package graft.functions

import graft.SparkSpec

/** SQL-surface tests: the native expressions resolve and evaluate through
  * plain spark.sql once registered (registerAll; GraftExtensions injects
  * the same descriptions at session build on a cluster). */
class GraftFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("graft functions usable from SQL") {
    GraftFunctions.registerAll(spark)
    val cos = spark.sql(
      "SELECT graft_cosine_sim(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c")
      .as[Double].head()
    assert(math.abs(cos - 1.0) < 1e-12)
    val sigLen = spark.sql(
      "SELECT size(graft_minhash64(array(1L, 2L, 3L))) AS n").as[Int].head()
    assert(sigLen === 64)
    val sh = spark.sql(
      "SELECT graft_simhash64(array(1L, 2L, 3L)) AS s").as[Long].head()
    assert(sh === SimHash64.eval(Array(1L, 2L, 3L)))
    // SQL surface matches the Column surface bit-for-bit (same tree)
    val sqlKm = spark.sql(
      "SELECT graft_haversine_km(39.7392D, -104.9903D, 40.0150D, -105.2705D) AS km")
      .as[Double].head()
    val colKm = spark.range(1).select(
      GeoFunctions.haversineKm(
        org.apache.spark.sql.functions.lit(39.7392),
        org.apache.spark.sql.functions.lit(-104.9903),
        org.apache.spark.sql.functions.lit(40.0150),
        org.apache.spark.sql.functions.lit(-105.2705)).as("km"))
      .as[Double].head()
    assert(sqlKm === colKm, s"$sqlKm vs $colKm")
    assert(math.abs(sqlKm - 38.4) < 1.0, s"Denver->Boulder ~38km, got $sqlKm")
  }

  test("GraftSession front door registers functions and tuned conf") {
    val s = graft.GraftSession.getOrCreate() // returns the active session
    assert(s.sql("SELECT size(graft_minhash64(array(7L))) AS n")
      .as[Int].head() === 64)
    val b = graft.GraftSession.builder()
    assert(b.getClass.getSimpleName === "Builder") // constructible for cluster use
  }

  test("GraftExtensions exposes the same function set") {
    assert(GraftFunctions.descriptions.map(_._1.funcName).sorted ===
      Seq("graft_cosine_sim", "graft_haversine_km", "graft_minhash64",
        "graft_simhash64"))
    new graft.GraftExtensions() // constructible for spark.sql.extensions
  }
}
