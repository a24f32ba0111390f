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
      Seq("graft_cosine_sim", "graft_minhash64", "graft_simhash64"))
    new graft.GraftExtensions() // constructible for spark.sql.extensions
  }
}
