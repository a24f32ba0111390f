package graft

/** Every declared query must execute at sf0.001 and agree with its oracle's
  * column set; entry() must return rows (the driver's t1 smoke). */
class QueriesSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  test("entry returns GeoJSON features") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracle keys are a subset of query keys") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  // q07/q28 legitimately return 0 rows at sf0.001; execution must still succeed.
  private val mayBeEmpty = Set("q07_join_anti", "q28_having")

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name executes at sf0.001") {
      val df = fn(spark, d)
      assert(df.columns.nonEmpty)
      val n = df.count()
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned no rows")
    }
  }
}
