package graft.ops

import graft.SparkSpec

/** q112 harness pins — what the driver's hash gate can't check: the
  * complete-mode leaderboard really was rewritten across MULTIPLE
  * triggers (a single-trigger run would pass the hash without proving
  * state carry + whole-result rewrite), and the served rows equal the
  * batch recompute at spec time. */
class CompleteModeSpec extends SparkSpec {

  test("q112: complete mode reranks across >= 2 triggers and equals the batch top-3") {
    val d = "/root/testdata/sf0.001"
    val (served, triggers) = SessionGates.q112Harness(spark, d)
    assert(triggers >= 2,
      s"complete-mode gate ran $triggers non-empty triggers — the " +
        "two-file split must land as two micro-batches")
    val batch = graft.Tables(spark, d, "events")
      .groupBy(org.apache.spark.sql.functions.col("event_type"))
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"),
        org.apache.spark.sql.functions.sum(org.apache.spark.sql.functions
          .expr("CAST(floor(value * 100 + 0.5) AS BIGINT)")).as("sum_cents"))
      .orderBy(org.apache.spark.sql.functions.col("n").desc,
        org.apache.spark.sql.functions.col("event_type").asc)
      .limit(3)
    assert(served.collect().toSeq === batch.collect().toSeq,
      "the final complete-mode table must equal the batch top-3")
  }
}
