package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-8 streaming-gate property specs. */
class StreamGatesR8Spec extends SparkSpec {

  test("q67 outer rows emit only after the watermark advances past them") {
    val d = "/root/testdata/sf0.001"
    // With the sentinel batch the watermark passes every real purchase, so
    // the landed frame IS the full batch left join (the oracle gates that).
    val withS = SessionGates.streamOuterJoinGate(spark, d, sentinel = true)
      .collect().map(_.toSeq.map(String.valueOf(_)).mkString("|")).toSet
    // Without it, the final watermark stalls at
    // min(max click_ts, max purchase_ts) - 10 min, so purchases past that
    // point must still be buffered when the query drains — their null-click
    // rows are exactly what the sentinel exists to flush.
    val withoutS = SessionGates.streamOuterJoinGate(spark, d, sentinel = false)
      .collect().map(_.toSeq.map(String.valueOf(_)).mkString("|")).toSet
    assert(withoutS.subsetOf(withS),
      "the sentinel may only ADD rows (flush buffered outer state)")
    val missing = withS -- withoutS
    assert(missing.nonEmpty,
      "some outer rows must be held back without the watermark advance")
    // every held-back row is a null-click row whose purchase sits past the
    // stalled watermark (columns: purchase_id|uid|purchase_ms|click_id|click_ms)
    val ev = graft.Tables(spark, d, "events")
      .select(col("event_type"), unix_millis(col("ts")).as("ts_ms"))
    val maxBySide = ev.filter(col("event_type").isin("click", "purchase"))
      .groupBy(col("event_type")).agg(max(col("ts_ms")).as("m"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val stalled = math.min(maxBySide("click"), maxBySide("purchase")) - 600000L
    missing.foreach { row =>
      val parts = row.split("\\|")
      assert(parts(3) == "null" && parts(4) == "null",
        s"held-back row must be a null-click outer row: $row")
      assert(parts(2).toLong >= stalled,
        s"held-back purchase ${parts(0)} at ${parts(2)} predates the " +
          s"stalled watermark $stalled — it should have emitted")
    }
  }
}
