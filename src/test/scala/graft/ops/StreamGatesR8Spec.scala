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

  test("q74: transformWithState carries per-user totals across the batch boundary") {
    val d = "/root/testdata/sf0.001"
    val rows = graft.SparkEntry.queries("q74_stream_cumulative")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byUser = rows.groupBy(_._1)
    // totals over the whole fixture, computed batch-agnostically
    val exact = graft.Tables(spark, d, "events")
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(floor(value * 100 + 0.5) AS BIGINT)")).as("c"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // a user emits at most twice (once per batch they appear in), and the
    // LAST emission must equal the exact lifetime totals — state survived
    byUser.foreach { case (u, rs) =>
      assert(rs.length <= 2, s"user $u emitted ${rs.length} rows")
      val last = rs.maxBy(_._2)
      assert((last._2, last._3) === exact(u),
        s"user $u final totals drifted from the batch-agnostic recompute")
    }
    // cross-boundary users exist and their first emission is a strict
    // prefix of the second — the state the new API must have carried
    val both = byUser.filter(_._2.length == 2)
    assert(both.nonEmpty, "fixture must have users active in both batches")
    both.foreach { case (u, rs) =>
      val Seq(a, b) = rs.sortBy(_._2).toSeq
      assert(a._2 < b._2,
        s"user $u batch-1 emission is not a running prefix: $rs")
    }
  }
}
