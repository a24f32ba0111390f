package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-11 streaming-gate property specs. */
class StreamGatesR11Spec extends SparkSpec {

  test("q99 full-outer: BOTH sides' outer rows emit only on watermark close") {
    val d = "/root/testdata/sf0.001"
    // With the sentinel batch the watermark clears every eviction bound,
    // so the landed frame IS the full batch FULL JOIN (the oracle gates
    // that). Without it, the watermark stalls and the trailing unmatched
    // state on BOTH sides must still be buffered when the query drains.
    val withS = SessionGates
      .streamOuterJoinGate(spark, d, sentinel = true, joinType = "full_outer")
      .collect().map(_.toSeq.map(String.valueOf(_)).mkString("|")).toSet
    val withoutS = SessionGates
      .streamOuterJoinGate(spark, d, sentinel = false, joinType = "full_outer")
      .collect().map(_.toSeq.map(String.valueOf(_)).mkString("|")).toSet
    assert(withoutS.subsetOf(withS),
      "the sentinel may only ADD rows (flush buffered outer state)")
    val missing = withS -- withoutS
    assert(missing.nonEmpty,
      "some outer rows must be held back without the watermark advance")
    val ev = graft.Tables(spark, d, "events")
      .select(col("event_type"), unix_millis(col("ts")).as("ts_ms"))
    val maxBySide = ev.filter(col("event_type").isin("click", "purchase"))
      .groupBy(col("event_type")).agg(max(col("ts_ms")).as("m"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val stalled = math.min(maxBySide("click"), maxBySide("purchase")) - 600000L
    // columns: purchase_id|uid|purchase_ms|click_id|click_ms
    var nullClick, nullPurchase = 0
    missing.foreach { row =>
      val p = row.split("\\|")
      val isNullClick = p(3) == "null" && p(4) == "null"
      val isNullPurchase = p(0) == "null" && p(2) == "null"
      assert(isNullClick ^ isNullPurchase,
        s"held-back rows must be one-sided outer rows (matched rows emit " +
          s"on arrival, never on watermark): $row")
      if (isNullClick) {
        nullClick += 1
        // a purchase's null-click row closes when the watermark passes its
        // own event time — held-back ⇒ it sits past the stalled watermark
        assert(p(2).toLong >= stalled,
          s"held-back purchase ${p(0)} at ${p(2)} predates the stalled " +
            s"watermark $stalled — it should have emitted")
      } else {
        nullPurchase += 1
        // a click's null-purchase row closes only when a claiming purchase
        // can no longer arrive: watermark > click_ts + 30 min — so a
        // held-back click sits within the horizon of the stalled watermark
        assert(p(4).toLong >= stalled - 1800000L,
          s"held-back click ${p(3)} at ${p(4)} is past its eviction bound " +
            s"(stalled watermark $stalled - 30 min) — it should have emitted")
      }
    }
    assert(nullClick > 0 && nullPurchase > 0,
      s"both legs must hold state back ($nullClick null-click / " +
        s"$nullPurchase null-purchase held) — a one-sided holdback means " +
        "the full-outer eviction pass only runs one side")
  }

  test("q102: statestore batchId time-travels to the state AS OF an earlier commit") {
    val d = "/root/testdata/sf0.001"
    val out = ExportOps.scratchDir("graft_statesrc_spec", "spec")
    ExportOps.withScratchCleanup(out) {
      SessionGates.stateSourceHarness(spark, d, out)
      def stateAt(opts: Map[String, String]): Map[Long, (Long, Long)] = {
        val r = spark.read.format("statestore")
          .option("path", s"$out/ckpt")
        opts.foreach { case (k, v) => r.option(k, v) }
        r.load()
          .select(col("key.user_id"), col("value.count"), col("value.sum"))
          .collect()
          .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2)))).toMap
      }
      val fin = stateAt(Map.empty)
      val b0 = stateAt(Map("batchId" -> "0"))
      // batch 0 committed only the first file: every user's batch-0 state
      // must equal their first-half totals, strictly below the final
      // state for any user with second-half events
      val mid = graft.Tables(spark, d, "events")
        .agg(avg(unix_micros(col("ts")))).head().getDouble(0).toLong
      val firstHalf = graft.Tables(spark, d, "events")
        .filter(unix_micros(col("ts")) <= mid)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n"),
          sum(unix_millis(col("ts")) - lit(SessionGates.BaseEpochMs)).as("sm"))
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
        .toMap
      assert(b0 === firstHalf,
        "batchId=0 state must be exactly the first file's aggregate")
      assert(b0 != fin, "final state must differ (second file added events)")
      // final state is componentwise >= the batch-0 state (counts only grow)
      b0.foreach { case (u, (n0, _)) =>
        assert(fin(u)._1 >= n0, s"user $u count shrank across commits")
      }
      ExportOps.deleteRecursively(out)
    }
  }

  test("q103: the ingest screen is load-bearing — unscreened late replay inflates sessions") {
    val d = "/root/testdata/sf0.001"
    def sumN(df: org.apache.spark.sql.DataFrame): Long =
      df.agg(sum(col("n_events"))).head().getLong(0)
    val corpus = graft.Tables(spark, d, "events").count()
    val Array(mn, mx) = graft.Tables(spark, d, "events")
      .agg(min(unix_micros(col("ts"))), max(unix_micros(col("ts"))))
      .head().toSeq.map(_.asInstanceOf[Long]).toArray
    val planted = graft.Tables(spark, d, "events")
      .filter(unix_micros(col("ts")) <= mn + (mx - mn) / 4).count()
    // screened: the redelivery is fully absorbed — every corpus event
    // sessionized exactly once (the oracle gates the full row content)
    val screened = SessionGates.lateRedeliveryHarness(spark, d, screened = true)
    assert(sumN(screened) === corpus)
    // unscreened: append-mode session aggregation does NOT drop
    // watermark-late input (Spark 4.1.2, verified here) — the replay
    // re-opens closed sessions and re-emits them, inflating the sink by
    // exactly the planted rows. This is WHY q103 composes the q65 screen
    // in front: late-data hygiene is the pipeline's job.
    val unscreened = SessionGates.lateRedeliveryHarness(spark, d, screened = false)
    assert(sumN(unscreened) === corpus + planted,
      s"expected the unscreened replay to inflate by $planted — if this " +
        "now equals the corpus, Spark started dropping late aggregation " +
        "input and the q103 scaladoc story needs rewriting")
  }

  test("q105: observed metrics account for every ingested row and cent") {
    val d = "/root/testdata/sf0.001"
    val (_, nRows, sumCents) = SessionGates.observedSessionHarness(spark, d)
    val ev = graft.Tables(spark, d, "events")
    val corpus = ev.count()
    val cents = ev.agg(
      sum(expr("CAST(floor(value * 100 + 0.5) AS BIGINT)"))).head().getLong(0)
    // the sentinel row observes too (value 0.0 → floor(0.5) = 0 cents)
    assert(nRows === corpus + 1,
      s"observed $nRows rows, ingested ${corpus + 1} (corpus + sentinel)")
    assert(sumCents === cents,
      s"observed cents $sumCents != batch total $cents")
  }

  test("q100: history reaches the stream ONLY via initial state, and is carried") {
    val d = "/root/testdata/sf0.001"
    val rows = graft.SparkEntry.queries("q100_stream_state_bootstrap")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // exact lifetime totals + distinct types, computed batch-agnostically
    val exact = graft.Tables(spark, d, "events")
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(floor(value * 100 + 0.5) AS BIGINT)")).as("c"),
        countDistinct(col("event_type")).as("t"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    val mid = graft.Tables(spark, d, "events").agg(
      expr("(min(unix_micros(ts)) + max(unix_micros(ts))) div 2"))
      .head().getLong(0)
    val preCounts = graft.Tables(spark, d, "events")
      .filter(unix_micros(col("ts")) <= mid)
      .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val byUser = rows.groupBy(_._1)
    // the bootstrap must actually be exercised: some emitting user's
    // history half is non-empty (it reached the processor only as state)
    assert(byUser.keys.exists(u => preCounts.getOrElse(u, 0L) > 0L),
      "no emitting user had pre-midpoint history — the harness split is broken")
    byUser.foreach { case (u, rs) =>
      assert(rs.length <= 2, s"user $u emitted ${rs.length} rows (max 2 batches)")
      val last = rs.maxBy(_._2)
      assert((last._2, last._3, last._4) === exact(u),
        s"user $u final emission ${(last._2, last._3, last._4)} != lifetime " +
          s"${exact(u)} — initial state lost or double-applied (pre-mid " +
          s"history: ${preCounts.getOrElse(u, 0L)} events)")
    }
  }
}
