package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q108 property pins — the evolution claims the oracle hash alone can't
  * localize: (1) v1 state actually CARRIED through the encoder upgrade
  * (run-2 totals are lifetime, not run-2-only), and (2) the added field
  * behaved as an evolution default (absent in every v1 row, fresh-folded
  * in run 2) — both on the real gate, checkpoint and all. */
class StateEvolveProbeSpec extends SparkSpec {

  test("q108: v1 state carries through the schema upgrade; new field starts from its default") {
    val d = "/root/testdata/sf0.001"
    val rows = graft.SparkEntry.queries("q108_state_schema_evolution")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    val ev = graft.Tables(spark, d, "events")
      .select(col("user_id"), unix_micros(col("ts")).as("tsu"),
        expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("cents"))
    val mid = ev.agg(expr("(min(tsu) + max(tsu)) div 2")).head().getLong(0)
    val lifetime = ev.groupBy(col("user_id")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val run2max = ev.filter(col("tsu") > mid)
      .groupBy(col("user_id")).agg(max(col("cents")).as("mx"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val (run1Rows, run2Rows) = rows.partition(_._4 == -1L)
    assert(run1Rows.nonEmpty && run2Rows.nonEmpty,
      "both runs must emit — the harness split drifted")
    // the carry: run-2 totals are LIFETIME counts, so every user with
    // pre-mid history proves the upgraded encoder read v1 state
    run2Rows.foreach { case (u, n, _, mx) =>
      assert(n === lifetime(u),
        s"user $u run-2 total $n != lifetime ${lifetime(u)} — v1 state " +
          "was lost in the encoder upgrade")
      assert(mx === run2max(u),
        s"user $u new-field fold $mx != run-2 max ${run2max(u)} — the " +
          "added field must start from its absent-state default")
    }
    val postMid = ev.filter(col("tsu") > mid)
      .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val carried = run2Rows.count { case (u, n, _, _) =>
      n > postMid.getOrElse(u, 0L) }
    assert(carried > 0, "no run-2 user had pre-mid history to carry")
  }
}
