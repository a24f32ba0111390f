package graft

/** Plan pins for the round-10 second-wave operators (rationale in
  * PlanAuditR7Spec: these fail on a refactor before any benchmark
  * notices). q92's pin exists because the O(n²) shape it forbids was
  * REAL: the first formulation used an `[current, unbounded following]`
  * frame, whose frame processor re-aggregates from scratch per row —
  * minutes instead of seconds on the hourly grid.
  */
class PlanAuditR10Spec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"
  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, d).queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)

  test("q92: both neighbour passes are running frames — no unbounded-following") {
    val p = plan("q92_resample_lerp")
    assert(!p.toLowerCase.contains("unboundedfollowing"),
      s"a following-frame window re-aggregates per row, O(n^2):\n$p")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
    assert("\\(\\d+\\) Window".r.findAllIn(p).size >= 2,
      s"prev/next passes must stay window operators:\n$p")
  }

  test("q94: map reshaping is per-row work on the aggregation — no joins") {
    val p = plan("q94_map_funcs")
    assert(!p.contains("Join"), s"map stats must not plan a join:\n$p")
    assert(p.contains("ReadSchema: struct<user_id:bigint,event_type:string>"),
      s"events scan must prune to (user_id, event_type):\n$p")
  }

  test("t27: rank and count ride ONE source-keyed exchange") {
    val p = plan("t27_source_prune")
    assert(!p.contains("Join"), s"the cut must not self-join:\n$p")
    // exactly one HASH exchange (the source-keyed one); the only other
    // allowed exchange is the presentation ORDER BY's range partitioning
    assert("hashpartitioning".r.findAllIn(p).size === 1,
      s"per-source rank + count must share one hash shuffle:\n$p")
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string,source:string>") ||
      p.contains("ReadSchema: struct<doc_id:bigint,source:string,text:string>"),
      s"documents scan must prune to (doc_id, source, text):\n$p")
  }

  test("q93: observe rides the export pass — one scan, CollectMetrics inline") {
    import org.apache.spark.sql.functions._
    val obs = org.apache.spark.sql.Observation("plan_pin")
    val p = Tables(spark, d, "events")
      .filter(col("event_type") =!= "error")
      .select(col("event_id"), col("value"))
      .observe(obs, count(lit(1)).as("n"))
      .queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
    assert(p.contains("CollectMetrics"), s"observe must plan inline:\n$p")
    // count tree nodes only — the formatted detail section repeats the
    // node name once per node, so a bare substring count double-counts
    assert("\\(\\d+\\) Scan parquet".r.findAllIn(p).size === 1,
      s"metrics must not add a second scan:\n$p")
  }

  test("q96: the sliding expansion feeds ONE hash aggregation — no self-join") {
    val p = plan("q96_window_sliding")
    assert(!p.contains("Join"),
      s"the overlap must come from the window generator, not a join:\n$p")
    assert("hashpartitioning".r.findAllIn(p).size === 1,
      s"one map-side-combined aggregation shuffle:\n$p")
  }

  test("m07: two embed towers meet in equi-joins — nothing pairwise") {
    val p = plan("m07_clip_filter")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"pair scoring must stay 1:1 on doc_id equi-joins:\n$p")
  }

  test("q95: the batch twin plans a hash LeftSemi on user_id, never a nest") {
    import org.apache.spark.sql.functions._
    val e = Tables(spark, d, "events")
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_millis(col("ts")).as("ms"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("uid"),
        col("ms").as("pms"))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("ms").as("cms"))
    val semi = purchases.join(clicks,
      col("uid") === col("user_id") &&
        col("cms") >= col("pms") - 1800000L && col("cms") <= col("pms"),
      "left_semi")
    val p = semi.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(p.contains("LeftSemi"), p)
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"interval bound must ride the uid equi-join as a post-condition:\n$p")
  }
}
