package graft.ops

import graft.SparkSpec

/** q113 pins the driver's hash gate can't check: the stream-static join
  * must be a stateless broadcast probe — a BroadcastHashJoin in the
  * micro-batch plan, no shuffle join, and NO state store (the whole point
  * of stream-static enrichment: state cost O(dim), not O(stream)) — and
  * the restart must re-bind the static side to the v2 dim. */
class StreamStaticSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  private def run(): (Seq[(Int, String, String, Long)], String, Boolean) = {
    var ckptState: Boolean = true
    var plan = ""
    val res = SessionGates.streamStaticHarness(spark, d, (out, p) => {
      plan = p
      ckptState = new java.io.File(out, "ckpt/state").exists()
    })
    val rows = res.collect().map(r =>
      (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    (rows, plan, ckptState)
  }

  test("q113: broadcast hash probe, no shuffle join, no state store") {
    val (rows, plan, ckptState) = run()
    assert(plan.contains("BroadcastHashJoin"),
      s"static dim must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin") &&
      !plan.contains("ShuffledHashJoin"),
      s"stream-static enrichment must not shuffle the stream:\n$plan")
    assert(!plan.contains("StateStore"),
      s"a stream-static join is stateless — no state store operator:\n$plan")
    assert(!ckptState,
      "checkpoint must have no state/ directory: the join keeps no state")
    // run-2 rebind observable in the data: v1 rows carry raw segments,
    // v2 rows carry the rebrand and never the old name
    val v1Tiers = rows.collect { case (1, t, _, _) => t }.toSet
    val v2Tiers = rows.collect { case (2, t, _, _) => t }.toSet
    assert(v1Tiers.contains("MACHINERY") && !v1Tiers.contains("AUTOMATION"),
      s"run 1 must serve the v1 dim: $v1Tiers")
    assert(v2Tiers.contains("AUTOMATION") && !v2Tiers.contains("MACHINERY"),
      s"run 2 must serve the v2 dim (rebrand visible): $v2Tiers")
  }

  test("q113: the v2 deletion drops run-2 events of deleted customers") {
    val ev = graft.Tables(spark, d, "events")
    val cust = graft.Tables(spark, d, "customer")
    import org.apache.spark.sql.functions._
    // total run-2 joined events the harness landed
    val (rows, _, _) = run()
    val landedRun2 = rows.collect { case (2, _, _, n) => n }.sum
    // recomputed: post-mid events whose user survives the v2 delete
    val stats = ev.agg(min(unix_micros(col("ts"))),
      max(unix_micros(col("ts")))).head()
    val mid = (stats.getLong(0) + stats.getLong(1)) / 2
    val expect = ev.filter(unix_micros(col("ts")) > mid)
      .join(cust.filter(col("c_custkey") % 10 =!= 3)
        .select(col("c_custkey").as("user_id")), Seq("user_id"))
      .count()
    assert(landedRun2 === expect,
      s"run-2 landing must reflect the v2 deletion: $landedRun2 vs $expect")
    // and the deletion is real: some post-mid events DID have a %10==3 user
    val dropped = ev.filter(unix_micros(col("ts")) > mid)
      .filter(col("user_id") % 10 === 3).count()
    assert(dropped > 0, "fixture must exercise the deleted-customer path")
  }
}
