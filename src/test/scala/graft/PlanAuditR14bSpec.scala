package graft

import graft.ops.{Relational, SimilarityOps}

/** Round-14 plan pins, second batch: the join-strategy hint override and
  * the radius search's window-free plan. */
class PlanAuditR14bSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  test("q138: the MERGE hint forces a sort-merge join the planner would not pick") {
    val (_, hinted) = Relational.joinHintRun(spark, d, hint = true)
    assert(hinted.contains("SortMergeJoin"),
      s"the hint must force the sort-merge strategy:\n$hinted")
    assert(!hinted.contains("BroadcastHashJoin"),
      s"the hinted plan must not fall back to broadcast:\n$hinted")
    val (_, free) = Relational.joinHintRun(spark, d, hint = false)
    assert(free.contains("BroadcastHashJoin"),
      s"without the hint the planner must broadcast the small dim " +
        s"(the size estimate the hint exists to override):\n$free")
  }

  test("t36: outer generate keeps gramless docs — same Generate node, outer flag on") {
    val inner = ops.TextOps.queries("t35_ngram_generator")(spark, d)
      .queryExecution.executedPlan.toString
    val outer = ops.TextOps.queries("t36_outer_generate")(spark, d)
      .queryExecution.executedPlan.toString
    // plan strings render Generate as: Generate <gen>(...), <required
    // ChildOutput>, <outer>, ... — pin the flag ON THE GENERATE LINE
    // (a bare contains("true") matches almost any executed plan)
    val generateLine = """Generate graft_ngrams\([^)]*\), [^,]*, (\w+)""".r
    def outerFlag(plan: String): Option[String] =
      generateLine.findFirstMatchIn(plan).map(_.group(1))
    assert(outerFlag(outer).contains("true"),
      s"t36 must plan an OUTER Generate (flag=${outerFlag(outer)}):\n$outer")
    assert(outerFlag(inner).contains("false"),
      s"t35 must plan the same Generate node with outer OFF " +
        s"(flag=${outerFlag(inner)}):\n$inner")
    // semantics: every document survives the outer explode
    val total = Tables(spark, d, "documents").count()
    val kept = ops.TextOps.queries("t36_outer_generate")(spark, d)
      .agg(org.apache.spark.sql.functions.sum("n_docs")).collect()(0).getLong(0)
    assert(kept == total,
      s"outer generate must keep all $total docs, kept $kept")
  }

  test("v24: radius search plans no per-query window — a filter, not a rank") {
    val radius = SimilarityOps.queries("v24_radius_search")(spark, d)
      .queryExecution.executedPlan.toString
    assert(!radius.contains("Window"),
      s"threshold search must not pay a rank/window:\n$radius")
    val topk = SimilarityOps.queries("v01_knn_brute")(spark, d)
      .queryExecution.executedPlan.toString
    assert(topk.contains("Window"),
      "the top-k twin DOES pay the window — the contrast the radius " +
        "contract exists for")
  }
}
