package graft

/** Plan pins for the round-8 batch operators added after the r7 pins
  * (see PlanAuditR7Spec for the rationale — these fail on a refactor
  * before any benchmark notices). */
class PlanAuditR8Spec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"
  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, d).queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)

  private def bnljCount(p: String): Int =
    "\\(\\d+\\) BroadcastNestedLoopJoin".r.findAllIn(p).size

  test("d28: components + keeper election stay equi-joins end-to-end") {
    val p = plan("d28_cluster_keep_best")
    assert(!p.contains("CartesianProduct"), p)
    assert(bnljCount(p) === 0,
      s"keeper election must never nest — it joins on component/doc_id:\n$p")
  }

  test("v15: only the broadcast unlabeled batch nests; the vote is keyed") {
    val p = plan("v15_knn_labels")
    assert(!p.contains("CartesianProduct"), p)
    // the one intended nested-loop is the labeled-corpus × broadcast
    // query-batch scan (v01's shape); top-k and the vote are windows/
    // hash aggregations over (vec_id) — keyed shuffles, never nested
    assert(bnljCount(p) <= 1, s"vote stage leaked into a nested loop:\n$p")
  }

  test("q71/q72: transition matrix and retention never join — windows + aggs only") {
    Seq("q71_transition_matrix", "q72_cohort_retention").foreach { name =>
      val p = plan(name)
      assert(!p.contains("Join"), s"$name grew a join:\n$p")
      assert(p.contains("Window"), p)
    }
  }

  test("q70: grid and fill stay keyed on user_id — one equi-join, no nesting") {
    val p = plan("q70_gap_fill_locf")
    assert(!p.contains("CartesianProduct") && bnljCount(p) === 0, p)
    assert(p.contains("Window"), p)
  }

  test("t20: query-term filter reaches the scored set; only 1-row stats nest") {
    val p = plan("t20_bm25")
    assert(!p.contains("CartesianProduct"), p)
    // the two permitted nested-loops are the 1-row N/avgdl broadcasts;
    // tf↔df↔dl are equi-joins on token/doc_id
    assert(bnljCount(p) <= 2, s"a model-side join leaked into a nested loop:\n$p")
  }

  test("e10: the bucketed fact-to-fact join has NO exchange on the join key") {
    val d2 = "/root/testdata/sf0.001"
    val s = spark
    val pid = ProcessHandle.current().pid()
    val ordT = s"graft_e10spec_orders_$pid"
    val liT = s"graft_e10spec_lineitem_$pid"
    val threshold = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      ops.ExportOps.writeBucketed(graft.Tables(s, d2, "orders")
        .select("o_orderkey", "o_orderpriority"), ordT, 8, "o_orderkey")
      ops.ExportOps.writeBucketed(graft.Tables(s, d2, "lineitem")
        .select("l_orderkey", "l_extendedprice", "l_discount"), liT, 8, "l_orderkey")
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val p = ops.ExportOps.colocatedRevenue(s.table(ordT), s.table(liT))
        .queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
      assert(p.contains("SortMergeJoin"), p)
      // the bucketed scans satisfy the join's distribution — a shuffle on
      // either key means the layout guarantee was dropped on the floor
      assert(!p.contains("hashpartitioning(o_orderkey"),
        s"orders side re-shuffled despite bucketing:\n$p")
      assert(!p.contains("hashpartitioning(l_orderkey"),
        s"lineitem side re-shuffled despite bucketing:\n$p")
      // the only exchange left is the final tiny agg on o_orderpriority
      assert("\\(\\d+\\) Exchange".r.findAllIn(p).size <= 1, p)
    } finally {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
      s.sql(s"DROP TABLE IF EXISTS $ordT")
      s.sql(s"DROP TABLE IF EXISTS $liT")
    }
  }

  test("e11: appending a batch keeps the bucketed layout — still no key exchange") {
    val d2 = "/root/testdata/sf0.001"
    val s = spark
    val pid = ProcessHandle.current().pid()
    val ordT = s"graft_e11spec_orders_$pid"
    val liT = s"graft_e11spec_lineitem_$pid"
    val threshold = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      val ord = graft.Tables(s, d2, "orders")
        .select("o_orderkey", "o_orderpriority")
      ops.ExportOps.writeBucketed(
        ord.filter(org.apache.spark.sql.functions.col("o_orderkey") % 2 === 0),
        ordT, 8, "o_orderkey")
      ops.ExportOps.appendBucketed(
        ord.filter(org.apache.spark.sql.functions.col("o_orderkey") % 2 =!= 0),
        ordT, 8, "o_orderkey")
      ops.ExportOps.writeBucketed(graft.Tables(s, d2, "lineitem")
        .select("l_orderkey", "l_extendedprice", "l_discount"), liT, 8, "l_orderkey")
      // the appended table really holds both batches
      assert(s.table(ordT).count() === ord.count())
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val p = ops.ExportOps.colocatedRevenue(s.table(ordT), s.table(liT))
        .queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
      assert(p.contains("SortMergeJoin"), p)
      assert(!p.contains("hashpartitioning(o_orderkey"),
        s"append broke the orders side's bucket guarantee:\n$p")
      assert(!p.contains("hashpartitioning(l_orderkey"), p)
    } finally {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
      s.sql(s"DROP TABLE IF EXISTS $ordT")
      s.sql(s"DROP TABLE IF EXISTS $liT")
    }
  }
}
