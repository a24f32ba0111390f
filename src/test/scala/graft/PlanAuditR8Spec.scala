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
}
