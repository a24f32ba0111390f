package graft

/** Plan pins for the round-7 batch operators (the streaming/persist gates
  * localize their results, so their shapes are pinned where the underlying
  * operator is testable — see PlanAuditSpec for the rationale: these fail
  * on a refactor before any benchmark notices). */
class PlanAuditR7Spec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"
  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, d).queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)

  private def bnljCount(p: String): Int =
    "\\(\\d+\\) BroadcastNestedLoopJoin".r.findAllIn(p).size

  test("t19: LM model joins stay equi-joins; only the 1-row total nested-loops") {
    val p = plan("t19_bigram_logprob")
    assert(!p.contains("CartesianProduct"), p)
    // bigram↔model joins must be real joins (broadcast-hash at fixture
    // size, shuffle joins once the vocab outgrows the threshold — AQE's
    // call); the single permitted nested-loop is the 1-row total
    assert(bnljCount(p) <= 1, s"model table leaked into a nested loop:\n$p")
  }

  test("d23: fuzzy blocking is an equi-join — the pair space never nests") {
    val p = plan("d23_fuzzy_dedup")
    assert(!p.contains("CartesianProduct") && bnljCount(p) === 0,
      s"blocking must stay a hash/sort-merge equi-join:\n$p")
  }

  test("v13: one intended query-set nested-loop, everything else equi-joins") {
    val p = plan("v13_rrf_fusion")
    assert(!p.contains("CartesianProduct"), p)
    assert(bnljCount(p) <= 1, s"only the broadcast query set may nest:\n$p")
  }

  test("t18: the corpus side never sort-merges — rates broadcast onto one scan") {
    val p = plan("t18_temperature_resample")
    assert(!p.contains("CartesianProduct"), p)
    // three 1-row cross-broadcasts (N twice — the withW subtree feeds both
    // the normalizer and the rates branch — plus the normalizer itself);
    // a SortMergeJoin would mean the corpus started shuffling for a
    // |domains|-row dimension table
    assert(!p.contains("SortMergeJoin"), s"corpus shuffled for a tiny dim:\n$p")
    assert(bnljCount(p) <= 3, p)
  }

  test("q66: the merge is one window over one shuffle — no joins at all") {
    val p = plan("q66_upsert_merge")
    assert(!p.contains("Join"), s"CDC merge must not join:\n$p")
    assert(p.contains("Window"), p)
  }
}
