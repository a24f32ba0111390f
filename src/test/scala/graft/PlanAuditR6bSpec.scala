package graft

/** Plan pins for the second-wave round-6 operators (see PlanAuditSpec for
  * the rationale: these fail on a refactor before any benchmark notices). */
class PlanAuditR6bSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"
  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, d).queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)

  test("d18: bloom probe filters the incoming side before the verify join") {
    val p = plan("d18_bloom_screen")
    // the probe is a driver-broadcast sketch applied in a Filter; the
    // verify is a left-semi hash join on the 32-byte hash — never a
    // cartesian, never a corpus broadcast of the incoming batch
    assert(p.toLowerCase.contains("udf"), s"bloom probe filter lost:\n$p")
    assert(p.contains("LeftSemi"), s"verify join no longer left-semi:\n$p")
    assert(!p.contains("CartesianProduct"), p)
    // the probe must sit below the semi join (plan prints children after
    // parents: the first LeftSemi line precedes its input's Filter detail)
    val probeIdx = p.toLowerCase.indexOf("udf")
    val joinIdx = p.indexOf("LeftSemi")
    assert(joinIdx >= 0 && probeIdx > joinIdx,
      s"probe not on the join's input side:\n$p")
  }

  test("t17: domain mix shuffles once on source (plus the output sort)") {
    val p = plan("t17_domain_mix")
    val hashEx = "hashpartitioning".r.findAllIn(p).size
    assert(hashEx == 1, s"expected exactly 1 hash shuffle, got $hashEx:\n$p")
    assert(p.contains("Window"), s"running-sum window lost:\n$p")
  }

  test("q57: native session agg — no window function, partial aggregation") {
    val p = plan("q57_session_window")
    assert(!p.contains("Window ["), s"q57 should aggregate, not window:\n$p")
    assert(p.contains("HashAggregate") || p.contains("SortAggregate"),
      s"session aggregation lost:\n$p")
    val hashEx = "hashpartitioning".r.findAllIn(p).size
    assert(hashEx <= 2, s"session agg shuffles more than expected:\n$p")
  }

  test("q59: merge re-aggregates partials — no join, no re-scan fan-out") {
    val p = plan("q59_incremental_agg")
    assert(!p.contains("Join"), s"q59 grew a join:\n$p")
    assert("HashAggregate".r.findAllIn(p).size >= 4,
      s"partial+final aggregation on both branches lost:\n$p")
  }

  test("d19: domain cap is one window over one hash shuffle") {
    val p = plan("d19_domain_cap")
    val hashEx = "hashpartitioning".r.findAllIn(p).size
    assert(hashEx == 1, s"expected exactly 1 hash shuffle, got $hashEx:\n$p")
    assert(p.contains("Window"), s"rank window lost:\n$p")
    assert(!p.contains("Join"), s"d19 grew a join:\n$p")
  }
}
