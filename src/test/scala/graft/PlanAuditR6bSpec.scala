package graft

/** Plan pins for the second-wave round-6 operators (see PlanAuditSpec for
  * the rationale: these fail on a refactor before any benchmark notices). */
class PlanAuditR6bSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"
  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, d).queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)

  test("d18: bloom probe filters the incoming side below the verify join") {
    import org.apache.spark.sql.execution.{FilterExec, SparkPlan}
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, ScalaUDF}
    // structural check on the plan TREE (string positions in FormattedMode
    // are layout, not structure): the left-semi verify join must exist,
    // and a Filter whose condition invokes the codegen'd
    // BloomFilterMightContain probe (r7: was a ScalaUDF) must live in its
    // STREAMED (left) subtree — the bloom pre-filter runs before any
    // shuffle/join work on the incoming batch
    val plan = SparkEntry.queries("d18_bloom_screen")(spark, d)
      .queryExecution.sparkPlan
    def hasProbeFilter(p: SparkPlan): Boolean =
      p.exists {
        case f: FilterExec =>
          f.condition.exists(_.isInstanceOf[BloomFilterMightContain])
        case _ => false
      }
    assert(!plan.exists {
      case f: FilterExec => f.condition.exists(_.isInstanceOf[ScalaUDF])
      case _ => false
    }, s"the probe must not be an interpreted UDF:\n$plan")
    val semis = plan.collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec
          if j.joinType.sql == "LEFT SEMI" => j
    }
    assert(semis.nonEmpty, s"verify join no longer left-semi:\n$plan")
    assert(semis.exists(j => hasProbeFilter(j.left)),
      s"bloom probe filter not below the semi join's streamed side:\n$plan")
    assert(!plan.toString.contains("CartesianProduct"), plan.toString)
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
