package graft

/** Locks in the physical-plan properties the engine is designed around —
  * if a refactor silently breaks scan pushdown or turns a broadcast into a
  * cartesian product, these fail before any benchmark notices. */
class PlanAuditSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"
  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, d).queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)

  test("q02: filters and projection reach the parquet scan") {
    val p = plan("q02_filter_project")
    assert(p.contains("GreaterThan(l_quantity,45.0)"), s"filter not pushed:\n$p")
    assert(p.contains("LessThan(l_discount,0.02)"), s"filter not pushed:\n$p")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("l_shipdate") && !readSchema.contains("l_tax"),
      s"column pruning lost: $readSchema")
  }

  test("q04: dims broadcast, no cartesian products") {
    val p = plan("q04_join_multiway")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), s"cartesian product crept in:\n$p")
  }

  test("v01: query side broadcasts; corpus streams once") {
    val p = plan("v01_knn_brute")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q01: partial + final hash aggregation (map-side combine)") {
    val p = plan("q01_pricing_summary")
    assert("HashAggregate".r.findAllIn(p).size >= 2, s"no partial aggregation:\n$p")
  }

  test("q17: top-k plans TakeOrderedAndProject, not a global sort") {
    val p = plan("q17_topk")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("d10: candidate pairs dedupe before the Jaccard verify join") {
    val p = plan("d10_jaccard_blocked")
    // the distinct (HashAggregate on doc_a/doc_b) must sit between the band
    // self-join and the verify joins — pairs never fan out the hash arrays
    assert(p.contains("HashAggregate"), s"pair dedup lost:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("v02: LSH kNN candidates form via band equi-joins, no nested loop") {
    // the OR-of-band-equalities formulation planned a BroadcastNestedLoopJoin
    // over the whole corpus — correct at 16 queries, quadratic the moment the
    // query side grows. The band-exploded equi-join must keep every join a
    // hash/sort-merge join.
    val p = plan("v02_knn_lsh")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"v02 degenerated to a nested-loop over the corpus:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("v03: corpus verify joins never hint-broadcast the embedding table") {
    // with size-based auto-broadcast off, any remaining BroadcastHashJoin
    // would have to come from a broadcast() hint — the scale-killer this
    // pins out. The verify legs must fall back to shuffle equi-joins.
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    try {
      spark.conf.set(key, "-1")
      val p = plan("v03_embed_neardup")
      assert(!p.contains("BroadcastHashJoin"),
        s"v03 hint-broadcasts the corpus embedding table:\n$p")
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"), p)
    } finally spark.conf.set(key, prev)
  }

  test("v06: bounded pair space broadcasts the small side") {
    val p = plan("v06_neardup_exact")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
  }

  test("q51: split assignment reads only doc_id from the scan") {
    val p = plan("q51_split_assign")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("text"),
      s"split must not read document bodies: $readSchema")
  }

  test("d13: contamination joins on shingle hash, never a doc cross product") {
    val p = plan("d13_contamination")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"contamination check must stay an equi-join:\n$p")
  }

  test("sweep: no query plans an unintended cartesian product") {
    // ops whose semantics ARE a bounded cross product (explicit cross join
    // of dims, brute-force similarity over a broadcast query set)
    val intended = Set("q44_cross_join", "v01_knn_brute", "v06_neardup_exact",
      "v05_knn_ivf", "v07_knn_ivf_trained", "t06_tfidf")
    SparkEntry.queries.keys.filterNot(intended).toSeq.sorted.foreach { name =>
      val p = plan(name)
      assert(!p.contains("CartesianProduct"),
        s"$name plans a CartesianProduct:\n$p")
    }
  }

  test("t11: bigram top-100 is TakeOrderedAndProject over partial aggregation") {
    val p = plan("t11_bigram_counts")
    assert(p.contains("TakeOrderedAndProject"), s"top-k became a global sort:\n$p")
    assert("HashAggregate".r.findAllIn(p).size >= 2, s"no partial aggregation:\n$p")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("n_chars") && !readSchema.contains("lang"),
      s"bigram pass must scan only text: $readSchema")
  }

  test("t12: model join stays an equi-join; only the 1-row total broadcasts") {
    val p = plan("t12_unigram_logprob")
    assert(!p.contains("CartesianProduct"), p)
    // the token↔counts join must be a real join (hash or sort-merge), and
    // the only nested-loop is the broadcast of the single-row total
    // (FormattedMode prints each node twice: tree line + "(n) Node" detail)
    assert("\\(\\d+\\) BroadcastNestedLoopJoin".r.findAllIn(p).size <= 1, p)
  }

  test("g01: flagship joins are hash joins with no shuffle on the dim side") {
    val p = plan("g01_geotab_flagship")
    assert(p.contains("BroadcastHashJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("SortMergeJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }
}
