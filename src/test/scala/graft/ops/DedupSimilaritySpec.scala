package graft.ops

import graft.SparkSpec
import graft.functions.{SimHash64, VectorExpressions}
import org.apache.spark.sql.functions._

/** Unit tests for the LLM-pipeline operators (SURVEY.md §5.5): hand-built
  * inputs with known duplicates; LSH recall cross-checked against brute
  * force. */
class DedupSimilaritySpec extends SparkSpec {
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog again and again today"
  private def docs = Seq(
    (0L, base),
    (1L, base),                                             // exact dup of 0
    (2L, base.replace("lazy", "sleepy")),                   // near dup of 0
    (3L, "completely different words about spark catalyst optimizer rules engine"),
    (4L, "another unrelated document mentioning parquet files and shuffles everywhere")
  ).toDF("doc_id", "text")

  test("semantic dedup keeps exactly one representative per component") {
    // hand-built component structure: {1,2,3} chained, {5,6} paired,
    // {4,7} untouched
    val universe = (1L to 7L).toDF("vec_id")
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("doc_a", "doc_b")
    val got = SimilarityOps.semanticDedup(universe, pairs)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(1L -> "representative", 5L -> "representative",
      4L -> "unique", 7L -> "unique"))
    // and on the gated instance: no near-dup pair survives intact
    val d = "/root/testdata/sf0.001"
    val survivors = graft.SparkEntry.queries("v11_semantic_dedup")(spark, d)
      .select("vec_id").as[Long].collect().toSet
    val pairRows = graft.SparkEntry.queries("v06_neardup_exact")(spark, d)
      .select("id_a", "id_b").as[(Long, Long)].collect()
    assert(pairRows.nonEmpty)
    pairRows.foreach { case (a, b) =>
      assert(!(survivors(a) && survivors(b)),
        s"near-dup pair ($a,$b) survived semantic dedup intact")
    }
  }

  test("minhash LSH finds exact and near duplicates, not unrelated pairs") {
    val sigs = DedupOps.minhashSignatures(spark, docs)
    val pairs = DedupOps.lshCandidates(sigs)
      .as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)), s"exact dup pair missing from $pairs")
    assert(pairs.contains((0L, 2L)) || pairs.contains((1L, 2L)),
      s"near dup pair missing from $pairs")
    assert(!pairs.contains((3L, 4L)), "unrelated docs must not collide")
  }

  test("minhash estimated jaccard is 1.0 for identical docs") {
    val sigs = DedupOps.minhashSignatures(spark, docs)
    val s0 = sigs.filter($"doc_id" === 0).head().getSeq[Long](1)
    val s1 = sigs.filter($"doc_id" === 1).head().getSeq[Long](1)
    assert(s0 === s1)
    assert(s0.length === 64)
  }

  test("simhash: identical docs hash equal; near dups within small hamming") {
    val sig = docs.select($"doc_id",
      SimHash64.simhash64(spark,
        transform(split($"text", " "), t => xxhash64(t))).as("sh"))
      .as[(Long, Long)].collect().toMap
    assert(sig(0L) === sig(1L))
    val hammingNear = java.lang.Long.bitCount(sig(0L) ^ sig(2L))
    val hammingFar = java.lang.Long.bitCount(sig(0L) ^ sig(3L))
    assert(hammingNear < hammingFar,
      s"near-dup hamming $hammingNear !< unrelated hamming $hammingFar")
  }

  test("cosine expression matches hand computation and handles zero vectors") {
    val vecs = Seq(
      (Array(1.0f, 0.0f), Array(1.0f, 0.0f), 1.0),
      (Array(1.0f, 0.0f), Array(0.0f, 1.0f), 0.0),
      (Array(1.0f, 1.0f), Array(1.0f, 0.0f), math.sqrt(0.5)),
      (Array(0.0f, 0.0f), Array(1.0f, 0.0f), 0.0) // zero-norm guard
    ).toDF("a", "b", "expected")
    val got = vecs.select(
      VectorExpressions.cosineSim(spark, $"a", $"b").as("cos"), $"expected")
      .as[(Double, Double)].collect()
    got.foreach { case (c, e) => assert(math.abs(c - e) < 1e-12, s"$c vs $e") }
  }

  test("LSH and IVF knn recall vs brute force at sf0.001 is reasonable") {
    val d = "/root/testdata/sf0.001"
    val brute = SparkEntryQueries("v01_knn_brute", d)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val lsh = SparkEntryQueries("v02_knn_lsh", d)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val ivf = SparkEntryQueries("v05_knn_ivf", d)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val lshRecall = (brute & lsh).size.toDouble / brute.size
    val ivfRecall = (brute & ivf).size.toDouble / brute.size
    assert(lshRecall >= 0.3, s"LSH recall $lshRecall collapsed")
    assert(ivfRecall >= 0.3, s"IVF recall $ivfRecall collapsed")
  }

  test("PQ-ADC: recall vs exact L2 ranking is reasonable; ADC tracks true distance") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val d = "/root/testdata/sf0.001"
    val corpus = spark.read.parquet(s"$d/embeddings.parquet")
      .select($"vec_id",
        graft.functions.VectorFunctions.toDouble($"embedding").as("v"))
    val queries = corpus.filter($"vec_id" < 16)
      .select($"vec_id".as("q_id"), $"v".as("qv"))
    // exact L2 top-5 — the metric PQ-ADC approximates (v01 ranks by
    // cosine; comparing across metrics would measure the metric gap, not
    // the quantizer)
    val l2 = corpus.crossJoin(broadcast(queries))
      .filter($"vec_id" =!= $"q_id")
      .select($"q_id", $"vec_id",
        aggregate(zip_with($"v", $"qv", (x, y) => (x - y) * (x - y)),
          lit(0.0), (acc, e) => acc + e).as("dist"))
    val w = Window.partitionBy($"q_id").orderBy($"dist".asc, $"vec_id".asc)
    val exact = l2.withColumn("r", row_number().over(w)).filter($"r" <= 5)
    val exactSet = exact.select("q_id", "vec_id")
      .as[(Long, Long)].collect().toSet
    val pq = SparkEntryQueries("v14_pq_adc", d)
    val pqSet = pq.select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val recall = (exactSet & pqSet).size.toDouble / exactSet.size
    assert(recall >= 0.3, s"PQ-ADC recall $recall collapsed")
    // ADC is an m-term lower-dimensional approximation of the true L2²;
    // it must be positively correlated with the exact distances on the
    // pairs it returned (sanity: lookups are wired to the right codes)
    val joined = pq.select($"q_id", $"n_id".as("vec_id"), $"adc")
      .join(l2, Seq("q_id", "vec_id"))
      .select($"adc", $"dist").as[(Double, Double)].collect()
    assert(joined.nonEmpty)
    val (adcM, distM) = (joined.map(_._1).sum / joined.length,
      joined.map(_._2).sum / joined.length)
    val cov = joined.map { case (a, b) => (a - adcM) * (b - distM) }.sum
    assert(cov > 0.0, "ADC scores must co-vary with true L2 distances")
  }

  private def SparkEntryQueries(name: String, d: String) =
    graft.SparkEntry.queries(name)(spark, d)

  test("v15 kernel: majority of the k nearest labels wins; ties break label-asc") {
    val labeled = Seq(
      (1L, Array(1.0f, 0.0f), "a"), (2L, Array(0.98f, 0.2f), "a"),
      (3L, Array(0.95f, 0.31f), "a"),
      (4L, Array(0.0f, 1.0f), "b"), (5L, Array(0.2f, 0.98f), "b")
    ).toDF("n_id", "n_vec", "label")
    val q = Seq((10L, Array(1.0f, 0.1f))).toDF("vec_id", "q_vec")
    // k=5 takes all five neighbors: 3 a's vs 2 b's -> a, confidence 3
    val got = SimilarityOps.knnLabelVote(spark, labeled, q, 5)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq === Seq((10L, "a", 3L)))
    // exact vote tie (one of each, equidistant) must break label-asc
    val pair = Seq((1L, Array(1.0f, 0.0f), "b"), (2L, Array(0.0f, 1.0f), "a"))
      .toDF("n_id", "n_vec", "label")
    val mid = Seq((20L, Array(1.0f, 1.0f))).toDF("vec_id", "q_vec")
    val tie = SimilarityOps.knnLabelVote(spark, pair, mid, 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(tie.toSeq === Seq((20L, "a", 1L)))
  }

  test("v15 vote: a query with NO candidates gets an explicit zero-confidence verdict") {
    // r15 advice: the banded generator can leave a query with no labeled
    // collision at an unmeasured SF — it must surface as (null, 0), not
    // silently vanish from the output
    val labeled = Seq((1L, Array(1.0f, 0.0f), "a")).toDF("n_id", "n_vec", "label")
    val unlabeled = Seq((10L, Array(0.0f, 1.0f)), (11L, Array(1.0f, 0.1f)))
      .toDF("vec_id", "q_vec")
    val candIds = Seq((11L, 1L)).toDF("vec_id", "n_id") // 10 uncovered
    val got = SimilarityOps.knnLabelVoteOn(spark, labeled, unlabeled, candIds, 5)
      .orderBy("vec_id")
      .collect().map(r => (r.getLong(0), Option(r.getString(1)), r.getLong(2)))
    assert(got.toSeq === Seq((10L, None, 0L), (11L, Some("a"), 1L)),
      s"uncovered queries must carry a null/zero verdict: ${got.toSeq}")
  }

  test("v15 candidates: coverage complete, recall@5 vs brute above the ANN floor") {
    // The gated form votes over LSH candidates only; the brute kernel
    // ([[SimilarityOps.knnLabelVote]]) is its exact cross-check. The pin
    // is the family's standard candidate-quality metric (the v02/v05/v21
    // 0.3 recall floor) — NOT label agreement: the fixture's labels are
    // geometry-free, so votes among ~equidistant neighbors are noise by
    // construction; recall of the true top-5 is what the generator owes.
    val d = "/root/testdata/sf0.001"
    val corpus = graft.Tables(spark, d, "embeddings")
    val labeled = corpus.filter($"vec_id" % 7 =!= 3)
      .select($"vec_id".as("n_id"), $"embedding".as("n_vec"), $"label")
    val unlabeled = corpus.filter($"vec_id" % 7 === 3)
      .select($"vec_id", $"embedding".as("q_vec"))
    def top5(scored: org.apache.spark.sql.DataFrame) = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"vec_id").orderBy($"cos".desc, $"n_id".asc)
      scored.withColumn("rn", row_number().over(w)).filter($"rn" <= 5)
        .select("vec_id", "n_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    val brute = top5(labeled.crossJoin(broadcast(unlabeled))
      .select($"vec_id", $"n_id", graft.functions.VectorExpressions
        .cosineSim(spark, $"q_vec", $"n_vec").as("cos")))
    // the gate's candidate generation, re-derived: 500 vectors → band
    // width 4, so each band is the plain 4-bit signature slice
    val banded = corpus
      .withColumn("sig", graft.functions.HyperplaneSigExact
        .hyperplaneSig(spark, $"embedding", planes = 32))
      .select($"vec_id", posexplode(array((0 until 4).map(b =>
        shiftright($"sig", b * 4).bitwiseAND(lit(0xFL))): _*)))
      .withColumnRenamed("pos", "band_idx").withColumnRenamed("col", "band")
    val cand = banded.filter($"vec_id" % 7 === 3)
      .join(banded.filter($"vec_id" % 7 =!= 3)
        .select($"band_idx", $"band", $"vec_id".as("n_id")),
        Seq("band_idx", "band"))
      .select("vec_id", "n_id").distinct()
    val gatedTop = top5(cand.join(unlabeled, "vec_id").join(labeled, "n_id")
      .select($"vec_id", $"n_id", graft.functions.VectorExpressions
        .cosineSim(spark, $"q_vec", $"n_vec").as("cos")))
    val recall = (brute & gatedTop).size.toDouble / brute.size
    assert(recall >= 0.3, s"v15 candidate recall@5 $recall collapsed")
    // coverage: every unlabeled vector must still get a verdict
    val gated = SparkEntryQueries("v15_knn_labels", d)
      .collect().map(_.getLong(0)).toSet
    assert(gated === brute.map(_._1), "every query must get a verdict")
  }

  test("v16 gate: JL projection is complete and roughly norm-preserving") {
    val d = "/root/testdata/sf0.001"
    val proj = SparkEntryQueries("v16_jl_projection", d)
      .groupBy($"vec_id").agg(sum($"coord" * $"coord").as("p2"),
        count(lit(1)).as("k"))
    val orig = graft.Tables(spark, d, "embeddings")
      .select($"vec_id",
        aggregate($"embedding", lit(0.0), (a, x) => a + x * x).as("v2"))
    val rows = proj.join(orig, "vec_id")
      .select($"vec_id", $"p2", $"k", $"v2")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(2) === 16L, "16 output dims per vector"))
    // E[||Pv||²] = ||v||² for a ±1/√k JL matrix — individual vectors
    // fluctuate, the corpus mean must not
    val ratios = rows.map(r => r.getDouble(1) / r.getDouble(3))
    val mean = ratios.sum / ratios.length
    assert(mean > 0.7 && mean < 1.3, s"norm-preservation drifted: mean=$mean")
  }

  test("v15 gate: every unlabeled vector gets one verdict, bounded confidence") {
    val d = "/root/testdata/sf0.001"
    val got = SparkEntryQueries("v15_knn_labels", d).collect()
    val unlabeledCount = graft.Tables(spark, d, "embeddings")
      .filter($"vec_id" % 7 === 3).count()
    assert(got.length.toLong === unlabeledCount, "one prediction per query")
    got.foreach { r =>
      assert(r.getLong(0) % 7 === 3, "predictions only for the unlabeled slice")
      assert(r.getLong(2) >= 1L && r.getLong(2) <= 5L, r.toString)
    }
    // the vote must not be degenerate — a single class absorbing
    // everything would pass the bounds above on a broken cosine
    assert(got.map(_.getInt(1)).distinct.length >= 2, "one-class collapse")
  }

  test("connected components merge transitive near-dup chains") {
    // (1,3) and (2,3): the pairwise drop-doc_b rule keeps BOTH 1 and 2 —
    // components must collapse all three through the shared neighbor
    val pairs = Seq((1L, 3L), (2L, 3L), (10L, 11L),
      (5L, 6L), (6L, 7L), (7L, 8L)).toDF("doc_a", "doc_b")
    val comp = DedupOps.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(comp === Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L,
      5L -> 5L, 6L -> 5L, 7L -> 5L, 8L -> 5L), comp.toString)
  }

  test("connected components close a long chain (pointer jumping)") {
    // a 61-node path needs 60 propagation-only rounds; with path halving it
    // must converge well inside the round budget
    val chain = (100L until 160L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val comp = DedupOps.connectedComponents(chain)
      .as[(Long, Long)].collect().toMap
    assert(comp.size === 61 && comp.values.forall(_ == 100L), comp.toString)
  }

  test("int8 quantization: constant dimension codes to 0, never NaN") {
    // dim 1 is constant (mx == mn) — unguarded (x-mn)/(mx-mn) would be 0/0
    val vecs = Seq(
      (0L, Array(0.0f, 7.5f, -1.0f)),
      (1L, Array(1.0f, 7.5f, 0.0f)),
      (2L, Array(2.0f, 7.5f, 1.0f))
    ).toDF("vec_id", "embedding")
    val got = SimilarityOps.quantizeInt8(vecs)
      .as[(Long, Long, Long, Long)].collect()
    // codes: dim0 spans 0..2 -> {0,128,255}; dim1 constant -> 0; dim2 -> same as dim0
    assert(got === Array((0L, 0L, 0L, 0L), (1L, 256L, 0L, 128L), (2L, 510L, 0L, 255L)),
      got.mkString(", "))
  }

  test("exact dedup keeps min doc_id per text") {
    val dup = docs.union(docs.filter($"doc_id" === 3))
    val out = dup.groupBy($"text")
      .agg(min($"doc_id").as("keeper_id"), count(lit(1)).as("n"))
    val m = out.as[(String, Long, Long)].collect()
      .map { case (_, k, n) => k -> n }.toMap
    assert(m(0L) === 2L) // doc 0 text appears twice (0,1) -> keeper 0
    assert(m(3L) === 2L) // duplicated row
  }
}
