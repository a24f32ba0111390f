package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Partition-layout and seed-swept invariants for the round-6 corpus
  * operators: results must be byte-identical under any repartitioning (the
  * property that makes them trustworthy on a real cluster, where layout is
  * an accident of scheduling), and the Bloom screen must equal its exact
  * reference join across randomized corpora. */
class CorpusOpsInvariantSpec extends SparkSpec {
  import spark.implicits._

  private def randDocs(seed: Int, n: Int) = {
    val r = new scala.util.Random(seed)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa")
    (0 until n).map { i =>
      val len = 5 + r.nextInt(40)
      (i.toLong, Seq.fill(len)(vocab(r.nextInt(vocab.size))).mkString(" "))
    }
  }

  test("d17 chunk dedup is invariant under repartitioning") {
    val docs = randDocs(11, 300).toDF("doc_id", "text")
    val ref = DedupOps.chunkDedup(docs).orderBy("doc_id").collect().toSeq
    for (parts <- Seq(1, 7, 32)) {
      val got = DedupOps.chunkDedup(docs.repartition(parts))
        .orderBy("doc_id").collect().toSeq
      assert(got === ref, s"chunkDedup drifted at $parts partitions")
    }
  }

  test("d18 bloom screen equals the exact join across seeded corpora") {
    for (seed <- Seq(1, 2, 3)) {
      val r = new scala.util.Random(seed)
      val existing = randDocs(seed, 150).toDF("doc_id", "raw")
        .select(col("doc_id"), md5(col("raw")).as("th"))
      val dupIds = (0 until 150).filter(_ => r.nextDouble() < 0.2)
      val incoming = (randDocs(seed + 100, 80).map {
        case (id, t) => (id + 1000L, t + " fresh") } ++
        dupIds.zipWithIndex.map { case (i, k) =>
          (5000L + k, randDocs(seed, 150)(i)._2) })
        .toDF("doc_id", "raw")
        .select(col("doc_id"), md5(col("raw")).as("th"))
      val got = DedupOps.bloomScreen(incoming, existing)
        .collect().map(x => x.getLong(0) -> x.getString(1)).toMap
      val want = incoming.as("i")
        .join(existing.select("th").distinct(), Seq("th"), "left_semi")
        .select("doc_id").collect().map(_.getLong(0)).toSet
      incoming.select("doc_id").collect().map(_.getLong(0)).foreach { id =>
        val expect = if (want(id)) "exact_dup" else "kept"
        assert(got(id) === expect, s"seed $seed id $id: ${got(id)} != $expect")
      }
    }
  }

  test("t17 domain mix and d19 domain cap are shuffle-layout-stable") {
    // perturb the layout the window operators actually see: the shuffle
    // partition count changes which rows co-reside when the per-source /
    // per-domain windows sort and scan, so a lost tie-break or any other
    // layout sensitivity changes the result. (maxPartitionBytes is NOT a
    // usable perturbation here — the fixture parquet is a single row
    // group, so scan splits never redistribute rows.) The md5 priority
    // order must make the output byte-identical regardless.
    val d = "/root/testdata/sf0.001"
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    for (name <- Seq("t17_domain_mix", "d19_domain_cap")) {
      val ref = graft.SparkEntry.queries(name)(spark, d).collect().toSeq
      try {
        for (parts <- Seq("1", "5", "61")) {
          spark.conf.set(key, parts)
          val got = graft.SparkEntry.queries(name)(spark, d).collect().toSeq
          assert(got === ref, s"$name drifted at $parts shuffle partitions")
        }
      } finally spark.conf.set(key, prev)
    }
  }
}
