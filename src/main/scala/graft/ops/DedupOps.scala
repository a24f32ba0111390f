package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions
import graft.functions.SimHash64.simhash64

/** Deduplication operators for LLM-scale training-data pipelines
  * (SURVEY.md §2.6): exact, key-based, MinHash+LSH near-dup, SimHash, and
  * n-gram Jaccard verification.
  *
  * Scale design: every variant is a hash-partitioned groupBy/join — no
  * driver-side state, no O(n²) all-pairs stage. MinHash/SimHash candidate
  * generation bounds the pair space by banding (pairs only form inside a
  * band bucket), which is the standard web-scale dedup topology: at 100 TB
  * the band-bucket join shuffles each doc's signature slices, not the corpus
  * cross product.
  */
object DedupOps {

  private def docs(s: SparkSession, d: String) = Tables(s, d, "documents")

  /** Exact dedup: canonical keeper (min doc_id) per identical text. */
  private def d01(s: SparkSession, d: String): DataFrame =
    docs(s, d)
      .groupBy(col("text"))
      .agg(min(col("doc_id")).as("keeper_id"), count(lit(1)).as("n_copies"))
      .select("keeper_id", "n_copies")
      .orderBy("keeper_id")

  /** Key-based dedup (dropDuplicates-by-subset semantics, made deterministic
    * by keeping the min id per key instead of an arbitrary row). */
  private def d02(s: SparkSession, d: String): DataFrame =
    docs(s, d)
      .groupBy(col("lang"), col("source"))
      .agg(min(col("doc_id")).as("keeper_id"), count(lit(1)).as("n_in_group"))
      .orderBy("lang", "source")

  /** Deterministic MinHash signature over xxhash64'd 3-word shingles,
    * computed by the one-pass native expression (see VectorExpressions for
    * why the compositional lambda form was quadratic). */
  def minhashSignatures(s: SparkSession, df: DataFrame, numHashes: Int = 64): DataFrame =
    df.select(col("doc_id"),
      graft.functions.VectorExpressions.minhash(
        s, graft.functions.ShingleHashes.shingleHashes(s, col("text")),
        numHashes).as("minhash"))

  /** LSH banding: split the signature into `bands` bands of `rows` values,
    * hash each band, and emit (band_idx, band_hash, doc_id). Docs sharing
    * any band bucket become candidate pairs.
    */
  def lshCandidates(signatures: DataFrame, bands: Int = 16, rows: Int = 4): DataFrame = {
    // cached: both sides of the self-join consume this subtree, and Spark
    // does not share it across join branches on its own
    val banded = signatures.select(col("doc_id"), posexplode(
      array((0 until bands).map(b =>
        xxhash64(lit(b), slice(col("minhash"), b * rows + 1, rows))): _*)))
      .withColumnRenamed("pos", "band_idx")
      .withColumnRenamed("col", "band_hash")
      .cache()
    val a = banded.select(col("band_idx"), col("band_hash"), col("doc_id").as("doc_a"))
    val b = banded.select(col("band_idx"), col("band_hash"), col("doc_id").as("doc_b"))
    a.join(b, Seq("band_idx", "band_hash"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b")
      .distinct()
  }

  /** MinHash near-dup candidates with estimated Jaccard (matching-signature
    * fraction), thresholded. Rows-only oracle: the hash family is
    * engine-specific, but the output is fully deterministic. */
  private def d03(s: SparkSession, d: String): DataFrame = {
    val sigs = minhashSignatures(s, docs(s, d)).cache()
    val pairs = lshCandidates(sigs)
    val sa = sigs.select(col("doc_id").as("doc_a"), col("minhash").as("sig_a"))
    val sb = sigs.select(col("doc_id").as("doc_b"), col("minhash").as("sig_b"))
    pairs.join(sa, "doc_a").join(sb, "doc_b")
      .withColumn("est_jaccard",
        size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) =>
          when(x === y, 1).otherwise(0)), v => v === 1)).cast("double") / 64.0)
      .filter(col("est_jaccard") >= 0.5)
      .select("doc_a", "doc_b", "est_jaccard")
      .orderBy("doc_a", "doc_b")
  }

  /** SimHash signatures via the custom codegen'd Catalyst expression. */
  private def d04(s: SparkSession, d: String): DataFrame =
    docs(s, d)
      .select(col("doc_id"),
        simhash64(s, transform(TextFunctions.tokens(col("text")), t => xxhash64(t)))
          .as("simhash"))
      .orderBy("doc_id")

  /** Exact n-gram Jaccard verification of the MinHash candidates: join the
    * shingle sets back in and compute |A∩B| / |A∪B| exactly. Sets are
    * carried as 64-bit shingle hashes (set semantics identical up to
    * negligible 64-bit collisions) — long-array intersects are far cheaper
    * to shuffle and compare than the shingle strings. */
  private def d05(s: SparkSession, d: String): DataFrame = {
    val dd = docs(s, d)
    val sigs = minhashSignatures(s, dd)
    val pairs = lshCandidates(sigs)
    val sh = dd.select(col("doc_id"),
      graft.functions.ShingleHashes.shingleHashes(s, col("text")).as("sh"))
      .cache() // consumed by both sides of the pair join
    val a = sh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"))
    val b = sh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"))
    pairs.join(a, "doc_a").join(b, "doc_b")
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))).cast("double"))
      .withColumn("uni", size(array_union(col("sh_a"), col("sh_b"))).cast("double"))
      .withColumn("jaccard", col("inter") / col("uni"))
      .filter(col("jaccard") >= 0.7)
      .select("doc_a", "doc_b", "jaccard")
      .orderBy("doc_a", "doc_b")
  }

  /** SimHash near-dup pairs: band the 64-bit signature into four 16-bit
    * chunks (a pair within Hamming distance 3 must agree on ≥1 chunk —
    * pigeonhole), join per chunk, verify with bit_count(xor). */
  private def d06(s: SparkSession, d: String): DataFrame = {
    val sigs = d04(s, d)
    val chunked = sigs.select(col("doc_id"), col("simhash"), posexplode(
      array((0 until 4).map(i =>
        shiftright(col("simhash"), 16 * i).bitwiseAND(lit(0xFFFFL))): _*)))
      .withColumnRenamed("pos", "chunk_idx")
      .withColumnRenamed("col", "chunk")
    val a = chunked.select(col("chunk_idx"), col("chunk"),
      col("doc_id").as("doc_a"), col("simhash").as("sig_a"))
    val b = chunked.select(col("chunk_idx"), col("chunk"),
      col("doc_id").as("doc_b"), col("simhash").as("sig_b"))
    a.join(b, Seq("chunk_idx", "chunk"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= 3)
      .orderBy("doc_a", "doc_b")
  }

  /** Dedup-against-reference (SURVEY.md §2.2): drop documents whose exact
    * text already exists in a reference corpus — left-anti join, the
    * incremental-ingest dedup shape (new shard vs existing lake). The
    * "reference corpus" here is the first docs of the same table. */
  private def d07(s: SparkSession, d: String): DataFrame = {
    val all = docs(s, d)
    val reference = all.filter(col("doc_id") < 100).select(col("text"))
    all.filter(col("doc_id") >= 100)
      .join(reference, Seq("text"), "left_anti")
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .orderBy("doc_id")
  }

  /** End-to-end corpus dedup: duplicate clusters (exact AND near, jaccard
    * >= 0.7 via MinHash LSH -> exact verify) collapse to their lowest
    * doc_id. Exact duplicates need no separate pass: identical texts have
    * identical signatures, so every band collides and their pair verifies
    * at jaccard 1.0 — a higher-id member of any cluster appears as doc_b of
    * some verified pair and is dropped. Returns the surviving ids — the
    * operator a training-data pipeline actually runs. */
  private def d08(s: SparkSession, d: String): DataFrame = {
    val dd = docs(s, d)
    val sigs = minhashSignatures(s, dd)
    val pairs = lshCandidates(sigs)
    val sh = dd.select(col("doc_id"),
      graft.functions.ShingleHashes.shingleHashes(s, col("text")).as("sh"))
      .cache() // consumed by both sides of the pair join
    val a = sh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"))
    val b = sh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"))
    val losers = pairs.join(a, "doc_a").join(b, "doc_b")
      .filter(size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
        size(array_union(col("sh_a"), col("sh_b"))).cast("double") >= 0.7)
      .select(col("doc_b").as("doc_id")).distinct()
    dd.select("doc_id").join(losers, Seq("doc_id"), "left_anti")
      .orderBy("doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "d01_exact_dedup" -> d01 _, "d02_key_dedup" -> d02 _,
    "d03_minhash_candidates" -> d03 _, "d04_simhash_signatures" -> d04 _,
    "d05_ngram_jaccard_verify" -> d05 _, "d06_simhash_pairs" -> d06 _,
    "d07_anti_dedup" -> d07 _, "d08_dedup_corpus" -> d08 _)

  val oracle: Map[String, String] = Map(
    "d01_exact_dedup" ->
      """SELECT min(doc_id) AS keeper_id, count(1) AS n_copies
        |FROM documents GROUP BY text ORDER BY keeper_id""".stripMargin,
    "d02_key_dedup" ->
      """SELECT lang, source, min(doc_id) AS keeper_id, count(1) AS n_in_group
        |FROM documents GROUP BY lang, source ORDER BY lang, source""".stripMargin,
    "d07_anti_dedup" ->
      """SELECT doc_id, lang, n_chars FROM documents
        |WHERE doc_id >= 100 AND text NOT IN (
        |  SELECT text FROM documents WHERE doc_id < 100)
        |ORDER BY doc_id""".stripMargin)
}
