package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions._

/** Text-analysis operators over the documents table (SURVEY.md §2.6):
  * token statistics, corpus profiles, quality scoring, language-ID,
  * fingerprinting. All column-expression compositions — whole-stage
  * codegen'd, no UDFs.
  */
object TextOps {

  private def docs(s: SparkSession, d: String) = Tables(s, d, "documents")

  /** Per-document token statistics (space-split to match the oracle's
    * string_split semantics exactly). */
  private def t01(s: SparkSession, d: String): DataFrame =
    docs(s, d)
      .select(col("doc_id"),
        size(split(col("text"), " ", -1)).cast("long").as("n_tokens"),
        length(col("text")).cast("long").as("n_chars_calc"),
        col("n_chars"))
      .orderBy("doc_id")

  /** Corpus profile by language label. */
  private def t02(s: SparkSession, d: String): DataFrame =
    docs(s, d)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        StableAgg.intAvg(col("n_chars")).as("avg_chars"),
        min(col("n_chars")).as("min_chars"),
        max(col("n_chars")).as("max_chars"))
      .orderBy("lang")

  /** Repetition profile: distinct-token ratio (integer-derived doubles —
    * exact in both engines). */
  private def t03(s: SparkSession, d: String): DataFrame = {
    val toks = split(col("text"), " ", -1)
    docs(s, d)
      .select(col("doc_id"),
        size(array_distinct(toks)).cast("long").as("n_distinct_tokens"),
        (size(array_distinct(toks)).cast("double") /
          size(toks).cast("double")).as("distinct_ratio"))
      .orderBy("doc_id")
  }

  /** Full text profile: language-ID heuristic, composite quality score,
    * BPE-ish token count, rolling-hash fingerprint. Deterministic but
    * engine-specific hashes — rows-only check. */
  private def t04(s: SparkSession, d: String): DataFrame =
    docs(s, d)
      .select(col("doc_id"), col("lang"),
        languageId(col("text")).as("predicted_lang"),
        round(qualityScore(col("text")), 4).as("quality"),
        tokenCountBpeish(col("text")).as("bpeish_tokens"),
        fingerprint(col("text")).as("fingerprint"),
        round(stopwordRatio(col("text")), 4).as("stopword_ratio"),
        round(punctRatio(col("text")), 4).as("punct_ratio"))
      .orderBy("doc_id")

  /** Token-frequency table (explode → count): the tf side of tf-idf. */
  private def t05(s: SparkSession, d: String): DataFrame =
    docs(s, d)
      .select(explode(split(col("text"), " ", -1)).as("token"))
      .filter(length(col("token")) > 0)
      .groupBy(col("token"))
      .agg(count(lit(1)).as("tf"))
      .orderBy(col("tf").desc, col("token").asc)
      .limit(100)

  /** tf-idf: corpus-wide document frequency joined back to per-doc term
    * frequency (two hash aggregations + one broadcastable join — the
    * standard distributed formulation; df is computed over the FULL corpus
    * while the output is restricted to a bounded doc set for determinism). */
  private def t06(s: SparkSession, d: String): DataFrame = {
    val toks = docs(s, d)
      .select(col("doc_id"), explode(split(col("text"), " ", -1)).as("token"))
      .filter(length(col("token")) > 0)
    val tf = toks.filter(col("doc_id") < 20)
      .groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("tf"))
    val dfreq = toks.select(col("doc_id"), col("token")).distinct()
      .groupBy(col("token")).agg(count(lit(1)).as("df"))
    val n = docs(s, d).agg(count(lit(1)).as("n_docs"))
    tf.join(dfreq, "token").crossJoin(broadcast(n))
      .select(col("doc_id"), col("token"), col("tf"), col("df"),
        round(col("tf") * log(col("n_docs").cast("double") / col("df")), 6)
          .as("tfidf"))
      .orderBy("doc_id", "token")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t06_tfidf" -> t06 _,
    "t01_token_stats" -> t01 _, "t02_lang_profile" -> t02 _,
    "t03_repetition" -> t03 _, "t04_text_profile" -> t04 _,
    "t05_token_frequency" -> t05 _)

  val oracle: Map[String, String] = Map(
    "t06_tfidf" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
        |), toks_ne AS (
        |  SELECT doc_id, token FROM toks WHERE length(token) > 0
        |), tf AS (
        |  SELECT doc_id, token, count(1) AS tf FROM toks_ne
        |  WHERE doc_id < 20 GROUP BY doc_id, token
        |), dfreq AS (
        |  SELECT token, count(1) AS df FROM (
        |    SELECT DISTINCT doc_id, token FROM toks_ne) x GROUP BY token
        |)
        |SELECT doc_id, token, tf, df,
        |  round(tf * ln(CAST((SELECT count(1) FROM documents) AS DOUBLE) / df), 6) AS tfidf
        |FROM tf JOIN dfreq USING (token)
        |ORDER BY doc_id, token""".stripMargin,
    "t01_token_stats" ->
      """SELECT doc_id, len(string_split(text, ' ')) AS n_tokens,
        | length(text) AS n_chars_calc, n_chars
        |FROM documents ORDER BY doc_id""".stripMargin,
    "t02_lang_profile" ->
      """SELECT lang, count(1) AS n_docs,
        | CAST(sum(n_chars) AS DOUBLE) / count(1) AS avg_chars,
        | min(n_chars) AS min_chars, max(n_chars) AS max_chars
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    "t03_repetition" ->
      """SELECT doc_id,
        | len(list_distinct(string_split(text, ' '))) AS n_distinct_tokens,
        | CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE) /
        |   len(string_split(text, ' ')) AS distinct_ratio
        |FROM documents ORDER BY doc_id""".stripMargin,
    "t05_token_frequency" ->
      """SELECT token, count(1) AS tf FROM (
        |  SELECT unnest(string_split(text, ' ')) AS token FROM documents) x
        |WHERE length(token) > 0
        |GROUP BY token ORDER BY tf DESC, token ASC LIMIT 100""".stripMargin)
}
