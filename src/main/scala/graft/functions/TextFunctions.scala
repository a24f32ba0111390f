package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for the LLM-data-pipeline operators
  * (SURVEY.md §2.6): tokenization, shingling, fingerprints, quality
  * scoring, language-ID. All are compositions of codegen'd Catalyst
  * builtins — no Scala UDFs on the hot path — so they distribute and
  * pipeline like any other expression at 100 TB.
  */
object TextFunctions {

  /** Whitespace tokenization (splits on runs of whitespace, drops empties). */
  def tokens(text: Column): Column =
    filter(split(text, "\\s+"), t => length(t) > 0)

  /** BPE-ish subword-boundary token count: splits on whitespace AND on
    * letter/digit/punctuation boundaries, approximating how a byte-pair
    * tokenizer fragments mixed content. Cheap proxy for LLM token budgeting.
    */
  def tokenCountBpeish(text: Column): Column =
    size(filter(
      split(text, "(?=\\p{Punct})|(?<=\\p{Punct})|\\s+|(?<=\\p{L})(?=\\p{N})|(?<=\\p{N})(?=\\p{L})"),
      t => length(t) > 0)).cast("long")

  /** k-word shingles (returns the whole text as a single shingle when the
    * document is shorter than k tokens). */
  def shingles(text: Column, k: Int = 3): Column = {
    val toks = tokens(text)
    val n = size(toks)
    val idx = sequence(lit(0), n - k) // valid only when n >= k
    val sh = transform(idx, i =>
      concat_ws(" ", slice(toks, i + 1, lit(k))))
    when(n >= k, sh).otherwise(array(concat_ws(" ", toks)))
  }

  /** 64-bit hashes of the shingle set (deterministic xxhash64). */
  def shingleHashes(text: Column, k: Int = 3): Column =
    transform(array_distinct(shingles(text, k)), s => xxhash64(s))

  /** Rolling-hash document fingerprint: a left fold chaining
    * xxhash64(acc, tokenHash) over the token sequence. Order-sensitive
    * (unlike a bag-of-words hash), so reordered documents fingerprint
    * differently; wrap-free under ANSI mode.
    */
  def fingerprint(text: Column): Column =
    aggregate(transform(tokens(text), t => xxhash64(t)),
      lit(0L), (acc, h) => xxhash64(acc, h))

  /** Punctuation character ratio (0 when empty). */
  def punctRatio(text: Column): Column = {
    val len = length(text).cast("double")
    val noPunct = length(regexp_replace(text, "[\\p{Punct}]", "")).cast("double")
    when(len === 0.0, 0.0).otherwise((len - noPunct) / len)
  }

  /** Fraction of tokens that are English stopwords. */
  val EnglishStopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "on", "for", "with", "as", "at", "by", "be", "this", "that", "are")

  def stopwordRatio(text: Column): Column = {
    val toks = tokens(text)
    val n = size(toks).cast("double")
    val hits = size(filter(toks, t => t.isin(EnglishStopwords.map(x => x: Any): _*)))
      .cast("double")
    when(n === 0.0, 0.0).otherwise(hits / n)
  }

  /** Composite document-quality score in [0,1]: rewards reasonable length,
    * moderate stopword density, low punctuation noise, and low repetition
    * (distinct-token ratio). The weights are heuristic; the point is the
    * distributed, codegen-friendly shape.
    */
  def qualityScore(text: Column): Column = {
    val toks = tokens(text)
    val n = size(toks).cast("double")
    val lengthScore = least(n / 100.0, lit(1.0))
    val sw = stopwordRatio(text)
    val stopScore = lit(1.0) - abs(sw - 0.1) // peak near 10% stopwords
    val punctScore = lit(1.0) - punctRatio(text)
    val distinctRatio = when(n === 0.0, 0.0)
      .otherwise(size(array_distinct(toks)).cast("double") / n)
    (lengthScore * 0.25 + greatest(stopScore, lit(0.0)) * 0.25 +
      punctScore * 0.25 + distinctRatio * 0.25).as("quality")
  }

  /** Character-class profile based language-ID heuristic. Scores each
    * candidate language by stopword hits and script ranges (CJK for zh),
    * returns the argmax label. Deterministic tie-break by language code.
    */
  private val StopwordsByLang: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "and", "of", "to", "in", "is", "it", "that", "for"),
    "fr" -> Seq("le", "la", "les", "et", "de", "des", "un", "une", "est", "que"),
    "es" -> Seq("el", "la", "los", "las", "y", "de", "un", "una", "es", "que"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "eine", "nicht", "mit", "zu"),
    "zh" -> Seq() // scored by CJK codepoint ratio instead
  )

  def languageId(text: Column): Column = {
    val toks = tokens(lower(text))
    val n = greatest(size(toks).cast("double"), lit(1.0))
    val cjkRatio = {
      val len = greatest(length(text).cast("double"), lit(1.0))
      length(regexp_replace(text, "[^\\u4e00-\\u9fff]", "")).cast("double") / len
    }
    val scored = StopwordsByLang.toSeq.sortBy(_._1).map { case (lang, sws) =>
      val score =
        if (lang == "zh") cjkRatio
        else size(filter(toks, t => t.isin(sws.map(x => x: Any): _*))).cast("double") / n
      struct(score.as("score"), lit(lang).as("lang"))
    }
    // greatest on structs compares field-by-field: score first, then lang —
    // deterministic argmax with lexicographic tie-break.
    greatest(scored: _*).getField("lang")
  }
}
