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

  /** The engine's single tokenizer seam: every text operator (t01–t19, the
    * dedup shingle path, the Gopher/CCNet kernels) tokenizes through this
    * one definition, so a corpus-wide tokenization policy change is one
    * edit — not nineteen drifting `split` calls. Modes:
    *
    *  - `space-raw`: split on single spaces, KEEP empties — the
    *    `string_split(text, ' ')` semantics the token-count oracles use
    *    (consecutive spaces produce empty tokens that count);
    *  - `space`: split on single spaces, drop empties — the unigram/bigram
    *    LM tokenization (t12/t19);
    *  - `ws` (default): split on ASCII-whitespace runs, drop empties — the
    *    Gopher/CCNet word definition (t08/t14/t15/t17, the d17/d21
    *    kernels);
    *  - `unicode`: split on Unicode whitespace — `\s` plus the `\p{Z}`
    *    separators (NBSP, ideographic space …), zero-width space and BOM —
    *    the mode multilingual corpora need, where NBSP-joined French
    *    numerals or U+3000-spaced CJK would otherwise fuse into one token.
    *
    * All modes are a single codegen'd `split` (+ a higher-order filter):
    * per-row work, no shuffle, no UDF — the 100 TB cost is one scan
    * regardless of mode. */
  def tokenize(text: Column, mode: String = "ws"): Column = mode match {
    case "space-raw" => split(text, " ", -1)
    case "space" => filter(split(text, " ", -1), t => length(t) > 0)
    case "ws" => filter(split(text, "\\s+", -1), t => length(t) > 0)
    case "unicode" =>
      filter(split(text, "[\\s\\p{Z}\\u200B\\uFEFF]+", -1), t => length(t) > 0)
    case other => throw new IllegalArgumentException(
      s"unknown tokenize mode '$other' (space-raw|space|ws|unicode)")
  }

  /** Whitespace tokenization (splits on runs of whitespace, drops
    * empties) — [[tokenize]]'s default mode. */
  def tokens(text: Column): Column = tokenize(text)

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

  /** Engine-portable rolling fingerprint: fold (acc·31 + h) mod
    * [[MinHashP]] over 60-bit md5 token-prefix hashes — order-sensitive
    * like [[fingerprint]], but recomputable in any engine with md5 (the
    * d09 discipline), which makes t04 oracle-checkable end to end. Bounds:
    * acc < 2^29 (post-mod) so acc·31 < 2^34, h < 2^60 → the sum stays
    * under 2^63: wrap-free under ANSI mode, exact BIGINT in the oracle. */
  def fingerprintMd5(text: Column): Column =
    aggregate(transform(tokens(text),
        t => conv(substring(md5(t), 1, 15), 16, 10).cast("long")),
      lit(0L), (acc, h) => (acc * 31L + h) % MinHashP)

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

  /** MinHash mixing prime (just under 2^29) and per-slot affine mix: slot i
    * maps h -> (h·(2i+3) + 97i+31) mod P. The base hash is the top 28 bits
    * of md5(shingle), so the product stays far below 2^63 — no wraparound
    * for ANSI mode to reject, and the identical arithmetic runs in any
    * engine (the whole point of the md5 family: DuckDB-oracle-checkable,
    * unlike xxhash64). Canonical definition — [[graft.ops.DedupOps]]
    * builds its signatures and persisted index (d22) from these. */
  val MinHashP = 536870909L

  def minhashAffine(i: Int)(h: Column): Column =
    (h * lit((2 * i + 3).toLong) + lit((97 * i + 31).toLong)) % MinHashP

  /** 28-bit md5 base hash per distinct 3-word shingle (compact long array;
    * downstream joins never carry shingle strings). */
  def md5ShingleHashes(text: Column): Column =
    transform(array_distinct(shingles(text)),
      x => conv(substring(md5(x), 1, 7), 16, 10).cast("long"))

  /** The 8-slot md5-MinHash signature as one array<long> — the SQL-surface
    * form of the d09 signature. Each slot references the shingle-hash
    * array afresh (8 evaluations per row); the DataFrame pipeline
    * ([[graft.ops.DedupOps.shingleHashFrame]]) materializes it once and is
    * the shape to use at scale — this scalar form exists so the SQL
    * surface can compute the identical signature inline. */
  def md5MinhashSig(text: Column, slots: Int = 8): Column =
    array((0 until slots).map(i =>
      array_min(transform(md5ShingleHashes(text), h => minhashAffine(i)(h)))): _*)

  /** Gopher quality metrics (Rae et al. 2021, table A1) as one struct:
    * word count, mean word length, symbol-to-word ratio, alphabetic-word
    * ratio, required-stopword hits, and the composite pass verdict — the
    * same integer-derived quotients the t14 gate computes (which
    * materializes the token array once; this scalar form re-tokenizes per
    * metric and is the SQL-surface convenience). */
  val GopherRequiredStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  def gopherQuality(text: Column): Column = {
    val toks = tokenize(text)
    val nW = size(toks).cast("long")
    val n = nW.cast("double")
    val mwl = when(n === 0.0, 0.0)
      .otherwise(length(regexp_replace(text, "\\s", "")).cast("double") / n)
    val swr = when(n === 0.0, 0.0)
      .otherwise(regexp_count(text, lit("#|\\.\\.\\.")).cast("double") / n)
    val awr = when(n === 0.0, 0.0)
      .otherwise(size(filter(toks, t => t.rlike("[A-Za-z]"))).cast("double") / n)
    val stops = size(array_intersect(
      array_distinct(transform(toks, t => lower(t))),
      array(GopherRequiredStopwords.map(lit): _*))).cast("long")
    struct(
      nW.as("n_words"), mwl.as("mean_word_len"),
      swr.as("symbol_word_ratio"), awr.as("alpha_word_ratio"),
      stops.as("n_required_stopwords"),
      (nW.between(50L, 100000L) && mwl.between(3.0, 10.0) &&
        swr <= 0.1 && awr > 0.8 && stops >= 2L).as("passes_gopher"))
  }

  /** Winnowing fingerprints (Schleimer et al., SIGMOD'03) as a per-row
    * array: hash every k-char gram, slide a w-window over the hash
    * sequence, keep each window's minimum; distinct minima, sorted. The
    * sliding minimum builds by folding w-1 shifted `zip_with(…, least)`
    * passes over the hash array — each pass references the array as a
    * transform CHILD (evaluated once per row), never inside a lambda body,
    * so the work is O(n·w), not the O(n²) lambda-capture trap. Documents
    * shorter than k+w-1 chars have no full window and return an empty
    * array. Same hash, same windows as the distributed operator
    * ([[graft.ops.TextOps.winnowFingerprints]], the shape for corpus-scale
    * runs — its one shuffle distributes a pathological document's grams
    * where this per-row form keeps them on one row). */
  def winnowArray(text: Column, k: Int = 8, w: Int = 4): Column = {
    val ng = length(text) - (k - 1) // number of k-grams
    val hs = transform(sequence(lit(1), ng), p =>
      conv(substring(md5(text.substr(p, lit(k))), 1, 15), 16, 10).cast("long"))
    val mins = (2 to w).foldLeft(hs)((acc, o) =>
      zip_with(acc, slice(hs, lit(o), ng), (a, b) => least(a, b)))
    when(length(text) >= k + w - 1,
      array_sort(array_distinct(slice(mins, lit(1), ng - (w - 1)))))
      .otherwise(array().cast("array<bigint>"))
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
