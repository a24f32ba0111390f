package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Behavior tests for the text-pipeline operators whose fixture-corpus gate
  * rows can't exercise the interesting inputs (the synthetic documents
  * contain no PII). */
class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  test("pii redaction rewrites emails, phones, and long digit runs") {
    val rows = Seq(
      (1L, "contact jane.doe+x@example.co.uk or 555-867-5309 today"),
      (2L, "account 1234567890123 cleared; short 12345 stays"),
      (3L, "two mails a@b.io c@d.org and a phone 303.555.1234"),
      (4L, "nothing sensitive here"),
      // a phone-shaped string inside an email local part is consumed by the
      // email rewrite — n_phones must agree with the redacted output (0)
      (5L, "reach 555-867-5309@corp.example now")
    ).toDF("doc_id", "text")
    val got = TextOps.redactPii(rows).orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect()
    assert(got(0) === ((1L, 1L, 1L, "contact <EMAIL> or <PHONE> today")))
    assert(got(1) === ((2L, 0L, 0L, "account <ID> cleared; short 12345 stays")))
    assert(got(2) === ((3L, 2L, 1L, "two mails <EMAIL> <EMAIL> and a phone <PHONE>")))
    assert(got(3) === ((4L, 0L, 0L, "nothing sensitive here")))
    assert(got(4) === ((5L, 1L, 0L, "reach <EMAIL> now")))
  }

  test("bigram pairing matches adjacent tokens and skips empty-token pairs") {
    // replicate t11's pairing over a controlled doc via the gate query at a
    // tiny scale is impossible (it reads the fixture corpus), so check the
    // pairing expression shape directly
    val toks = split(col("text"), " ", -1)
    val bigrams = Seq((1L, "a b  c")).toDF("doc_id", "text")
      .select(explode(zip_with(
        slice(toks, lit(1), size(toks) - 1),
        slice(toks, lit(2), size(toks) - 1),
        (a, b) => concat(a, lit(" "), b))).as("bigram"))
      .filter(!col("bigram").startsWith(" ") && !col("bigram").endsWith(" "))
      .as[String].collect().toSeq
    // "a b  c" tokenizes to [a, b, "", c]: pairs (a b), (b ""), ("" c) —
    // the empty-token pairs are dropped
    assert(bigrams === Seq("a b"))
  }

  test("winnowing guarantee: docs sharing a substring of length >= k+w-1 share a fingerprint") {
    // k=8, w=4 → any common substring of length 11+ must yield a common
    // fingerprint (Schleimer et al. guarantee); two unrelated texts with
    // no 8-char overlap must share none
    val shared = "GUARANTEED-MATCH-REGION"
    val rows = Seq(
      (1L, s"left padding blah $shared and some tail text here"),
      (2L, s"totally different opening $shared closing words differ"),
      (3L, "no overlap with the others at all, distinct content xyz"))
      .toDF("doc_id", "text")
    val fps = TextOps.winnowFingerprints(rows)
      .as[(Long, Long)].collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    assert((fps(1L) intersect fps(2L)).nonEmpty,
      "shared 11+ char substring must produce a shared fingerprint")
    assert((fps(1L) intersect fps(3L)).isEmpty,
      "unrelated docs must not collide")
    // a doc shorter than one full window produces nothing (no partial windows)
    val short = TextOps.winnowFingerprints(Seq((9L, "tiny")).toDF("doc_id", "text"))
    assert(short.isEmpty)
  }

  test("unigram logprob: repeated tokens score higher than rare ones") {
    // mirror of t12's scoring shape on a controlled corpus: a doc of
    // common tokens must outscore a doc of singletons
    val rows = Seq(
      (1L, "the the the the"), (2L, "qzx wvu ponm"), (3L, "the the qzx the"))
      .toDF("doc_id", "text")
    val toks = rows.select(col("doc_id"),
      explode(filter(split(col("text"), " ", -1), t => length(t) > 0)).as("token"))
    val counts = toks.groupBy(col("token")).agg(count(lit(1)).as("cnt"))
    val total = counts.agg(sum(col("cnt")).as("n_total"))
    val scored = toks.join(counts, "token").crossJoin(broadcast(total))
      .groupBy(col("doc_id"))
      .agg(avg(log(col("cnt").cast("double") / col("n_total"))).as("lp"))
      .as[(Long, Double)].collect().toMap
    // corpus: the×7, qzx×2, wvu×1, ponm×1 (11 tokens)
    assert(math.abs(scored(1L) - math.log(7.0 / 11)) < 1e-12)
    assert(scored(1L) > scored(3L) && scored(3L) > scored(2L))
  }

  test("gopher repetition mode is linear: a 20k-token doc completes, values exact") {
    // the compositional per-row form was O(n²) per document (distinct
    // grams × full-array scans) — ~4·10⁸ comparisons for this doc; the
    // keyed explode→count→struct-max form must handle it in bounded time
    val n = 20000
    // tokens: x0 x1 ... x9 repeating, with one run of "y y" injected so
    // the top 2-gram is unambiguous: "y y" appears 3 times in a row of 4 ys
    val toks = (0 until n).map(i => s"x${i % 10}") ++ Seq("y", "y", "y", "y")
    val doc = Seq((1L, toks.mkString(" "))).toDF("doc_id", "text")
    val t0 = System.nanoTime()
    val row = TextOps.repetitionGopher(doc).collect().head
    val secs = (System.nanoTime() - t0) / 1e9
    assert(secs < 60.0, s"20k-token doc took ${secs}s — quadratic regression?")
    assert(row.getAs[Long]("n_2grams") === (n + 4 - 1).toLong)
    // every x-gram repeats (only 10 distinct x-pairs exist) and the
    // injected ys add 3 more grams ("y y"×3) + 1 bridge ("x9 y"... unique)
    assert(row.getAs[String]("top_2gram").startsWith("x") ||
      row.getAs[String]("top_2gram") === "y y")
    // the mode count must match an independent driver-side count
    val g2 = toks.sliding(2).map(_.mkString(" ")).toSeq
    val (bestGram, bestCnt) = g2.groupBy(identity).view.mapValues(_.size)
      .toSeq.maxBy { case (g, c) => (c, g) } // same (cnt, gram) tie-break
    assert(row.getAs[String]("top_2gram") === bestGram)
    val expFrac = bestCnt.toDouble * bestGram.length / toks.mkString(" ").length
    assert(math.abs(row.getAs[Double]("top_2gram_char_frac") - expFrac) < 1e-12)
  }

  test("gopher repetition handles docs with zero and one token") {
    val rows = Seq((1L, ""), (2L, "solo"), (3L, "a b a b")).toDF("doc_id", "text")
    val got = TextOps.repetitionGopher(rows).orderBy("doc_id").collect()
    assert(got(0).getAs[Long]("n_2grams") === 0L)
    assert(got(0).getAs[String]("top_2gram") === "")
    assert(got(0).getAs[Double]("top_2gram_char_frac") === 0.0)
    assert(got(1).getAs[Long]("n_2grams") === 0L)
    // grams of "a b a b": [a b, b a, a b] → "a b"×2, "b a"×1 → mode "a b"
    assert(got(2).getAs[String]("top_2gram") === "a b")
    assert(got(2).getAs[Double]("dup_2gram_frac") === 1.0 / 3.0)
  }
}
