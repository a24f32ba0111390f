package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Behavior tests for the round-6 corpus operators: Gopher quality rules
  * recomputed by hand, URL canonicalization invariants, and the MMR
  * selection replayed exactly by a driver-side reference implementation. */
class CorpusOpsR6Spec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  test("t14: Gopher metrics match a hand computation per document") {
    val out = graft.SparkEntry.queries("t14_gopher_quality")(spark, d)
      .collect().map(r => r.getLong(0) -> r).toMap
    val docs = Tables(spark, d, "documents")
      .select("doc_id", "text").collect()
    assert(docs.nonEmpty && out.size === docs.length)
    val reqStops = Set("the", "be", "to", "of", "and", "that", "have", "with")
    docs.foreach { doc =>
      val (id, text) = (doc.getLong(0), doc.getString(1))
      val toks = text.split("\\s+").filter(_.nonEmpty)
      val n = toks.length
      val meanLen = toks.map(_.length).sum.toDouble / n
      val symbols = "#|\\.\\.\\.".r.findAllIn(text).length.toDouble / n
      val alpha = toks.count(_.exists(c =>
        (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z'))).toDouble / n
      val stops = toks.map(_.toLowerCase).distinct.count(reqStops).toLong
      val passes = (n >= 50 && n <= 100000) && meanLen >= 3.0 && meanLen <= 10.0 &&
        symbols <= 0.1 && alpha > 0.8 && stops >= 2
      val r = out(id)
      assert(r.getLong(1) === n.toLong, s"doc $id n_words")
      assert(math.abs(r.getDouble(2) - meanLen) < 1e-12, s"doc $id mean_word_len")
      assert(math.abs(r.getDouble(3) - symbols) < 1e-12, s"doc $id symbol ratio")
      assert(math.abs(r.getDouble(4) - alpha) < 1e-12, s"doc $id alpha ratio")
      assert(r.getLong(5) === stops, s"doc $id required stopwords")
      assert(r.getBoolean(6) === passes, s"doc $id passes_gopher")
    }
  }

  test("d15: canonical URLs are normalized and account for every document") {
    val rows = graft.SparkEntry.queries("d15_url_dedup")(spark, d).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val u = r.getString(0)
      assert(u.startsWith("https://www."), s"scheme/host not canonical: $u")
      assert(!u.contains("utm_"), s"tracking params survive: $u")
      assert(!u.contains("#"), s"fragment survives: $u")
      assert(!u.contains(":443"), s"default port survives: $u")
      assert(!u.endsWith("/"), s"trailing slash survives: $u")
      val host = u.stripPrefix("https://").takeWhile(_ != '/')
      assert(!host.exists(_.isUpper), s"host case not folded: $u")
    }
    val nDocs = Tables(spark, d, "documents").count()
    assert(rows.map(_.getLong(2)).sum === nDocs,
      "every document must be counted under exactly one canonical URL")
    assert(rows.exists(_.getLong(2) > 1),
      "the messy-variant synthesis must produce genuine duplicates")
    assert(rows.forall(r => r.getLong(1) >= 0 && r.getLong(2) >= 1))
  }

  test("v10: MMR selection replays an exact driver-side reference") {
    // the same kernel order as CosineSimilarity: dot/na/nb in one pass,
    // denom = sqrt(na)*sqrt(nb)
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      val n = math.min(a.length, b.length)
      while (i < n) {
        val x = a(i).toDouble; val y = b(i).toDouble
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
      val denom = math.sqrt(na) * math.sqrt(nb)
      if (denom == 0.0) 0.0 else dot / denom
    }
    val vecs = Tables(spark, d, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    val q = vecs.find(_._1 == 0L).get._2
    val rel = vecs.filter(_._1 != 0L).map { case (id, v) => (id, v, cos(q, v)) }
    var picked = Vector.empty[(Long, Array[Float], Double)]
    while (picked.size < 8) {
      val avail = rel.filterNot(c => picked.exists(_._1 == c._1))
      val scored = avail.map { case (id, v, r) =>
        val score =
          if (picked.isEmpty) r
          else 0.7 * r - 0.3 * picked.map(p => cos(p._2, v)).max
        (id, v, score)
      }
      picked :+= scored.minBy { case (id, _, sc) => (-sc, id) }
    }
    val got = graft.SparkEntry.queries("v10_mmr_select")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val want = picked.zipWithIndex.map { case ((id, _, sc), i) => (i + 1L, id, sc) }
    assert(got.map(_._2).toSeq === want.map(_._2),
      s"selection order diverges: got ${got.toSeq} want $want")
    got.zip(want).foreach { case ((_, _, g), (_, _, w)) =>
      assert(math.abs(g - w) < 5e-5, s"score diverges beyond rounding: $g vs $w")
    }
    assert(got.map(_._2).distinct.length === 8, "selected ids must be distinct")
  }
}
