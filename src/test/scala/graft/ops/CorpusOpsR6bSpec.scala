package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Behavior tests for the second wave of round-6 corpus operators:
  * chunk-level dedup on synthetic corpora, the Bloom screen's
  * no-false-negative / exact-final-output contract, quality-bucket
  * balance, and the domain-mix budget replayed driver-side. */
class CorpusOpsR6bSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  test("d17: chunk dedup flags shared chunks and only shared chunks") {
    import spark.implicits._
    // 32 tokens = exactly two 16-token chunks per doc. Docs 1 and 2 share
    // their first chunk; doc 3 is disjoint.
    val chunkA = (1 to 16).map(i => s"a$i").mkString(" ")
    val tail1 = (1 to 16).map(i => s"b$i").mkString(" ")
    val tail2 = (1 to 16).map(i => s"c$i").mkString(" ")
    val other = (1 to 32).map(i => s"z$i").mkString(" ")
    val df = Seq(
      (1L, s"$chunkA $tail1"),
      (2L, s"$chunkA $tail2"),
      (3L, other)).toDF("doc_id", "text")
    val out = DedupOps.chunkDedup(df).orderBy("doc_id").collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L))
    out.take(2).foreach { r =>
      assert(r.getLong(1) === 2L, "two chunks per 32-token doc")
      assert(r.getLong(2) === 1L, "exactly the shared chunk is duplicated")
      assert(math.abs(r.getDouble(3) - 0.5) < 1e-15)
      assert(r.getBoolean(4), "0.5 > 0.3 must flag")
    }
    val r3 = out(2)
    assert(r3.getLong(2) === 0L && !r3.getBoolean(4))
    // trailing partial chunk counts as a chunk
    val partial = Seq((9L, (1 to 20).map(i => s"p$i").mkString(" ")))
      .toDF("doc_id", "text")
    assert(DedupOps.chunkDedup(partial).collect().head.getLong(1) === 2L)
  }

  test("d18: bloom screen output equals the exact join, dups never missed") {
    import spark.implicits._
    val existing = (1 to 200)
      .map(i => (i.toLong, s"text-$i")).toDF("doc_id", "raw")
      .select(col("doc_id"), md5(col("raw")).as("th"))
    // incoming: 50 fresh + 10 copies of existing texts
    val incoming = ((1001 to 1050).map(i => (i.toLong, s"new-$i")) ++
      (1 to 10).map(i => (2000L + i, s"text-${i * 7}")))
      .toDF("doc_id", "raw")
      .select(col("doc_id"), md5(col("raw")).as("th"))
    val got = DedupOps.bloomScreen(incoming, existing)
      .orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // reference: plain exact equi-join, no bloom
    val want = incoming.as("i")
      .join(existing.select("th").distinct().as("e"), Seq("th"), "left")
      .select(col("doc_id"), col("e.th").isNotNull.as("dup"))
      .collect().map(r => r.getLong(0) ->
        (if (r.getBoolean(1)) "exact_dup" else "kept")).toMap
    assert(got === want, "bloom pre-filter must not change the final output")
    assert(got.count(_._2 == "exact_dup") === 10,
      "every true duplicate must survive the probe (no false negatives)")
    assert(got.size === 60)
  }

  test("d18: the bloom probe is the codegen'd expression pair, not a UDF") {
    import spark.implicits._
    val existing = (1 to 50).map(i => (i.toLong, s"text-$i")).toDF("doc_id", "raw")
      .select(col("doc_id"), md5(col("raw")).as("th"))
    val incoming = (101 to 120).map(i => (i.toLong, s"new-$i")).toDF("doc_id", "raw")
      .select(col("doc_id"), md5(col("raw")).as("th"))
    val screened = DedupOps.bloomScreen(incoming, existing)
    val analyzed = screened.queryExecution.analyzed.toString()
    assert(analyzed.contains("might_contain"),
      s"probe must be BloomFilterMightContain:\n${analyzed.take(1500)}")
    assert(analyzed.contains("bloom_filter_agg"),
      s"filter must build via BloomFilterAggregate:\n${analyzed.take(1500)}")
    val physical = screened.queryExecution.executedPlan.toString()
    assert(!physical.contains("UDF") && !analyzed.contains("UDF"),
      "the screen must stay inside whole-stage codegen — no Scala UDF node")
  }

  test("t16: terciles are balanced per lang and ordered head >= tail") {
    val rows = graft.SparkEntry.queries("t16_quality_buckets")(spark, d)
      .collect().map(r => (r.getString(1), r.getDouble(2), r.getString(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (lang, rs) =>
      val sizes = rs.groupBy(_._3).view.mapValues(_.size).toMap
      val counts = Seq("head", "middle", "tail").map(sizes.getOrElse(_, 0))
      assert(counts.max - counts.min <= 1,
        s"$lang buckets unbalanced: $sizes")
      // rank-cut buckets: every head score >= every tail score
      if (sizes.getOrElse("head", 0) > 0 && sizes.getOrElse("tail", 0) > 0) {
        val minHead = rs.filter(_._3 == "head").map(_._2).min
        val maxTail = rs.filter(_._3 == "tail").map(_._2).max
        assert(minHead >= maxTail, s"$lang: head $minHead < tail $maxTail")
      }
    }
  }

  test("d19: per-domain cap keeps exactly the top-capped md5-order prefix") {
    val docs = Tables(spark, d, "documents")
      .select(col("doc_id"), col("source"),
        md5(col("doc_id").cast("string")).as("ord"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val want = docs.groupBy(_._2).toSeq.flatMap { case (src, rs) =>
      rs.sortBy(r => (r._3, r._1)).take(DedupOps.DomainCap).zipWithIndex.map {
        case ((id, _, _), i) =>
          (id, s"www.$src.example.com", (i + 1).toLong)
      }
    }.toSet
    val got = graft.SparkEntry.queries("d19_domain_cap")(spark, d)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got === want)
    got.groupBy(_._2).foreach { case (dom, rs) =>
      assert(rs.size <= DedupOps.DomainCap, s"$dom over cap")
      assert(rs.map(_._3).toSeq.sorted === (1 to rs.size).map(_.toLong),
        s"$dom ranks not contiguous from 1")
    }
  }

  test("d20: streaming ingestion screen equals the d18 batch screen") {
    val batch = graft.SparkEntry.queries("d18_bloom_screen")(spark, d)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val streamed = graft.SparkEntry.queries("d20_stream_ingest_dedup")(spark, d)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(streamed === batch,
      "stream-static screen must land the identical statuses")
    assert(streamed.exists(_._2 == "exact_dup") &&
      streamed.exists(_._2 == "kept"))
  }

  test("t17: kept set replays the greedy per-source budget exactly") {
    val docs = Tables(spark, d, "documents")
      .select(col("doc_id"), col("source"),
        size(filter(split(col("text"), "\\s+", -1), t => length(t) > 0))
          .cast("long").as("n"),
        md5(col("doc_id").cast("string")).as("ord"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3)))
    val want = docs.groupBy(_._2).toSeq.flatMap { case (_, rs) =>
      var cum = 0L
      rs.sortBy(r => (r._4, r._1)).toSeq.flatMap { case (id, src, n, _) =>
        val before = cum
        cum += n
        if (before < TextOps.DomainMixBudget) Some((id, src, n, cum)) else None
      }
    }.toSet
    val got = graft.SparkEntry.queries("t17_domain_mix")(spark, d)
      .collect().map(r =>
        (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(got === want)
    assert(got.nonEmpty && got.size < docs.length,
      "budget must keep some and drop some documents")
    assert(got.map(_._2) === docs.map(_._2).toSet,
      "a positive budget keeps at least one document per source")
  }
}
