package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-7 operator properties the fixture gates can't express: CDC merge
  * algebra, resampling budget discipline, and the LM score's semantic
  * ordering. */
class CorpusOpsR7Spec extends SparkSpec {
  import spark.implicits._

  private def snapshot = Seq(
    (1L, "alice", 10.0), (2L, "bob", 20.0), (3L, "carol", 30.0))
    .toDF("k", "name", "bal")

  private def changes = Seq(
    (2L, Some("bob"), Some(25.0), 1L, "U"),   // update
    (3L, Option.empty[String], Option.empty[Double], 2L, "D"), // delete
    (3L, Some("carol2"), Some(35.0), 1L, "U"), // update of the deleted key, EARLIER seq
    (9L, Some("dave"), Some(90.0), 1L, "I"))   // insert
    .toDF("k", "name", "bal", "seq", "op")

  test("upsertMerge applies insert/update/delete; delete beats an earlier update") {
    val merged = Relational.upsertMerge(snapshot, changes, Seq("name", "bal"))
      .orderBy("k")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(merged.toSeq === Seq(
      (1L, "alice", 10.0),  // untouched
      (2L, "bob", 25.0),    // updated
      (9L, "dave", 90.0)))  // inserted; k=3 deleted despite its seq-1 update
  }

  test("upsertMerge is idempotent under CDC-log replay (redelivered changes)") {
    val once = Relational.upsertMerge(snapshot, changes, Seq("name", "bal"))
    val twice = Relational.upsertMerge(snapshot,
      changes.unionByName(changes), Seq("name", "bal")) // full redelivery
    assert(twice.exceptAll(once).isEmpty && once.exceptAll(twice).isEmpty,
      "replaying the same change batch must not change the merged snapshot")
  }

  test("t18 resampling respects its budget and flattens the distribution") {
    val d = "/root/testdata/sf0.001"
    val rows = graft.SparkEntry.queries("t18_temperature_resample")(spark, d)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val totalDocs = rows.map(_._2).sum
    val kept = rows.map(_._3).sum
    // expected kept ≈ B = N/2; md5-bucket sampling noise stays well inside
    // ±20% at fixture size, and the min(1, ·) cap only ever UNDERSHOOTS
    assert(kept <= (totalDocs * 0.65).toLong && kept >= (totalDocs * 0.35).toLong,
      s"budget N/2 not respected: kept $kept of $totalDocs")
    // temperature flattening: smaller domains get strictly >= keep rates
    // (sliding windows of size < 2 — a single-domain fixture — are skipped
    // rather than MatchError'd)
    val byRate = rows.sortBy(_._2)
    byRate.sliding(2).collect {
      case Array((s1, n1, _, r1), (s2, n2, _, r2)) => ((s1, n1, r1), (s2, n2, r2))
    }.foreach { case ((s1, n1, r1), (s2, n2, r2)) =>
      if (n1 < n2)
        assert(r1 >= r2 - 1e-9, s"flattening violated: $s1($n1)=$r1 < $s2($n2)=$r2")
    }
  }

  test("t19 sanity: natural phrasing outscores token salad on the gate corpus") {
    // the fixture-gated rows must at least separate: every document has a
    // finite score, and documents dominated by repeated bigrams (high
    // dup_2gram_frac from t15) never sit at the score minimum
    val d = "/root/testdata/sf0.001"
    val scores = graft.SparkEntry.queries("t19_bigram_logprob")(spark, d)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(scores.nonEmpty && scores.values.forall(v => !v.isNaN && !v.isInfinite))
    val rep = graft.SparkEntry.queries("t15_repetition_gopher")(spark, d)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val topRepetitive = rep.toSeq.sortBy(-_._2).take(10).map(_._1)
    val minScore = scores.values.min
    assert(topRepetitive.forall(id =>
      scores.get(id).forall(_ > minScore)),
      "highly repetitive docs must not be the LM-score minimum (they repeat seen bigrams)")
  }
}
