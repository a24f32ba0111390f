package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** q107 property pins — what the hash-match alone can't localize:
  * (1) the ListState is BOUNDED (no emission exceeds 5; some user hits
  * the bound, so the trim is exercised), and (2) the list SURVIVES the
  * micro-batch boundary: users with fewer than 5 batch-2 events emit
  * batch-2 windows that blend batch-1 events in — state carried, not
  * recomputed from the batch. */
class ListStateSurvivalSpec extends SparkSpec {

  test("q107: list is bounded at 5 and carried across the batch boundary") {
    val d = "/root/testdata/sf0.001"
    val rows = graft.SparkEntry.queries("q107_stream_list_state")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    // bound: never above 5, and the trim actually fires somewhere
    assert(rows.forall(_._2 <= 5L), "a window exceeded the 5-element bound")
    assert(rows.exists(_._2 === 5L),
      "no user reached the bound — the fixture can't exercise the trim")
    val ev = graft.Tables(spark, d, "events")
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("tsu"),
        expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("cents"))
    val mid = ev.agg(expr("(min(tsu) + 19 * max(tsu)) div 20")).head().getLong(0)
    // batch-agnostic newest-5 per user over ALL events — the final
    // emission every user must land on
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("tsu").desc, col("event_id").desc)
    val exact = ev.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("c"),
        max(when(col("rk") === 1, col("event_id"))).as("last"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    val counts = ev.groupBy(col("user_id")).agg(
      count(lit(1)).as("tn"),
      sum(when(col("tsu") > mid, 1L).otherwise(0L)).as("b2n"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byUser = rows.groupBy(_._1)
    byUser.foreach { case (u, rs) =>
      assert(rs.length <= 2, s"user $u emitted ${rs.length} rows (max 2 batches)")
      val last = rs.maxBy(_._4) // newest last_event_id = the later batch
      assert((last._2, last._3, last._4) === exact(u),
        s"user $u final window ${(last._2, last._3, last._4)} != newest-5 " +
          s"${exact(u)} — the list was lost, reordered, or recomputed")
    }
    // survival is exercised, not vacuous: some user with events in BOTH
    // halves and fewer than 5 batch-2 events emits a batch-2 window
    // larger than their batch-2 arrivals — those extra elements can only
    // be batch-1 events carried in the ListState
    val blended = counts.filter { case (u, tn, b2n) =>
      b2n > 0L && b2n < 5L && tn > b2n && byUser.contains(u)
    }
    assert(blended.nonEmpty,
      "fixture left no user to prove the cross-batch blend — split drifted")
    blended.foreach { case (u, tn, b2n) =>
      val last = byUser(u).maxBy(_._4)
      assert(last._2 === math.min(5L, tn),
        s"user $u batch-2 window has ${last._2} elements; expected " +
          s"min(5, $tn) — batch-1 events (${tn - b2n}) were not carried")
      assert(last._2 > b2n,
        s"user $u window never grew past its $b2n batch-2 arrivals")
    }
  }
}
