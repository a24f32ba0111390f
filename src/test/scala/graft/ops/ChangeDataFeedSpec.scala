package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** e23 property specs — what the driver's hash gate can't check about the
  * read-side change feed:
  *
  *  - ROUND-TRIP: applying the feed to the old snapshot reproduces the
  *    new snapshot exactly (the CDF contract that makes the feed a
  *    replayable log for incremental consumers);
  *  - unchanged rows never appear in the feed (the 100 TB property — the
  *    feed is change-sized, not table-sized);
  *  - updates emit BOTH images with matching keys. */
class ChangeDataFeedSpec extends SparkSpec {

  private def asSet(df: DataFrame) =
    df.collect().map(_.toSeq.map(String.valueOf(_))).toSet

  test("e23: applying the feed to the old snapshot reproduces the new one") {
    import spark.implicits._
    val old = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0),
      (4L, "d", 40.0)).toDF("k", "name", "bal")
    val nw = Seq((1L, "a", 10.0), (2L, "b", 99.0), (4L, "D", 40.0),
      (5L, "e", 50.0)).toDF("k", "name", "bal")
    val feed = ExportOps.changeDataFeed(old, nw, Seq("k"))
    // consumer-side apply: drop deleted + pre-image keys, add inserts +
    // post-images — pure set algebra on the feed, no second table scan
    val dropKeys = feed.filter(col("_change_type")
        .isin("delete", "update_preimage")).select("k")
    val addRows = feed.filter(col("_change_type")
        .isin("insert", "update_postimage")).drop("_change_type")
    val applied = old.join(dropKeys, Seq("k"), "left_anti")
      .unionByName(addRows)
    assert(asSet(applied) === asSet(nw),
      "feed applied to the old snapshot must reproduce the new one")
  }

  test("e23: unchanged rows never enter the feed; updates carry both images") {
    import spark.implicits._
    val old = Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("k", "name", "bal")
    val nw = Seq((1L, "a", 10.0), (2L, "b", 21.0)).toDF("k", "name", "bal")
    val feed = ExportOps.changeDataFeed(old, nw, Seq("k"))
    val types = feed.select("k", "_change_type").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(types === Set((2L, "update_preimage"), (2L, "update_postimage")),
      s"only the changed key, with both images: $types")
  }
}
