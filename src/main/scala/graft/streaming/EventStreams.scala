package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery}

/** Streaming analytics over the events schema (ts, user_id, event_type,
  * value, ...). Every transform here takes a plain DataFrame, so the same
  * code runs in batch and under readStream — the reference is itself a
  * scheduled micro-batch with a 1-hour late-data policy
  * (task.ts:106-107, 231), i.e. exactly
  * `Trigger.AvailableNow` + `withWatermark("ts", "1 hour")` in Spark terms
  * (SURVEY.md §1.4).
  */
object EventStreams {

  /** Tumbling-window counts/sums with late-data handling. */
  def tumblingCounts(events: DataFrame, window: String = "5 minutes",
                     watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), window),
        col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("win_start"), col("window.end").as("win_end"),
        col("event_type"), col("n"), col("sum_value"))

  /** Sliding-window per-type average. */
  def slidingAvg(events: DataFrame, window: String = "10 minutes",
                 slide: String = "5 minutes", watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), window, slide),
        col("event_type"))
      .agg(avg(col("value")).as("avg_value"), count(lit(1)).as("n"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("avg_value"), col("n"))

  /** Gap-based sessions via the native session_window operator (the batch
    * twin, q32_sessionize, composes the same semantics from lag+cumsum so
    * it can be oracle-verified). */
  def sessionCounts(events: DataFrame, gap: String = "5 minutes",
                    watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n_events"))

  /** Streaming exact dedup: drop events whose id was already seen within
    * the watermark horizon — the ingest-side dedup a training-data stream
    * runs before anything downstream (at-least-once sources redeliver).
    * State is bounded by the watermark: ids older than the horizon are
    * evicted, which is the only way streaming dedup state survives at
    * 100 TB/day. */
  def dedupedEvents(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-stream interval join: every purchase picks up the same user's
    * clicks from the preceding `horizon`. Both sides carry watermarks and
    * the join condition bounds event time on both ends, so each side's
    * join state is evicted once the other side's watermark passes the
    * interval — the only way stream-stream join state stays bounded at
    * scale. The batch as-of twin is q33 (one ordered window, no state).
    *
    * `joinType` "left_outer" is the attribution shape production asks for
    * at least as often as the inner form ("purchases with NO qualifying
    * click"): a purchase that found no click emits exactly one null-click
    * row, and it emits only when the watermark passes the purchase's event
    * time — the point where a matching click can no longer arrive. Same
    * state bounds as the inner join; the outer rows ride the eviction
    * pass. "full_outer" adds the symmetric leg — a click no purchase
    * claimed emits one null-purchase row on ITS watermark close — the
    * reconciliation shape ("which side of the funnel leaked?") that needs
    * both sides' unmatched rows; `uid` coalesces across sides because
    * exactly one side is non-null on every outer row. */
  def purchasesWithClicks(events: DataFrame, horizon: String = "30 minutes",
                          watermark: String = "10 minutes",
                          joinType: String = "inner"): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", watermark)
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", watermark)
    val joined = purchases.join(clicks,
      col("p_user") === col("user_id") &&
        col("click_ts") >= col("purchase_ts") - expr(s"INTERVAL $horizon") &&
        col("click_ts") <= col("purchase_ts"), joinType)
    // a semi join carries no right-side columns: each matched purchase
    // emits exactly once (on the micro-batch its first match arrives in)
    if (joinType == "left_semi")
      joined.select(col("purchase_id"), col("p_user").as("uid"),
        col("purchase_ts"))
    else if (joinType == "full_outer" || joinType == "right_outer")
      // an unmatched row carries only one side's user column, so the uid
      // must coalesce across sides (right-outer: null purchase columns on
      // a click no purchase claimed)
      joined.select(col("purchase_id"),
        coalesce(col("p_user"), col("user_id")).as("uid"),
        col("purchase_ts"), col("click_id"), col("click_ts"))
    else
      joined.select(col("purchase_id"), col("p_user").as("uid"),
        col("purchase_ts"), col("click_id"), col("click_ts"))
  }

  /** The sink seam of the reference (S8, task.ts:294 `this.submit(fc)`):
    * each micro-batch of GeoJSON features goes to a pluggable sink —
    * file / console(DEBUG, task.ts:76) / in-memory for tests. A real
    * CloudTAK HTTP submitter is one more implementation of this trait. */
  trait FeatureSink extends Serializable {
    def submit(batch: Dataset[Row], batchId: Long): Unit
  }

  class ConsoleSink extends FeatureSink {
    override def submit(batch: Dataset[Row], batchId: Long): Unit =
      batch.show(20, truncate = false)
  }

  class FileSink(dir: String) extends FeatureSink {
    override def submit(batch: Dataset[Row], batchId: Long): Unit =
      batch.write.mode("append").json(s"$dir/batch_$batchId")
  }

  /** Collecting sink for tests (driver-side; test-scale batches only). */
  class MemorySink extends FeatureSink {
    val batches = scala.collection.mutable.ArrayBuffer.empty[Array[Row]]
    override def submit(batch: Dataset[Row], batchId: Long): Unit =
      batches.synchronized { batches += batch.collect() }
  }

  /** Wire a feature stream into a sink via foreachBatch. */
  def featureWriter(features: DataFrame, sink: FeatureSink): DataStreamWriter[Row] =
    features.writeStream
      .outputMode("append")
      .foreachBatch((b: Dataset[Row], id: Long) => sink.submit(b, id))

  /** The reference's scheduled CoT emit (task.ts:294 submit + node-cot
    * conversion) as a streaming path: each micro-batch of flat features is
    * converted to CoT event XML (a stateless, codegen'd projection —
    * byte-identical to the batch `GeotabPipeline.cotXml`) and submitted
    * through the pluggable sink. */
  def cotWriter(flatFeatures: DataFrame, sink: FeatureSink,
                staleAfter: String = "INTERVAL 1 HOUR"): DataStreamWriter[Row] =
    featureWriter(graft.geotab.GeotabPipeline.cotXml(flatFeatures, staleAfter), sink)

  def start(w: DataStreamWriter[Row], checkpoint: String): StreamingQuery =
    w.option("checkpointLocation", checkpoint).start()
}
