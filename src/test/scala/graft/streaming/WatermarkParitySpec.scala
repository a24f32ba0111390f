package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

case class Tick(dateTime: Timestamp, device_id: String)

/** F1 parity (task.ts:231, 265-267): the reference drops telemetry with
  * `dateTime <= hourAgo` and keeps strictly-newer rows. The batch engine
  * expresses that as `filter(dateTime > now - 1h)` (GeotabPipeline
  * featuresFlat); the streaming engine as `withWatermark("dateTime",
  * "1 hour")` feeding a stateful operator. This spec pins that BOTH drop
  * exactly the same boundary rows: Spark's late-row predicate is
  * `eventTime <= watermark` — i.e. a row timestamped exactly one hour
  * behind the max-seen event time (the streaming analogue of `now`) is
  * dropped, one tick newer survives. The reference's inclusive boundary is
  * therefore expressible by the native watermark with NO correction term.
  */
class WatermarkParitySpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val anchor = Tick(ts("2026-01-01 12:00:00"), "anchor")
  private val boundaryRows = Seq(
    Tick(ts("2026-01-01 10:59:59"), "below"),    // 1h+1s old: both drop
    Tick(ts("2026-01-01 11:00:00"), "boundary"), // exactly 1h old: both drop
    Tick(ts("2026-01-01 11:00:01"), "above"))    // 1s inside: both keep

  test("batch freshness filter and 1h watermark drop the same boundary rows") {
    implicit val sql = spark.sqlContext

    // batch: the F1 filter with now = the stream's max event time
    val batchSurvivors = (anchor +: boundaryRows).toDF()
      .filter(col("dateTime") > lit(anchor.dateTime) - expr("INTERVAL 1 HOUR"))
      .select($"device_id").as[String].collect().toSet

    // streaming: anchor establishes watermark = 11:00:00, then the boundary
    // rows arrive late; dedup-by-(id,time) passes every on-time row through
    // so the late-drop is visible row-for-row
    val in = MemoryStream[Tick]
    val q = in.toDF()
      .withWatermark("dateTime", "1 hour")
      .dropDuplicates("device_id", "dateTime")
      .writeStream.outputMode("append").format("memory")
      .queryName("wm_parity").start()
    val streamSurvivors =
      try {
        in.addData(anchor)
        q.processAllAvailable() // watermark advances to max(dateTime) - 1h
        in.addData(boundaryRows: _*)
        q.processAllAvailable()
        spark.table("wm_parity").select($"device_id").as[String].collect().toSet
      } finally q.stop()

    assert(batchSurvivors === Set("anchor", "above"),
      s"batch F1 boundary must be `<= drops, > keeps`: $batchSurvivors")
    assert(streamSurvivors === batchSurvivors,
      s"watermark late-drop diverges from the batch freshness filter: " +
        s"stream=$streamSurvivors batch=$batchSurvivors")
  }
}
