package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import graft.streaming.TripSegmentation.{StatusPing, Trip}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class TripSegmentationSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("trips close on stop pings; state survives micro-batch boundaries") {
    implicit val sql = spark.sqlContext
    val in = MemoryStream[StatusPing]
    val q = TripSegmentation.trips(spark, in.toDS())
      .writeStream.outputMode("append").format("memory")
      .queryName("trips_out").start()
    try {
      // batch 1: d1 starts driving; d2 stays stopped
      in.addData(
        StatusPing("d1", ts("2026-01-01 08:00:00"), 30.0),
        StatusPing("d1", ts("2026-01-01 08:05:00"), 45.0),
        StatusPing("d2", ts("2026-01-01 08:00:00"), 0.0))
      q.processAllAvailable()
      assert(spark.table("trips_out").isEmpty) // trip still open
      // batch 2: d1 keeps driving then stops -> one trip spanning batches
      in.addData(
        StatusPing("d1", ts("2026-01-01 08:10:00"), 20.0),
        StatusPing("d1", ts("2026-01-01 08:15:00"), 0.0))
      q.processAllAvailable()
      val trips = spark.table("trips_out").as[Trip].collect()
      assert(trips.length === 1)
      val t = trips.head
      assert(t.deviceId === "d1")
      assert(t.startMs === ts("2026-01-01 08:00:00").getTime)
      assert(t.endMs === ts("2026-01-01 08:10:00").getTime)
      assert(t.nPings === 3)
      assert(t.maxSpeed === 45.0)
      // batch 3: d1 drives again -> a second, separate trip
      in.addData(
        StatusPing("d1", ts("2026-01-01 09:00:00"), 50.0),
        StatusPing("d1", ts("2026-01-01 09:02:00"), 0.0))
      q.processAllAvailable()
      assert(spark.table("trips_out").count() === 2)
    } finally q.stop()
  }

  test("silent device's open trip closes at the event-time idle horizon") {
    implicit val sql = spark.sqlContext
    val in = MemoryStream[StatusPing]
    // watermark delay 0 so the horizon is just lastPing + idleTimeout
    val q = TripSegmentation.trips(spark, in.toDS(),
      watermarkDelay = "0 seconds", idleTimeoutMs = 30L * 60 * 1000)
      .writeStream.outputMode("append").format("memory")
      .queryName("trips_timeout_out").start()
    try {
      // d1 starts a trip, then goes silent forever
      in.addData(
        StatusPing("d1", ts("2026-01-01 08:00:00"), 30.0),
        StatusPing("d1", ts("2026-01-01 08:05:00"), 45.0))
      q.processAllAvailable()
      assert(spark.table("trips_timeout_out").isEmpty) // open, within horizon
      // another device's traffic advances the watermark past 08:35
      in.addData(StatusPing("d9", ts("2026-01-01 09:30:00"), 0.0))
      q.processAllAvailable()
      val trips = spark.table("trips_timeout_out").as[Trip].collect()
      assert(trips.length === 1, s"open trip not closed by timeout: ${trips.toSeq}")
      val t = trips.head
      assert(t.deviceId === "d1")
      assert(t.startMs === ts("2026-01-01 08:00:00").getTime)
      assert(t.endMs === ts("2026-01-01 08:05:00").getTime)
      assert(t.nPings === 2 && t.maxSpeed === 45.0)
    } finally q.stop()
  }

  test("batch mode: same segmentation code runs on a bounded dataset") {
    val pings = Seq(
      StatusPing("d1", ts("2026-01-01 08:00:00"), 30.0),
      StatusPing("d1", ts("2026-01-01 08:05:00"), 10.0),
      StatusPing("d1", ts("2026-01-01 08:06:00"), 0.0),
      StatusPing("d1", ts("2026-01-01 09:00:00"), 20.0),
      StatusPing("d1", ts("2026-01-01 09:10:00"), 0.0)).toDS()
    val trips = TripSegmentation.trips(spark, pings).collect().sortBy(_.startMs)
    assert(trips.length === 2)
    assert(trips(0).nPings === 2 && trips(1).nPings === 1)
  }

  test("stateful operator and relational twin segment sf0.001 telemetry identically") {
    import org.apache.spark.sql.functions._
    // the g07 synthesis: one ping per order, event second = orderkey
    val pings = graft.Tables(spark, "/root/testdata/sf0.001", "orders").select(
      concat(lit("dev-"), col("o_custkey")).as("device_id"),
      col("o_orderkey").cast("long").as("t"),
      ((col("o_orderkey") % 5) * 10).cast("double").as("speed"))
    val relational = TripSegmentation.tripsRelational(pings)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toSet
    val stateful = TripSegmentation.trips(spark,
        pings.select(col("device_id").as("deviceId"),
          timestamp_seconds(col("t")).as("ts"), col("speed")).as[StatusPing])
      .collect()
      .map(t => (t.deviceId, t.startMs / 1000, t.endMs / 1000, t.nPings.toLong, t.maxSpeed))
      .toSet
    assert(relational.nonEmpty, "fixture must produce closed trips")
    assert(stateful === relational,
      s"stateful/relational divergence: only-stateful=${(stateful -- relational).take(3)} " +
        s"only-relational=${(relational -- stateful).take(3)}")
  }
}
