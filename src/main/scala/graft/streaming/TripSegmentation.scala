package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom stateful streaming operator: segments a vehicle's status pings
  * into trips (drive → stop transitions) with `flatMapGroupsWithState` —
  * the semantics the reference's per-device telemetry implies but its
  * stateless one-shot runs cannot express (each Lambda run sees one
  * snapshot; a stream of them makes trips recoverable).
  *
  * State is per device (hash-partitioned by key — scales horizontally);
  * within a micro-batch pings are sorted by event time before folding, so
  * replays and batch boundaries don't change the segmentation.
  */
object TripSegmentation {

  case class StatusPing(deviceId: String, ts: Timestamp, speed: Double)

  case class TripState(startMs: Long, lastMs: Long, nPings: Int, maxSpeed: Double)

  case class Trip(deviceId: String, startMs: Long, endMs: Long,
                  nPings: Int, maxSpeed: Double)

  /** A device is driving while speed >= stopSpeed; the first non-driving
    * ping after a driving run closes the trip and emits it. A device that
    * goes silent mid-trip is closed by event-time timeout when the
    * watermark passes lastPing + idleTimeoutMs — without this, the state
    * store grows with every vehicle that ever disappears mid-trip
    * (decommissioned, offline), which is unbounded at fleet scale. */
  def segment(stopSpeed: Double, idleTimeoutMs: Long)(
      deviceId: String, pings: Iterator[StatusPing],
      state: GroupState[TripState]): Iterator[Trip] = {
    if (state.hasTimedOut) {
      // silent device: emit the open trip as-of its last ping and free state
      val s = state.get
      state.remove()
      return Iterator.single(Trip(deviceId, s.startMs, s.lastMs, s.nPings, s.maxSpeed))
    }
    val ordered = pings.toSeq.sortBy(p => (p.ts.getTime, p.speed))
    val out = scala.collection.mutable.ArrayBuffer.empty[Trip]
    var cur = state.getOption
    ordered.foreach { p =>
      val ms = p.ts.getTime
      val driving = p.speed >= stopSpeed
      cur match {
        case None if driving =>
          cur = Some(TripState(ms, ms, 1, p.speed))
        case None => // still stopped
        case Some(s) if driving =>
          cur = Some(TripState(s.startMs, ms, s.nPings + 1, math.max(s.maxSpeed, p.speed)))
        case Some(s) => // stop ping closes the trip
          out += Trip(deviceId, s.startMs, s.lastMs, s.nPings, s.maxSpeed)
          cur = None
      }
    }
    cur match {
      case Some(s) =>
        state.update(s)
        // arm the idle horizon; in batch execution there is no watermark
        // (and timeouts never fire), so skip arming there
        val wm = try Some(state.getCurrentWatermarkMs())
                 catch { case _: UnsupportedOperationException => None }
        wm.foreach(w => state.setTimeoutTimestamp(
          math.max(s.lastMs + idleTimeoutMs, w + 1)))
      case None => state.remove()
    }
    out.iterator
  }

  /** Declarative (oracle-checkable) twin of [[segment]] for batch
    * execution: gaps-and-islands over a device-partitioned window. A trip
    * is a maximal run of driving pings (speed >= stopSpeed) closed by a
    * later stop ping; the trailing open run is NOT emitted — exactly the
    * batch behavior of [[trips]], where end-of-data state is discarded.
    * Two window functions + one hash aggregation, all partitioned by
    * device — the same key the stateful operator shards on, so both forms
    * scale identically. Input columns: device_id, t (unique-per-device
    * BIGINT event seconds), speed. */
  def tripsRelational(pings: org.apache.spark.sql.DataFrame,
                      stopSpeed: Double = 1.0): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val isStop = when(col("speed") < stopSpeed, 1L).otherwise(0L)
    val byDev = Window.partitionBy(col("device_id"))
    val f = pings.select(col("device_id"), col("t"), col("speed"),
      isStop.as("is_stop"),
      sum(isStop).over(byDev.orderBy(col("t"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)).as("grp"),
      sum(isStop).over(byDev).as("n_stops"))
    f.filter(col("is_stop") === 0 && col("grp") < col("n_stops"))
      .groupBy(col("device_id"), col("grp"))
      .agg(min(col("t")).as("trip_start_s"), max(col("t")).as("trip_end_s"),
        count(lit(1)).as("n_pings"), max(col("speed")).as("max_speed"))
      .drop("grp")
  }

  /** Streaming (or batch) entry point. The watermark bounds both late data
    * and state lifetime: an open trip whose device stays silent for
    * idleTimeoutMs of event time is emitted and evicted. */
  def trips(spark: SparkSession, pings: Dataset[StatusPing],
            stopSpeed: Double = 1.0,
            watermarkDelay: String = "10 minutes",
            idleTimeoutMs: Long = 30L * 60 * 1000): Dataset[Trip] = {
    import spark.implicits._
    pings.withWatermark("ts", watermarkDelay)
      .groupByKey(_.deviceId)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        segment(stopSpeed, idleTimeoutMs))
  }
}
