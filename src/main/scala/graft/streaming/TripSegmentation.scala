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
    * ping after a driving run closes the trip and emits it. */
  def segment(stopSpeed: Double)(
      deviceId: String, pings: Iterator[StatusPing],
      state: GroupState[TripState]): Iterator[Trip] = {
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
      case Some(s) => state.update(s)
      case None => state.remove()
    }
    out.iterator
  }

  /** Streaming (or batch) entry point. */
  def trips(spark: SparkSession, pings: Dataset[StatusPing],
            stopSpeed: Double = 1.0): Dataset[Trip] = {
    import spark.implicits._
    pings.groupByKey(_.deviceId)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        segment(stopSpeed))
  }
}
