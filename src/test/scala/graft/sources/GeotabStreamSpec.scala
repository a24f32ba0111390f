package graft.sources

import graft.SparkSpec
import graft.sources.geotab._
import org.apache.spark.sql.functions._

/** Streaming connector test: readStream over the geotab source fires a
  * micro-batch per snapshot version, re-polling the API each time — the
  * reference's scheduled-poll cadence under Structured Streaming. */
class GeotabStreamSpec extends SparkSpec {

  private def infoJson(id: String, speed: Double): String =
    s"""{"bearing":90.0,"latitude":39.7,"longitude":-104.9,"speed":$speed,
       |"dateTime":"2026-01-01T11:30:00Z","device":{"id":"$id"},
       |"driver":"UnknownDriverId","isDriving":true,
       |"isDeviceCommunicating":true,"isHistoricLastDriver":false,
       |"groups":[{"id":"g1"}]}""".stripMargin.replaceAll("\n", "")

  test("micro-batches fire per snapshot version and see fresh data") {
    val c = new InMemoryGeotabClient(Seq.empty, Seq.empty, Seq(infoJson("d1", 10.0)))
    GeotabClients.register("stream1", c)
    GeotabSessionCache.clear()
    val stream = spark.readStream.format("geotab")
      .option("entity", "deviceInfo").option("client", "stream1")
      .load()
      .select(col("device.id").as("device_id"), col("speed"))
    val q = stream.writeStream.outputMode("append")
      .format("memory").queryName("geotab_stream_out").start()
    try {
      q.processAllAvailable()
      val batch1 = spark.table("geotab_stream_out").collect()
      assert(batch1.map(r => (r.getString(0), r.getDouble(1))).toSet ===
        Set(("d1", 10.0)))
      // new telemetry snapshot -> new micro-batch with the fresh poll
      c.setDeviceInfo(Seq(infoJson("d1", 55.0), infoJson("d2", 20.0)))
      q.processAllAvailable()
      val all = spark.table("geotab_stream_out").collect()
        .map(r => (r.getString(0), r.getDouble(1))).toSet
      assert(all === Set(("d1", 10.0), ("d1", 55.0), ("d2", 20.0)), s"got $all")
    } finally q.stop()
  }

  private val sf = "/root/testdata/sf0.001"

  test("g05: flagship under readStream+AvailableNow matches the batch flagship exactly") {
    val streamed = graft.geotab.GeotabSynth.streamFlagship(spark, sf).collect()
    val batch = graft.geotab.GeotabSynth.flagship(spark, sf)
      // the parquet sink round-trip reorders nothing but the gate re-sorts;
      // align column order to the streamed read-back for Row equality
      .select(streamed.headOption.map(_.schema.fieldNames).getOrElse(Array("id")).map(col): _*)
      .collect()
    assert(streamed.length === batch.length && streamed.length > 0,
      s"row counts differ: stream=${streamed.length} batch=${batch.length}")
    assert(streamed.sameElements(batch), "stream/batch flagship rows diverge")
  }

  test("g06: CoT XML through the streaming FeatureSink matches the batch conversion byte-for-byte") {
    val streamed = graft.geotab.GeotabSynth.streamCot(spark, sf).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    val batch = graft.geotab.GeotabSynth.cotQuery(spark, sf).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(streamed.nonEmpty && streamed === batch,
      "streamed CoT events must be byte-identical to the batch conversion")
  }
}
