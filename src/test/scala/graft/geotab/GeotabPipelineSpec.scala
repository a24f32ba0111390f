package graft.geotab

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Golden-output test of the reference pipeline semantics (SURVEY.md §5.2):
  * hand-built fixtures exercising every edge the reference's control() hits
  * (task.ts:221-294) — inner-join miss, stale row, string-variant driver,
  * driver probe miss, empty-string vs null defaults, prefix filter.
  */
class GeotabPipelineSpec extends SparkSpec {
  import spark.implicits._

  private val now = Timestamp.valueOf("2026-01-01 12:00:00")
  private def ts(s: String) = Timestamp.valueOf(s)

  // devices: id, vin, licenseState, licensePlate, name
  private def devices = Seq(
    ("d1", "V1", "CO", "ABC123", "Truck One"),   // fully populated
    ("d2", "V2", null, "", null),                // null state, empty plate, null name
    ("d3", "V3", "", "XYZ", ""),                 // empty state, empty name
    ("d4", "V4", "NM", "PLT4", "Truck Four"),    // no matching info -> dropped
    ("d5", "V5", "TX", "PLT5", "Truck Five"),    // stale info -> dropped
    ("d6", "V6", "UT", "PLT6", "Zebra Six")      // filtered by prefix 'Truck'
  ).toDF("id", "vehicleIdentificationNumber", "licenseState", "licensePlate", "name")

  // device_id, dateTime, lat, lon, speed, bearing, driverId, driverIsObject, groups
  // (named infoDf: `info` collides with ScalaTest's Informer)
  private def infoDf = Seq(
    ("d1", ts("2026-01-01 11:30:00"), 39.7, -104.9, 100.0, 90.0, "drv1", true, "g1"),
    ("d2", ts("2026-01-01 11:45:00"), 40.0, -105.0, 50.0, 180.0, "UnknownDriverId", false, "g1"),
    ("d3", ts("2026-01-01 11:59:00"), 41.0, -106.0, 0.0, 0.0, "drvMissing", true, "g2"),
    ("d5", ts("2026-01-01 10:59:59"), 42.0, -107.0, 10.0, 45.0, "drv1", true, "g2"), // < now-1h: stale
    ("d6", ts("2026-01-01 11:50:00"), 43.0, -108.0, 20.0, 270.0, "drv1", true, "g3")
  ).toDF("device_id", "dateTime", "latitude", "longitude", "speed", "bearing",
    "driverId", "driverIsObject", "groups")

  private def drivers = Seq(
    ("drv1", "jdoe", "John", "Doe", "555-0100", "Senior", "night shift")
  ).toDF("id", "name", "firstName", "lastName", "phoneNumber", "designation", "comment")

  private def run(prefix: String = "") = GeotabPipeline.featuresFlat(
    devices, infoDf, drivers,
    GeotabPipeline.Config(prefix = prefix, now = lit(now)))

  test("inner join drops devices without status info (task.ts:286-288)") {
    val ids = run().select("id").as[String].collect().toSet
    assert(!ids.contains("geotab-d4"))
  }

  test("freshness filter drops rows at or older than now - 1h (task.ts:231,265-267)") {
    val ids = run().select("id").as[String].collect().toSet
    assert(!ids.contains("geotab-d5"))
    assert(ids === Set("geotab-d1", "geotab-d2", "geotab-d3", "geotab-d6"))
  }

  test("JS || default-fill treats empty string like null (task.ts:241-244)") {
    val d2 = run().filter($"id" === "geotab-d2").head()
    assert(d2.getAs[String]("license_state") === "US")   // null -> US
    assert(d2.getAs[String]("license_plate") === "Unknown") // "" -> Unknown
    assert(d2.getAs[String]("vehicle_name") === "No Name")  // null -> No Name
    val d3 = run().filter($"id" === "geotab-d3").head()
    assert(d3.getAs[String]("license_state") === "US")   // "" -> US
    assert(d3.getAs[String]("vehicle_name") === "No Name")  // "" -> No Name
  }

  test("callsign: name wins; else ??-state + ||-plate fallback (task.ts:261-263)") {
    val rows = run().select("id", "callsign").as[(String, String)].collect().toMap
    assert(rows("geotab-d1") === "Truck One")
    // d2: name null -> state null ?? 'US', plate '' || 'Unknown'
    assert(rows("geotab-d2") === "US-Unknown")
    // d3: name '' -> falls back; state '' stays '' under ?? (JS ?? keeps ""),
    // plate XYZ kept
    assert(rows("geotab-d3") === "-XYZ")
  }

  test("driver enrichment: object variant joins, string variant must not (task.ts:248-258)") {
    val rows = run().select("id", "driver_username").as[(String, String)]
      .collect().toMap
    assert(rows("geotab-d1") === "jdoe")
    assert(rows("geotab-d2") === null) // string variant guarded out
    assert(rows("geotab-d3") === null) // probe miss tolerated (left join)
  }

  test("speed converted km/h -> m/s with reference constant (task.ts:276)") {
    val d1 = run().filter($"id" === "geotab-d1").head()
    assert(math.abs(d1.getAs[Double]("speed_ms") - 27.7778) < 1e-9)
  }

  test("prefix filter applies to filled metadata name (task.ts:288-291)") {
    val ids = run(prefix = "Truck").select("id").as[String].collect().toSet
    assert(ids === Set("geotab-d1")) // d2/d3 are 'No Name', d6 is 'Zebra Six'
  }

  test("geojson assembly: lon-first coordinates, nested Feature shape (task.ts:269-285)") {
    val gj = GeotabPipeline.geojson(run()).filter($"feature_id" === "geotab-d1").head()
    val json = gj.getAs[String]("feature_json")
    assert(json.contains(""""type":"Feature""""))
    assert(json.contains(""""coordinates":[-104.9,39.7]""")) // lon first!
    assert(json.contains(""""callsign":"Truck One""""))
    assert(json.contains(""""vin":"V1""""))
  }

  test("schema introspection returns input/output contracts (task.ts:109-122)") {
    assert(GeotabSchemas.describe("input", "incoming") === GeotabSchemas.deviceInfo)
    assert(GeotabSchemas.describe("output", "incoming").fieldNames.contains("callsign"))
    assert(GeotabSchemas.describe("output", "outgoing").isEmpty) // Type.Object({})
    assert(GeotabSchemas.describeJson("input", "incoming").contains("\"dateTime\""))
    // the pipeline's actual output matches the advertised contract
    assert(run().schema.fieldNames.toSeq ===
      GeotabSchemas.featureFlat.fieldNames.toSeq)
  }

  test("featureCollections assembles sink-batch payloads (task.ts:233-294)") {
    val fc = GeotabPipeline.featureCollections(run(), nBuckets = 1).head()
    assert(fc.getAs[Long]("fc_bucket") === 0L)
    assert(fc.getAs[Int]("n_features") === 4)
    val json = fc.getAs[String]("collection_json")
    assert(json.startsWith("""{"type":"FeatureCollection","features":["""))
    assert(json.contains(""""coordinates":[-104.9,39.7]"""))
    // bucketed form partitions the same features
    val buckets = GeotabPipeline.featureCollections(run(), nBuckets = 3)
      .agg(org.apache.spark.sql.functions.sum($"n_features")).head().getLong(0)
    assert(buckets === 4)
  }

  test("cot xml: golden event output with escaping and fixed number renders") {
    val withXmlName = devices
      .withColumn("name",
        when($"id" === "d1", lit("A&B <Truck> \"One\"")).otherwise($"name"))
    val flat = GeotabPipeline.featuresFlat(withXmlName, infoDf, drivers,
      GeotabPipeline.Config(prefix = "A&B", now = lit(now)))
    val xml = GeotabPipeline.cotXml(flat)
      .filter($"id" === "geotab-d1").select("cot_xml").as[String].head()
    assert(xml ===
      "<event version=\"2.0\" uid=\"geotab-d1\" type=\"a-f-G-E-V-C\" how=\"m-g\"" +
        " time=\"2026-01-01T11:30:00Z\" start=\"2026-01-01T11:30:00Z\"" +
        " stale=\"2026-01-01T12:30:00Z\">" +
        "<point lat=\"39.7000\" lon=\"-104.9000\"" +
        " hae=\"9999999.0\" ce=\"9999999.0\" le=\"9999999.0\"/>" +
        "<detail><contact callsign=\"A&amp;B &lt;Truck&gt; &quot;One&quot;\"/>" +
        "<track speed=\"27.7778\" course=\"90.0000\"/>" +
        "<remarks>vin=V1</remarks></detail></event>", xml)
  }

  test("union-typed driver normalization discriminates string vs object (task.ts:25-31)") {
    val df = Seq(
      ("""{"id":"drv9","isDriver":true}"""),
      ("UnknownDriverId"),
      (null: String)
    ).toDF("driver")
      .select(GeotabSchemas.normalizeDriver($"driver").as("n"))
      .select($"n.driverId", $"n.driverIsObject")
    val rows = df.collect()
    assert(rows(0).getString(0) === "drv9" && rows(0).getBoolean(1))
    assert(rows(1).getString(0) === "UnknownDriverId" && !rows(1).getBoolean(1))
    assert(rows(2).isNullAt(0) && !rows(2).getBoolean(1))
  }
}
