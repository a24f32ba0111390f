package graft.geotab

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's whole `control()` pipeline (task.ts:124-295) re-expressed
  * as declarative DataFrame transforms — one Catalyst plan with three scan
  * leaves, a broadcast inner join, a guarded broadcast left join, projection
  * and two filters. No driver-side Maps (the reference builds in-memory
  * hash maps, task.ts:221-229, which is O(dataset) driver memory); here the
  * optimizer picks broadcast-hash vs shuffled-hash vs sort-merge by size, so
  * the same code scales from one fleet to 100 TB of fleets.
  *
  * Input contracts:
  *  - devices: id, vehicleIdentificationNumber, licenseState, licensePlate, name
  *  - info:    device_id, dateTime (timestamp), latitude, longitude, speed
  *             (km/h), bearing, driverId, driverIsObject, groups
  *  - drivers: id, name, firstName, lastName, phoneNumber, designation, comment
  */
object GeotabPipeline {

  /** now/freshness parameterized so the correctness oracle can pin the same
    * boundary (the reference hard-codes wall-clock minus 1h, task.ts:231). */
  case class Config(
      prefix: String = "",              // name-prefix filter (task.ts:288-291)
      now: Column,                      // freshness boundary reference point
      freshness: String = "INTERVAL 1 HOUR", // task.ts:231: 3_600_000 ms
      speedFactor: Double = 0.277778)   // km/h -> m/s (task.ts:276)

  /** JS `||` semantics: replaces null AND empty string (task.ts:241-244). */
  private def orElseJs(c: Column, default: String): Column =
    when(c.isNull || c === "", lit(default)).otherwise(c)

  /** JS `??` semantics: replaces only null/undefined (task.ts:261-263). */
  private def orElseNullish(c: Column, default: String): Column =
    coalesce(c, lit(default))

  /** Flat feature projection: every output field of the reference's Feature
    * (task.ts:269-285) as a top-level column. [[geojson]] nests and
    * serializes this into the actual GeoJSON FeatureCollection rows.
    */
  def featuresFlat(devices: DataFrame, info: DataFrame, drivers: DataFrame,
                   cfg: Config): DataFrame = {
    // J3 (task.ts:236-237, 286-288): INNER devices ⋈ info on device id —
    // probe-miss rows are dropped, which is exactly inner-join semantics.
    // The reference builds a driver-side Map; we declare the join and let
    // Catalyst broadcast the small side (or shuffle at scale).
    val di = devices.join(info, devices("id") === info("device_id"), "inner")

    // F1 (task.ts:231, 265-267): freshness window — drop rows with
    // dateTime <= now - 1h. Strictly-older-or-equal dropped, like the
    // reference's `<= hourAgo` check.
    val fresh = di.filter(col("dateTime") > cfg.now - expr(cfg.freshness))

    // J4 (task.ts:248-258): LEFT join driver enrichment, guarded by the
    // union discriminator — the string variant must NOT join.
    val dr = drivers.select(
      col("id").as("d_id"), col("name").as("d_name"),
      col("firstName").as("d_firstName"), col("lastName").as("d_lastName"),
      col("phoneNumber").as("d_phoneNumber"),
      col("designation").as("d_designation"), col("comment").as("d_comment"))
    val joined = fresh.join(dr,
      fresh("driverIsObject") && (fresh("driverId") === dr("d_id")), "left")

    // P1-P9 projections (task.ts:239-285).
    val name = col("name")
    val callsign = when(name.isNotNull && name =!= "", name) // P3, task.ts:261-263
      .otherwise(concat(
        orElseNullish(col("licenseState"), "US"), lit("-"),
        orElseJs(col("licensePlate"), "Unknown")))

    val projected = joined.select(
      concat(lit("geotab-"), col("device_id")).as("id"),     // P4 task.ts:270
      callsign.as("callsign"),
      col("bearing").as("course"),                            // task.ts:274
      col("dateTime").as("start_ts"),                         // task.ts:275
      (col("speed") * cfg.speedFactor).as("speed_ms"),        // P5 task.ts:276
      col("longitude").as("longitude"),                       // P7 lon-first
      col("latitude").as("latitude"),
      col("vehicleIdentificationNumber").as("vin"),           // P1 task.ts:240
      orElseJs(col("licenseState"), "US").as("license_state"),    // P2
      orElseJs(col("licensePlate"), "Unknown").as("license_plate"),
      orElseJs(col("name"), "No Name").as("vehicle_name"),
      col("groups").as("groups"),
      col("d_name").as("driver_username"),                    // P9 task.ts:252-257
      col("d_firstName").as("driver_first_name"),
      col("d_lastName").as("driver_last_name"),
      col("d_phoneNumber").as("driver_phone"),
      col("d_designation").as("driver_designation"),
      col("d_comment").as("driver_comment"))

    // F3 (task.ts:288-291): name-prefix filter on the *metadata* name, i.e.
    // the default-filled vehicle name. Empty prefix matches all.
    if (cfg.prefix.isEmpty) projected
    else projected.filter(col("vehicle_name").startsWith(cfg.prefix))
  }

  /** Assemble the nested GeoJSON Feature rows (task.ts:269-285) and a
    * serialized JSON form — the sink payload shape (`FeatureCollection`
    * members submitted at task.ts:294).
    */
  def geojson(flat: DataFrame): DataFrame = {
    val feature = struct(
      col("id"),
      lit("Feature").as("type"),
      struct(
        col("callsign"), col("course"),
        date_format(col("start_ts"), "yyyy-MM-dd'T'HH:mm:ss'Z'").as("start"),
        col("speed_ms").as("speed"),
        struct(
          col("vin"), col("vehicle_name").as("name"),
          col("license_state").as("licenseState"),
          col("license_plate").as("licensePlate"),
          col("groups"),
          col("driver_username").as("driverUsername"),
          col("driver_first_name").as("firstName"),
          col("driver_last_name").as("lastName"),
          col("driver_phone").as("driverPhone"),
          col("driver_designation").as("designation"),
          col("driver_comment").as("comment")
        ).as("metadata")
      ).as("properties"),
      struct(
        lit("Point").as("type"),
        array(col("longitude"), col("latitude")).as("coordinates") // lon first, task.ts:281
      ).as("geometry"))
    flat.select(col("id").as("feature_id"), feature.as("feature"))
      .withColumn("feature_json", to_json(col("feature")))
  }

  /** Cursor-on-Target event XML per feature — the sink-side conversion the
    * reference delegates to `@tak-ps/node-cot` (package-lock.json:696-714;
    * submit at task.ts:294): uid/type/how/time/start/stale attributes, a
    * `point` with the lon-first pair restored to lat/lon attributes, and a
    * `detail` carrying contact callsign + track speed/course. Number
    * attributes render with fixed %.4f so the output is byte-stable across
    * engines; the three XML-special characters are escaped. Pure string
    * expressions — codegen'd, zero shuffle. */
  def cotXml(flat: DataFrame, staleAfter: String = "INTERVAL 1 HOUR"): DataFrame = {
    def esc(c: Column): Column =
      regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        c, "&", "&amp;"), "<", "&lt;"), ">", "&gt;"), "\"", "&quot;")
    def f4(c: Column): Column = format_string("%.4f", c)
    val fmt = "yyyy-MM-dd'T'HH:mm:ss'Z'"
    val t = date_format(col("start_ts"), fmt)
    val stale = date_format(col("start_ts") + expr(staleAfter), fmt)
    val xml = concat(
      lit("<event version=\"2.0\" uid=\""), col("id"),
      lit("\" type=\"a-f-G-E-V-C\" how=\"m-g\" time=\""), t,
      lit("\" start=\""), t,
      lit("\" stale=\""), stale,
      lit("\"><point lat=\""), f4(col("latitude")),
      lit("\" lon=\""), f4(col("longitude")),
      lit("\" hae=\"9999999.0\" ce=\"9999999.0\" le=\"9999999.0\"/>"),
      lit("<detail><contact callsign=\""), esc(col("callsign")),
      lit("\"/><track speed=\""), f4(col("speed_ms")),
      lit("\" course=\""), f4(col("course")),
      lit("\"/><remarks>vin="), esc(col("vin")),
      lit("</remarks></detail></event>"))
    flat.select(col("id"), xml.as("cot_xml"))
  }

  /** Assemble sink-batch FeatureCollections (the submit payload,
    * task.ts:233-234, 294) — `nBuckets` collections of roughly equal size,
    * bucketed by feature-id hash. The reference submits one fleet-sized
    * collection per run (nBuckets = 1); at scale, bucketing bounds each
    * payload instead of collecting the world into one JSON document. */
  def featureCollections(flat: DataFrame, nBuckets: Int = 1): DataFrame =
    geojson(flat)
      .withColumn("fc_bucket",
        abs(xxhash64(col("feature_id"))) % lit(nBuckets.max(1)))
      .groupBy(col("fc_bucket"))
      .agg(collect_list(col("feature")).as("features"))
      .select(col("fc_bucket"),
        to_json(struct(lit("FeatureCollection").as("type"), col("features")))
          .as("collection_json"),
        size(col("features")).as("n_features"))
}
