package graft.geotab

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Declared, validated schemas for the three Geotab entity streams, mirroring
  * the reference's TypeBox declarations (reference: task.ts:12-36 DeviceInfo,
  * task.ts:39-47 Driver, task.ts:49-55 Device). Schema-on-read with hard
  * validation: ingest uses FAILFAST from_json so a non-conforming payload
  * fails the run, like the reference's `req.typed(schema)` (task.ts:161-163).
  */
object GeotabSchemas {

  private val idStruct = StructType(Seq(StructField("id", StringType, nullable = false)))

  /** DeviceStatusInfo (task.ts:12-36). The union-typed `driver` field
    * (string | object, task.ts:25-31) is carried as a raw JSON string here
    * and normalized by [[normalizeDriver]] — Spark has no union type, so the
    * ingest contract is a discriminated pair (driverId, driverIsObject).
    */
  val deviceInfo: StructType = StructType(Seq(
    StructField("bearing", DoubleType),
    StructField("currentStateDuration", StringType),
    // Type.Array(Type.Unknown()) (task.ts:15): elements are arbitrary JSON,
    // so the whole array is carried VERBATIM as its raw JSON text (Spark's
    // JSON parser preserves raw text for StringType fields holding
    // structured values) — never read by the pipeline, but not dropped:
    // downstream consumers can get_json_object/from_json into it.
    StructField("exceptionEvents", StringType),
    StructField("isDeviceCommunicating", BooleanType),
    StructField("isDriving", BooleanType),
    StructField("latitude", DoubleType),
    StructField("longitude", DoubleType),
    StructField("speed", DoubleType),
    StructField("dateTime", StringType), // ISO-8601; parsed at ingest
    StructField("device", idStruct),
    StructField("driver", StringType), // raw JSON: string variant or object
    StructField("isHistoricLastDriver", BooleanType),
    StructField("groups", ArrayType(idStruct))
  ))

  /** Device registry entry (task.ts:49-55). */
  val device: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("vehicleIdentificationNumber", StringType),
    StructField("licenseState", StringType),
    StructField("licensePlate", StringType),
    StructField("name", StringType)
  ))

  /** Driver / User (task.ts:39-47). */
  val driver: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("name", StringType),
    StructField("comment", StringType),
    StructField("phoneNumber", StringType),
    StructField("firstName", StringType),
    StructField("lastName", StringType),
    StructField("designation", StringType)
  ))

  /** Discriminate the union-typed `driver` payload (task.ts:25-31, guard at
    * task.ts:248): the object variant parses as JSON with an `id` field; the
    * string variant (e.g. "UnknownDriverId") does not. Returns a struct
    * (driverId string, driverIsObject boolean).
    */
  def normalizeDriver(driverRaw: Column): Column = {
    val parsed = from_json(driverRaw, StructType(Seq(StructField("id", StringType))))
    val isObject = driverRaw.isNotNull && driverRaw.startsWith("{") && parsed.getField("id").isNotNull
    struct(
      when(isObject, parsed.getField("id")).otherwise(driverRaw).as("driverId"),
      isObject.as("driverIsObject"))
  }

  /** FAILFAST JSON ingest, reproducing `req.typed()` throw-on-mismatch. */
  def typedIngest(raw: Column, schema: StructType): Column =
    from_json(raw, schema, Map("mode" -> "FAILFAST"))

  /** Flat output-contract schema of the feature pipeline (the engine's
    * analogue of SchemaOutput, task.ts:79-91). */
  val featureFlat: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("callsign", StringType),
    StructField("course", DoubleType),
    StructField("start_ts", TimestampType),
    StructField("speed_ms", DoubleType),
    StructField("longitude", DoubleType),
    StructField("latitude", DoubleType),
    StructField("vin", StringType),
    StructField("license_state", StringType),
    StructField("license_plate", StringType),
    StructField("vehicle_name", StringType),
    StructField("groups", StringType),
    StructField("driver_username", StringType),
    StructField("driver_first_name", StringType),
    StructField("driver_last_name", StringType),
    StructField("driver_phone", StringType),
    StructField("driver_designation", StringType),
    StructField("driver_comment", StringType)))

  /** Schema introspection (reference entry point C, task.ts:109-122): the
    * platform asks for input or output contract; unused combinations return
    * an empty struct like the reference's `Type.Object({})`. */
  def describe(schemaType: String, flow: String): StructType =
    (schemaType, flow) match {
      case ("input", "incoming") => deviceInfo
      case ("output", "incoming") => featureFlat
      case _ => StructType(Nil)
    }

  /** JSON form for contract registration (StructType.json). */
  def describeJson(schemaType: String, flow: String): String =
    describe(schemaType, flow).json
}
