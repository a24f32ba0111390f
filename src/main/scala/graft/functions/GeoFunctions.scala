package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Geo helpers (SURVEY.md §2.7 "optionally haversine_km"): pure built-in
  * arithmetic — radians/sin/cos/asin/sqrt compose into one codegen'd
  * expression tree, so no custom Expression is needed. The evaluation
  * order is written out explicitly and mirrored term-by-term in the DuckDB
  * oracle; trig libraries may differ in the last ulp, which the gate's
  * rounding absorbs. */
object GeoFunctions {

  /** Mean Earth radius (IUGG R1), km. */
  private[functions] val EarthRadiusKm = 6371.0088

  /** Great-circle distance in km between (lat1, lon1) and (lat2, lon2),
    * all in degrees, via the haversine formula:
    * 2R·asin(√(sin²(Δlat/2) + cos(lat1)·cos(lat2)·sin²(Δlon/2))). */
  def haversineKm(lat1: Column, lon1: Column,
                  lat2: Column, lon2: Column): Column = {
    val sLat = sin(radians(lat2 - lat1) / 2)
    val sLon = sin(radians(lon2 - lon1) / 2)
    val a = sLat * sLat + cos(radians(lat1)) * cos(radians(lat2)) * sLon * sLon
    lit(2 * EarthRadiusKm) * asin(sqrt(a))
  }
}
