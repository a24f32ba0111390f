package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GeoFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def dist(lat1: Double, lon1: Double, lat2: Double, lon2: Double): Double =
    Seq((lat1, lon1, lat2, lon2)).toDF("a", "b", "c", "d")
      .select(GeoFunctions.haversineKm($"a", $"b", $"c", $"d").as("km"))
      .as[Double].head()

  test("haversine matches known distances") {
    // Denver -> Boulder: ~38.6 km
    assert(math.abs(dist(39.7392, -104.9903, 40.0150, -105.2705) - 38.6) < 1.0)
    // one degree of latitude at the equator: ~111.19 km
    assert(math.abs(dist(0, 0, 1, 0) - 111.19) < 0.1)
    // antipodal points: half the Earth's circumference, ~20015 km
    assert(math.abs(dist(0, 0, 0, 180) - 20015.1) < 1.0)
  }

  test("haversine is zero for identical points and symmetric") {
    assert(dist(51.5, -0.12, 51.5, -0.12) === 0.0)
    val ab = dist(48.8566, 2.3522, 52.52, 13.405) // Paris <-> Berlin
    val ba = dist(52.52, 13.405, 48.8566, 2.3522)
    assert(math.abs(ab - ba) < 1e-9)
    assert(math.abs(ab - 877.5) < 2.0)
  }
}
