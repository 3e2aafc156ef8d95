package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** F7 — UTM ↔ geographic conversion parity with the reference's
  * seismic_reader example (examples/seismic_reader/utm.hh). */
class GeoSpec extends SparkSpec {
  import spark.implicits._

  test("utmToGeo matches the example's fixed points") {
    // the zone's anchor identities: at the false easting the longitude IS
    // the central meridian; at the equator (northing = false northing in
    // the southern-hemisphere convention) the latitude is 0
    val df = Seq((500000.0, 10000000.0)).toDF("e", "n")
      .select(Geo.utmToGeo(col("e"), col("n")).as("g"))
      .select($"g.lat", $"g.lon").as[(Double, Double)].head()
    assert(math.abs(df._1 - 0.0) < 1e-9)
    assert(math.abs(df._2 - 123.0) < 1e-9)
  }

  test("forward/inverse round-trip under 1 mm across the zone") {
    val pts = for {
      e <- Seq(300000.0, 500000.0, 700000.0)
      n <- Seq(7500000.0, 8200000.0, 9000000.0)
    } yield (e, n)
    val back = pts.toDF("e", "n")
      .select(col("e"), col("n"), Geo.utmToGeo(col("e"), col("n")).as("g"))
      .select(col("e"), col("n"), Geo.geoToUtm($"g.lat", $"g.lon").as("u"))
      .select(abs($"u.easting" - col("e")), abs($"u.northing" - col("n")))
      .as[(Double, Double)].collect()
    back.foreach { case (de, dn) =>
      assert(de < 1e-3 && dn < 1e-3, s"round-trip drift $de m / $dn m")
    }
  }

  test("latitudes are southern-hemisphere and monotonic in northing") {
    val lats = Seq((500000.0, 7500000.0), (500000.0, 8500000.0), (500000.0, 9500000.0))
      .toDF("e", "n")
      .select(Geo.utmToGeo(col("e"), col("n")).getField("lat")).as[Double].collect()
    assert(lats.forall(_ < 0.0)) // MGA Zone 51 covers Australia
    assert(lats.sorted.toSeq == lats.toSeq) // farther north -> larger (less negative)
  }

  test("geojson bounding box document shape") {
    val doc = Geo.geojsonBoundingBox(Seq((122.0, -20.0), (124.0, -20.0), (124.0, -18.0), (122.0, -18.0)))
    assert(doc.startsWith("""{"type":"Polygon""""))
    assert(doc.contains("[122.0,-20.0]") && doc.count(_ == '[') == 7) // ring closed
  }
}
