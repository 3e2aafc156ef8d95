package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Geodetic helpers (F7): UTM ↔ geographic conversion as pure column
  * expressions — the Spark-native form of the reference's seismic_reader
  * example (`examples/seismic_reader/utm.hh:82-147` utm_to_geo for
  * GDA94 / MGA Zone 51), used there to turn dataset corner extents into
  * map coordinates.
  *
  * Everything is `org.apache.spark.sql.functions` math, so the conversion
  * runs inside whole-stage codegen over any number of rows — corner
  * extents of a 100 TB survey or per-trace coordinates alike. The series
  * expansions are the standard public transverse-Mercator formulas
  * (Snyder, "Map Projections – A Working Manual", USGS PP 1395, 1987).
  */
object Geo {

  /** Projection constants: GRS80 ellipsoid + transverse-Mercator zone
    * parameters (defaults = GDA94 / MGA Zone 51, EPSG:28351, matching the
    * reference example). */
  final case class TmZone(
      a: Double = 6378137.0,            // semi-major axis
      f: Double = 1.0 / 298.257222101,  // flattening (GRS80)
      k0: Double = 0.9996,              // scale factor
      centralMeridianDeg: Double = 123.0,
      falseEasting: Double = 500000.0,
      falseNorthing: Double = 10000000.0) {
    val e2: Double = 2 * f - f * f
    val ePrime2: Double = e2 / (1 - e2)
  }

  val mgaZone51: TmZone = TmZone()

  /** UTM (easting, northing) → struct(lat, lon) in decimal degrees
    * (inverse transverse Mercator, utm.hh:82-147).
    *
    * DELIBERATE DEVIATION from the reference example: utm.hh:131 scales
    * the latitude series by `tanφ/(R1·N1)` where Snyder 8-17 has
    * `N1·tanφ/R1` — the example's form mis-places latitudes by up to
    * ~1.3 km at the zone edge and does not round-trip with the forward
    * projection. This implementation uses the published Snyder form,
    * verified by the sub-millimeter forward/inverse round-trip in
    * GeoSpec. */
  def utmToGeo(easting: Column, northing: Column, z: TmZone = mgaZone51): Column = {
    val x = easting.cast("double") - lit(z.falseEasting)
    val y = northing.cast("double") - lit(z.falseNorthing)
    val m = y / lit(z.k0)
    val e2 = z.e2
    val mu = m / lit(z.a * (1 - e2 / 4 - 3 * e2 * e2 / 64 - 5 * e2 * e2 * e2 / 256))
    val e1 = (1 - math.sqrt(1 - e2)) / (1 + math.sqrt(1 - e2))
    val j1 = 3 * e1 / 2 - 27 * e1 * e1 * e1 / 32
    val j2 = 21 * e1 * e1 / 16 - 55 * e1 * e1 * e1 * e1 / 32
    val j3 = 151 * e1 * e1 * e1 / 96
    val j4 = 1097 * e1 * e1 * e1 * e1 / 512
    val fp = mu + lit(j1) * sin(mu * 2) + lit(j2) * sin(mu * 4) +
      lit(j3) * sin(mu * 6) + lit(j4) * sin(mu * 8)
    val cosFp = cos(fp); val sinFp = sin(fp); val tanFp = tan(fp)
    val c1 = lit(z.ePrime2) * cosFp * cosFp
    val t1 = tanFp * tanFp
    val r1 = lit(z.a * (1 - e2)) / pow(lit(1.0) - lit(e2) * sinFp * sinFp, 1.5)
    val n1 = lit(z.a) / sqrt(lit(1.0) - lit(e2) * sinFp * sinFp)
    val d = x / (n1 * lit(z.k0))
    val latRad = fp - (n1 * tanFp / r1) * (
      pow(d, 2) / 2 -
        (lit(5.0) + lit(3.0) * t1 + lit(10.0) * c1 - lit(4.0) * c1 * c1 -
          lit(9.0 * z.ePrime2)) * pow(d, 4) / 24 +
        (lit(61.0) + lit(90.0) * t1 + lit(298.0) * c1 + lit(45.0) * t1 * t1 -
          lit(252.0 * z.ePrime2) - lit(3.0) * c1 * c1) * pow(d, 6) / 720)
    val lonRad = lit(math.toRadians(z.centralMeridianDeg)) + (
      d -
        (lit(1.0) + lit(2.0) * t1 + c1) * pow(d, 3) / 6 +
        (lit(5.0) - lit(2.0) * c1 + lit(28.0) * t1 - lit(3.0) * c1 * c1 +
          lit(8.0 * z.ePrime2) + lit(24.0) * t1 * t1) * pow(d, 5) / 120
      ) / cosFp
    struct(degrees(latRad).as("lat"), degrees(lonRad).as("lon"))
  }

  /** Geographic (lat, lon) degrees → struct(easting, northing) meters
    * (forward transverse Mercator, Snyder 8-9..8-13) — the inverse's
    * round-trip partner: |geoToUtm(utmToGeo(p)) - p| < 1 mm over a zone,
    * pinned in GeoSpec without any cross-engine trig-exactness coupling. */
  def geoToUtm(latDeg: Column, lonDeg: Column, z: TmZone = mgaZone51): Column = {
    val lat = radians(latDeg.cast("double"))
    val lon = radians(lonDeg.cast("double"))
    val e2 = z.e2
    val sinLat = sin(lat); val cosLat = cos(lat); val tanLat = tan(lat)
    val n = lit(z.a) / sqrt(lit(1.0) - lit(e2) * sinLat * sinLat)
    val t = tanLat * tanLat
    val c = lit(z.ePrime2) * cosLat * cosLat
    val aa = (lon - lit(math.toRadians(z.centralMeridianDeg))) * cosLat
    val m = lit(z.a) * (
      lit(1 - e2 / 4 - 3 * e2 * e2 / 64 - 5 * e2 * e2 * e2 / 256) * lat -
        lit(3 * e2 / 8 + 3 * e2 * e2 / 32 + 45 * e2 * e2 * e2 / 1024) * sin(lat * 2) +
        lit(15 * e2 * e2 / 256 + 45 * e2 * e2 * e2 / 1024) * sin(lat * 4) -
        lit(35 * e2 * e2 * e2 / 3072) * sin(lat * 6))
    val easting = lit(z.falseEasting) + lit(z.k0) * n * (
      aa + (lit(1.0) - t + c) * pow(aa, 3) / 6 +
        (lit(5.0) - lit(18.0) * t + t * t + lit(72.0) * c - lit(58.0 * z.ePrime2)) *
          pow(aa, 5) / 120)
    val northing = lit(z.falseNorthing) + lit(z.k0) * (m + n * tanLat * (
      pow(aa, 2) / 2 + (lit(5.0) - t + lit(9.0) * c + lit(4.0) * c * c) * pow(aa, 4) / 24 +
        (lit(61.0) - lit(58.0) * t + t * t + lit(600.0) * c - lit(330.0 * z.ePrime2)) *
          pow(aa, 6) / 720))
    struct(easting.as("easting"), northing.as("northing"))
  }

  /** GeoJSON bounding-box document for UTM corner extents — the reference
    * example's encodeGeoJSONBoundingBoxURL payload
    * (utm.hh:186-230), minus the web-map URL wrapper. Driver-side
    * convenience over four converted corners. */
  def geojsonBoundingBox(corners: Seq[(Double, Double)]): String = {
    val ring = (corners :+ corners.head)
      .map { case (lon, lat) => s"[$lon,$lat]" }.mkString(",")
    s"""{"type":"Polygon","coordinates":[[$ring]]}"""
  }
}
