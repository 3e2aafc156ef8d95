package graft.operators

import graft.SparkSpec
import graft.tools.SeismicDemo
import org.apache.spark.sql.functions._

/** The reference's canonical seismic workflow (examples/seismic_reader.cc
  * shape) end to end: cube build → aligned parallel write → labeled open
  * with 2-D geometry alignment → section/slice reads → statsV1 attach →
  * UTM corner inversion. Values pinned against the synthetic wavefield. */
class SeismicWorkflowSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dir =
    java.nio.file.Files.createTempDirectory("seismic").resolve("survey.mdio").toString
  private lazy val cube = {
    SeismicDemo.build(spark, dir)
    SeismicDemo.open(spark, dir)
  }

  test("every cell of an inline section reads back exactly") {
    val got = cube.isel("inline", 12L, 13L).data
      .select("crossline", "depth", "amplitude")
      .as[(Long, Long, Float)].collect().map { case (x, z, a) => (x, z) -> a }.toMap
    assert(got.size == (SeismicDemo.nXl * SeismicDemo.nZ).toInt)
    for (x <- 0L until SeismicDemo.nXl; z <- 0L until SeismicDemo.nZ)
      assert(got((x, z)) == SeismicDemo.amplitude(12L, x, z), s"cell ($x,$z)")
  }

  test("depth-slice means match the wavefield, computed in one aggregation") {
    val got = cube.data.groupBy(col("depth"))
      .agg(avg(col("amplitude").cast("double")).as("m"))
      .as[(Long, Double)].collect().toMap
    val z = 7L
    val want = (for { il <- 0L until SeismicDemo.nIl; xl <- 0L until SeismicDemo.nXl }
      yield SeismicDemo.amplitude(il, xl, z).toDouble).sum /
      (SeismicDemo.nIl * SeismicDemo.nXl)
    assert(math.abs(got(z) - want) < 1e-9, s"slice $z: ${got(z)} vs $want")
    assert(got.size == SeismicDemo.nZ.toInt)
  }

  test("UTM survey corners invert to plausible zone-51-south lat/lon") {
    val g = cube.data.agg(
      min(col("cdp_x")).as("e0"), max(col("cdp_x")).as("e1"),
      min(col("cdp_y")).as("n0"), max(col("cdp_y")).as("n1")).first()
    assert(g.getDouble(0) == 350000.0 && g.getDouble(1) == 350000.0 + 25.0 * 31)
    assert(g.getDouble(2) == 7600000.0 && g.getDouble(3) == 7600000.0 + 25.0 * 31)
    val corner = Seq((g.getDouble(0), g.getDouble(2))).toDF("e", "n")
      .select(graft.functions.Geo.utmToGeo(col("e"), col("n")).as("g"))
      .select("g.lat", "g.lon").as[(Double, Double)].head()
    // MGA zone 51 south, northing 7.6e6 ≈ 21.7°S, central meridian 123°E
    assert(corner._1 < -15 && corner._1 > -30, s"lat ${corner._1}")
    assert(corner._2 > 120 && corner._2 < 126, s"lon ${corner._2}")
  }

  test("bare insertAligned works on a multi-tuple store (scoped to df's variables)") {
    // the build above already used insertAligned on a store holding a 3-D
    // amplitude plus 2-D geometry; overwrite one chunk-aligned slab and
    // check both the slab and the geometry survive
    val slab = (for { il <- 0L until 16L; xl <- 0L until 16L; z <- 0L until 32L }
      yield (il, xl, z, 9.5f)).toDF("inline", "crossline", "depth", "amplitude")
    graft.sources.MdioWriter.insertAligned(slab, dir)
    val reopened = SeismicDemo.open(spark, dir)
    val probe = reopened.data
      .filter(col("inline") === 3 && col("crossline") === 3 && col("depth") === 3)
      .select("amplitude", "cdp_x").as[(Float, Double)].head()
    assert(probe._1 == 9.5f, "slab write must land")
    assert(probe._2 == 350000.0 + 25.0 * 3, "geometry must survive the slab write")
    val untouched = reopened.data
      .filter(col("inline") === 20 && col("crossline") === 20 && col("depth") === 40)
      .select("amplitude").as[Float].head()
    assert(untouched == SeismicDemo.amplitude(20, 20, 40), "other chunks untouched")
  }

  test("store lifecycle on the 3-D cube: transpose -> extract -> concat stay exact") {
    // the depth-slice optimization story end to end: flip amplitude to
    // (depth, inline, crossline) storage, cut the target subcube, then
    // merge two "campaigns" — every cell checked against the wavefield
    val base = java.nio.file.Files.createTempDirectory("seismic_lc")
      .resolve("s.mdio").toString
    SeismicDemo.build(spark, base)
    val MW = graft.sources.MdioWriter
    val tp = base + "_tp"
    MW.transpose(spark, base, tp,
      Map("amplitude" -> Seq("depth", "inline", "crossline")))
    val ex = base + "_ex"
    MW.extract(spark, tp, ex, Map("inline" -> (8L, 16L), "depth" -> (16L, 48L)))
    val cells = spark.read.format("mdio").option("variables", "amplitude").load(ex)
      .select("inline", "crossline", "depth", "amplitude")
      .as[(Long, Long, Long, Float)].collect()
    assert(cells.length == 8 * SeismicDemo.nXl.toInt * 32)
    cells.foreach { case (il, xl, z, a) =>
      assert(a == SeismicDemo.amplitude(il + 8, xl, z + 16),
        s"extracted cell ($il,$xl,$z)") }
    // the 2-D geometry followed the inline cut
    val geo = graft.zarr.ZarrMeta.readGroup(graft.zarr.ZarrMeta.path(ex))._2
    assert(geo("cdp_x")._1.shape == Seq(8L, SeismicDemo.nXl))
    val cc = base + "_cc"
    MW.concat(spark, ex, ex, cc, "crossline")
    val seam = spark.read.format("mdio").option("variables", "amplitude").load(cc)
      .filter(col("inline") === 2 && col("depth") === 5 &&
        (col("crossline") === 7 || col("crossline") === SeismicDemo.nXl + 7))
      .select("crossline", "amplitude").as[(Long, Float)].collect().toMap
    assert(seam.size == 2 &&
      seam(7L) == seam(SeismicDemo.nXl + 7) &&
      seam(7L) == SeismicDemo.amplitude(10, 7, 21),
      s"campaign B must mirror campaign A across the seam: $seam")
    Seq(cc, ex, tp, base).foreach(MW.delete)
  }

  test("statsV1 attaches into variable attributes and survives re-read") {
    val stats = MdioStats.compute(spark, cube, "amplitude",
      histLo = -2.0, histWidth = 0.5, histBins = 16)
    assert(stats.count == SeismicDemo.nIl * SeismicDemo.nXl * SeismicDemo.nZ)
    MdioStats.attach(dir, "amplitude", stats)
    val attrs = graft.zarr.ZarrMeta.readGroup(graft.zarr.ZarrMeta.path(dir))
      ._2("amplitude")._2.map(_.toString).getOrElse("")
    assert(attrs.contains("statsV1") && attrs.contains("\"count\""),
      s"statsV1 missing from attributes: ${attrs.take(200)}")
  }
}
