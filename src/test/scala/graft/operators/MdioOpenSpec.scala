package graft.operators

import graft.SparkSpec
import graft.sources.MdioWriter
import graft.spec.MdioSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The reference's full read path against real chunked storage:
  * Open → isel/sel (value-based via a dimension coordinate) → read
  * (mdio/dataset_test.cc create→write→reopen→verify shape). */
class MdioOpenSpec extends SparkSpec {
  import spark.implicits._

  private def build(): String = {
    val dir = Files.createTempDirectory("mdio_open").resolve("g.mdio").toString
    MdioWriter.create(MdioSpec.fromJson(
      """{
        |  "metadata": {"name": "g", "apiVersion": "v1.0", "createdOn": "2026-01-01T00:00:00Z"},
        |  "variables": [
        |    {"name": "inline", "dataType": "float64",
        |     "dimensions": [{"name": "inline", "size": 6}]},
        |    {"name": "crossline", "dataType": "float64",
        |     "dimensions": [{"name": "crossline", "size": 4}]},
        |    {"name": "cdp", "dataType": "float64",
        |     "dimensions": [{"name": "inline", "size": 6}, {"name": "crossline", "size": 4}]},
        |    {"name": "image", "dataType": "float64",
        |     "dimensions": [{"name": "inline", "size": 6}, {"name": "crossline", "size": 4}],
        |     "coordinates": ["cdp"],
        |     "metadata": {"chunkGrid": {"name": "regular", "configuration": {"chunkShape": [3, 2]}}}}
        |  ]
        |}""".stripMargin), dir)
    // dimension-coordinate values: inline -> 100 + 10*i; crossline -> 7 + x
    MdioWriter.writeVariable(spark,
      (0L until 6L).map(i => (i, 100.0 + 10 * i)).toDF("inline", "inline__value"),
      dir, "inline")
    MdioWriter.writeVariable(spark,
      (0L until 4L).map(x => (x, 7.0 + x)).toDF("crossline", "crossline__value"),
      dir, "crossline")
    val cells = for { i <- 0L until 6L; x <- 0L until 4L } yield (i, x, i * 100.0 + x)
    MdioWriter.writeVariable(spark, cells.toDF("inline", "crossline", "image"), dir, "image")
    MdioWriter.writeVariable(spark,
      cells.map { case (i, x, _) => (i, x, i * 1000.0 + x) }.toDF("inline", "crossline", "cdp"),
      dir, "cdp")
    dir
  }

  test("unitsV1 round-trips: typed accessor + StructField metadata (F6)") {
    val dir = build().stripSuffix("g.mdio") + "u.mdio"
    MdioWriter.create(MdioSpec.fromJson(
      """{
        |  "metadata": {"name": "u", "apiVersion": "v1.0", "createdOn": "2026-01-01T00:00:00Z"},
        |  "variables": [
        |    {"name": "depth", "dataType": "int64",
        |     "dimensions": [{"name": "depth", "size": 4}],
        |     "metadata": {"unitsV1": {"length": "m"}}},
        |    {"name": "velocity", "dataType": "float64",
        |     "dimensions": [{"name": "depth", "size": 4}],
        |     "metadata": {"unitsV1": [{"speed": "m/s"}]}}
        |  ]
        |}""".stripMargin), dir)
    MdioWriter.writeVariable(spark,
      (0L until 4L).map(d => (d, d * 1500.0)).toDF("depth", "velocity"), dir, "velocity")
    val ds = MdioDataset.open(spark, dir)
    assert(ds.unitsOf("velocity") == Seq("speed" -> "m/s"))
    assert(ds.unitsOf("depth") == Seq("length" -> "m"))
    assert(ds.unitsOf("nope") == Nil)
    // and the connector surfaces units as column metadata
    val f = spark.read.format("mdio").load(dir).schema("velocity")
    assert(f.metadata.getMetadata("unitsV1").getString("speed") == "m/s")
    MdioWriter.delete(dir)
  }

  test("open exposes data vars, dims, domain, and coordinate variables") {
    val dir = build()
    val ds = MdioDataset.open(spark, dir)
    assert(ds.dims == Seq("inline", "crossline"))
    assert(ds.domain == Map("inline" -> (0L, 6L), "crossline" -> (0L, 4L)))
    assert(ds.coords.keySet == Set("inline", "crossline", "cdp"))
    assert(ds.data.columns.toSet == Set("inline", "crossline", "image"))
    assert(ds.data.count() == 24)
    MdioWriter.delete(dir)
  }

  test("sel by dimension-coordinate value against real storage (P7)") {
    val dir = build()
    val ds = MdioDataset.open(spark, dir)
    val hit = ds.sel("inline", lit(120.0)) // inline value 120 -> index 2
    val rows = hit.data.select("inline", "crossline", "image")
      .as[(Long, Long, Double)].collect().toSet
    assert(rows == (0L until 4L).map(x => (2L, x, 200.0 + x)).toSet)
    MdioWriter.delete(dir)
  }

  test("selRange stop-inclusive + isel compose against storage (P8+P4)") {
    val dir = build()
    val ds = MdioDataset.open(spark, dir)
    val sub = ds.selRange("crossline", lit(8.0), lit(9.0)) // -> x in {1,2}
      .isel("inline", 0L, 2L)
    assert(sub.data.count() == 4)
    MdioWriter.delete(dir)
  }

  test("withCoordinate attaches a 2-D listed coordinate (J3)") {
    val dir = build()
    val ds = MdioDataset.open(spark, dir)
    val joined = ds.withCoordinate("cdp").data
    assert(joined.filter(col("cdp") =!= col("inline") * 1000.0 - col("inline") * 1000.0
      + col("inline") * 1000.0 + col("crossline")).count() == 0)
    assert(joined.count() == 24)
    MdioWriter.delete(dir)
  }

  test("attachVariable aligns a lower-rank variable on shared dims (J1)") {
    val dir = Files.createTempDirectory("mdio_j1").resolve("j.mdio").toString
    MdioWriter.create(MdioSpec.fromJson(
      """{
        |  "metadata": {"name": "j", "apiVersion": "v1.0", "createdOn": "2026-01-01T00:00:00Z"},
        |  "variables": [
        |    {"name": "inline", "dataType": "int64",
        |     "dimensions": [{"name": "inline", "size": 4}]},
        |    {"name": "depth", "dataType": "int64",
        |     "dimensions": [{"name": "depth", "size": 3}]},
        |    {"name": "velocity", "dataType": "float64",
        |     "dimensions": [{"name": "depth", "size": 3}]},
        |    {"name": "image", "dataType": "float64",
        |     "dimensions": [{"name": "inline", "size": 4}, {"name": "depth", "size": 3}]}
        |  ]
        |}""".stripMargin), dir)
    val cells = for { i <- 0L until 4L; z <- 0L until 3L } yield (i, z, i * 10.0 + z)
    MdioWriter.writeVariable(spark, cells.toDF("inline", "depth", "image"), dir, "image")
    MdioWriter.writeVariable(spark,
      (0L until 3L).map(z => (z, 1500.0 + z * 100)).toDF("depth", "velocity"), dir, "velocity")

    // open() grids on the highest-rank tuple (image); velocity attaches
    val ds = MdioDataset.open(spark, dir)
    assert(ds.dims == Seq("inline", "depth"))
    assert(ds.data.columns.contains("image") && !ds.data.columns.contains("velocity"))
    val joined = MdioDataset.attachVariable(spark, ds, dir, "velocity")
    assert(joined.data.count() == 12)
    val bad = joined.data
      .filter(col("velocity") =!= (lit(1500.0) + col("depth") * 100)).count()
    assert(bad == 0)
    MdioWriter.delete(dir)
  }
}
