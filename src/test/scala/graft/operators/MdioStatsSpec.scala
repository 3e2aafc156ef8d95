package graft.operators

import graft.SparkSpec
import graft.sources.MdioWriter
import graft.spec.MdioSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

class MdioStatsSpec extends SparkSpec {
  import spark.implicits._

  test("one-pass statsV1 aggregator matches independent aggregates") {
    val data = (1 to 1000).map(i => (i.toLong % 10, i.toLong / 10, (i % 97).toDouble))
      .toDF("x", "y", "v")
    val ds = MdioDataset(data, Seq("x", "y"), Map("x" -> (0L, 10L), "y" -> (0L, 101L)))
    val s = MdioStats.compute(spark, ds, "v", histLo = 0.0, histWidth = 10.0, histBins = 10)
    assert(s.count == 1000)
    assert(s.min == 0.0 && s.max == 96.0)
    assert(math.abs(s.sum - (1 to 1000).map(_ % 97).sum) < 1e-6)
    assert(math.abs(s.sumSquares - (1 to 1000).map(i => (i % 97) * (i % 97)).sum) < 1e-6)
    assert(s.histogram.counts.sum == 1000)
    assert(s.histogram.binCenters == (0 until 10).map(i => i * 10.0 + 5.0))
    // histogram bin 0 = values in [0,10)
    assert(s.histogram.counts.head == (1 to 1000).count(i => (i % 97) < 10))
  }

  test("attach persists statsV1 into variable attributes (A3+S10)") {
    val dir = Files.createTempDirectory("mdio_stats").resolve("s.mdio").toString
    MdioWriter.create(MdioSpec.fromJson(
      """{
        |  "metadata": {"name": "s", "apiVersion": "v1.0", "createdOn": "2026-01-01T00:00:00Z"},
        |  "variables": [
        |    {"name": "d", "dataType": "int64", "dimensions": [{"name": "d", "size": 4}]},
        |    {"name": "v", "dataType": "float64", "dimensions": [{"name": "d", "size": 4}]}
        |  ]
        |}""".stripMargin), dir)
    MdioWriter.writeVariable(spark,
      (0L until 4L).map(i => (i, i * 2.0)).toDF("d", "v"), dir, "v")
    val ds = MdioDataset.open(spark, dir)
    val s = MdioStats.compute(spark, ds, "v", 0.0, 2.0, 4)
    MdioStats.attach(dir, "v", s)
    val (_, arrays) = graft.zarr.ZarrMeta.readGroup(graft.zarr.ZarrMeta.path(dir))
    val attrs = arrays("v")._2.get
    assert(attrs.contains("\"statsV1\"") && attrs.contains("\"count\":4"))
    assert(attrs.contains("_ARRAY_DIMENSIONS")) // merge-patch preserved
    MdioWriter.delete(dir)
  }

  test("header variables round-trip content through attributes (S13)") {
    val dir = Files.createTempDirectory("mdio_hdr").resolve("h.mdio").toString
    MdioWriter.create(MdioSpec.fromJson(
      """{
        |  "metadata": {"name": "h", "apiVersion": "v1.0", "createdOn": "2026-01-01T00:00:00Z"},
        |  "variables": [
        |    {"name": "d", "dataType": "int64", "dimensions": [{"name": "d", "size": 2}]},
        |    {"name": "v", "dataType": "float64", "dimensions": [{"name": "d", "size": 2}]}
        |  ]
        |}""".stripMargin), dir)
    MdioWriter.writeVariable(spark, (0L until 2L).map(i => (i, i * 1.0)).toDF("d", "v"), dir, "v")
    MdioWriter.writeHeader(dir, "segy_file_header",
      """{"textHeader": "C01 CLIENT", "binaryHeader": {"sampleRate": 4000}}""")
    val got = MdioWriter.readHeader(dir, "segy_file_header").get
    assert(got.contains("\"sampleRate\":4000"))
    // header nodes are invisible to the table reader (no array to scan)
    val df = spark.read.format("mdio").load(dir)
    assert(!df.columns.contains("segy_file_header"))
    assert(MdioWriter.readHeader(dir, "d").isEmpty) // real arrays are not headers
    MdioWriter.delete(dir)
  }

  test("generation-checked attribute commit detects concurrent writers") {
    val dir = Files.createTempDirectory("mdio_gen").resolve("g.mdio").toString
    MdioWriter.create(MdioSpec.fromJson(
      """{
        |  "metadata": {"name": "g", "apiVersion": "v1.0", "createdOn": "2026-01-01T00:00:00Z"},
        |  "variables": [
        |    {"name": "d", "dataType": "int64", "dimensions": [{"name": "d", "size": 2}]},
        |    {"name": "v", "dataType": "float64", "dimensions": [{"name": "d", "size": 2}]}
        |  ]
        |}""".stripMargin), dir)
    assert(MdioWriter.generation(dir) == 0L)
    val g1 = MdioWriter.updateAttributesIf(dir, "v", """{"a": 1}""", expected = 0L)
    assert(g1 == 1L && MdioWriter.generation(dir) == 1L)
    // a second writer still holding generation 0 must be rejected
    intercept[java.util.ConcurrentModificationException] {
      MdioWriter.updateAttributesIf(dir, "v", """{"a": 2}""", expected = 0L)
    }
    // and the winning writer's value survived
    val (_, arrays) = graft.zarr.ZarrMeta.readGroup(graft.zarr.ZarrMeta.path(dir))
    assert(arrays("v")._2.get.contains("\"a\":1"))
    MdioWriter.delete(dir)
  }
}
