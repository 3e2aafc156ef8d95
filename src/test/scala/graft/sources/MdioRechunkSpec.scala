package graft.sources

import graft.SparkSpec
import graft.spec.MdioSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** [[MdioWriter.rechunk]]: store-to-store chunk-grid migration. */
class MdioRechunkSpec extends SparkSpec {
  import spark.implicits._

  private def create(): String = {
    val dir = Files.createTempDirectory("mdio_rc").resolve("src.mdio").toString
    MdioWriter.create(MdioSpec.fromJson(
      """{
        |  "metadata": {"name": "rc", "apiVersion": "v1.0", "createdOn": "2026-01-01T00:00:00Z"},
        |  "variables": [
        |    {"name": "inline", "dataType": "int64",
        |     "dimensions": [{"name": "inline", "size": 8}]},
        |    {"name": "crossline", "dataType": "int64",
        |     "dimensions": [{"name": "crossline", "size": 6}]},
        |    {"name": "cdp-x", "dataType": "float32",
        |     "dimensions": [{"name": "inline", "size": 8}, {"name": "crossline", "size": 6}],
        |     "metadata": {"unitsV1": {"length": "m"},
        |                  "chunkGrid": {"name": "regular", "configuration": {"chunkShape": [4, 3]}}}},
        |    {"name": "image", "dataType": "float64",
        |     "dimensions": [{"name": "inline", "size": 8}, {"name": "crossline", "size": 6}],
        |     "compressor": {"name": "zstd"},
        |     "coordinates": ["cdp-x"],
        |     "metadata": {"chunkGrid": {"name": "regular", "configuration": {"chunkShape": [4, 3]}}}},
        |    {"name": "mask", "dataType": "int32",
        |     "dimensions": [{"name": "inline", "size": 8}, {"name": "crossline", "size": 6}],
        |     "metadata": {"chunkGrid": {"name": "regular", "configuration": {"chunkShape": [4, 3]}}}}
        |  ]
        |}""".stripMargin), dir)
    val cells = for { i <- 0L until 8L; x <- 0L until 6L }
      yield (i, x, (i * 10 + x).toDouble, ((i + x) % 5).toInt, (i + x * 0.5).toFloat)
    val df = cells.toDF("inline", "crossline", "image", "mask", "cdp-x")
    MdioWriter.writeVariable(spark, df.select("inline", "crossline", "image"), dir, "image")
    MdioWriter.writeVariable(spark, df.select("inline", "crossline", "mask"), dir, "mask")
    MdioWriter.writeVariable(spark, df.select("inline", "crossline", "cdp-x"), dir, "cdp-x")
    MdioWriter.writeVariable(spark,
      spark.range(8).select(col("id").as("inline"), (col("id") * 100).as("inline__value")),
      dir, "inline")
    dir
  }

  test("rechunk: cell-identical data, new chunk grid on disk, metadata carried") {
    val src = create()
    val dst = src + "_rc"
    MdioWriter.rechunk(spark, src, dst,
      Map("image" -> Seq(2L, 6L), "mask" -> Seq(8L, 2L)))
    // every cell of every variable survives the migration exactly (the
    // variables now live on different chunk grids, so scan them one by one)
    def cells[T: org.apache.spark.sql.Encoder](p: String, v: String) =
      spark.read.format("mdio").option("variables", v).load(p)
        .select(col("inline"), col("crossline"), col(s"`$v`"))
        .as[T].collect().toSet
    assert(cells[(Long, Long, Double)](dst, "image") == cells[(Long, Long, Double)](src, "image"))
    assert(cells[(Long, Long, Int)](dst, "mask") == cells[(Long, Long, Int)](src, "mask"))
    assert(cells[(Long, Long, Float)](dst, "cdp-x") == cells[(Long, Long, Float)](src, "cdp-x"))
    // the destination grid is the REQUESTED one: image 2x6 -> chunks 4x1,
    // mask 8x2 -> 1x3, cdp-x untouched -> keeps 4x3 -> 2x2
    val root = graft.zarr.ZarrMeta.path(dst)
    val (_, arrays) = graft.zarr.ZarrMeta.readGroup(root)
    assert(arrays("image")._1.chunks == Seq(2L, 6L))
    assert(arrays("mask")._1.chunks == Seq(8L, 2L))
    assert(arrays("cdp-x")._1.chunks == Seq(4L, 3L))
    assert(root.resolve("image").list().map(_.name).toSet
      .intersect(Set("0.0", "1.0", "2.0", "3.0")).size == 4)
    // compressor, coordinates attr, units metadata, dim coordinate values
    assert(arrays("image")._1.compressor.contains("zstd"))
    assert(arrays("image")._2.exists(MdioTableUtil.coordinatesAttr(_) == Seq("cdp-x")))
    assert(arrays("cdp-x")._2.map(MdioTableUtil.unitsAttr).exists(_ == Seq(("length", "m"))))
    val coordVals = spark.read.format("mdio").option("variables", "inline").load(dst)
      .select("inline", "inline__value").as[(Long, Long)].collect().toMap
    assert(coordVals == (0L until 8L).map(i => i -> i * 100).toMap)
    MdioWriter.delete(dst); MdioWriter.delete(src)
  }

  test("rechunk of a sharded v3 variable: shard kept, inner chunks change, data exact") {
    val dir = Files.createTempDirectory("mdio_rcs").resolve("s.mdio").toString
    MdioWriter.create(MdioSpec.fromJson(
      """{
        |  "metadata": {"name": "rcs", "apiVersion": "v1.0", "createdOn": "2026-01-01T00:00:00Z"},
        |  "variables": [
        |    {"name": "inline", "dataType": "int64",
        |     "dimensions": [{"name": "inline", "size": 8}]},
        |    {"name": "crossline", "dataType": "int64",
        |     "dimensions": [{"name": "crossline", "size": 8}]},
        |    {"name": "image", "dataType": "float64",
        |     "dimensions": [{"name": "inline", "size": 8}, {"name": "crossline", "size": 8}],
        |     "metadata": {"chunkGrid": {"name": "regular", "configuration":
        |       {"chunkShape": [4, 4], "shardShape": [8, 8]}}}}
        |  ]
        |}""".stripMargin), dir, version = 3)
    val cells = for { i <- 0L until 8L; x <- 0L until 8L }
      yield (i, x, (i * 8 + x).toDouble)
    MdioWriter.writeVariable(spark,
      cells.toDF("inline", "crossline", "image"), dir, "image")
    val dst = dir + "_rc"
    MdioWriter.rechunk(spark, dir, dst, Map("image" -> Seq(2L, 4L)), version = 3)
    val (_, arrays) = graft.zarr.ZarrMeta.readGroup(graft.zarr.ZarrMeta.path(dst))
    assert(arrays("image")._1.chunks == Seq(2L, 4L))
    assert(arrays("image")._1.shard.contains(Seq(8L, 8L)))
    val got = spark.read.format("mdio").load(dst)
      .select("inline", "crossline", "image")
      .as[(Long, Long, Double)].collect().toSet
    assert(got == cells.toSet)
    // inner chunks that do not divide the shard reject loud
    intercept[IllegalArgumentException] {
      MdioWriter.rechunk(spark, dir, dir + "_bad", Map("image" -> Seq(3L, 4L)), version = 3)
    }
    MdioWriter.delete(dst); MdioWriter.delete(dir)
  }

  test("rechunk newShards: flat -> sharded -> un-sharded round-trip, data exact (v3)") {
    val dir = Files.createTempDirectory("mdio_rsh").resolve("f.mdio").toString
    MdioWriter.create(MdioSpec.fromJson(
      """{
        |  "metadata": {"name": "rsh", "apiVersion": "v1.0", "createdOn": "2026-01-01T00:00:00Z"},
        |  "variables": [
        |    {"name": "inline", "dataType": "int64",
        |     "dimensions": [{"name": "inline", "size": 8}]},
        |    {"name": "crossline", "dataType": "int64",
        |     "dimensions": [{"name": "crossline", "size": 8}]},
        |    {"name": "image", "dataType": "float64",
        |     "dimensions": [{"name": "inline", "size": 8}, {"name": "crossline", "size": 8}],
        |     "metadata": {"chunkGrid": {"name": "regular", "configuration": {"chunkShape": [2, 4]}}}}
        |  ]
        |}""".stripMargin), dir, version = 3)
    val cells = for { i <- 0L until 8L; x <- 0L until 8L } yield (i, x, (i * 8 + x).toDouble)
    MdioWriter.writeVariable(spark, cells.toDF("inline", "crossline", "image"), dir, "image")
    def readBack(p: String) = spark.read.format("mdio").option("variables", "image").load(p)
      .select("inline", "crossline", "image").as[(Long, Long, Double)].collect().toSet
    // flat -> sharded: 4x8 shards over the kept 2x4 inner chunks
    val sh = dir + "_sh"
    MdioWriter.rechunk(spark, dir, sh, Map.empty, version = 3,
      newShards = Map("image" -> Seq(4L, 8L)))
    val (_, a1) = graft.zarr.ZarrMeta.readGroup(graft.zarr.ZarrMeta.path(sh))
    assert(a1("image")._1.shard.contains(Seq(4L, 8L)))
    assert(a1("image")._1.chunks == Seq(2L, 4L))
    assert(readBack(sh) == cells.toSet)
    // sharded -> un-sharded (empty Seq removes the shard grid)
    val flat = dir + "_flat"
    MdioWriter.rechunk(spark, sh, flat, Map.empty, version = 3,
      newShards = Map("image" -> Seq.empty))
    val (_, a2) = graft.zarr.ZarrMeta.readGroup(graft.zarr.ZarrMeta.path(flat))
    assert(a2("image")._1.shard.isEmpty)
    assert(readBack(flat) == cells.toSet)
    // shard not a multiple of the (new) chunks rejects loud
    intercept[IllegalArgumentException] {
      MdioWriter.rechunk(spark, dir, dir + "_bad", Map("image" -> Seq(3L, 4L)),
        version = 3, newShards = Map("image" -> Seq(4L, 8L)))
    }
    Seq(flat, sh, dir).foreach(MdioWriter.delete)
  }

  test("extract: dims shrink, indices shift to zero-origin, coord values carry") {
    val src = create()
    val dst = src + "_ex"
    MdioWriter.extract(spark, src, dst,
      Map("inline" -> (2L, 6L), "crossline" -> (1L, 4L)))
    val (_, arrays) = graft.zarr.ZarrMeta.readGroup(graft.zarr.ZarrMeta.path(dst))
    assert(arrays("image")._1.shape == Seq(4L, 3L))
    assert(arrays("image")._1.chunks == Seq(4L, 3L), "chunks clamp to the cut")
    // every extracted cell equals its source cell at (i+2, x+1)
    val got = spark.read.format("mdio").option("variables", "image").load(dst)
      .select("inline", "crossline", "image")
      .as[(Long, Long, Double)].collect().toSet
    val expect = (for { i <- 0L until 4L; x <- 0L until 3L }
      yield (i, x, ((i + 2) * 10 + (x + 1)).toDouble)).toSet
    assert(got == expect)
    // the dimension coordinate keeps its VALUES for the kept indices
    val coord = spark.read.format("mdio").option("variables", "inline").load(dst)
      .select("inline", "inline__value").as[(Long, Long)].collect().toMap
    assert(coord == (0L until 4L).map(i => i -> (i + 2) * 100).toMap)
    MdioWriter.delete(dst); MdioWriter.delete(src)
  }

  test("extract contracts fail fast") {
    val src = create()
    intercept[IllegalArgumentException] {
      MdioWriter.extract(spark, src, src + "_a", Map("depth" -> (0L, 2L)))
    }
    intercept[IllegalArgumentException] {
      MdioWriter.extract(spark, src, src + "_b", Map("inline" -> (4L, 4L)))
    }
    intercept[IllegalArgumentException] {
      MdioWriter.extract(spark, src, src + "_c", Map("inline" -> (0L, 9L)))
    }
    // stop past the extent with start > 0: the LENGTH (12-4 = 8) fits the
    // extent 8, so only the absolute-stop check catches it — without it the
    // unwritten destination cells would silently read back as fill
    intercept[IllegalArgumentException] {
      MdioWriter.extract(spark, src, src + "_d", Map("inline" -> (4L, 12L)))
    }
    MdioWriter.delete(src)
  }

  test("extract clamp=true: reference isel semantics — bounds clamp into the domain") {
    val src = create()
    val dst = src + "_cl"
    // [4, 12) on extent 8 clamps to [4, 8): same result as asking exactly
    MdioWriter.extract(spark, src, dst, Map("inline" -> (4L, 12L)), clamp = true)
    val (_, arrays) = graft.zarr.ZarrMeta.readGroup(graft.zarr.ZarrMeta.path(dst))
    assert(arrays("image")._1.shape == Seq(4L, 6L))
    val got = spark.read.format("mdio").option("variables", "image").load(dst)
      .select("inline", "crossline", "image")
      .as[(Long, Long, Double)].collect().toSet
    val expect = (for { i <- 0L until 4L; x <- 0L until 6L }
      yield (i, x, ((i + 4) * 10 + x).toDouble)).toSet
    assert(got == expect)
    // a region entirely outside the domain still rejects loud under clamp
    intercept[IllegalArgumentException] {
      MdioWriter.extract(spark, src, src + "_e", Map("inline" -> (9L, 12L)), clamp = true)
    }
    MdioWriter.delete(dst); MdioWriter.delete(src)
  }

  test("transpose: dims/chunks permute on disk, name-addressed cells identical") {
    val src = create()
    val dst = src + "_tp"
    MdioWriter.transpose(spark, src, dst,
      Map("image" -> Seq("crossline", "inline")))
    val (_, arrays) = graft.zarr.ZarrMeta.readGroup(graft.zarr.ZarrMeta.path(dst))
    def dimsOf(v: String): Option[Seq[String]] =
      arrays(v)._1.dimNames.orElse(
        arrays(v)._2.flatMap(MdioTableUtil.arrayDimensions))
    assert(dimsOf("image").contains(Seq("crossline", "inline")))
    assert(arrays("image")._1.shape == Seq(6L, 8L))
    assert(arrays("image")._1.chunks == Seq(3L, 4L), "chunks permute with dims")
    assert(dimsOf("mask").contains(Seq("inline", "crossline")),
      "unnamed variables keep their order")
    def cells(p: String) = spark.read.format("mdio").option("variables", "image").load(p)
      .select("inline", "crossline", "image")
      .as[(Long, Long, Double)].collect().toSet
    assert(cells(dst) == cells(src))
    intercept[IllegalArgumentException] {
      MdioWriter.transpose(spark, src, src + "_x",
        Map("image" -> Seq("inline", "depth")))
    }
    MdioWriter.delete(dst); MdioWriter.delete(src)
  }

  test("concat: B shifts past A along the dim, seam chunks intact, coords concatenate") {
    val src = create()
    val dst = src + "_cc"
    MdioWriter.concat(spark, src, src, dst, "inline")
    val (_, arrays) = graft.zarr.ZarrMeta.readGroup(graft.zarr.ZarrMeta.path(dst))
    assert(arrays("image")._1.shape == Seq(16L, 6L))
    assert(arrays("crossline")._1.shape == Seq(6L), "off-axis variables keep extent")
    val got = spark.read.format("mdio").option("variables", "image").load(dst)
      .select("inline", "crossline", "image")
      .as[(Long, Long, Double)].collect().toSet
    val expect = (for { i <- 0L until 16L; x <- 0L until 6L }
      yield (i, x, ((i % 8) * 10 + x).toDouble)).toSet
    assert(got == expect, "campaign B must be campaign A shifted by 8 inlines")
    val coord = spark.read.format("mdio").option("variables", "inline").load(dst)
      .select("inline", "inline__value").as[(Long, Long)].collect().toMap
    assert(coord == (0L until 16L).map(i => i -> (i % 8) * 100).toMap,
      "coordinate values concatenate")
    // off-axis extent mismatch rejects loud: an extract has fewer crosslines
    val narrow = src + "_n"
    MdioWriter.extract(spark, src, narrow, Map("crossline" -> (0L, 3L)))
    intercept[IllegalArgumentException] {
      MdioWriter.concat(spark, src, narrow, src + "_bad", "inline")
    }
    MdioWriter.delete(narrow); MdioWriter.delete(dst); MdioWriter.delete(src)
  }

  test("concat: off-axis VALUE disagreement rejects loud (not silently kept from A)") {
    val a = create()
    val b = create()
    // same shapes/dtypes everywhere, but B's crossline coordinate carries
    // different values than A's (A's is unwritten -> fill) — the documented
    // "must agree between the stores" contract is on values too
    MdioWriter.writeVariable(spark,
      spark.range(6).select(col("id").as("crossline"),
        (col("id") * 7 + 1).as("crossline__value")), b, "crossline")
    val err = intercept[IllegalArgumentException] {
      MdioWriter.concat(spark, a, b, a + "_bad", "inline")
    }
    assert(err.getMessage.contains("crossline"))
    MdioWriter.delete(a); MdioWriter.delete(b)
  }

  test("algebra: extract inverts concat — cutting campaign A back out equals A") {
    val src = create()
    val cc = src + "_cc"
    MdioWriter.concat(spark, src, src, cc, "inline")
    val back = src + "_back"
    MdioWriter.extract(spark, cc, back, Map("inline" -> (0L, 8L)))
    def all(p: String) = spark.read.format("mdio")
      .option("variables", "image,mask,cdp-x").load(p)
      .select("inline", "crossline", "image", "mask", "cdp-x")
      .as[(Long, Long, Double, Int, Float)].collect().toSet
    assert(all(back) == all(src))
    Seq(back, cc, src).foreach(MdioWriter.delete)
  }

  test("forEachParallel: per-variable units genuinely overlap; first failure rethrows") {
    // both units block until the OTHER has entered work — a sequential
    // loop deadlocks here and the await times out, so passing proves the
    // store-lifecycle copy loop really runs variables concurrently
    val latch = new java.util.concurrent.CountDownLatch(2)
    MdioWriter.forEachParallel(Seq(1, 2)) { _ =>
      latch.countDown()
      assert(latch.await(10, java.util.concurrent.TimeUnit.SECONDS), "units did not overlap")
    }
    val ran = java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()
    val e = intercept[RuntimeException] {
      MdioWriter.forEachParallel(Seq(1, 2, 3)) { i =>
        ran.add(i); if (i == 2) throw new RuntimeException("boom")
      }
    }
    assert(e.getMessage == "boom")
    assert(ran.size == 3, "all units run to completion even when one fails")
  }

  test("rechunk contracts fail fast") {
    val src = create()
    intercept[IllegalArgumentException] {
      MdioWriter.rechunk(spark, src, src + "_x", Map("nope" -> Seq(2L, 2L)))
    }
    intercept[IllegalArgumentException] {
      MdioWriter.rechunk(spark, src, src + "_y", Map("image" -> Seq(2L)))
    }
    MdioWriter.delete(src)
  }
}
