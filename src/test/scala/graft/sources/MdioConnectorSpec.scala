package graft.sources

import graft.SparkSpec
import graft.spec.MdioSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** End-to-end connector lifecycle: create from spec → distributed
  * chunk-aligned write → DSv2 read with pushdown → trim → delete
  * (the reference's dataset_test.cc create/write/reopen/verify cycles). */
class MdioConnectorSpec extends SparkSpec {
  import spark.implicits._

  private val specJson =
    """{
      |  "metadata": {"name": "toy", "apiVersion": "v1.0", "createdOn": "2026-01-01T00:00:00Z"},
      |  "variables": [
      |    {"name": "inline", "dataType": "int64",
      |     "dimensions": [{"name": "inline", "size": 8}]},
      |    {"name": "crossline", "dataType": "int64",
      |     "dimensions": [{"name": "crossline", "size": 6}]},
      |    {"name": "image", "dataType": "float32",
      |     "dimensions": [{"name": "inline", "size": 8}, {"name": "crossline", "size": 6}],
      |     "compressor": {"name": "zstd"},
      |     "metadata": {"chunkGrid": {"name": "regular", "configuration": {"chunkShape": [4, 3]}}}},
      |    {"name": "mask", "dataType": "int32",
      |     "dimensions": [{"name": "inline", "size": 8}, {"name": "crossline", "size": 6}],
      |     "compressor": {"name": "zlib"},
      |     "metadata": {"chunkGrid": {"name": "regular", "configuration": {"chunkShape": [4, 3]}}}}
      |  ]
      |}""".stripMargin

  private def freshDataset(): String = {
    val dir = Files.createTempDirectory("mdio_test").resolve("toy.mdio").toString
    val spec = MdioSpec.fromJson(specJson)
    MdioWriter.create(spec, dir)
    // image(i, x) = i*10 + x ; mask = (i + x) % 2
    val cells = for { i <- 0L until 8L; x <- 0L until 6L } yield (i, x, (i * 10 + x).toFloat, ((i + x) % 2).toInt)
    val df = cells.toDF("inline", "crossline", "image", "mask")
    MdioWriter.writeVariable(spark, df.select($"inline", $"crossline", $"image"), dir, "image")
    MdioWriter.writeVariable(spark, df.select($"inline", $"crossline", col("mask").cast("double").as("mask")), dir, "mask")
    dir
  }

  test("create writes zarr v2 metadata incl. consolidated .zmetadata") {
    val dir = freshDataset()
    val root = graft.zarr.ZarrMeta.path(dir)
    assert(root.resolve(".zgroup").exists)
    assert(root.resolve(".zmetadata").exists)
    assert(root.resolve("image").resolve(".zarray").exists)
    val (groupAttrs, arrays) = graft.zarr.ZarrMeta.readGroup(root)
    assert(arrays.keySet == Set("inline", "crossline", "image", "mask"))
    assert(arrays("image")._1.chunks == Seq(4L, 3L))
    MdioWriter.delete(dir)
  }

  test("round-trip: every written cell reads back exactly") {
    val dir = freshDataset()
    val got = spark.read.format("mdio").load(dir)
      .select("inline", "crossline", "image", "mask")
      .as[(Long, Long, Float, Int)].collect().toSet
    val want = (for { i <- 0L until 8L; x <- 0L until 6L }
      yield (i, x, (i * 10 + x).toFloat, ((i + x) % 2).toInt)).toSet
    assert(got == want)
    MdioWriter.delete(dir)
  }

  test("dim-range filters prune chunks (pushdown) and return exact cells") {
    val dir = freshDataset()
    val df = spark.read.format("mdio").load(dir)
      .filter($"inline" >= 2 && $"inline" < 5 && $"crossline" === 1)
    // partition pruning: only chunks intersecting [2,5)x[1,2) → inline
    // chunks {0,1} × crossline chunk {0} = 2 of 4 chunks
    assert(df.rdd.getNumPartitions == 2)
    val got = df.select("inline", "crossline", "image")
      .as[(Long, Long, Float)].collect().toSet
    val want = (for { i <- 2L until 5L } yield (i, 1L, (i * 10 + 1).toFloat)).toSet
    assert(got == want)
    MdioWriter.delete(dir)
  }

  test("column pruning: unprojected variables are not decoded") {
    val dir = freshDataset()
    // delete all of mask's chunk files; reading only image must still work
    val maskDir = graft.zarr.ZarrMeta.path(dir).resolve("mask")
    maskDir.list().foreach { p =>
      if (!p.name.startsWith(".")) p.delete()
    }
    val sum = spark.read.format("mdio").load(dir)
      .select("image").agg(sum_distinct(lit(0)), count(lit(1))).collect()(0).getLong(1)
    assert(sum == 48)
    // and reading mask now yields the fill value, not an error (S5 fill path)
    val fills = spark.read.format("mdio").load(dir).select("mask").distinct().as[Int].collect()
    assert(fills.toSeq == Seq(Int.MaxValue))
    MdioWriter.delete(dir)
  }

  test("updateAttributes merge-patches and survives re-consolidation (S10)") {
    val dir = freshDataset()
    MdioWriter.updateAttributes(dir, "image",
      """{"statsV1": {"count": 48, "min": 0.0, "max": 75.0}, "unitsV1": {"length": "m"}}""")
    MdioWriter.updateAttributes(dir, "image", """{"statsV1": {"max": 80.0}}""")
    val (_, arrays) = graft.zarr.ZarrMeta.readGroup(graft.zarr.ZarrMeta.path(dir))
    val attrs = arrays("image")._2.get
    assert(attrs.contains("\"max\":80.0") && attrs.contains("\"count\":48"))
    assert(attrs.contains("_ARRAY_DIMENSIONS")) // merge-patch preserved dims
    MdioWriter.delete(dir)
  }

  test("trim shrinks a dimension and deletes orphaned chunks (S11)") {
    val dir = freshDataset()
    MdioWriter.trim(dir, "inline", 4L)
    val df = spark.read.format("mdio").load(dir)
    assert(df.agg(max($"inline")).as[Long].head() == 3L)
    assert(df.count() == 24)
    // orphaned inline-chunk-1 files are gone
    val imageFiles = graft.zarr.ZarrMeta.path(dir).resolve("image")
      .list().map(_.name).filterNot(_.startsWith(".")).toSet
    assert(imageFiles == Set("0.0", "0.1"))
    MdioWriter.delete(dir)
  }

  test("zarr v3: create/write/read round-trip with version auto-detection (S8)") {
    val dir = Files.createTempDirectory("mdio_v3").resolve("toy3.mdio").toString
    val spec = MdioSpec.fromJson(specJson.replace(""""name": "zstd"""", """"name": "zstd""""))
    // v3 writes allow None/zstd codecs only; the spec uses zstd+zlib — switch mask to no compressor
    val spec3 = spec.copy(variables = spec.variables.map(v =>
      if (v.compressor.contains("zlib")) v.copy(compressor = None) else v))
    MdioWriter.create(spec3, dir, version = 3)
    val root = graft.zarr.ZarrMeta.path(dir)
    assert(root.resolve("zarr.json").exists)
    assert(root.resolve("image").resolve("zarr.json").exists)
    assert(!root.resolve(".zgroup").exists)
    assert(graft.zarr.ZarrMeta.detectVersion(root) == 3)

    val cells = for { i <- 0L until 8L; x <- 0L until 6L } yield (i, x, (i * 10 + x).toFloat)
    MdioWriter.writeVariable(spark, cells.toDF("inline", "crossline", "image"), dir, "image")
    // v3 chunk keys are nested under c/
    assert(root.resolve("image").resolve("c").resolve("0").resolve("0").exists)

    val got = spark.read.format("mdio").load(dir)
      .filter($"inline" >= 2 && $"inline" < 5)
      .select("inline", "crossline", "image")
      .as[(Long, Long, Float)].collect().toSet
    val want = (for { i <- 2L until 5L; x <- 0L until 6L } yield (i, x, (i * 10 + x).toFloat)).toSet
    assert(got == want)

    MdioWriter.updateAttributes(dir, "image", """{"statsV1": {"count": 48}}""")
    val (_, arrays) = graft.zarr.ZarrMeta.readGroup(root)
    assert(arrays("image")._2.get.contains("\"count\":48"))

    MdioWriter.trim(dir, "inline", 4L)
    assert(spark.read.format("mdio").load(dir).count() == 24)
    MdioWriter.delete(dir)
  }

  test("blosc write parity: reference spec forms round-trip v2 and v3") {
    // the reference's spec layer accepts ONLY blosc, honoring
    // cname/clevel/shuffle with legacy aliases algorithm/level
    // (mdio/dataset_factory.h:288-367)
    val bloscSpec = MdioSpec.fromJson(specJson
      .replace("""{"name": "zstd"}""",
        """{"name": "blosc", "algorithm": "zstd", "level": 7, "shuffle": "shuffle"}""")
      .replace("""{"name": "zlib"}""",
        """{"name": "blosc", "cname": "lz4", "clevel": 5, "shuffle": 1}"""))
    assert(bloscSpec.variable("image").blosc.contains(graft.zarr.ChunkCodec.Blosc("zstd", 7, 1)))
    assert(bloscSpec.variable("mask").blosc.contains(graft.zarr.ChunkCodec.Blosc("lz4", 5, 1)))

    for (version <- Seq(2, 3)) {
      val dir = Files.createTempDirectory(s"mdio_blosc_v$version").resolve("b.mdio").toString
      MdioWriter.create(bloscSpec, dir, version = version)
      val root = graft.zarr.ZarrMeta.path(dir)
      if (version == 2) {
        val zarray = root.resolve("image").resolve(".zarray").readString()
        assert(zarray.contains("\"id\": \"blosc\"") && zarray.contains("\"cname\": \"zstd\"")
          && zarray.contains("\"clevel\": 7") && zarray.contains("\"shuffle\": 1"))
      } else {
        val zjson = root.resolve("image").resolve("zarr.json").readString()
        assert(zjson.contains("\"name\": \"bytes\"") && zjson.contains("\"name\": \"blosc\""),
          "v3 must emit the [bytes, blosc] codec pipeline")
        assert(zjson.contains("\"shuffle\": \"shuffle\"") && zjson.contains("\"typesize\": 4"))
      }
      // metadata round-trips through the reader with the same settings
      val (_, arrays) = graft.zarr.ZarrMeta.readGroup(root)
      assert(arrays("image")._1.compressor.contains("blosc"))
      assert(arrays("image")._1.blosc.contains(graft.zarr.ChunkCodec.Blosc("zstd", 7, 1)))

      val cells = for { i <- 0L until 8L; x <- 0L until 6L } yield (i, x, (i * 10 + x).toFloat, ((i + x) % 2).toInt)
      val df = cells.toDF("inline", "crossline", "image", "mask")
      MdioWriter.writeVariable(spark, df.select($"inline", $"crossline", $"image"), dir, "image")
      MdioWriter.writeVariable(spark, df.select($"inline", $"crossline",
        col("mask").cast("double").as("mask")), dir, "mask")
      val got = spark.read.format("mdio").load(dir)
        .select("inline", "crossline", "image", "mask")
        .as[(Long, Long, Float, Int)].collect().toSet
      assert(got == cells.toSet, s"v$version blosc round-trip")
      MdioWriter.delete(dir)
    }
  }

  test("blosc BITSHUFFLE (shuffle=2) writes and round-trips v2 and v3") {
    // the last member of the reference's BloscShuffle enum
    // (mdio/dataset_schema.h:145-165), pure-JVM bit transposition
    val spec = MdioSpec.fromJson(specJson
      .replace("""{"name": "zstd"}""",
        """{"name": "blosc", "cname": "zstd", "clevel": 5, "shuffle": "bitshuffle"}""")
      .replace("""{"name": "zlib"}""",
        """{"name": "blosc", "cname": "lz4", "clevel": 5, "shuffle": "bitshuffle"}"""))
    assert(spec.variable("image").blosc.contains(graft.zarr.ChunkCodec.Blosc("zstd", 5, 2)))
    for (version <- Seq(2, 3)) {
      val dir = Files.createTempDirectory(s"mdio_bitshuf_v$version").resolve("b.mdio").toString
      MdioWriter.create(spec, dir, version = version)
      val root = graft.zarr.ZarrMeta.path(dir)
      if (version == 2)
        assert(root.resolve("image").resolve(".zarray").readString()
          .contains("\"shuffle\": 2"))
      else
        assert(root.resolve("image").resolve("zarr.json").readString()
          .contains("\"shuffle\": \"bitshuffle\""))
      val (_, arrays) = graft.zarr.ZarrMeta.readGroup(root)
      assert(arrays("image")._1.blosc.contains(graft.zarr.ChunkCodec.Blosc("zstd", 5, 2)))
      val cells = for { i <- 0L until 8L; x <- 0L until 6L } yield (i, x, (i * 10 + x).toFloat / 4f)
      MdioWriter.writeVariable(spark, cells.toDF("inline", "crossline", "image"), dir, "image")
      val got = spark.read.format("mdio").option("variables", "image").load(dir)
        .select("inline", "crossline", "image")
        .as[(Long, Long, Float)].collect().toSet
      assert(got == cells.toSet, s"v$version bitshuffle round-trip")
      MdioWriter.delete(dir)
    }
  }

  test("SQL DDL surface: CREATE TABLE ... USING mdio + pure-SQL query") {
    val dir = freshDataset()
    spark.sql(s"CREATE TABLE mdio_toy USING mdio OPTIONS (path '$dir')")
    try {
      val got = spark.sql(
        """SELECT inline, SUM(CAST(image AS DOUBLE)) AS s
          |FROM mdio_toy WHERE crossline < 3 GROUP BY inline ORDER BY inline""".stripMargin)
        .as[(Long, Double)].collect().toSeq
      val want = (0L until 8L).map(i => (i, (0 until 3).map(x => i * 10.0 + x).sum))
      assert(got == want)
      // pushdown works through the SQL path too
      val p = spark.sql("SELECT image FROM mdio_toy WHERE inline = 2 AND crossline = 2")
        .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
      assert(p.contains("ranges=inline:[2,3),crossline:[2,3)"), p.take(600))
    } finally {
      spark.sql("DROP TABLE mdio_toy")
      MdioWriter.delete(dir)
    }
  }

  test("delete refuses non-MDIO directories (S12)") {
    val plain = Files.createTempDirectory("not_mdio")
    intercept[IllegalArgumentException](MdioWriter.delete(plain.toString))
  }

  private implicit class IterOps[T](it: java.util.Iterator[T]) {
    def asScala: Iterator[T] = scala.jdk.CollectionConverters.IteratorHasAsScala(it).asScala
  }

  test("unknown variables and mismatched chunk shapes error clearly") {
    val dir = freshDataset()
    // unknown variable name
    val e1 = intercept[IllegalArgumentException] {
      spark.read.format("mdio").option("variables", "ghost").load(dir).schema
    }
    assert(e1.getMessage.contains("unknown variables"))
    // force a chunkShape mismatch between selected variables
    val maskMeta = graft.zarr.ZarrMeta.path(dir).resolve("mask").resolve(".zarray")
    maskMeta.writeString(
      maskMeta.readString().replace("[4, 3]", "[2, 3]"))
    graft.zarr.ZarrMeta.consolidate(graft.zarr.ZarrMeta.path(dir))
    val e2 = intercept[IllegalArgumentException] {
      spark.read.format("mdio").option("variables", "image,mask").load(dir).schema
    }
    assert(e2.getMessage.contains("chunkShapes"))
    MdioWriter.delete(dir)
  }

  test("format(mdio) without a path errors with guidance") {
    val e = intercept[Exception] {
      spark.read.format("mdio").load()
    }
    assert(e.getMessage.toLowerCase.contains("path"))
  }

  test("GraftFunctions.register is idempotent") {
    graft.GraftFunctions.register(spark)
    graft.GraftFunctions.register(spark) // second call must not throw
    import org.apache.spark.sql.functions._
    assert(spark.range(1).select(call_function("simhash64",
      array(lit("a"), lit("b")))).count() == 1)
  }

  test("runtime IN-filter prunes chunks (SupportsRuntimeV2Filtering)") {
    import org.apache.spark.sql.connector.expressions.Expressions
    import org.apache.spark.sql.connector.expressions.filter.Predicate
    import org.apache.spark.sql.types.LongType
    val dir = freshDataset()
    val scan = MdioScan(dir, Seq("inline", "crossline"),
      Map("image" -> graft.zarr.ZarrMeta.readGroup(graft.zarr.ZarrMeta.path(dir))._2("image")._1),
      new org.apache.spark.sql.types.StructType()
        .add("inline", LongType).add("image", org.apache.spark.sql.types.FloatType),
      Map.empty)
    assert(scan.planInputPartitions().length == 4) // 2x2 chunk grid
    // dynamic IN-set from a (simulated) selective join build side: inline ∈ {1, 2}
    scan.filter(Array(new Predicate("IN", Array(
      Expressions.column("inline"),
      Expressions.literal(1L), Expressions.literal(2L)))))
    assert(scan.planInputPartitions().length == 2) // only inline-chunk 0 survives
    MdioWriter.delete(dir)
  }
}
