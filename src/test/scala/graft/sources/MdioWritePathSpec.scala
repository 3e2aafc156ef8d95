package graft.sources

import graft.SparkSpec
import graft.spec.MdioSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The DSv2 write path: df.write.format("mdio") with the declared
  * chunk-aligned clustering distribution. */
class MdioWritePathSpec extends SparkSpec {
  import spark.implicits._

  private def create(): String = {
    val dir = Files.createTempDirectory("mdio_w").resolve("w.mdio").toString
    MdioWriter.create(MdioSpec.fromJson(
      """{
        |  "metadata": {"name": "w", "apiVersion": "v1.0", "createdOn": "2026-01-01T00:00:00Z"},
        |  "variables": [
        |    {"name": "inline", "dataType": "int64",
        |     "dimensions": [{"name": "inline", "size": 8}]},
        |    {"name": "crossline", "dataType": "int64",
        |     "dimensions": [{"name": "crossline", "size": 6}]},
        |    {"name": "image", "dataType": "float64",
        |     "dimensions": [{"name": "inline", "size": 8}, {"name": "crossline", "size": 6}],
        |     "compressor": {"name": "zstd"},
        |     "metadata": {"chunkGrid": {"name": "regular", "configuration": {"chunkShape": [4, 3]}}}},
        |    {"name": "mask", "dataType": "int32",
        |     "dimensions": [{"name": "inline", "size": 8}, {"name": "crossline", "size": 6}],
        |     "metadata": {"chunkGrid": {"name": "regular", "configuration": {"chunkShape": [4, 3]}}}}
        |  ]
        |}""".stripMargin), dir)
    dir
  }

  test("aligned parallel write: repartitionByChunk + option(aligned) round-trips") {
    val dir = create()
    val cells = for { i <- 0L until 8L; x <- 0L until 6L }
      yield (i, x, (i * 10 + x).toDouble, ((i + x) % 2).toInt)
    val scrambled = cells.toDF("inline", "crossline", "image", "mask").repartition(7)
    MdioWriter.repartitionByChunk(scrambled, dir)
      .write.format("mdio").option("aligned", "true").mode("append").save(dir)
    val got = spark.read.format("mdio").load(dir)
      .select("inline", "crossline", "image", "mask")
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(got == cells.toSet)
    // chunk files exist for all 4 chunks of each variable
    val names = graft.zarr.ZarrMeta.path(dir).resolve("image")
      .list().map(_.name).toSet
    assert(Set("0.0", "0.1", "1.0", "1.1").subsetOf(names))
    MdioWriter.delete(dir)
  }

  test("partial writes read-modify-write: untouched cells survive (both paths)") {
    val dir = create()
    val cells = for { i <- 0L until 8L; x <- 0L until 6L } yield (i, x, (i * 10 + x).toDouble)
    MdioWriter.writeVariable(spark,
      cells.toDF("inline", "crossline", "image"), dir, "image")
    // 1) writeVariable path: overwrite ONLY the cells with crossline < 2
    //    (part of each chunk) — the rest must keep its old values, not
    //    collapse to fill (the reference's merging accessor writes)
    val patch = for { i <- 0L until 8L; x <- 0L until 2L } yield (i, x, 999.0)
    MdioWriter.writeVariable(spark,
      patch.toDF("inline", "crossline", "image"), dir, "image")
    def readAll(): Map[(Long, Long), Double] =
      spark.read.format("mdio").load(dir)
        .select("inline", "crossline", "image").as[(Long, Long, Double)]
        .collect().map(r => (r._1, r._2) -> r._3).toMap
    val after1 = readAll()
    for { i <- 0L until 8L; x <- 0L until 6L } {
      val want = if (x < 2) 999.0 else (i * 10 + x).toDouble
      assert(after1((i, x)) == want, s"writeVariable RMW at ($i,$x)")
    }
    // 2) DSv2 sink path: patch a single cell through df.write
    Seq((3L, 5L, -1.0)).toDF("inline", "crossline", "image")
      .write.format("mdio").mode("append").save(dir)
    val after2 = readAll()
    for { i <- 0L until 8L; x <- 0L until 6L } {
      val want =
        if ((i, x) == (3L, 5L)) -1.0
        else if (x < 2) 999.0
        else (i * 10 + x).toDouble
      assert(after2((i, x)) == want, s"sink RMW at ($i,$x)")
    }
    MdioWriter.delete(dir)
  }

  test("default write is the safe single-partition path (no torn chunks)") {
    val dir = create()
    val cells = for { i <- 0L until 8L; x <- 0L until 6L }
      yield (i, x, 1.0, 1)
    val df = cells.toDF("inline", "crossline", "image", "mask").repartition(5)
    df.write.format("mdio").mode("append").save(dir)
    // a single writer owns every chunk — no torn chunks: re-read equals input
    assert(spark.read.format("mdio").load(dir).count() == 48)
    MdioWriter.delete(dir)
  }

  test("insertAligned: one call, >1 writer task, bit-identical to the serial path") {
    val serialDir = create()
    val alignedDir = create()
    val cells = for { i <- 0L until 8L; x <- 0L until 6L }
      yield (i, x, (i * 3 + x).toDouble, ((i * x) % 3).toInt)
    val df = cells.toDF("inline", "crossline", "image", "mask").repartition(7)
    // serial twin: the bare sink (single writer task)
    df.write.format("mdio").mode("append").save(serialDir)
    // pit-of-success call: repartitions by chunk + aligned internally
    assert(MdioWriter.repartitionByChunk(df, alignedDir).rdd.getNumPartitions > 1,
      "alignment repartition must fan out to >1 writer task")
    MdioWriter.insertAligned(df, alignedDir)
    // bit-identical chunk files, variable by variable
    for (v <- Seq("image", "mask")) {
      val s = graft.zarr.ZarrMeta.path(serialDir).resolve(v)
      val a = graft.zarr.ZarrMeta.path(alignedDir).resolve(v)
      val chunkNames = s.list().map(_.name).filterNot(_.startsWith(".")).sorted
      assert(chunkNames.nonEmpty)
      for (c <- chunkNames)
        assert(java.util.Arrays.equals(
          s.resolve(c).readAllBytes(), a.resolve(c).readAllBytes()),
          s"chunk $v/$c differs between serial and aligned writes")
    }
    MdioWriter.delete(serialDir)
    MdioWriter.delete(alignedDir)
  }

  test("a sharded variable elsewhere in the table does not block unsharded writes") {
    val dir = Files.createTempDirectory("mdio_shmix").resolve("mix.mdio").toString
    MdioWriter.create(MdioSpec.fromJson(
      """{
        |  "metadata": {"name": "mix", "apiVersion": "v1.0", "createdOn": "2026-01-01T00:00:00Z"},
        |  "variables": [
        |    {"name": "inline", "dataType": "int64",
        |     "dimensions": [{"name": "inline", "size": 8}]},
        |    {"name": "crossline", "dataType": "int64",
        |     "dimensions": [{"name": "crossline", "size": 6}]},
        |    {"name": "wave", "dataType": "float64",
        |     "dimensions": [{"name": "inline", "size": 8}, {"name": "crossline", "size": 6}],
        |     "metadata": {"chunkGrid": {"name": "regular", "configuration":
        |       {"chunkShape": [4, 3], "shardShape": [8, 6]}}}},
        |    {"name": "mask", "dataType": "int32",
        |     "dimensions": [{"name": "inline", "size": 8}, {"name": "crossline", "size": 6}],
        |     "metadata": {"chunkGrid": {"name": "regular", "configuration": {"chunkShape": [4, 3]}}}}
        |  ]
        |}""".stripMargin), dir, version = 3)
    val cells = for { i <- 0L until 8L; x <- 0L until 6L } yield (i, x, ((i + x) % 2).toInt)
    // write of the UNSHARDED variable must succeed…
    cells.toDF("inline", "crossline", "mask")
      .write.format("mdio").mode("append").save(dir)
    val got = spark.read.format("mdio").load(dir).select("inline", "crossline", "mask")
      .as[(Long, Long, Int)].collect().toSet
    assert(got == cells.toSet)
    // …without touching the sharded peer (no shard objects materialize
    // for its null-expanded column)
    assert(graft.zarr.ZarrMeta.path(dir).resolve("wave").resolve("c")
      .listFilesRecursive().isEmpty)
    // …and a write carrying actual SHARDED data assembles shard objects
    // through the same sink (r11 verdict item 5 — the loud reject is gone)
    val waves = for { i <- 0L until 8L; x <- 0L until 6L } yield (i, x, (i * 6 + x).toDouble)
    waves.toDF("inline", "crossline", "wave")
      .write.format("mdio").mode("append").save(dir)
    assert(graft.zarr.ZarrMeta.path(dir).resolve("wave").resolve("c")
      .listFilesRecursive().nonEmpty, "shard objects must materialize")
    val gotW = spark.read.format("mdio").load(dir).select("inline", "crossline", "wave")
      .as[(Long, Long, Double)].collect().toSet
    assert(gotW == waves.toSet)
    MdioWriter.delete(dir)
  }

  test("sink partial-variable write leaves the unmentioned variable intact") {
    val dir = create()
    val cells = for { i <- 0L until 8L; x <- 0L until 6L }
      yield (i, x, (i * 10 + x).toDouble, ((i + x) % 2).toInt)
    cells.toDF("inline", "crossline", "image", "mask")
      .write.format("mdio").mode("append").save(dir)
    // a mask-only patch must not clobber image cells (Spark null-expands
    // the missing image column; null = leave untouched)
    (for { i <- 0L until 8L; x <- 0L until 6L } yield (i, x, 7))
      .toDF("inline", "crossline", "mask")
      .write.format("mdio").mode("append").save(dir)
    val got = spark.read.format("mdio").load(dir)
      .select("inline", "crossline", "image", "mask")
      .as[(Long, Long, Double, Int)].collect()
    assert(got.forall { case (i, x, img, m) => img == (i * 10 + x).toDouble && m == 7 })
    MdioWriter.delete(dir)
  }

  test("aligned parallel write at 100k cells keeps every chunk intact") {
    val dir = Files.createTempDirectory("mdio_big").resolve("big.mdio").toString
    MdioWriter.create(MdioSpec.fromJson(
      """{
        |  "metadata": {"name": "big", "apiVersion": "v1.0", "createdOn": "2026-01-01T00:00:00Z"},
        |  "variables": [
        |    {"name": "inline", "dataType": "int64",
        |     "dimensions": [{"name": "inline", "size": 400}]},
        |    {"name": "crossline", "dataType": "int64",
        |     "dimensions": [{"name": "crossline", "size": 250}]},
        |    {"name": "image", "dataType": "float64",
        |     "dimensions": [{"name": "inline", "size": 400}, {"name": "crossline", "size": 250}],
        |     "compressor": {"name": "zstd"},
        |     "metadata": {"chunkGrid": {"name": "regular", "configuration": {"chunkShape": [64, 64]}}}}
        |  ]
        |}""".stripMargin), dir)
    import spark.implicits._
    val df = spark.range(100000).select(
      (col("id") / 250).cast("long").as("inline"),
      (col("id") % 250).as("crossline"),
      (col("id") * 0.5).as("image")).repartition(13) // deliberately scrambled
    MdioWriter.repartitionByChunk(df, dir, partitions = 8)
      .write.format("mdio").option("aligned", "true").mode("append").save(dir)
    val back = spark.read.format("mdio").load(dir)
    assert(back.count() == 100000)
    // spot-exact: decimal sums match (order-independent)
    val sum = back.agg(org.apache.spark.sql.functions.sum(col("image").cast("decimal(27,6)")))
      .collect()(0).getDecimal(0)
    assert(sum == new java.math.BigDecimal("2499975000.0").setScale(6))
    MdioWriter.delete(dir)
  }
}
