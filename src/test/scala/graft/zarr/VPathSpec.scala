package graft.zarr

import graft.SparkSpec
import graft.sources.MdioWriter
import graft.spec.MdioSpec
import org.apache.spark.sql.functions._

/** S7 — the storage-driver layer: the whole connector lifecycle must work
  * through an explicit `file:` URI resolved by the Hadoop FileSystem API,
  * proving paths are scheme-dispatched (the reference's driver inference,
  * mdio/zarr/zarr_driver.h:225-231) rather than hard-wired to java.nio.
  * `s3a://`/`gs://` take the identical code path via their Hadoop
  * connectors (no cloud creds in this container to exercise them live). */
/** A registrable non-`file` scheme backed by the local filesystem: proves
  * VPath's dispatch goes through Hadoop's `fs.<scheme>.impl` resolution —
  * the exact mechanism `s3a`/`gs` use — without cloud credentials (the
  * reference leaves its gcs/s3 suites creds-gated the same way,
  * mdio/gcs_test.cc, mdio/s3_test.cc). */
class MockFileSystem extends org.apache.hadoop.fs.RawLocalFileSystem {
  import org.apache.hadoop.fs.{FileStatus, Path}
  override def getUri: java.net.URI = java.net.URI.create("mock:///")
  override def getScheme: String = "mock"
  // RawLocalFileSystem lazy-loads permissions via `new java.io.File(uri)`,
  // which rejects non-file schemes — pre-bake permissions instead
  private def baked(s: FileStatus): FileStatus =
    new FileStatus(s.getLen, s.isDirectory, s.getReplication, s.getBlockSize,
      s.getModificationTime, s.getAccessTime,
      org.apache.hadoop.fs.permission.FsPermission.getDefault, "u", "g", s.getPath)
  override def getFileStatus(f: Path): FileStatus = baked(super.getFileStatus(f))
  override def listStatus(f: Path): Array[FileStatus] = super.listStatus(f).map(baked)
}

/** [[MockFileSystem]] whose NON-recursive FILE deletes fail — simulates a
  * transient store error during trim's doomed-chunk sweep, which must
  * abort LOUDLY (a silently-skipped doomed chunk is stale data a later
  * dimension regrow resurrects). Directories still delete normally. */
class FailingDeleteFileSystem extends MockFileSystem {
  import org.apache.hadoop.fs.Path
  override def getUri: java.net.URI = java.net.URI.create("faildel:///")
  override def getScheme: String = "faildel"
  override def delete(f: Path, recursive: Boolean): Boolean = {
    if (!recursive && getFileStatus(f).isFile)
      throw new java.io.IOException(s"simulated transient delete failure: $f")
    super.delete(f, recursive)
  }
}

class VPathSpec extends SparkSpec {
  import spark.implicits._

  test("VPath primitives over an explicit file: URI") {
    val tmp = java.nio.file.Files.createTempDirectory("vpath").toString
    val root = VPath(s"file://$tmp/store")
    root.mkdirs()
    val f = root.resolve("sub").resolve("x.json")
    f.writeString("""{"k": 1}""")          // parent dirs created implicitly
    assert(f.exists && f.isFile)
    assert(f.readString() == """{"k": 1}""")
    assert(f.parent.name == "sub")
    assert(root.relativize(f) == "sub/x.json")
    assert(root.listFilesRecursive().map(root.relativize) == Seq("sub/x.json"))
    assert(f.readBytesOrNull() != null && root.resolve("ghost").readBytesOrNull() == null)
    root.deleteRecursive()
    assert(!root.exists)
  }

  test("mdio create/write/read round-trip through a file:// URI (S7)") {
    val dir = "file://" +
      java.nio.file.Files.createTempDirectory("mdio_uri").resolve("toy.mdio").toString
    val spec = MdioSpec.fromJson(
      """{
        |  "metadata": {"name": "uri", "apiVersion": "v1.0", "createdOn": "2026-01-01T00:00:00Z"},
        |  "variables": [
        |    {"name": "inline", "dataType": "int64",
        |     "dimensions": [{"name": "inline", "size": 4}]},
        |    {"name": "crossline", "dataType": "int64",
        |     "dimensions": [{"name": "crossline", "size": 4}]},
        |    {"name": "image", "dataType": "float32",
        |     "dimensions": [{"name": "inline", "size": 4}, {"name": "crossline", "size": 4}],
        |     "compressor": {"name": "zstd"},
        |     "metadata": {"chunkGrid": {"name": "regular", "configuration": {"chunkShape": [2, 2]}}}}
        |  ]
        |}""".stripMargin)
    MdioWriter.create(spec, dir)
    val cells = for { i <- 0L until 4L; x <- 0L until 4L } yield (i, x, (i * 4 + x).toFloat)
    MdioWriter.writeVariable(spark, cells.toDF("inline", "crossline", "image"), dir, "image")

    val df = spark.read.format("mdio").load(dir)
    assert(df.count() == 16)
    assert(df.agg(sum($"image".cast("double"))).as[Double].head() == (0 until 16).sum.toDouble)
    // pushdown still prunes chunks through the URI path
    assert(df.filter($"inline" === 3 && $"crossline" === 3).select("image")
      .as[Float].head() == 15.0f)

    MdioWriter.updateAttributes(dir, "image", """{"note": "via-uri"}""")
    val (_, arrays) = ZarrMeta.readGroup(ZarrMeta.path(dir))
    assert(arrays("image")._2.get.contains("via-uri"))
    MdioWriter.delete(dir)
    assert(!ZarrMeta.path(dir).exists)
  }

  test("non-file scheme dispatch: full lifecycle through mock:// (S7)") {
    // register the scheme exactly as a user registers s3a/gs: through the
    // session's Hadoop configuration
    spark.sparkContext.hadoopConfiguration
      .set("fs.mock.impl", classOf[MockFileSystem].getName)
    val dir = "mock://" +
      java.nio.file.Files.createTempDirectory("mdio_mock").resolve("toy.mdio").toString
    val spec = MdioSpec.fromJson(
      """{
        |  "metadata": {"name": "mock", "apiVersion": "v1.0", "createdOn": "2026-01-01T00:00:00Z"},
        |  "variables": [
        |    {"name": "inline", "dataType": "int64",
        |     "dimensions": [{"name": "inline", "size": 4}]},
        |    {"name": "crossline", "dataType": "int64",
        |     "dimensions": [{"name": "crossline", "size": 4}]},
        |    {"name": "image", "dataType": "float32",
        |     "dimensions": [{"name": "inline", "size": 4}, {"name": "crossline", "size": 4}],
        |     "compressor": {"name": "zstd"},
        |     "metadata": {"chunkGrid": {"name": "regular", "configuration": {"chunkShape": [2, 2]}}}}
        |  ]
        |}""".stripMargin)
    MdioWriter.create(spec, dir)
    val cells = for { i <- 0L until 4L; x <- 0L until 4L } yield (i, x, (i * 4 + x).toFloat)
    MdioWriter.writeVariable(spark, cells.toDF("inline", "crossline", "image"), dir, "image")
    val df = spark.read.format("mdio").load(dir)
    assert(df.count() == 16)
    // sel-style pushdown prunes chunks through the mock scheme too
    assert(df.filter($"inline" === 2 && $"crossline" === 1).select("image")
      .as[Float].head() == 9.0f)
    // DSv2 sink through the scheme as well
    Seq((0L, 0L, -5.0f)).toDF("inline", "crossline", "image")
      .write.format("mdio").mode("append").save(dir)
    assert(spark.read.format("mdio").load(dir)
      .filter($"inline" === 0 && $"crossline" === 0).select("image")
      .as[Float].head() == -5.0f)
    MdioWriter.delete(dir)
    assert(!ZarrMeta.path(dir).exists)
  }

  private def oneDimStore(scheme: String): String = {
    val dir = scheme +
      java.nio.file.Files.createTempDirectory("mdio_del").resolve("t.mdio").toString
    MdioWriter.create(MdioSpec.fromJson(
      """{
        |  "metadata": {"name": "t", "apiVersion": "v1.0", "createdOn": "2026-01-01T00:00:00Z"},
        |  "variables": [
        |    {"name": "x", "dataType": "int64",
        |     "dimensions": [{"name": "x", "size": 64}]},
        |    {"name": "v", "dataType": "float64",
        |     "dimensions": [{"name": "x", "size": 64}],
        |     "metadata": {"chunkGrid": {"name": "regular", "configuration": {"chunkShape": [8]}}}}
        |  ]
        |}""".stripMargin), dir)
    MdioWriter.writeVariable(spark,
      spark.range(64).select($"id".as("x"), $"id".cast("double").as("v")), dir, "v")
    dir
  }

  test("trim swallows ONLY the junk-directory delete failure; a doomed FILE rethrows") {
    // junk DIRECTORY named like a doomed chunk key: fs.delete(dir, false)
    // throws on a non-empty dir — trim must shrug (foreign junk is not
    // the engine's data) and still delete the real doomed chunk files
    val dir = oneDimStore("file://")
    val varDir = ZarrMeta.path(dir).resolve("v")
    varDir.resolve("6").readBytesOrNull() // real chunk 6 exists...
    new java.io.File(new java.net.URI(varDir.resolve("6").uri)).delete()
    varDir.resolve("6").resolve("junk.txt").writeString("not a chunk")
    MdioWriter.trim(dir, "x", 32L)
    assert(!varDir.resolve("4").exists && !varDir.resolve("5").exists &&
      !varDir.resolve("7").exists, "real doomed chunks must delete")
    assert(varDir.resolve("6").resolve("junk.txt").exists,
      "foreign junk dir must survive the trim untouched")
    assert(spark.read.format("mdio").load(dir).count() == 32)
    MdioWriter.delete(dir)
    // a real doomed FILE that fails to delete must abort the trim loudly
    // — silence would leave stale beyond-boundary data a regrow resurrects
    spark.sparkContext.hadoopConfiguration
      .set("fs.faildel.impl", classOf[FailingDeleteFileSystem].getName)
    val dir2 = oneDimStore("faildel://")
    val e = intercept[Exception] { MdioWriter.trim(dir2, "x", 32L) }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(e).exists(_.getMessage != null) &&
      chain(e).exists(t => t.getMessage != null &&
        t.getMessage.contains("simulated transient delete failure")),
      s"trim swallowed a real delete failure: $e")
  }
}
