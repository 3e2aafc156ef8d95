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
}
