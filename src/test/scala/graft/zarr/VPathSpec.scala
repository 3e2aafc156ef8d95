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
}
