package graft.sources

import graft.SparkSpec
import graft.zarr.{ChunkCodec, ZarrMeta}
import org.apache.spark.sql.functions._
import java.nio.ByteBuffer
import java.nio.ByteOrder
import java.nio.file.Files

/** Structured ("void") record arrays: numpy field-list dtype decoded into
  * Spark structs (reference mdio/zarr/zarr_v2.h:109-120; the storage form
  * behind SelectField P3). Read-only in v1. */
class MdioRecordDtypeSpec extends SparkSpec {
  import spark.implicits._

  private def build(): String = {
    val root = ZarrMeta.path(Files.createTempDirectory("mdio_rec").resolve("r.mdio").toString)
    ZarrMeta.writeGroup(root, Some("""{"name": "r"}"""))
    // trace dim coordinate
    ZarrMeta.writeArray(root, "trace",
      ZarrMeta.ArrayMeta(Seq(4L), Seq(4L), "<i8", None, Some(0.0)),
      Some("""{"_ARRAY_DIMENSIONS": ["trace"]}"""))
    root.resolve("trace").resolve("0").write(
      ChunkCodec.encodeLongs(Array(0L, 1L, 2L, 3L), "<i8"))
    // record variable: headers(trace) with fields cdp-x:<i4, elev:<f4
    val fields = Seq("cdp-x" -> "<i4", "elev" -> "<f4")
    ZarrMeta.writeArray(root, "headers",
      ZarrMeta.ArrayMeta(Seq(4L), Seq(4L), "|V8", None, None, fields = Some(fields)),
      Some("""{"_ARRAY_DIMENSIONS": ["trace"]}"""))
    val bb = ByteBuffer.allocate(4 * 8).order(ByteOrder.LITTLE_ENDIAN)
    (0 until 4).foreach { i => bb.putInt(1000 + i); bb.putFloat(i * 1.5f) }
    root.resolve("headers").resolve("0").write(bb.array())
    ZarrMeta.consolidate(root)
    root.toString
  }

  test("record dtype round-trips through .zarray metadata") {
    val dir = build()
    val (_, arrays) = ZarrMeta.readGroup(graft.zarr.ZarrMeta.path(dir))
    val m = arrays("headers")._1
    assert(m.fields.contains(Seq("cdp-x" -> "<i4", "elev" -> "<f4")))
    assert(m.elemSize == 8)
    MdioWriter.delete(dir)
  }

  test("record variable reads as struct; nested fields project (P3)") {
    val dir = build()
    val df = spark.read.format("mdio").load(dir)
    assert(df.schema("headers").dataType.simpleString == "struct<cdp-x:int,elev:float>")
    val rows = df.orderBy("trace")
      .select(col("trace"), col("headers").getField("cdp-x").as("x"),
        col("headers").getField("elev").as("e"))
      .as[(Long, Int, Float)].collect().toSeq
    assert(rows == (0 until 4).map(i => (i.toLong, 1000 + i, i * 1.5f)))
    MdioWriter.delete(dir)
  }

  test("record variable WRITE path: distributed struct write round-trips") {
    val root = ZarrMeta.path(Files.createTempDirectory("mdio_recw").resolve("w.mdio").toString)
    ZarrMeta.writeGroup(root, Some("""{"name": "w"}"""))
    ZarrMeta.writeArray(root, "trace",
      ZarrMeta.ArrayMeta(Seq(6L), Seq(3L), "<i8", None, Some(0.0)),
      Some("""{"_ARRAY_DIMENSIONS": ["trace"]}"""))
    val fields = Seq("cdp-x" -> "<i4", "elev" -> "<f4")
    ZarrMeta.writeArray(root, "headers",
      ZarrMeta.ArrayMeta(Seq(6L), Seq(3L), "|V8", Some("zstd"), None, fields = Some(fields)),
      Some("""{"_ARRAY_DIMENSIONS": ["trace"]}"""))
    ZarrMeta.consolidate(root)

    val df = (0L until 6L).map(i => (i, (2000 + i).toInt, i * 0.25f))
      .toDF("trace", "x", "e")
      .select(col("trace"), struct(col("x").as("cdp-x"), col("e").as("elev")).as("headers"))
    MdioWriter.writeVariable(spark, df, root.toString, "headers")

    val got = spark.read.format("mdio").load(root.toString)
      .orderBy("trace")
      .select(col("trace"), col("headers.`cdp-x`"), col("headers.elev"))
      .as[(Long, Int, Float)].collect().toSeq
    assert(got == (0L until 6L).map(i => (i, (2000 + i).toInt, i * 0.25f)))
    MdioWriter.delete(root.toString)
  }

  test("record dtype through the DSv2 sink: df.write.format(\"mdio\") round-trips") {
    val root = ZarrMeta.path(Files.createTempDirectory("mdio_recs").resolve("s.mdio").toString)
    ZarrMeta.writeGroup(root, Some("""{"name": "s"}"""))
    ZarrMeta.writeArray(root, "trace",
      ZarrMeta.ArrayMeta(Seq(6L), Seq(3L), "<i8", None, Some(0.0)),
      Some("""{"_ARRAY_DIMENSIONS": ["trace"]}"""))
    val fields = Seq("cdp-x" -> "<i4", "elev" -> "<f4", "flag" -> "|u1")
    ZarrMeta.writeArray(root, "headers",
      ZarrMeta.ArrayMeta(Seq(6L), Seq(3L), "|V9", Some("zstd"), None, fields = Some(fields)),
      Some("""{"_ARRAY_DIMENSIONS": ["trace"]}"""))
    ZarrMeta.consolidate(root)

    val df = (0L until 6L).map(i => (i, (3000 + i).toInt, i * 0.5f, (i % 2).toInt))
      .toDF("trace", "x", "e", "f")
      .select(col("trace"),
        struct(col("x").as("cdp-x"), col("e").as("elev"),
          col("f").cast("short").as("flag")).as("headers"))
    df.write.format("mdio").mode("append").save(root.toString)

    val got = spark.read.format("mdio").load(root.toString)
      .orderBy("trace")
      .select(col("trace"), col("headers.`cdp-x`"), col("headers.elev"), col("headers.flag"))
      .as[(Long, Int, Float, Short)].collect().toSeq
    assert(got == (0L until 6L).map(i => (i, (3000 + i).toInt, i * 0.5f, (i % 2).toShort)))
    // record structs now take the vectorized read path too
    val plan = spark.read.format("mdio").load(root.toString)
      .select("trace", "headers").queryExecution.executedPlan
    assert(plan.exists(_.isInstanceOf[org.apache.spark.sql.execution.ColumnarToRowExec]),
      plan.treeString.take(800))
    MdioWriter.delete(root.toString)
  }
}
