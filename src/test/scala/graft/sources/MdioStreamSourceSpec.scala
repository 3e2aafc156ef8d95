package graft.sources

import graft.SparkSpec
import graft.spec.MdioSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Streaming SOURCE over a growing MDIO store: `readStream.format("mdio")`
  * tails chunk objects appended along the leading dimension (the ingest
  * pattern the reference's SEG-Y pipeline produces), delivering each chunk
  * exactly once as a micro-batch of long-form rows. */
class MdioStreamSourceSpec extends SparkSpec {
  import spark.implicits._

  private def create(): String = {
    val dir = Files.createTempDirectory("mdio_src").resolve("s.mdio").toString
    MdioWriter.create(MdioSpec.fromJson(
      """{
        |  "metadata": {"name": "s", "apiVersion": "v1.0", "createdOn": "2026-01-01T00:00:00Z"},
        |  "variables": [
        |    {"name": "inline", "dataType": "int64",
        |     "dimensions": [{"name": "inline", "size": 8}]},
        |    {"name": "crossline", "dataType": "int64",
        |     "dimensions": [{"name": "crossline", "size": 6}]},
        |    {"name": "image", "dataType": "float64",
        |     "dimensions": [{"name": "inline", "size": 8}, {"name": "crossline", "size": 6}],
        |     "compressor": {"name": "zstd"},
        |     "metadata": {"chunkGrid": {"name": "regular", "configuration": {"chunkShape": [4, 3]}}}}
        |  ]
        |}""".stripMargin), dir)
    dir
  }

  private def writeInlines(dir: String, lo: Long, hi: Long): Unit = {
    val cells = for { i <- lo until hi; x <- 0L until 6L } yield (i, x, (i * 10 + x).toDouble)
    MdioWriter.writeVariable(spark,
      cells.toDF("inline", "crossline", "image"), dir, "image")
  }

  test("readStream tails appended chunks exactly once across micro-batches") {
    val dir = create()
    writeInlines(dir, 0L, 4L) // chunk row 0: chunks (0,0) and (0,1)

    val q = spark.readStream.format("mdio").load(dir)
      .writeStream.format("memory").queryName("mdio_tail").outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("mdio_tail").count() == 24)

      // ingest appends the next inline block -> chunks (1,0), (1,1) appear
      writeInlines(dir, 4L, 8L)
      q.processAllAvailable()
      val rows = spark.table("mdio_tail")
        .select("inline", "crossline", "image").as[(Long, Long, Double)].collect()
      assert(rows.length == 48, "each chunk delivered exactly once")
      assert(rows.toSet ==
        (for { i <- 0L until 8L; x <- 0L until 6L } yield (i, x, (i * 10 + x).toDouble)).toSet)

      // no data, no new batch rows
      q.processAllAvailable()
      assert(spark.table("mdio_tail").count() == 48)
    } finally q.stop()
    MdioWriter.delete(dir)
  }

  test("below-boundary backfill cannot shift offsets into duplicates") {
    val dir = create()
    writeInlines(dir, 4L, 8L) // only chunk ROW 1 present: chunks (1,0), (1,1)
    val meta = graft.zarr.ZarrMeta.readGroup(graft.zarr.ZarrMeta.path(dir))._2("image")._1
    val stream = new MdioMicroBatchStream(dir, Seq("inline", "crossline"),
      Map("image" -> meta),
      new org.apache.spark.sql.types.StructType()
        .add("inline", org.apache.spark.sql.types.LongType)
        .add("crossline", org.apache.spark.sql.types.LongType)
        .add("image", org.apache.spark.sql.types.DoubleType),
      Map.empty)
    val start = stream.initialOffset().asInstanceOf[MdioStreamOffset]
    val committed = stream.latestOffset().asInstanceOf[MdioStreamOffset]
    assert(committed.key == Vector(1L, 1L)) // max present chunk key
    assert(stream.planInputPartitions(start, committed).length == 2)
    // BACKFILL below the boundary: chunk row 0 appears after the commit.
    // A count-based offset would shift indices and re-deliver row-1 chunks;
    // the keyed offset neither re-delivers nor advances.
    writeInlines(dir, 0L, 4L)
    val after = stream.latestOffset().asInstanceOf[MdioStreamOffset]
    assert(after.key == committed.key, "max key unchanged by below-boundary backfill")
    assert(stream.planInputPartitions(committed, after).isEmpty)
    // offsets survive their JSON round-trip
    assert(stream.deserializeOffset(committed.json()) == committed)
    MdioWriter.delete(dir)
  }

  test("v2 tail prunes below-floor names at parse: planning set is O(new data)") {
    val dir = create() // v2 store: flat `i.j` chunk namespace
    writeInlines(dir, 0L, 8L) // all 4 chunks of the 2x2 grid present
    val meta = graft.zarr.ZarrMeta.readGroup(graft.zarr.ZarrMeta.path(dir))._2("image")._1
    assert(meta.version == 2)
    val stream = new MdioMicroBatchStream(dir, Seq("inline", "crossline"),
      Map("image" -> meta),
      new org.apache.spark.sql.types.StructType()
        .add("inline", org.apache.spark.sql.types.LongType)
        .add("crossline", org.apache.spark.sql.types.LongType)
        .add("image", org.apache.spark.sql.types.DoubleType),
      Map.empty)
    val first = stream.latestOffset().asInstanceOf[MdioStreamOffset]
    assert(first.key == Vector(1L, 1L))
    assert(MdioMicroBatchStream.lastListed == 4 && MdioMicroBatchStream.lastRetained == 4)
    stream.commit(first)
    // history must drop at parse on the next listing: chunk row 0 falls to
    // the leading-component floor, and (1,0) — sub-leading history WITHIN
    // the head slab — falls to the second-component floor, leaving only
    // the floor chunk itself in the sort/plan set (an append storm inside
    // the current leading slab stays O(new data) too)
    stream.latestOffset()
    assert(MdioMicroBatchStream.lastListed == 4, "flat namespace still lists in full")
    assert(MdioMicroBatchStream.lastRetained == 1,
      s"below-floor names must drop at parse, retained ${MdioMicroBatchStream.lastRetained}")
    // and a below-floor backfill row never re-plans even while retained=row1
    val after = stream.latestOffset().asInstanceOf[MdioStreamOffset]
    assert(after.key == first.key)
    assert(stream.planInputPartitions(first, after).isEmpty)
    MdioWriter.delete(dir)
  }

  test("v3 tail skips below-floor subtrees: listing is O(new subtrees)") {
    // the long-tail format-of-record pin: v3's hierarchical c/<i>/… layout
    // lets an advanced floor skip WHOLE leading-dim subtrees before any
    // inner LIST — a months-long tail of a growing store re-lists only the
    // head slab, where v2's flat namespace re-lists every name per trigger
    val dir = Files.createTempDirectory("mdio_src").resolve("s3.mdio").toString
    MdioWriter.create(MdioSpec.fromJson(
      """{
        |  "metadata": {"name": "s3", "apiVersion": "v1.0", "createdOn": "2026-01-01T00:00:00Z"},
        |  "variables": [
        |    {"name": "inline", "dataType": "int64",
        |     "dimensions": [{"name": "inline", "size": 8}]},
        |    {"name": "crossline", "dataType": "int64",
        |     "dimensions": [{"name": "crossline", "size": 6}]},
        |    {"name": "image", "dataType": "float64",
        |     "dimensions": [{"name": "inline", "size": 8}, {"name": "crossline", "size": 6}],
        |     "metadata": {"chunkGrid": {"name": "regular", "configuration": {"chunkShape": [4, 3]}}}}
        |  ]
        |}""".stripMargin), dir, version = 3)
    writeInlines(dir, 0L, 8L) // both inline subtrees c/0, c/1 fully present
    val meta = graft.zarr.ZarrMeta.readGroup(graft.zarr.ZarrMeta.path(dir))._2("image")._1
    assert(meta.version == 3)
    val stream = new MdioMicroBatchStream(dir, Seq("inline", "crossline"),
      Map("image" -> meta),
      new org.apache.spark.sql.types.StructType()
        .add("inline", org.apache.spark.sql.types.LongType)
        .add("crossline", org.apache.spark.sql.types.LongType)
        .add("image", org.apache.spark.sql.types.DoubleType),
      Map.empty)
    val first = stream.latestOffset().asInstanceOf[MdioStreamOffset]
    assert(first.key == Vector(1L, 1L))
    assert(MdioMicroBatchStream.lastSubtreesListed == 2,
      "cold start recurses into every subtree")
    stream.commit(first)
    // with the floor at chunk row 1, subtree c/0 is skipped BEFORE any
    // inner LIST: only the head slab's subtree is recursively listed
    stream.latestOffset()
    assert(MdioMicroBatchStream.lastSubtreesListed == 1,
      s"an advanced floor must skip below-floor subtrees, listed " +
        s"${MdioMicroBatchStream.lastSubtreesListed}")
    assert(MdioMicroBatchStream.lastRetained == 2) // head slab's own chunks
    MdioWriter.delete(dir)
  }

  test("streaming source honors pushed dim-range filters") {
    val dir = create()
    writeInlines(dir, 0L, 8L)
    val q = spark.readStream.format("mdio").load(dir)
      .filter($"crossline" < 3) // prunes chunk column 1 entirely
      .writeStream.format("memory").queryName("mdio_tail_f").outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("mdio_tail_f").select("inline", "crossline")
        .as[(Long, Long)].collect().toSet
      assert(got == (for { i <- 0L until 8L; x <- 0L until 3L } yield (i, x)).toSet)
    } finally q.stop()
    MdioWriter.delete(dir)
  }
}
