package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def media = Multimodal.attachPayload(
    Seq((1L, "abcd"), (2L, ""), (3L, "hello world")).toDF("doc_id", "text"))

  test("attachPayload produces binary payload + typed metadata") {
    val r = media.schema.fields.map(f => f.name -> f.dataType.simpleString).toMap
    assert(r("payload") == "binary" && r("width") == "int" && r("height") == "int")
    assert(media.count() == 3)
  }

  test("extractFeatures runs the per-partition decode and preserves rows") {
    val feats = Multimodal.extractFeatures(spark, media).collect().sortBy(_.doc_id)
    assert(feats.map(_.doc_id).toSeq == Seq(1L, 2L, 3L))
    assert(feats(0).n_bytes == 4L && feats(1).n_bytes == 0L)
    assert(feats(1).mean_luma == 0.0)
    // deterministic fake: same payload -> same features
    val again = Multimodal.extractFeatures(spark, media).collect().sortBy(_.doc_id)
    assert(feats.map(_.frame_hash).toSeq == again.map(_.frame_hash).toSeq)
  }

  test("sampleFrames emits every k-th block with the right byte slice") {
    val df = Multimodal.sampleFrames(media.filter(col("doc_id") === 3), everyK = 1, blockBytes = 4)
    val rows = df.select("frame_idx", "frame_bytes").as[(Int, Array[Byte])]
      .collect().sortBy(_._1)
    assert(rows.length == 2)  // "hello world" = 11 bytes -> 2 full-ish blocks
    assert(new String(rows(0)._2) == "hell")
  }
}
