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

  test("BmpCodec: golden 2x2 image encodes to exact BMP bytes and decodes back") {
    // pixels (top-down): 0, 64, 128, 255
    val bmp = BmpCodec.encode(2, 2, Array[Byte](0, 64, 128.toByte, 255.toByte))
    assert(bmp.length == 54 + 2 * (6 + 2)) // 2 rows of 6 pixel bytes + 2 pad
    assert(bmp(0) == 'B' && bmp(1) == 'M')
    assert((bmp(18) & 0xff) == 2 && (bmp(22) & 0xff) == 2) // width, height
    assert((bmp(28) & 0xff) == 24) // bpp
    // bottom row first: pixels 128, 255 as BGR triples
    assert((bmp(54) & 0xff) == 128 && (bmp(55) & 0xff) == 128 && (bmp(56) & 0xff) == 128)
    assert((bmp(57) & 0xff) == 255)
    val d = BmpCodec.decode(bmp)
    assert(d.width == 2 && d.height == 2)
    assert(d.meanLuma == (0 + 64 + 128 + 255).toDouble / 4 / 255.0)
  }

  test("BmpCodec rejects non-BMP and unsupported flavors loudly") {
    intercept[IllegalArgumentException] { BmpCodec.decode("not a bitmap at all, just text".getBytes) }
    val bmp = BmpCodec.encode(2, 2, Array[Byte](1, 2, 3, 4))
    bmp(28) = 8 // claim 8 bpp
    intercept[IllegalArgumentException] { BmpCodec.decode(bmp) }
  }

  test("extractFeatures decodes real BMP payloads end to end") {
    val docs = Seq((1L, "abcd"), (2L, "")).toDF("doc_id", "text")
    val out = Multimodal.extractFeatures(spark, Multimodal.attachBmpPayload(docs))
      .collect().map(f => f.doc_id -> f).toMap
    // doc 1: w=17,h=17 (1%64+16, 1%48+16); pixels cycle 'a'..'d'
    val (w, h) = (17, 17)
    val t = "abcd".getBytes("UTF-8").map(_ & 0xff)
    val n = w * h
    val pixSum = (0 until n).map(i => t(i % t.length)).sum
    assert(out(1L).mean_luma == pixSum.toDouble / n / 255.0)
    assert(out(1L).thumb_w == w / 2 && out(1L).thumb_h == h / 2)
    val rowBytes = 3 * w; val pad = (4 - rowBytes % 4) % 4
    assert(out(1L).n_bytes == 54L + (rowBytes + pad) * h)
    assert(out(2L).mean_luma == 0.0, "empty text renders an all-black image")
  }

  test("WavCodec: golden mono PCM round-trip with exact header bytes") {
    val wav = WavCodec.encode(Array[Short](0, 16384, -16384, 32767), 8000)
    assert(wav.length == 44 + 8)
    assert(new String(wav, 0, 4) == "RIFF" && new String(wav, 8, 4) == "WAVE")
    assert((wav(22) & 0xff) == 1, "mono") // channels LE16 low byte
    assert((wav(34) & 0xff) == 16, "16-bit")
    val d = WavCodec.decode(wav)
    assert(d.nSamples == 4 && d.sampleRate == 8000)
    assert(d.durationSec == 4.0 / 8000)
    assert(d.meanAbsAmplitude == (0L + 16384 + 16384 + 32767).toDouble / 4 / 32768.0)
  }

  test("WavCodec rejects non-WAV and unsupported flavors loudly") {
    intercept[IllegalArgumentException] { WavCodec.decode("definitely not audio bytes".getBytes) }
    val wav = WavCodec.encode(Array[Short](1, 2), 8000)
    wav(34) = 8 // claim 8-bit samples
    intercept[IllegalArgumentException] { WavCodec.decode(wav) }
  }

  test("extractFeatures decodes real WAV payloads end to end") {
    val docs = Seq((1L, "ab"), (2L, "")).toDF("doc_id", "text")
    val out = Multimodal.extractFeatures(spark,
      Multimodal.attachWavPayload(docs, sampleRate = 8000, nSamples = 64))
      .collect().map(f => f.doc_id -> f).toMap
    // doc 1: samples cycle (|'a'-128|, |'b'-128|)*256 = (31, 30)*256
    val want = (0 until 64).map(i => math.abs((if (i % 2 == 0) 'a' else 'b') - 128) * 256L).sum
    assert(out(1L).mean_luma == want.toDouble / 64 / 32768.0)
    assert(out(1L).thumb_w == 64 && out(1L).thumb_h == 8000)
    assert(out(1L).n_bytes == 44L + 128)
    assert(out(2L).mean_luma == 0.0, "empty text renders silence")
  }

  test("sampleFrames emits every k-th block with the right byte slice") {
    val df = Multimodal.sampleFrames(media.filter(col("doc_id") === 3), everyK = 1, blockBytes = 4)
    val rows = df.select("frame_idx", "frame_bytes").as[(Int, Array[Byte])]
      .collect().sortBy(_._1)
    assert(rows.length == 2)  // "hello world" = 11 bytes -> 2 full-ish blocks
    assert(new String(rows(0)._2) == "hell")
  }
}
