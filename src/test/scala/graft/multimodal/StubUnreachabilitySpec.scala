package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** The StubDecoder (the documented inter-predicted-video boundary) must be
  * UNREACHABLE from every oracle query's corpus: each multimodal_* /
  * pipeline media query feeds extractFeatures only formats with a real
  * pure-JVM codec. Two independent witnesses per corpus: (a) the format
  * set is within the real-codec dispatch; (b) every emitted feature row
  * carries content_hash == 0 — the real branches all set 0 and the stub's
  * rolling-hash signature is nonzero on every payload in the corpus. */
class StubUnreachabilitySpec extends SparkSpec {

  private val realFormats = Set(
    "image/bmp", "image/png", "image/jpeg", "image/gif", "video/h264", "audio/wav")

  private def corpora: Map[String, DataFrame] = {
    val docs = graft.Tables.documents(spark, sf)
    Map(
      "attachMixedPayload" -> Multimodal.attachMixedPayload(docs),
      "attachBmpPayload" -> Multimodal.attachBmpPayload(docs),
      "attachPngPayload" -> Multimodal.attachPngPayload(docs),
      "attachGifPayload" -> Multimodal.attachGifPayload(docs),
      "attachJpegPayload" -> Multimodal.attachJpegPayload(docs),
      "attachJpegProgressivePayload" -> Multimodal.attachJpegProgressivePayload(docs),
      "attachJpegColorPayload" -> Multimodal.attachJpegColorPayload(docs),
      "attachWavPayload" -> Multimodal.attachWavPayload(docs),
      "attachH264Payload" -> Multimodal.attachH264Payload(docs),
      "attachH264AcPayload" -> Multimodal.attachH264AcPayload(docs))
  }

  test("every extractFeatures corpus stays inside the real-codec dispatch") {
    for ((name, media) <- corpora) {
      val formats = media.select("format").distinct()
        .collect().map(_.getString(0)).toSet
      assert(formats.subsetOf(realFormats),
        s"$name emits formats ${formats -- realFormats} that would hit the StubDecoder")
    }
  }

  test("extractFeatures over every corpus never routes through the stub") {
    for ((name, media) <- corpora) {
      val feats = Multimodal.extractFeatures(spark, media)
      val stubRows = feats.filter(_.content_hash != 0L).count()
      assert(stubRows == 0L, s"$name: $stubRows rows carry the stub's hash signature")
    }
  }

  test("multimodal_bytes is the only attachPayload consumer, and it never decodes") {
    // the fake/rgb8 corpus survives solely for the payload-length query;
    // it must never reach extractFeatures from a registered query
    val media = Multimodal.attachPayload(graft.Tables.documents(spark, sf))
    val formats = media.select("format").distinct().collect().map(_.getString(0)).toSet
    assert(formats == Set("fake/rgb8"))
  }

  test("the mp4/mjpeg container corpora route through their dedicated demuxers") {
    // these two formats never reach extractFeatures from any registered
    // query — their queries call decodeMjpegKeyframes / the mp4 demuxer
    // directly; pin that the attach functions still declare them so a
    // future extractFeatures caller would trip the format-set test above
    val docs = graft.Tables.documents(spark, sf)
    val mjpeg = Multimodal.attachMjpegPayload(docs).select("format").distinct()
      .collect().map(_.getString(0)).toSet
    assert(mjpeg == Set("video/mjpeg"))
  }
}
