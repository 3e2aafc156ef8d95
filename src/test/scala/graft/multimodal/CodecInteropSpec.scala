package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** Cross-implementation validation of the pure-JVM media codecs against
  * the JDK's own INDEPENDENT implementations — javax.imageio for PNG/BMP
  * and javax.sound.sampled for WAV. Two codebases, one wire format, both
  * directions: whatever graft encodes, the JDK must decode to identical
  * pixels/samples, and whatever the JDK encodes, graft must decode to
  * identical features. (The same discipline as the python blosc interop
  * loop — no self-roundtrip blind spots.) */
class CodecInteropSpec extends AnyFunSuite {

  private def gray(w: Int, h: Int, seed: Int): Array[Byte] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(w * h)(rnd.nextInt(256).toByte)
  }

  test("PNG: ImageIO decodes graft-encoded images pixel-exact") {
    for ((w, h, seed) <- Seq((17, 17, 1), (64, 48, 2), (1, 7, 3))) {
      val px = gray(w, h, seed)
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(PngCodec.encode(w, h, px)))
      assert(img.getWidth == w && img.getHeight == h)
      // raw raster samples: getRGB would run the JDK's gray->sRGB color
      // transform and report gamma-shifted values
      for (y <- 0 until h; x <- 0 until w) {
        val v = px(y * w + x) & 0xff
        val got = img.getRaster.getSample(x, y, 0)
        assert(got == v, s"pixel ($x,$y) of ${w}x$h differs: ImageIO $got vs $v")
      }
    }
  }

  test("PNG: graft decodes ImageIO-encoded images to the exact mean luma") {
    val (w, h) = (23, 11)
    val px = gray(w, h, 7)
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w) // raw samples, not setRGB (gamma)
      img.getRaster.setSample(x, y, 0, px(y * w + x) & 0xff)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", bos), "JDK PNG writer unavailable")
    val d = PngCodec.decode(bos.toByteArray)
    assert(d.width == w && d.height == h)
    val want = px.map(_ & 0xff).map(_.toLong).sum.toDouble / (w * h) / 255.0
    assert(d.meanLuma == want, s"ImageIO-written PNG decoded luma ${d.meanLuma} != $want")
  }

  test("BMP: ImageIO decodes graft-encoded images pixel-exact") {
    val (w, h) = (17, 17)
    val px = gray(w, h, 9)
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(BmpCodec.encode(w, h, px)))
    assert(img.getWidth == w && img.getHeight == h)
    for (y <- 0 until h; x <- 0 until w) {
      val v = px(y * w + x) & 0xff
      assert((img.getRGB(x, y) & 0xff) == v, s"pixel ($x,$y)")
    }
  }

  test("WAV: javax.sound parses graft-encoded audio; graft decodes JDK-written WAV") {
    import javax.sound.sampled._
    val samples = Array.tabulate(256)(i => ((i * 257) % 65536 - 32768).toShort)
    // graft -> JDK
    val ais = AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(WavCodec.encode(samples, 8000)))
    val f = ais.getFormat
    assert(f.getSampleRate == 8000f && f.getChannels == 1 && f.getSampleSizeInBits == 16)
    val raw = ais.readAllBytes()
    assert(raw.length == samples.length * 2)
    val got = (0 until samples.length).map { i =>
      (((raw(2 * i + 1) & 0xff) << 8) | (raw(2 * i) & 0xff)).toShort
    }
    assert(got == samples.toSeq, "JDK-decoded samples differ")
    // JDK -> graft
    val fmt = new AudioFormat(8000f, 16, 1, true, false) // signed 16-bit LE mono
    val pcm = new Array[Byte](samples.length * 2)
    samples.zipWithIndex.foreach { case (s, i) =>
      pcm(2 * i) = (s & 0xff).toByte; pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, samples.length),
      AudioFileFormat.Type.WAVE, bos)
    val d = WavCodec.decode(bos.toByteArray)
    assert(d.nSamples == samples.length && d.sampleRate == 8000)
    val want = samples.map(s => math.abs(s.toLong)).sum.toDouble / samples.length / 32768.0
    assert(d.meanAbsAmplitude == want)
  }
}
