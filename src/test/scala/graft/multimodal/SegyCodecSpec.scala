package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** SEG-Y rev-1 writer/reader contract: byte-level layout pins (header
  * offsets against the public standard), IBM hexadecimal float properties
  * (known bit patterns, exactness band, random round-trip), EBCDIC card
  * round-trip, IEEE format duality, and adversarial inputs — the same
  * malformed-input discipline as the other media codecs. */
class SegyCodecSpec extends AnyFunSuite {
  import SegyCodec._

  private def mkTrace(xl: Int, n: Int = 8): Trace =
    Trace(inline = 7, crossline = xl, cdpX = 100 + xl, cdpY = 200,
      samples = Array.tabulate(n)(i => (i * xl).toDouble))

  test("IBM float: public known bit patterns decode exactly") {
    // canonical examples from the public IBM/SEG-Y literature
    assert(ibmDecode(0x42640000) === 100.0)  // 0.390625 * 16^2
    assert(ibmDecode(0xC2640000) === -100.0)
    assert(ibmDecode(0x41100000) === 1.0)    // 0.0625 * 16
    assert(ibmDecode(0x40800000) === 0.5)
    assert(ibmDecode(0) === 0.0)
    assert(ibmEncode(100.0) === 0x42640000)
    assert(ibmEncode(-100.0) === 0xC2640000.toInt)
    assert(ibmEncode(1.0) === 0x41100000)
    assert(ibmEncode(0.5) === 0x40800000)
    assert(ibmEncode(0.0) === 0)
  }

  test("IBM float: every integer magnitude below 2^21 round-trips exactly") {
    val rnd = new scala.util.Random(42)
    (0 until 5000).foreach { _ =>
      val v = (rnd.nextInt(1 << 21) - (1 << 20)).toDouble
      assert(ibmDecode(ibmEncode(v)) === v, s"integer $v")
    }
    // and the normalization boundaries themselves
    Seq(15.0, 16.0, 17.0, 255.0, 256.0, 4095.0, 4096.0, 1048575.0)
      .foreach(v => assert(ibmDecode(ibmEncode(v)) === v))
  }

  test("IBM float: random doubles round-trip within 24-bit fraction error") {
    val rnd = new scala.util.Random(7)
    (0 until 5000).foreach { _ =>
      val v = math.scalb(rnd.nextDouble() - 0.5, rnd.nextInt(40) - 20)
      val back = ibmDecode(ibmEncode(v))
      // fraction carries >= 21 significant bits after <= 3 normalization
      // zeros; error bound is one ulp at 2^-21 relative
      assert(math.abs(back - v) <= math.abs(v) * 1.1e-6 + 1e-300, s"$v -> $back")
    }
  }

  test("IBM float: NaN/Inf and out-of-range magnitudes reject loud") {
    intercept[IllegalArgumentException](ibmEncode(Double.NaN))
    intercept[IllegalArgumentException](ibmEncode(Double.PositiveInfinity))
    intercept[IllegalArgumentException](ibmEncode(math.scalb(1.0, 300)))
  }

  test("layout: header words land at the public standard's offsets") {
    val bytes = write("C01 TEST", dtMicros = 2000, formatCode = 1,
      traces = Seq(mkTrace(3, n = 4)))
    assert(bytes.length === 3600 + 240 + 16)
    val bb = java.nio.ByteBuffer.wrap(bytes)
    assert(bb.getShort(3216) === 2000)      // bytes 3217-3218: dt
    assert(bb.getShort(3220) === 4)         // bytes 3221-3222: samples/trace
    assert(bb.getShort(3224) === 1)         // bytes 3225-3226: format code
    assert(bb.getShort(3500) === 0x0100)    // rev 1.0
    assert(bb.getShort(3502) === 1)         // fixed-length flag
    assert(bb.getInt(3600) === 1)           // trace sequence number
    assert(bb.getShort(3600 + 28) === 1)    // trace id: live seismic
    assert(bb.getShort(3600 + 114) === 4)   // samples this trace
    assert(bb.getInt(3600 + 188) === 7)     // rev-1 inline word
    assert(bb.getInt(3600 + 192) === 3)     // rev-1 crossline word
    // EBCDIC of "C01 TEST": C=0xC3 0=0xF0 1=0xF1 space=0x40 T=0xE3 ...
    assert((bytes(0) & 0xff) === 0xC3 && (bytes(3) & 0xff) === 0x40 &&
      (bytes(4) & 0xff) === 0xE3)
  }

  test("round-trip: headers, textual cards, and samples survive both formats") {
    val traces = (0 until 5).map(xl => mkTrace(xl, n = 16))
    for (fmt <- Seq(1, 5)) {
      val sg = read(write("C01 GRAFT\nC02 LINE 9", 4000, fmt, traces))
      assert(sg.formatCode === fmt && sg.dtMicros === 4000)
      assert(sg.textual.startsWith("C01 GRAFT\nC02 LINE 9"))
      assert(sg.traces.size === 5)
      sg.traces.zipWithIndex.foreach { case (t, xl) =>
        assert(t.inline === 7 && t.crossline === xl)
        assert(t.cdpX === 100 + xl && t.cdpY === 200)
        assert(t.samples.toSeq === mkTrace(xl, 16).samples.toSeq)
      }
    }
  }

  test("python-written fixture parses exactly (two codebases, one wire format)") {
    // src/test/resources/segy_fixture/pytape.sgy is written by the
    // INDEPENDENT python codec (tools/segy_py.py via make_segy_fixture.py):
    // stdlib cp037 EBCDIC + frexp-based IBM floats. Exact agreement here
    // rules out compensating encode/decode bugs in the Scala codec.
    val in = getClass.getResourceAsStream("/segy_fixture/pytape.sgy")
    assert(in != null, "segy fixture missing — run tools/make_segy_fixture.py")
    val bytes = in.readAllBytes(); in.close()
    val sg = read(bytes)
    assert(sg.textual.startsWith("C01 PYTHON WROTE THIS TAPE\nC02 GRAFT INTEROP FIXTURE"))
    assert(sg.dtMicros === 2000 && sg.formatCode === 1 && sg.traces.size === 3)
    val t0 = sg.traces(0)
    assert(t0.inline === 12 && t0.crossline === 34 &&
      t0.cdpX === -777 && t0.cdpY === 888)
    assert(t0.samples.toSeq === Seq(0.0, 1.0, -1.0, 0.5, -0.0625, 100.0,
      ibmDecode(ibmEncode(-3.1415926535)), 2097151.0))
    val t1 = sg.traces(1)
    assert(t1.samples.toSeq === Seq(15.0 / 16.0, -255.0 / 256.0, 16.0, 256.0,
      4096.0, -65536.0, 1048576.0, 0.001953125))
    val t2 = sg.traces(2)
    assert(t2.cdpX === Int.MaxValue && t2.cdpY === Int.MinValue)
    assert(t2.samples(2) === 123456.0 && t2.samples(3) === -654321.0 &&
      t2.samples(7) === 31.9375)
    // cross-implementation IBM agreement on the non-exact values too:
    // python rounded the same 24-bit fraction the Scala encoder produces
    assert(t2.samples(5) === ibmDecode(ibmEncode(42.42)))
    assert(t2.samples(6) === ibmDecode(ibmEncode(-0.001)))
  }

  test("malformed inputs reject loud, never a partial parse") {
    val good = write("C01 X", 4000, 1, Seq(mkTrace(1, n = 4)))
    intercept[IllegalArgumentException](read(good.take(3599).toArray)) // short file
    intercept[IllegalArgumentException](read(good.dropRight(3).toArray)) // ragged trace region
    val badFmt = good.clone
    badFmt(3225) = 3 // int16 format: unsupported here
    intercept[IllegalArgumentException](read(badFmt))
    val zeroN = good.clone
    zeroN(3220) = 0; zeroN(3221) = 0
    intercept[IllegalArgumentException](read(zeroN))
    val lyingTrace = good.clone
    lyingTrace(3600 + 115) = 9 // trace header disagrees with file header
    intercept[IllegalArgumentException](read(lyingTrace))
    intercept[IllegalArgumentException]( // writer: mixed trace lengths
      write("C01", 4000, 1, Seq(mkTrace(1, 4), mkTrace(2, 5))))
    intercept[IllegalArgumentException]( // writer: unsupported format
      write("C01", 4000, 2, Seq(mkTrace(1, 4))))
  }
}
