package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** H.264 I-frame codec: exact reconstruction of macroblock-constant
  * content through the real bitstream path (Annex-B NALs with emulation
  * prevention, SPS/PPS, IDR slice headers, I_PCM and Intra_16x16 CAVLC
  * macroblocks, DC dequant + inverse transforms), multi-frame streams,
  * and the loud-or-correct policy on everything outside the wired
  * surface. No third-party H.264 implementation exists in the JDK, so
  * cross-validation is spec-pinned (known-answer bit patterns below)
  * rather than differential — the blosc fixture discipline. */
class H264CodecSpec extends AnyFunSuite {

  /** MB-constant values (multiples of 10) for a wMbs x hMbs grid. */
  private def mbGrid(wMbs: Int, hMbs: Int, seed: Int): Array[Int] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(wMbs * hMbs)(rnd.nextInt(26) * 10)
  }

  private def expand(wMbs: Int, hMbs: Int, mbs: Array[Int]): Array[Byte] = {
    val w = wMbs * 16
    Array.tabulate(w * hMbs * 16) { i =>
      val x = i % w; val y = i / w
      mbs((y / 16) * wMbs + x / 16).toByte
    }
  }

  test("macroblock-constant frames round-trip exactly at every geometry") {
    for ((wm, hm, seed) <- Seq((2, 2, 1), (4, 3, 2), (1, 1, 3), (9, 7, 4), (1, 5, 5))) {
      val mbs = mbGrid(wm, hm, seed)
      val d = H264Codec.decode(H264Codec.encode(wm * 16, hm * 16, Seq(mbs)))
      assert(d.width == wm * 16 && d.height == hm * 16 && d.frames.size == 1)
      assert(d.frames.head.luma.sameElements(expand(wm, hm, mbs)),
        s"${wm}x$hm seed=$seed")
    }
  }

  test("multi-frame IDR streams decode per frame, in order") {
    val (wm, hm) = (3, 2)
    val frames = (0 until 5).map(f => mbGrid(wm, hm, 100 + f))
    val d = H264Codec.decode(H264Codec.encode(wm * 16, hm * 16, frames))
    assert(d.frames.size == 5)
    for ((mbs, i) <- frames.zipWithIndex)
      assert(d.frames(i).luma.sameElements(expand(wm, hm, mbs)), s"frame $i")
  }

  test("every DC residual magnitude the content rule allows survives exactly") {
    // a 26-MB strip walking values 0,250,10,240,...: consecutive residuals
    // hit the extreme +/-250..-230 range, exercising prefix-15 level codes
    val wm = 13; val hm = 2
    val vals = Array.tabulate(wm * hm)(k =>
      if (k == 0) 120 else if (k % 2 == 1) 250 - (k / 2) * 10 else (k / 2 - 1) * 10)
    val d = H264Codec.decode(H264Codec.encode(wm * 16, hm * 16, Seq(vals)))
    assert(d.frames.head.luma.sameElements(expand(wm, hm, vals)))
  }

  test("all four 16x16 prediction modes round-trip (V/H/Plane residual-free)") {
    // layout forces every selection rule: MB1 copies MB0 (Horizontal),
    // MB4 copies MB0 (Vertical), MB5 has l=t=diag equal (Plane), the
    // rest differ (DC with a quantized level)
    val wm = 4; val hm = 3
    val v = Array(
      50, 50, 70, 120,
      50, 50, 90, 120,
      10, 50, 90, 200)
    val d = H264Codec.decode(H264Codec.encode(wm * 16, hm * 16, Seq(v)))
    assert(d.frames.head.luma.sameElements(expand(wm, hm, v)))
    // and a frame where EVERY body MB equals its left neighbor: a pure
    // H-prediction chain with zero DC levels end to end
    val flat = Array.fill(wm * hm)(130)
    val df = H264Codec.decode(H264Codec.encode(wm * 16, hm * 16, Seq(flat)))
    assert(df.frames.head.luma.sameElements(expand(wm, hm, flat)))
  }

  test("emulation prevention: PCM zero runs force 00 00 03 escapes that decode away") {
    val mbs = mbGrid(2, 2, 9); mbs(0) = 0 // 256 zero PCM bytes
    val enc = H264Codec.encode(32, 32, Seq(mbs))
    val hasEpb = enc.sliding(3).exists(w => w(0) == 0 && w(1) == 0 && w(2) == 3)
    assert(hasEpb, "expected at least one emulation-prevention byte")
    assert(H264Codec.decode(enc).frames.head.luma.sameElements(expand(2, 2, mbs)))
  }

  test("known-answer: the encoder's SPS/PPS parse back to the signaled geometry") {
    // spec-pinned fields rather than a third-party decoder: the stream
    // declares 48x32 via pic_width/height_in_mbs and the decoder's own
    // independent parse must surface exactly that geometry
    val mbs = mbGrid(3, 2, 11)
    val d = H264Codec.decode(H264Codec.encode(48, 32, Seq(mbs)))
    assert(d.width == 48 && d.height == 32)
  }

  test("rejects malformed and out-of-scope streams loudly") {
    intercept[IllegalArgumentException] { H264Codec.decode("not video at all..".getBytes) }
    val good = H264Codec.encode(32, 32, Seq(mbGrid(2, 2, 21)))
    // truncations at structural boundaries
    for (cut <- Seq(6, 20, 40, good.length - 9))
      intercept[IllegalArgumentException] { H264Codec.decode(good.take(cut)) }
    // unknown NAL type: patch the slice NAL header (type 5 -> 14)
    val idx = findNal(good, 5)
    val badType = good.clone(); badType(idx) = ((badType(idx) & 0xe0) | 14).toByte
    intercept[IllegalArgumentException] { H264Codec.decode(badType) }
    // forbidden_zero_bit set
    val fzb = good.clone(); fzb(idx) = (fzb(idx) | 0x80).toByte
    intercept[IllegalArgumentException] { H264Codec.decode(fzb) }
    // CABAC PPS: entropy_coding_mode is the first bit after ue(0)ue(0)="11"
    val pIdx = findNal(good, 8)
    val cabac = good.clone(); cabac(pIdx + 1) = (cabac(pIdx + 1) | 0x20).toByte
    intercept[IllegalArgumentException] { H264Codec.decode(cabac) }
    // slice before SPS/PPS
    val sliceOnly = good.drop(findNal(good, 5) - 5)
    intercept[IllegalArgumentException] { H264Codec.decode(sliceOnly) }
  }

  test("encode validates the exactness contract") {
    intercept[IllegalArgumentException] { H264Codec.encode(30, 32, Seq(Array(1, 2))) }
    intercept[IllegalArgumentException] { // non-multiple-of-10 MB value
      H264Codec.encode(32, 32, Seq(Array(10, 15, 20, 30)))
    }
    intercept[IllegalArgumentException] { H264Codec.encode(32, 32, Seq.empty) }
  }

  /** Index of the NAL-header byte of the first NAL of the given type. */
  private def findNal(b: Array[Byte], nalType: Int): Int = {
    var i = 0
    while (i + 3 < b.length) {
      if (b(i) == 0 && b(i + 1) == 0 && b(i + 2) == 1 && (b(i + 3) & 0x1f) == nalType)
        return i + 3
      i += 1
    }
    fail(s"no NAL of type $nalType")
  }
}
