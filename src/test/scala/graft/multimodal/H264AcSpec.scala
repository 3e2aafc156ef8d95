package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite
import H264Codec.MbSpec

/** Round 9 surface: Intra_16x16 AC residuals (CodedBlockPatternLuma 15)
  * and I_NxN macroblocks through all nine 4x4 spatial prediction modes.
  * Expected pixels are computed INDEPENDENTLY here (hand-derived delta
  * matrices from the QP-36 dequant + inverse-transform arithmetic), not
  * by calling back into the codec — the closed forms below are the same
  * ones the DuckDB oracle of multimodal_h264_ac recomputes. */
class H264AcSpec extends AnyFunSuite {

  // single AC coefficient `L` at zigzag 1 (raster (0,1)) at QP 36:
  // d = 13*64*L; residual columns (dc part excluded) per x:
  private def colDelta(level: Int): Array[Int] = level match {
    case 1 => Array(13, 7, -6, -13)
    case 2 => Array(26, 13, -13, -26)
  }
  // two +1 coefficients at zigzag 1 and 2 (rasters (0,1) and (1,0)):
  // delta(y)(x) — row y, column x
  private val Tc2Delta: Array[Array[Int]] = Array(
    Array(26, 20, 7, 0),
    Array(20, 13, 0, -6),
    Array(7, 0, -13, -19),
    Array(0, -6, -19, -26))

  /** Expected luma plane for a frame of MbSpecs (the encoder contract). */
  private def expectedPlane(wMbs: Int, hMbs: Int, specs: Array[MbSpec]): Array[Byte] = {
    val w = wMbs * 16
    val out = new Array[Byte](w * hMbs * 16)
    for (mb <- specs.indices) {
      val mbx = mb % wMbs; val mby = mb / wMbs
      val (base, acLevel) = specs(mb) match {
        case MbSpec.Pcm(v)     => (v, 0)
        case MbSpec.Const(v)   => (v, 0)
        case MbSpec.I4x4(v)    => (v, 0)
        case MbSpec.DcAc(v, a) => (v, a)
      }
      for (py <- 0 until 16; px <- 0 until 16) {
        val bx = px / 4; val by = py / 4
        val delta =
          if (acLevel == 0) 0
          else if ((bx, by) == (1, 1) || (bx, by) == (2, 2)) colDelta(acLevel)(px % 4)
          else if ((bx, by) == (2, 1)) Tc2Delta(py % 4)(px % 4)
          else 0
        out((mby * 16 + py) * w + mbx * 16 + px) = (base + delta).toByte
      }
    }
    out
  }

  test("Intra_16x16 AC residuals reconstruct the hand-derived delta pattern exactly") {
    val wm = 4; val hm = 3
    val specs: Array[MbSpec] = Array(
      MbSpec.Pcm(120), MbSpec.DcAc(40, 1), MbSpec.DcAc(210, 2), MbSpec.Const(100),
      MbSpec.DcAc(30, 1), MbSpec.Const(100), MbSpec.DcAc(100, 2), MbSpec.DcAc(160, 1),
      MbSpec.Const(0), MbSpec.DcAc(130, 2), MbSpec.DcAc(70, 1), MbSpec.Const(250))
    val d = H264Codec.decode(H264Codec.encodeFrames(wm * 16, hm * 16, Seq(specs)))
    assert(d.frames.size == 1)
    assert(d.frames.head.luma.sameElements(expectedPlane(wm, hm, specs)))
    // the AC-sensitive statistic matches its closed form: per DcAc MB,
    // sumSq = 256c^2 + 16c*s1 + 8q1 + 8c + 3382 with (s1,q1) = (1,423)
    // for level 1 and (0,1690) for level 2; others contribute 256v^2
    val expectSq = specs.map {
      case MbSpec.Pcm(v)     => 256L * v * v
      case MbSpec.Const(v)   => 256L * v * v
      case MbSpec.I4x4(v)    => 256L * v * v
      case MbSpec.DcAc(c, a) =>
        val (s1, q1) = if (a == 1) (1L, 423L) else (0L, 1690L)
        256L * c * c + 16L * c * s1 + 8L * q1 + 8L * c + 3382L
    }.sum
    assert(d.frames.head.lumaSqSum == expectSq)
    val expectSum = specs.map {
      case MbSpec.DcAc(c, a) => 256L * c + (if (a == 1) 8L else 0L) + 4L
      case MbSpec.Pcm(v)     => 256L * v
      case MbSpec.Const(v)   => 256L * v
      case MbSpec.I4x4(v)    => 256L * v
    }.sum
    assert(d.frames.head.lumaSum == expectSum)
  }

  test("I_NxN macroblocks reconstruct constants through all nine 4x4 modes") {
    val wm = 4; val hm = 3
    // I4x4 MBs with values differing from their bridge neighbor (DC
    // residual path, cbp 1) and equal to it (cbp 0 path)
    val specs: Array[MbSpec] = Array(
      MbSpec.Pcm(120), MbSpec.I4x4(40), MbSpec.I4x4(40), MbSpec.I4x4(250),
      MbSpec.I4x4(120), MbSpec.Const(90), MbSpec.I4x4(0), MbSpec.I4x4(30),
      MbSpec.I4x4(120), MbSpec.I4x4(200), MbSpec.Const(200), MbSpec.I4x4(10))
    val d = H264Codec.decode(H264Codec.encodeFrames(wm * 16, hm * 16, Seq(specs)))
    assert(d.frames.head.luma.sameElements(expectedPlane(wm, hm, specs)))
  }

  test("mixed-spec multi-frame streams, IDR-only and open-GOP, decode identically") {
    val wm = 3; val hm = 3
    val rnd = new scala.util.Random(7)
    val frames = Seq.tabulate(4) { fi =>
      Array.tabulate[MbSpec](wm * hm) { k =>
        if (k == 0) MbSpec.Pcm(rnd.nextInt(26) * 10)
        else (fi + k) % 3 match {
          case 0 => MbSpec.Const(rnd.nextInt(26) * 10)
          case 1 => MbSpec.DcAc(30 + rnd.nextInt(19) * 10, 1 + rnd.nextInt(2))
          case 2 => MbSpec.I4x4(rnd.nextInt(26) * 10)
        }
      }
    }
    val allIdr = H264Codec.decode(H264Codec.encodeFrames(wm * 16, hm * 16, frames))
    // open GOP: frames 1.. are non-IDR reference I slices whose
    // dec_ref_pic_marking bit must be consumed (the round-8 ADVICE desync)
    val openGop = H264Codec.decode(
      H264Codec.encodeFrames(wm * 16, hm * 16, frames, allIdr = false))
    assert(allIdr.frames.size == 4 && openGop.frames.size == 4)
    for (fi <- 0 until 4) {
      assert(allIdr.frames(fi).luma.sameElements(expectedPlane(wm, hm, frames(fi))), s"idr $fi")
      assert(openGop.frames(fi).luma.sameElements(expectedPlane(wm, hm, frames(fi))), s"gop $fi")
    }
  }

  test("encode validates the AC/I4x4 contracts loudly") {
    // DcAc value outside [30,210] would clip the AC swing
    intercept[IllegalArgumentException] {
      H264Codec.encodeFrames(32, 32, Seq(Array[MbSpec](
        MbSpec.Pcm(0), MbSpec.DcAc(250, 1), MbSpec.Const(0), MbSpec.Const(0))))
    }
    // I4x4 at MB 0 has no neighbor to bridge from
    intercept[IllegalArgumentException] {
      H264Codec.encodeFrames(32, 32, Seq(Array[MbSpec](
        MbSpec.I4x4(100), MbSpec.Const(0), MbSpec.Const(0), MbSpec.Const(0))))
    }
  }
}
