package graft.multimodal

import java.io.ByteArrayOutputStream

/** Pure-JVM H.264/AVC **I-frame** codec (ITU-T H.264 baseline profile,
  * CAVLC entropy coding), written against the PUBLIC spec — no codec
  * libraries. This is the keyframe-decode path of a crawl pipeline: an
  * Annex-B elementary stream of IDR pictures in, luma rasters out.
  *
  * Decode surface (v1, loud-or-correct — everything else rejects with a
  * message, never a silent wrong answer):
  *  - Annex-B start codes, emulation-prevention-byte removal, SPS/PPS
  *    (baseline fields, frame_mbs_only, optional frame cropping),
  *    IDR/non-IDR I-slice headers, exp-Golomb throughout;
  *  - macroblocks: `I_PCM` (raw samples) and `Intra_16x16` with all four
  *    luma prediction modes (V/H/DC/Plane), CAVLC luma-DC residual
  *    (coeff_token, levels with suffix growth, total_zeros, run_before),
  *    the 4x4 inverse Hadamard, the DC dequant ladder at any QP, and the
  *    4x4 inverse integer transform; chroma planes are consumed (I_PCM)
  *    or prediction-only (CBP chroma 0) and not emitted — the pipeline
  *    is grayscale;
  *  - rejected loudly: CABAC, P/B slices, I_NxN and Intra_16x16 AC
  *    residuals (CodedBlockPattern != 0), multi-slice pictures, fields.
  *    The CAVLC tables wired are the ones the supported surface can
  *    reach (nC < 2, nC >= 8 FLC, TotalCoeff <= 1 total_zeros); streams
  *    needing the 2<=nC<8 tables reject rather than decode half-trusted.
  *
  * Encode writes conformant single-slice IDR pictures: macroblock-constant
  * gray frames where MB (0,0) is I_PCM and every other MB is
  * I_16x16_2_0_0 (DC prediction, CBP 0) carrying exactly one quantized
  * luma-DC level. At QP 36 the dequant chain is dcY = 160*level and the
  * DC-only inverse transform is r = (dcY + 32) >> 6, so a residual of
  * 5k reconstructs EXACTLY from level 2k — with MB values restricted to
  * multiples of 10, DC prediction ((a+b+1)>>1 of multiples of 10) keeps
  * every residual a multiple of 5 and the whole frame survives the lossy
  * format bit-exactly (the multimodal_jpeg DC-only discipline, for AVC).
  * Reference intent parity: mdio has no video layer; this serves the
  * crawl-pipeline surface next to JpegCodec/Mp4Codec.
  */
object H264Codec {

  final case class Frame(width: Int, height: Int, luma: Array[Byte]) {
    def lumaSum: Long = {
      var s = 0L; var i = 0
      while (i < luma.length) { s += luma(i) & 0xff; i += 1 }
      s
    }
    def meanLuma: Double = lumaSum.toDouble / (width.toLong * height) / 255.0
  }

  final case class Decoded(width: Int, height: Int, frames: Vector[Frame])

  // ---- bit reader over an RBSP (MSB-first) ------------------------------

  private final class BitReader(buf: Array[Byte]) {
    private var pos = 0 // bit position
    def bitsLeft: Int = buf.length * 8 - pos
    def u1(): Int = {
      require(pos < buf.length * 8, "H264: bitstream exhausted")
      val b = (buf(pos >> 3) >> (7 - (pos & 7))) & 1
      pos += 1; b
    }
    def u(n: Int): Int = {
      var v = 0; var i = 0
      while (i < n) { v = (v << 1) | u1(); i += 1 }
      v
    }
    def ue(): Int = {
      var zeros = 0
      while (u1() == 0) { zeros += 1; require(zeros < 32, "H264: bad exp-Golomb") }
      (1 << zeros) - 1 + u(zeros)
    }
    def se(): Int = {
      val k = ue()
      if (k % 2 == 1) (k + 1) / 2 else -(k / 2)
    }
    def byteAlign(): Unit = while ((pos & 7) != 0) {
      require(u1() == 0, "H264: pcm alignment bit not zero")
    }
    def byte(): Int = {
      require((pos & 7) == 0, "H264: unaligned byte read")
      require(pos < buf.length * 8, "H264: bitstream exhausted")
      val v = buf(pos >> 3) & 0xff
      pos += 8; v
    }
  }

  // ---- bit writer --------------------------------------------------------

  private final class BitWriter {
    private val out = new ByteArrayOutputStream()
    private var acc = 0; private var nbits = 0
    def u(v: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        acc = (acc << 1) | ((v >> i) & 1); nbits += 1
        if (nbits == 8) { out.write(acc); acc = 0; nbits = 0 }
        i -= 1
      }
    }
    def u1(v: Int): Unit = u(v, 1)
    def ue(v: Int): Unit = {
      require(v >= 0)
      val k = v + 1
      val len = 32 - Integer.numberOfLeadingZeros(k)
      u(0, len - 1); u(k, len)
    }
    def se(v: Int): Unit = ue(if (v > 0) 2 * v - 1 else -2 * v)
    def byteAlignZero(): Unit = while (nbits != 0) u1(0)
    def byte(v: Int): Unit = { require(nbits == 0); out.write(v & 0xff) }
    def rbspTrailing(): Unit = { u1(1); byteAlignZero() }
    def toBytes: Array[Byte] = { require(nbits == 0, "unflushed bits"); out.toByteArray }
  }

  // ---- NAL layer ---------------------------------------------------------

  /** Strip emulation-prevention bytes: 00 00 03 xx -> 00 00 xx. */
  private def unescapeRbsp(b: Array[Byte], from: Int, until: Int): Array[Byte] = {
    val out = new ByteArrayOutputStream(until - from)
    var i = from
    var zeros = 0
    while (i < until) {
      val v = b(i) & 0xff
      if (zeros >= 2 && v == 3) { zeros = 0 } // drop the EPB
      else {
        out.write(v)
        zeros = if (v == 0) zeros + 1 else 0
      }
      i += 1
    }
    out.toByteArray
  }

  /** Insert emulation-prevention bytes into a raw RBSP. */
  private def escapeRbsp(rbsp: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(rbsp.length + 16)
    var zeros = 0
    for (b <- rbsp) {
      val v = b & 0xff
      if (zeros >= 2 && v <= 3) { out.write(3); zeros = 0 }
      out.write(v)
      zeros = if (v == 0) zeros + 1 else 0
    }
    out.toByteArray
  }

  private final case class Sps(widthMbs: Int, heightMbs: Int,
                               log2MaxFrameNum: Int, pocType: Int,
                               cropRight: Int, cropBottom: Int)
  private final case class Pps(picInitQp: Int, deblockPresent: Boolean)

  // ---- SPS / PPS ---------------------------------------------------------

  private def parseSps(r: BitReader): Sps = {
    val profile = r.u(8)
    r.u(8) // constraint flags + reserved
    r.u(8) // level_idc
    r.ue() // sps id
    require(!Set(100, 110, 122, 244, 44, 83, 86, 118, 128).contains(profile),
      s"H264: high/extended profile $profile unsupported (chroma/scaling fields)")
    val log2MaxFrameNum = r.ue() + 4
    val pocType = r.ue()
    pocType match {
      case 0 => r.ue() // log2_max_poc_lsb
      case 1 => throw new IllegalArgumentException("H264: poc type 1 unsupported")
      case 2 => ()
      case x => throw new IllegalArgumentException(s"H264: bad poc type $x")
    }
    r.ue() // max_num_ref_frames
    r.u1() // gaps allowed
    val wMbs = r.ue() + 1
    val hUnits = r.ue() + 1
    val frameMbsOnly = r.u1()
    require(frameMbsOnly == 1, "H264: interlaced (frame_mbs_only=0) unsupported")
    r.u1() // direct_8x8_inference
    val crop = r.u1()
    var (cl, cr, ct, cb) = (0, 0, 0, 0)
    if (crop == 1) { cl = r.ue(); cr = r.ue(); ct = r.ue(); cb = r.ue() }
    require(cl == 0 && ct == 0, "H264: left/top cropping unsupported")
    // 4:2:0: crop units are 2 luma samples horizontally and vertically
    Sps(wMbs, hUnits, log2MaxFrameNum, pocType, 2 * cr, 2 * cb)
  }

  private def parsePps(r: BitReader): Pps = {
    r.ue(); r.ue() // pps id, sps id
    val cabac = r.u1()
    require(cabac == 0, "H264: CABAC unsupported (CAVLC baseline only)")
    r.u1() // bottom_field_pic_order_in_frame_present
    val sliceGroups = r.ue() + 1
    require(sliceGroups == 1, "H264: slice groups (FMO) unsupported")
    r.ue(); r.ue() // ref idx defaults
    r.u1(); r.u(2) // weighted pred flags
    val qp = r.se() + 26
    r.se() // qs
    r.se() // chroma_qp_index_offset
    val deblock = r.u1() == 1
    r.u1() // constrained_intra_pred
    val redundant = r.u1()
    require(redundant == 0, "H264: redundant_pic_cnt unsupported")
    Pps(qp, deblock)
  }

  // ---- CAVLC tables (ITU-T H.264 Table 9-5 / 9-7 / 9-10, the wired subset)

  // coeff_token for 0 <= nC < 2: (code, length) -> (TotalCoeff, TrailingOnes)
  private val CoeffTokenNc0: Seq[(Int, Int, Int, Int)] = Seq(
    // (bits, len, totalCoeff, trailingOnes)
    (0x1, 1, 0, 0),
    (0x1, 2, 1, 1), (0x5, 6, 1, 0),
    (0x1, 3, 2, 2), (0x4, 6, 2, 1), (0x7, 8, 2, 0),
    (0x3, 5, 3, 3), (0x5, 7, 3, 2), (0x6, 8, 3, 1), (0x7, 9, 3, 0),
    (0x3, 6, 4, 3), (0x5, 8, 4, 2), (0x6, 9, 4, 1), (0x7, 10, 4, 0))
  // (deeper TotalCoeff rows of this column and the 2<=nC<8 columns are not
  //  wired: the supported surface cannot reach them — see decode guards)

  // total_zeros, 4x4 blocks, TotalCoeff == 1 (Table 9-7 first column)
  private val TotalZerosTc1: Seq[(Int, Int, Int)] = Seq(
    // (bits, len, totalZeros)
    (0x1, 1, 0), (0x3, 3, 1), (0x2, 3, 2), (0x3, 4, 3), (0x2, 4, 4),
    (0x3, 5, 5), (0x2, 5, 6), (0x3, 6, 7), (0x2, 6, 8), (0x3, 7, 9),
    (0x2, 7, 10), (0x3, 8, 11), (0x2, 8, 12), (0x3, 9, 13), (0x2, 9, 14),
    (0x1, 9, 15))

  /** Parse one CAVLC residual block. Returns levels placed in scan order
    * (length maxNumCoeff). Only the table subset the supported stream
    * shapes can produce is wired; anything deeper rejects loudly. */
  private def residualBlockCavlc(r: BitReader, maxNumCoeff: Int, nC: Int): Array[Int] = {
    val coeffs = new Array[Int](maxNumCoeff)
    // --- coeff_token ---
    var totalCoeff = -1; var trailingOnes = -1
    if (nC >= 8) {
      val v = r.u(6)
      if (v == 3) { totalCoeff = 0; trailingOnes = 0 }
      else { totalCoeff = (v >> 2) + 1; trailingOnes = v & 3 }
      require(trailingOnes <= totalCoeff, s"H264: bad FLC coeff_token $v")
    } else if (nC >= 0 && nC < 2) {
      var code = 0; var len = 0
      while (totalCoeff < 0) {
        code = (code << 1) | r.u1(); len += 1
        require(len <= 16, "H264: coeff_token prefix overrun")
        CoeffTokenNc0.find(t => t._2 == len && t._1 == code).foreach { t =>
          totalCoeff = t._3; trailingOnes = t._4
        }
      }
    } else {
      throw new IllegalArgumentException(
        s"H264: CAVLC table for nC=$nC not wired (only nC<2 and nC>=8)")
    }
    if (totalCoeff == 0) return coeffs
    require(totalCoeff <= 4,
      s"H264: TotalCoeff=$totalCoeff beyond the wired table subset")
    // --- levels ---
    val levels = new Array[Int](totalCoeff)
    var suffixLength = if (totalCoeff > 10 && trailingOnes < 3) 1 else 0
    var i = 0
    while (i < totalCoeff) {
      if (i < trailingOnes) {
        levels(i) = if (r.u1() == 1) -1 else 1
      } else {
        var prefix = 0
        while (r.u1() == 0) { prefix += 1; require(prefix <= 32, "H264: level prefix overrun") }
        val suffixSize =
          if (prefix >= 15) prefix - 3
          else if (prefix == 14 && suffixLength == 0) 4
          else suffixLength
        var levelCode = (math.min(15, prefix) << suffixLength) +
          (if (suffixSize > 0) r.u(suffixSize) else 0)
        if (prefix >= 15 && suffixLength == 0) levelCode += 15
        if (prefix >= 16) levelCode += (1 << (prefix - 3)) - 4096
        if (i == trailingOnes && trailingOnes < 3) levelCode += 2
        levels(i) = if (levelCode % 2 == 0) (levelCode + 2) >> 1
                    else -((levelCode + 1) >> 1)
        if (suffixLength == 0) suffixLength = 1
        if (math.abs(levels(i)) > (3 << (suffixLength - 1)) && suffixLength < 6)
          suffixLength += 1
      }
      i += 1
    }
    // --- total_zeros ---
    var totalZeros = 0
    if (totalCoeff < maxNumCoeff) {
      require(totalCoeff == 1,
        s"H264: total_zeros table for TotalCoeff=$totalCoeff not wired")
      var code = 0; var len = 0; var found = -1
      while (found < 0) {
        code = (code << 1) | r.u1(); len += 1
        require(len <= 9, "H264: total_zeros overrun")
        TotalZerosTc1.find(t => t._2 == len && t._1 == code).foreach(t => found = t._3)
      }
      totalZeros = found
    }
    // --- run_before + placement (decode order = highest scan pos first) ---
    var zerosLeft = totalZeros
    var coeffNum = totalZeros + totalCoeff - 1
    i = 0
    while (i < totalCoeff) {
      var run = 0
      if (i < totalCoeff - 1 && zerosLeft > 0) {
        run = runBefore(r, zerosLeft)
        zerosLeft -= run
      } else if (i == totalCoeff - 1) {
        run = zerosLeft; zerosLeft = 0
      }
      require(coeffNum >= 0 && coeffNum < maxNumCoeff, "H264: CAVLC placement overrun")
      coeffs(coeffNum) = levels(i)
      coeffNum -= 1 + (if (i < totalCoeff - 1) run else 0)
      i += 1
    }
    coeffs
  }

  /** run_before (Table 9-10) — unreachable on the wired surface: the
    * supported block shapes (TotalCoeff <= 1) never parse it, so rather
    * than ship an untested table transcription, reject loudly. Wired in
    * the AC-residual round together with its exercising tests. */
  private def runBefore(r: BitReader, zerosLeft: Int): Int =
    throw new IllegalArgumentException(
      "H264: run_before decoding not wired (multi-coefficient residuals unsupported)")

  // ---- transforms --------------------------------------------------------

  /** 4x4 inverse Hadamard (luma DC), in place. */
  private def inverseHadamard4(m: Array[Int]): Unit = {
    var i = 0
    while (i < 4) { // rows
      val a = m(4 * i); val b = m(4 * i + 1); val c = m(4 * i + 2); val d = m(4 * i + 3)
      val e0 = a + c; val e1 = a - c; val e2 = b - d; val e3 = b + d
      m(4 * i) = e0 + e3; m(4 * i + 1) = e1 + e2
      m(4 * i + 2) = e1 - e2; m(4 * i + 3) = e0 - e3
      i += 1
    }
    i = 0
    while (i < 4) { // columns
      val a = m(i); val b = m(4 + i); val c = m(8 + i); val d = m(12 + i)
      val e0 = a + c; val e1 = a - c; val e2 = b - d; val e3 = b + d
      m(i) = e0 + e3; m(4 + i) = e1 + e2
      m(8 + i) = e1 - e2; m(12 + i) = e0 - e3
      i += 1
    }
  }

  /** Luma DC dequant (8.5.10): V(qP%6, 0, 0) ladder. */
  private val DcScale = Array(10, 11, 13, 14, 16, 18)
  private def dequantLumaDc(f: Int, qP: Int): Int = {
    val v = DcScale(qP % 6)
    if (qP / 6 >= 2) (f * v) << (qP / 6 - 2)
    else (f * v + (1 << (1 - qP / 6))) >> (2 - qP / 6)
  }

  /** Inverse 4x4 transform of a DC-only block: every residual sample is
    * (dc + 32) >> 6 (the general butterfly collapses for AC=0). */
  private def dcOnlyResidual(dc: Int): Int = (dc + 32) >> 6

  private def clip255(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v

  // ---- decode ------------------------------------------------------------

  def decode(annexB: Array[Byte]): Decoded = {
    require(annexB.length >= 5, "not an H264 payload")
    // split on start codes (00 00 01 / 00 00 00 01)
    val nals = Vector.newBuilder[(Int, Int)] // (start, end) of NAL payload
    var i = 0
    var cur = -1
    while (i + 2 < annexB.length) {
      if (annexB(i) == 0 && annexB(i + 1) == 0 && annexB(i + 2) == 1) {
        val payloadStart = i + 3
        if (cur >= 0) nals += ((cur, if (i > 0 && annexB(i - 1) == 0) i - 1 else i))
        cur = payloadStart
        i = payloadStart
      } else i += 1
    }
    require(cur >= 0, "H264: no start code found")
    nals += ((cur, annexB.length))
    val nalRanges = nals.result()
    require(nalRanges.nonEmpty, "H264: empty stream")

    var sps: Sps = null
    var pps: Pps = null
    val frames = Vector.newBuilder[Frame]
    var nFrames = 0
    for ((s, e) <- nalRanges if e > s) {
      val header = annexB(s) & 0xff
      require((header & 0x80) == 0, "H264: forbidden_zero_bit set")
      val nalType = header & 0x1f
      lazy val rbsp = unescapeRbsp(annexB, s + 1, e)
      nalType match {
        case 7 => sps = parseSps(new BitReader(rbsp))
        case 8 => pps = parsePps(new BitReader(rbsp))
        case 6 | 9 | 10 | 11 | 12 => () // SEI / AUD / end markers: skip
        case 5 | 1 =>
          require(sps != null && pps != null, "H264: slice before SPS/PPS")
          frames += decodeSlice(new BitReader(rbsp), sps, pps, idr = nalType == 5)
          nFrames += 1
          require(nFrames <= 4096, "H264: frame-count bomb")
        case t =>
          throw new IllegalArgumentException(s"H264: unsupported NAL type $t")
      }
    }
    val fs = frames.result()
    require(fs.nonEmpty, "H264: no coded pictures")
    Decoded(fs.head.width, fs.head.height, fs)
  }

  private def decodeSlice(r: BitReader, sps: Sps, pps: Pps, idr: Boolean): Frame = {
    val firstMb = r.ue()
    require(firstMb == 0, "H264: multi-slice pictures unsupported")
    val sliceType = r.ue()
    require(sliceType == 2 || sliceType == 7,
      s"H264: only I slices supported (slice_type $sliceType)")
    r.ue() // pps id
    r.u(sps.log2MaxFrameNum) // frame_num
    if (idr) r.ue() // idr_pic_id
    sps.pocType match {
      case 0 => throw new IllegalArgumentException("H264: poc type 0 slice fields unsupported")
      case _ => ()
    }
    if (idr) { r.u1(); r.u1() } // no_output_of_prior_pics, long_term_reference
    val qp = pps.picInitQp + r.se()
    require(qp >= 0 && qp <= 51, s"H264: slice QP $qp out of range")
    // default deblocking (no control fields) would require the in-loop
    // filter; only streams that can and do signal disable are supported
    require(pps.deblockPresent, "H264: stream without deblock control fields unsupported")
    val deblockIdc = r.ue()
    require(deblockIdc == 1,
      "H264: in-loop deblocking unimplemented; stream must signal disable (idc=1)")

    val wMbs = sps.widthMbs; val hMbs = sps.heightMbs
    require(wMbs.toLong * hMbs <= (1L << 16), s"H264: geometry bomb ${wMbs}x$hMbs MBs")
    val w = wMbs * 16; val h = hMbs * 16
    val y = new Array[Byte](w * h)
    // per-4x4-block total_coeff for CAVLC nC context (16 per MB, raster)
    val nnz = new Array[Int](wMbs * hMbs * 16)
    var mb = 0
    var curQp = qp
    while (mb < wMbs * hMbs) {
      val mbx = mb % wMbs; val mby = mb / wMbs
      val mbType = r.ue()
      if (mbType == 25) { // I_PCM
        r.byteAlign()
        var py = 0
        while (py < 16) {
          var px = 0
          while (px < 16) {
            y((mby * 16 + py) * w + mbx * 16 + px) = r.byte().toByte
            px += 1
          }
          py += 1
        }
        var c = 0
        while (c < 128) { r.byte(); c += 1 } // Cb + Cr, 8x8 each
        var k = 0
        while (k < 16) { nnz(mb * 16 + k) = 16; k += 1 }
      } else if (mbType >= 1 && mbType <= 24) { // Intra_16x16
        val predMode = (mbType - 1) % 4
        val cbpChroma = ((mbType - 1) / 4) % 3
        val cbpLuma = if (mbType - 1 >= 12) 15 else 0
        require(cbpLuma == 0, "H264: Intra_16x16 AC residuals (CBP luma 15) unsupported")
        require(cbpChroma == 0, "H264: chroma residuals unsupported")
        val chromaMode = r.ue()
        require(chromaMode <= 3, s"H264: bad intra_chroma_pred_mode $chromaMode")
        curQp += r.se()
        require(curQp >= 0 && curQp <= 51, s"H264: MB QP $curQp out of range")
        // --- luma DC CAVLC: nC from neighbor 4x4 blocks of blk 0 ---
        val nA = if (mbx > 0) nnz((mb - 1) * 16 + 3) else -1 // left MB, blk (0,3)
        val nB = if (mby > 0) nnz((mb - wMbs) * 16 + 12) else -1 // top MB, blk (3,0)
        val nC = if (nA >= 0 && nB >= 0) (nA + nB + 1) >> 1
                 else if (nA >= 0) nA else if (nB >= 0) nB else 0
        val dcScan = residualBlockCavlc(r, 16, nC)
        // un-zigzag into the 4x4 DC matrix and inverse-transform
        val dc = new Array[Int](16)
        var k = 0
        while (k < 16) { dc(Zigzag4(k)) = dcScan(k); k += 1 }
        inverseHadamard4(dc)
        k = 0
        while (k < 16) { dc(k) = dequantLumaDc(dc(k), curQp); k += 1 }
        // --- prediction ---
        val top = new Array[Int](16); val left = new Array[Int](16)
        val hasTop = mby > 0; val hasLeft = mbx > 0
        if (hasTop) {
          var x = 0
          while (x < 16) { top(x) = y((mby * 16 - 1) * w + mbx * 16 + x) & 0xff; x += 1 }
        }
        if (hasLeft) {
          var yy = 0
          while (yy < 16) { left(yy) = y((mby * 16 + yy) * w + mbx * 16 - 1) & 0xff; yy += 1 }
        }
        // precompute the whole 16x16 prediction once per MB (a per-pixel
        // DC closure would redo the 32-sample edge sum 256 times)
        val predBuf = new Array[Int](256)
        predMode match {
          case 0 =>
            require(hasTop, "H264: vertical pred without top MB")
            var i = 0
            while (i < 256) { predBuf(i) = top(i & 15); i += 1 }
          case 1 =>
            require(hasLeft, "H264: horizontal pred without left MB")
            var i = 0
            while (i < 256) { predBuf(i) = left(i >> 4); i += 1 }
          case 2 =>
            val dcp =
              if (hasTop && hasLeft) (top.sum + left.sum + 16) >> 5
              else if (hasLeft) (left.sum + 8) >> 4
              else if (hasTop) (top.sum + 8) >> 4
              else 128
            java.util.Arrays.fill(predBuf, dcp)
          case _ =>
            require(hasTop && hasLeft, "H264: plane pred needs both edges")
            val tl = y((mby * 16 - 1) * w + mbx * 16 - 1) & 0xff
            var hh = 0; var vv = 0; var ii = 1
            while (ii <= 8) {
              hh += ii * (top(7 + ii) - (if (ii == 8) tl else top(7 - ii)))
              vv += ii * (left(7 + ii) - (if (ii == 8) tl else left(7 - ii)))
              ii += 1
            }
            val bP = (5 * hh + 32) >> 6; val cP = (5 * vv + 32) >> 6
            val aP = 16 * (left(15) + top(15))
            var i = 0
            while (i < 256) {
              predBuf(i) = clip255((aP + bP * ((i & 15) - 7) + cP * ((i >> 4) - 7) + 16) >> 5)
              i += 1
            }
        }
        // --- reconstruct: residual of block (bi,bj) is DC-only ---
        var bj = 0
        while (bj < 4) {
          var bi = 0
          while (bi < 4) {
            val res = dcOnlyResidual(dc(bj * 4 + bi))
            var py = 0
            while (py < 4) {
              var px = 0
              while (px < 4) {
                val lx = bi * 4 + px; val ly = bj * 4 + py
                y((mby * 16 + ly) * w + mbx * 16 + lx) =
                  clip255(predBuf(ly * 16 + lx) + res).toByte
                px += 1
              }
              py += 1
            }
            bi += 1
          }
          bj += 1
        }
        // AC blocks absent (CBP 0) -> nnz stays 0 for context
      } else if (mbType == 0) {
        throw new IllegalArgumentException("H264: I_NxN (Intra_4x4) unsupported")
      } else {
        throw new IllegalArgumentException(s"H264: bad I-slice mb_type $mbType")
      }
      mb += 1
    }
    val outW = w - sps.cropRight; val outH = h - sps.cropBottom
    require(outW > 0 && outH > 0, "H264: cropping eats the whole frame")
    val out =
      if (outW == w && outH == h) y
      else {
        val o = new Array[Byte](outW * outH)
        var yy = 0
        while (yy < outH) { System.arraycopy(y, yy * w, o, yy * outW, outW); yy += 1 }
        o
      }
    Frame(outW, outH, out)
  }

  private val Zigzag4 = Array(0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15)

  // ---- encode ------------------------------------------------------------

  private val EncQp = 36 // dcY = 160*level exactly (V=10, << 4): see header

  /** Encode macroblock-constant gray frames as one Annex-B stream of IDR
    * pictures. `mbValues(f)(k)` is the constant of MB k (raster) in frame
    * f; every value must be a multiple of 10 in [0,250] so the QP-36 DC
    * ladder reconstructs exactly (MB 0 is I_PCM and may be any byte). */
  def encode(width: Int, height: Int, mbValues: Seq[Array[Int]]): Array[Byte] = {
    require(width > 0 && height > 0 && width % 16 == 0 && height % 16 == 0,
      "H264 encode: dims must be multiples of 16")
    val wMbs = width / 16; val hMbs = height / 16
    require(mbValues.nonEmpty, "H264 encode: need at least one frame")
    mbValues.foreach { f =>
      require(f.length == wMbs * hMbs, "H264 encode: one value per MB")
      // MB 0 is I_PCM (lossless) but its edge feeds MB 1's and MB wMbs's
      // DC prediction, so the multiple-of-10 rule binds it too
      f.zipWithIndex.foreach { case (v, k) =>
        require(v >= 0 && v <= 250 && v % 10 == 0,
          s"H264 encode: MB $k value $v not a multiple of 10 in [0,250]")
      }
    }
    val out = new ByteArrayOutputStream()
    def writeNal(refIdc: Int, nalType: Int, rbsp: Array[Byte]): Unit = {
      out.write(Array[Byte](0, 0, 0, 1))
      out.write((refIdc << 5) | nalType)
      out.write(escapeRbsp(rbsp))
    }
    // --- SPS ---
    val sps = new BitWriter
    sps.u(66, 8) // baseline
    sps.u(0xc0, 8) // constraint_set0+1
    sps.u(30, 8) // level 3.0
    sps.ue(0) // sps id
    sps.ue(0) // log2_max_frame_num_minus4
    sps.ue(2) // poc type 2
    sps.ue(1) // max_num_ref_frames
    sps.u1(0) // gaps
    sps.ue(wMbs - 1); sps.ue(hMbs - 1)
    sps.u1(1) // frame_mbs_only
    sps.u1(1) // direct_8x8_inference
    sps.u1(0) // no cropping
    sps.u1(0) // no VUI
    sps.rbspTrailing()
    writeNal(3, 7, sps.toBytes)
    // --- PPS ---
    val pps = new BitWriter
    pps.ue(0); pps.ue(0) // pps id, sps id
    pps.u1(0) // CAVLC
    pps.u1(0) // bottom_field_pic_order
    pps.ue(0) // one slice group
    pps.ue(0); pps.ue(0) // ref idx defaults
    pps.u1(0); pps.u(0, 2) // weighted pred
    pps.se(EncQp - 26) // pic_init_qp
    pps.se(0) // qs
    pps.se(0) // chroma_qp_offset
    pps.u1(1) // deblocking_filter_control_present
    pps.u1(0) // constrained_intra_pred
    pps.u1(0) // redundant_pic_cnt
    pps.rbspTrailing()
    writeNal(3, 8, pps.toBytes)
    // --- one IDR slice per frame ---
    for ((mbs, fi) <- mbValues.zipWithIndex)
      writeNal(3, 5, encodeSlice(wMbs, hMbs, mbs, fi))
    out.toByteArray
  }

  private def encodeSlice(wMbs: Int, hMbs: Int, mbs: Array[Int], frameIdx: Int): Array[Byte] = {
    val b = new BitWriter
    b.ue(0) // first_mb_in_slice
    b.ue(7) // slice_type I (all)
    b.ue(0) // pps id
    b.u(0, 4) // frame_num (log2 4; IDR resets)
    b.ue(frameIdx & 0xffff) // idr_pic_id
    b.u1(0); b.u1(0) // no_output_of_prior_pics, long_term_reference
    b.se(0) // slice_qp_delta -> QP 36
    b.ue(1) // disable_deblocking_filter_idc = 1
    // recon tracks what the decoder reconstructs (exact by design)
    val recon = new Array[Int](mbs.length)
    val nnz = new Array[Int](mbs.length) // per-MB uniform context (0 or 16)
    var mb = 0
    while (mb < mbs.length) {
      val mbx = mb % wMbs; val mby = mb / wMbs
      if (mb == 0) {
        b.ue(25) // I_PCM
        b.byteAlignZero()
        var i = 0
        while (i < 256) { b.byte(mbs(0)); i += 1 }
        i = 0
        while (i < 128) { b.byte(128); i += 1 }
        recon(0) = mbs(0); nnz(0) = 16
      } else {
        // pick the prediction mode that is residual-free when a neighbor
        // already carries the target constant — Plane and V/H are EXACT
        // for any value there (no multiple-of-10 ladder needed), and the
        // oracle then certifies all four decoder prediction paths, not
        // just DC. Plane needs the top-left diagonal to match too (its
        // gradient terms read that corner pixel).
        val hasLeft = mbx > 0; val hasTop = mby > 0
        val c = mbs(mb)
        val l = if (hasLeft) recon(mb - 1) else -1
        val t = if (hasTop) recon(mb - wMbs) else -1
        val dgl = if (hasLeft && hasTop) recon(mb - wMbs - 1) else -1
        val predMode =
          if (hasLeft && hasTop && l == c && t == c && dgl == c) 3 // Plane
          else if (hasLeft && l == c) 1 // Horizontal
          else if (hasTop && t == c) 0 // Vertical
          else 2 // DC, with one quantized level
        b.ue(1 + predMode) // I_16x16_<mode>_0_0: CBP 0
        b.ue(0) // intra_chroma_pred_mode DC
        b.se(0) // mb_qp_delta
        val level =
          if (predMode != 2) 0
          else {
            val predDc =
              if (hasLeft && hasTop) (l + t + 1) >> 1
              else if (hasLeft) l
              else t
            val resid = c - predDc
            require(resid % 5 == 0, s"H264 encode: residual $resid not a multiple of 5 at MB $mb")
            2 * resid / 5 // dcY = 160*level; r = (160*level+32)>>6 = 5k
          }
        recon(mb) = c
        // CAVLC DC block: single coefficient at zigzag 0 (or empty)
        val nA = if (hasLeft) nnz(mb - 1) else -1
        val nB = if (hasTop) nnz(mb - wMbs) else -1
        val nC = if (nA >= 0 && nB >= 0) (nA + nB + 1) >> 1
                 else if (nA >= 0) nA else if (nB >= 0) nB else 0
        writeDcBlock(b, level, nC)
        nnz(mb) = 0
      }
      mb += 1
    }
    b.rbspTrailing()
    b.toBytes
  }

  /** Write one CAVLC 4x4 block holding a single coefficient `level` at
    * zigzag position 0 (TotalCoeff 1, total_zeros 0), or an empty block. */
  private def writeDcBlock(b: BitWriter, level: Int, nC: Int): Unit = {
    val flc = nC >= 8
    if (level == 0) {
      if (flc) b.u(3, 6) else b.u1(1) // coeff_token TC=0
      return
    }
    val t1 = if (math.abs(level) == 1) 1 else 0
    if (flc) b.u((0 << 2) | t1, 6) // TC=1
    else if (t1 == 1) b.u(1, 2) // "01"
    else b.u(5, 6) // "000101"
    if (t1 == 1) b.u1(if (level < 0) 1 else 0)
    else {
      // first level, trailingOnes < 3: decoder subtracts 2 from levelCode
      var levelCode = (if (level > 0) 2 * level - 2 else -2 * level - 1) - 2
      require(levelCode >= 0, s"H264 encode: |level| must be >= 2 here, got $level")
      if (levelCode < 14) { b.u(0, levelCode); b.u1(1) } // prefix only
      else if (levelCode < 30) { b.u(0, 14); b.u1(1); b.u(levelCode - 14, 4) }
      else {
        require(levelCode - 30 < 4096, s"H264 encode: level $level out of range")
        b.u(0, 15); b.u1(1); b.u(levelCode - 30, 12)
      }
    }
    b.u1(1) // total_zeros = 0 for TC=1 ("1")
  }
}
