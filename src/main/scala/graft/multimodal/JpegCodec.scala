package graft.multimodal

/** A REAL DCT image codec with zero dependencies: baseline sequential
  * JPEG (JFIF), written against the public ITU T.81 standard — marker
  * segments, canonical Huffman entropy coding, dequantization, separable
  * 8×8 IDCT. This retires the "DCT formats stubbed" caveat: `image/jpeg`
  * payloads decode through a genuine parser in
  * [[Multimodal.extractFeatures]], no image library needed.
  *
  * Decoder scope (loud on everything else): 8-bit baseline sequential
  * (SOF0) AND progressive (SOF2) Huffman JPEG, 1- or 3-component images
  * with the first (luma) component at full resolution — which covers
  * grayscale and 4:4:4/4:2:2/4:2:0 as every mainstream encoder emits
  * them. Progressive decodes the full successive-approximation protocol
  * (DC/AC first + refinement scans, spectral selection, EOB runs — ITU
  * T.81 G.1.2 / G.2), accumulating coefficients across scans and
  * reconstructing at EOI; certified pixel-exact against the JDK's
  * independent ImageIO decoder on JDK-written progressive streams
  * (CodecInteropSpec). Arithmetic coding, 12-bit precision, hierarchical
  * and multi-scan SEQUENTIAL streams are rejected loud, never decoded
  * wrong.
  * `meanLuma` is the mean of the Y channel (the luma plane IS the
  * intensity signal; chroma blocks are entropy-decoded to keep the
  * bitstream in sync but not reconstructed).
  *
  * Encoder scope: grayscale ([[encode]]) and interleaved 4:2:0 YCbCr
  * color ([[encodeColor]]), both with all-ones quantization tables — so
  * an 8×8 block of constant value round-trips EXACTLY (its DCT is a lone
  * DC coefficient; no quantization loss, no IDCT rounding), which is what
  * lets a SQL oracle certify decoded pixel sums of block-constant images
  * over a lossy wire format. Arbitrary images encode fine too (near
  * lossless at quant 1), exercising the full AC run/size path.
  */
object JpegCodec {

  // zigzag order k -> natural (row-major) coefficient index, ITU T.81 fig A.6
  private val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  // separable DCT basis M(a)(b) = C(b)/2 · cos((2a+1)bπ/16)
  private val Basis: Array[Array[Double]] = Array.tabulate(8, 8) { (a, b) =>
    val c = if (b == 0) 1.0 / math.sqrt(2.0) else 1.0
    c / 2.0 * math.cos((2 * a + 1) * b * math.Pi / 16.0)
  }

  /** Decoded image summary: dimensions + mean luma in [0,1]. */
  final case class Decoded(width: Int, height: Int, meanLuma: Double)

  // ---- encoder -------------------------------------------------------------

  /** Fixed encoder Huffman tables (any valid canonical DHT is legal; these
    * are chosen for simplicity, NOT Annex K): DC = the 12 magnitude
    * categories as 4-bit codes; AC = all 162 run/size symbols as 8-bit
    * codes. Decoders rebuild them canonically from BITS/HUFFVAL like any
    * other table. */
  private val DcVals: Array[Int] = (0 to 11).toArray
  private val AcVals: Array[Int] =
    Array(0x00, 0xF0) ++ (for (run <- 0 to 15; size <- 1 to 10) yield (run << 4) | size)

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0L
    private var nbits = 0
    def write(bits: Int, n: Int): Unit = {
      acc = (acc << n) | (bits & ((1L << n) - 1))
      nbits += n
      while (nbits >= 8) {
        val b = ((acc >> (nbits - 8)) & 0xff).toInt
        out.write(b)
        if (b == 0xff) out.write(0x00) // byte stuffing
        nbits -= 8
      }
    }
    def flush(): Unit = if (nbits > 0) { // pad with 1s to a byte boundary
      val b = (((acc << (8 - nbits)) | ((1 << (8 - nbits)) - 1)) & 0xff).toInt
      out.write(b)
      if (b == 0xff) out.write(0x00)
      nbits = 0
    }
  }

  private def category(v: Int): Int = {
    var s = 0
    var a = math.abs(v)
    while (a != 0) { a >>= 1; s += 1 }
    s
  }

  // canonical code assignment: symbol k of an equal-length table gets code k
  private val DcCode: Map[Int, Int] = DcVals.zipWithIndex.toMap
  private val AcCode: Map[Int, Int] = AcVals.zipWithIndex.toMap

  /** Forward-DCT one 8×8 block sampled from `plane` (edge-replicated) at
    * (x0, y0), quantized by 1 — the shared front half of all encoders. */
  private def dctBlock(plane: Array[Byte], pw: Int, ph: Int,
                       x0: Int, y0: Int): Array[Int] = {
    val block = new Array[Double](64)
    var y = 0
    while (y < 8) {
      val sy = math.min(y0 + y, ph - 1)
      var x = 0
      while (x < 8) {
        val sx = math.min(x0 + x, pw - 1)
        block(y * 8 + x) = (plane(sy * pw + sx) & 0xff) - 128.0
        x += 1
      }
      y += 1
    }
    // separable forward DCT: F = Mᵀ · s · M, then round (quant = 1)
    val t = new Array[Double](64)
    val coef = new Array[Int](64)
    var u = 0
    while (u < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var yy = 0
        while (yy < 8) { s += Basis(yy)(u) * block(yy * 8 + x); yy += 1 }
        t(u * 8 + x) = s
        x += 1
      }
      u += 1
    }
    u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        var s = 0.0
        var xx = 0
        while (xx < 8) { s += t(u * 8 + xx) * Basis(xx)(v); xx += 1 }
        coef(u * 8 + v) = math.round(s).toInt
        v += 1
      }
      u += 1
    }
    coef
  }

  /** DCT + sequential entropy-code one block against `pred`; returns the
    * new DC predictor. The shared hot path of both sequential encoders. */
  private def encodeBlock(bw: BitWriter, plane: Array[Byte], pw: Int, ph: Int,
                          x0: Int, y0: Int, pred: Int): Int = {
    val coef = dctBlock(plane, pw, ph, x0, y0)
    // DC difference
    val dc = coef(0)
    val diff = dc - pred
    val s0 = category(diff)
    bw.write(DcCode(s0), 4)
    if (s0 > 0) bw.write(if (diff < 0) diff + (1 << s0) - 1 else diff, s0)
    // AC run/size
    var run = 0
    var k = 1
    while (k < 64) {
      val v = coef(Zigzag(k))
      if (v == 0) run += 1
      else {
        while (run > 15) { bw.write(AcCode(0xF0), 8); run -= 16 }
        val s = category(v)
        require(s <= 10, s"AC coefficient $v out of the encoder's size range")
        bw.write(AcCode((run << 4) | s), 8)
        bw.write(if (v < 0) v + (1 << s) - 1 else v, s)
        run = 0
      }
      k += 1
    }
    if (run > 0) bw.write(AcCode(0x00), 8) // EOB
    dc
  }

  private def writeHeader(out: java.io.ByteArrayOutputStream, width: Int,
                          height: Int, color: Boolean): Unit = {
    def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
    def seg(m: Int, payload: Array[Int]): Unit = {
      marker(m)
      val len = payload.length + 2
      out.write((len >> 8) & 0xff); out.write(len & 0xff)
      payload.foreach(out.write)
    }
    marker(0xd8) // SOI
    seg(0xe0, Array('J', 'F', 'I', 'F', 0, 1, 1, 0, 0, 1, 0, 1, 0, 0))
    seg(0xdb, 0 +: Array.fill(64)(1)) // DQT: Pq=0 Tq=0, all ones
    if (color)
      seg(0xc0, Array(8, (height >> 8) & 0xff, height & 0xff,
        (width >> 8) & 0xff, width & 0xff, 3,
        1, 0x22, 0, 2, 0x11, 0, 3, 0x11, 0)) // SOF0: Y 2x2, Cb/Cr 1x1 (4:2:0)
    else
      seg(0xc0, Array(8, (height >> 8) & 0xff, height & 0xff,
        (width >> 8) & 0xff, width & 0xff, 1, 1, 0x11, 0)) // SOF0, 1 comp 1x1
    seg(0xc4, (0 +: Array.tabulate(16)(l => if (l == 3) DcVals.length else 0))
      ++ DcVals) // DHT DC0: all codes length 4
    seg(0xc4, (0x10 +: Array.tabulate(16)(l => if (l == 7) AcVals.length else 0))
      ++ AcVals) // DHT AC0: all codes length 8
    if (color) seg(0xda, Array(3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0))
    else seg(0xda, Array(1, 1, 0x00, 0, 63, 0)) // SOS
  }

  /** Encode a row-major 8-bit grayscale image (top-down) as baseline
    * sequential JFIF with all-ones quantization (edge blocks replicate
    * their last row/column, so block-constant content stays constant). */
  def encode(width: Int, height: Int, gray: Array[Byte]): Array[Byte] = {
    require(width > 0 && height > 0 && gray.length == width * height,
      s"need $width*$height=${width.toLong * height} pixels, got ${gray.length}")
    val out = new java.io.ByteArrayOutputStream(gray.length / 2 + 1024)
    writeHeader(out, width, height, color = false)
    val bw = new BitWriter(out)
    val bx = (width + 7) / 8
    val by = (height + 7) / 8
    var pred = 0
    var byi = 0
    while (byi < by) {
      var bxi = 0
      while (bxi < bx) {
        pred = encodeBlock(bw, gray, width, height, bxi * 8, byi * 8, pred)
        bxi += 1
      }
      byi += 1
    }
    bw.flush()
    out.write(0xff); out.write(0xd9) // EOI
    out.toByteArray
  }

  /** Encode a grayscale image as a four-scan PROGRESSIVE (SOF2) JFIF with
    * all-ones quantization: DC first at Al=1, two spectral AC bands
    * (1–5, 6–63), then the DC refinement bit — a real successive-
    * approximation script whose wire format exercises shifted-DC coding,
    * cross-block EOB runs, and per-block refinement bits. Scope: the AC
    * coefficients must be zero in every block (i.e. block-constant
    * content — the oracle corpus), so the AC band scans are pure EOB
    * runs and the image survives the lossy format EXACTLY; non-constant
    * blocks reject loud rather than encode wrong. */
  def encodeProgressive(width: Int, height: Int, gray: Array[Byte],
                        restartInterval: Int = 0): Array[Byte] = {
    require(width > 0 && height > 0 && gray.length == width * height,
      s"need $width*$height=${width.toLong * height} pixels, got ${gray.length}")
    require(restartInterval >= 0, "restartInterval must be >= 0")
    val out = new java.io.ByteArrayOutputStream(gray.length / 2 + 1024)
    def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
    def seg(m: Int, payload: Array[Int]): Unit = {
      marker(m)
      val len = payload.length + 2
      out.write((len >> 8) & 0xff); out.write(len & 0xff)
      payload.foreach(out.write)
    }
    marker(0xd8)
    seg(0xe0, Array('J', 'F', 'I', 'F', 0, 1, 1, 0, 0, 1, 0, 1, 0, 0))
    seg(0xdb, 0 +: Array.fill(64)(1))
    seg(0xc2, Array(8, (height >> 8) & 0xff, height & 0xff,
      (width >> 8) & 0xff, width & 0xff, 1, 1, 0x11, 0)) // SOF2, 1 comp
    seg(0xc4, (0 +: Array.tabulate(16)(l => if (l == 3) DcVals.length else 0))
      ++ DcVals) // DC table 0: all codes length 4 (shared with baseline)
    // progressive AC table 0: the 15 EOBn symbols + ZRL, all codes 5 bits
    val acProgVals: Array[Int] = (0 to 14).map(_ << 4).toArray :+ 0xF0
    val acProgCode: Map[Int, Int] = acProgVals.zipWithIndex.toMap
    seg(0xc4, (0x10 +: Array.tabulate(16)(l => if (l == 4) acProgVals.length else 0))
      ++ acProgVals)

    val bx = (width + 7) / 8
    val by = (height + 7) / 8
    val nBlocks = bx * by
    val dcs = new Array[Int](nBlocks)
    var bi = 0
    var byi = 0
    while (byi < by) {
      var bxi = 0
      while (bxi < bx) {
        val coef = dctBlock(gray, width, height, bxi * 8, byi * 8)
        var k = 1
        while (k < 64) {
          require(coef(k) == 0,
            "JPEG progressive encoder: non-constant block (AC coefficients present)")
          k += 1
        }
        dcs(bi) = coef(0)
        bi += 1
        bxi += 1
      }
      byi += 1
    }

    if (restartInterval > 0)
      seg(0xdd, Array((restartInterval >> 8) & 0xff, restartInterval & 0xff))

    def sos(ss: Int, se: Int, ah: Int, al: Int): Unit =
      seg(0xda, Array(1, 1, 0x00, ss, se, (ah << 4) | al))

    // restart boundary before block `bi` of a scan (non-interleaved:
    // one MCU = one block): byte-align + RSTn, n cycling 0..7
    def rstBefore(bw: BitWriter, bi: Int): Boolean =
      if (restartInterval > 0 && bi > 0 && bi % restartInterval == 0) {
        bw.flush()
        marker(0xd0 + ((bi / restartInterval) - 1) % 8)
        true
      } else false

    // scan 1: DC first, Al = 1 — codes dc >> 1 differentially
    sos(0, 0, 0, 1)
    var bw = new BitWriter(out)
    var pred = 0
    bi = 0
    while (bi < nBlocks) {
      if (rstBefore(bw, bi)) pred = 0
      val v = dcs(bi) >> 1
      val diff = v - pred
      pred = v
      val s0 = category(diff)
      bw.write(DcCode(s0), 4)
      if (s0 > 0) bw.write(if (diff < 0) diff + (1 << s0) - 1 else diff, s0)
      bi += 1
    }
    bw.flush()

    // scans 2+3: the AC bands are all-zero → pure cross-block EOB runs
    // (which must END at each restart boundary — runs cannot span one)
    for ((ss, se) <- Seq((1, 5), (6, 63))) {
      sos(ss, se, 0, 0)
      bw = new BitWriter(out)
      val segLen = if (restartInterval > 0) restartInterval else nBlocks
      var done = 0
      while (done < nBlocks) {
        if (rstBefore(bw, done)) () // eobrun state is per-segment anyway
        var remaining = math.min(segLen, nBlocks - done)
        done += remaining
        while (remaining > 0) {
          val run = math.min(remaining, 32767)
          var r = 0
          while ((1 << (r + 1)) <= run) r += 1 // r = floor(log2 run), ≤ 14
          bw.write(acProgCode(r << 4), 5)
          if (r > 0) bw.write(run - (1 << r), r)
          remaining -= run
        }
      }
      bw.flush()
    }

    // scan 4: DC refinement, Ah=1 Al=0 — the dropped LSB, one raw bit/block
    sos(0, 0, 1, 0)
    bw = new BitWriter(out)
    bi = 0
    while (bi < nBlocks) {
      rstBefore(bw, bi)
      bw.write(dcs(bi) & 1, 1)
      bi += 1
    }
    bw.flush()

    marker(0xd9)
    out.toByteArray
  }

  /** JFIF integer luma: Y = (77R + 150G + 29B + 128) >> 8 — exposed so the
    * oracle SQL can reproduce the exact same rounding. */
  def lumaOf(r: Int, g: Int, b: Int): Int = (77 * r + 150 * g + 29 * b + 128) >> 8

  /** Encode a row-major interleaved 8-bit RGB image (top-down, 3 bytes per
    * pixel) as baseline sequential 4:2:0 YCbCr JFIF — the layout every
    * mainstream encoder emits: one interleaved scan, luma at 2×2, chroma
    * subsampled by 2 in both axes (2×2 box average), all-ones quantization.
    * Pixels convert through fixed-point YCbCr ([[lumaOf]] for Y), so a
    * 16×16-macroblock-constant RGB image produces constant Y/Cb/Cr blocks
    * that survive the lossy wire format EXACTLY, same as the gray path. */
  def encodeColor(width: Int, height: Int, rgb: Array[Byte]): Array[Byte] = {
    require(width > 0 && height > 0 && rgb.length == 3 * width * height,
      s"need 3*$width*$height=${3L * width * height} bytes, got ${rgb.length}")
    val mcusX = (width + 15) / 16
    val mcusY = (height + 15) / 16
    val yW = mcusX * 16
    val yH = mcusY * 16
    val cW = mcusX * 8
    val cH = mcusY * 8
    val yP = new Array[Byte](yW * yH)
    val cbP = new Array[Byte](cW * cH)
    val crP = new Array[Byte](cW * cH)
    // full-resolution planes, edge-replicated to the MCU grid
    val cb0 = new Array[Int](yW * yH)
    val cr0 = new Array[Int](yW * yH)
    var y = 0
    while (y < yH) {
      val sy = math.min(y, height - 1)
      var x = 0
      while (x < yW) {
        val sx = math.min(x, width - 1)
        val p = (sy * width + sx) * 3
        val r = rgb(p) & 0xff
        val g = rgb(p + 1) & 0xff
        val b = rgb(p + 2) & 0xff
        yP(y * yW + x) = lumaOf(r, g, b).toByte
        cb0(y * yW + x) = ((-43 * r - 85 * g + 128 * b + 128) >> 8) + 128
        cr0(y * yW + x) = ((128 * r - 107 * g - 21 * b + 128) >> 8) + 128
        x += 1
      }
      y += 1
    }
    // 2x2 box average (round-half-up) — exact for constant macroblocks
    var cy = 0
    while (cy < cH) {
      var cx = 0
      while (cx < cW) {
        val p0 = (2 * cy) * yW + 2 * cx
        cbP(cy * cW + cx) =
          ((cb0(p0) + cb0(p0 + 1) + cb0(p0 + yW) + cb0(p0 + yW + 1) + 2) >> 2).toByte
        crP(cy * cW + cx) =
          ((cr0(p0) + cr0(p0 + 1) + cr0(p0 + yW) + cr0(p0 + yW + 1) + 2) >> 2).toByte
        cx += 1
      }
      cy += 1
    }
    val out = new java.io.ByteArrayOutputStream(rgb.length / 4 + 1024)
    writeHeader(out, width, height, color = true)
    val bw = new BitWriter(out)
    var predY = 0
    var predCb = 0
    var predCr = 0
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        var vb = 0
        while (vb < 2) { // 4 luma blocks, raster order within the MCU
          var hb = 0
          while (hb < 2) {
            predY = encodeBlock(bw, yP, yW, yH,
              mx * 16 + hb * 8, my * 16 + vb * 8, predY)
            hb += 1
          }
          vb += 1
        }
        predCb = encodeBlock(bw, cbP, cW, cH, mx * 8, my * 8, predCb)
        predCr = encodeBlock(bw, crP, cW, cH, mx * 8, my * 8, predCr)
        mx += 1
      }
      my += 1
    }
    bw.flush()
    out.write(0xff); out.write(0xd9) // EOI
    out.toByteArray
  }

  // ---- decoder -------------------------------------------------------------

  private final class Huff(bits: Array[Int], vals: Array[Int]) {
    // canonical decode tables per ITU T.81 F.2.2.3 (mincode/maxcode/valptr)
    val minCode = new Array[Int](17)
    val maxCode = Array.fill(17)(-1)
    val valPtr = new Array[Int](17)
    require(bits.map(_.toLong).sum == vals.length, "DHT: BITS/HUFFVAL mismatch")
    private var code = 0
    private var k = 0
    for (l <- 1 to 16) {
      if (bits(l - 1) > 0) {
        valPtr(l) = k
        minCode(l) = code
        code += bits(l - 1)
        k += bits(l - 1)
        maxCode(l) = code - 1
      }
      require(code <= (1 << l), s"DHT: over-subscribed code length $l")
      code <<= 1
    }
    def value(l: Int, c: Int): Int = vals(valPtr(l) + c - minCode(l))
  }

  private final class BitReader(data: Array[Byte], var ip: Int) {
    private var acc = 0
    private var nbits = 0
    def bit(): Int = {
      if (nbits == 0) {
        require(ip < data.length, "JPEG: truncated entropy stream")
        var b = data(ip) & 0xff
        ip += 1
        if (b == 0xff) {
          require(ip < data.length, "JPEG: truncated entropy stream")
          val m = data(ip) & 0xff
          require(m == 0x00, f"JPEG: marker 0xff$m%02x inside entropy data")
          ip += 1
          b = 0xff
        }
        acc = b
        nbits = 8
      }
      nbits -= 1
      (acc >> nbits) & 1
    }
    def receive(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }
    def decode(h: Huff): Int = {
      var c = bit()
      var l = 1
      while (c > h.maxCode(l)) {
        c = (c << 1) | bit()
        l += 1
        require(l <= 16, "JPEG: invalid Huffman code")
      }
      h.value(l, c)
    }
    /** Byte-align and consume the expected RSTn marker. */
    def restart(n: Int): Unit = {
      nbits = 0
      require(ip + 1 < data.length && (data(ip) & 0xff) == 0xff &&
        (data(ip + 1) & 0xff) == (0xd0 + n),
        s"JPEG: expected restart marker RST$n")
      ip += 2
    }
  }

  private def extend(v: Int, s: Int): Int =
    if (s == 0) 0 else if (v < (1 << (s - 1))) v - (1 << s) + 1 else v

  /** Decode a baseline sequential JPEG; loud on unsupported flavors and
    * malformed streams (truncation, bad Huffman codes, over-subscribed
    * tables, geometry bombs), never a hang or a silent wrong answer. */
  def decode(bytes: Array[Byte]): Decoded = {
    require(bytes.length >= 4 && (bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8,
      "not a JPEG payload")
    var ip = 2
    def u8(): Int = {
      require(ip < bytes.length, "JPEG: truncated stream"); ip += 1
      bytes(ip - 1) & 0xff
    }
    def u16(): Int = (u8() << 8) | u8()

    val quant = new Array[Array[Int]](4)
    val dcTables = new Array[Huff](4)
    val acTables = new Array[Huff](4)
    var width = -1
    var height = -1
    var nComp = 0
    var compId: Array[Int] = null
    var compH: Array[Int] = null
    var compV: Array[Int] = null
    var compQ: Array[Int] = null
    var restartInterval = 0

    // progressive state: coefficients accumulate across scans in a
    // per-component MCU-padded block grid, reconstructed at EOI
    var progressive = false
    var coefStore: Array[Array[Int]] = null
    var mcusX = 0
    var mcusY = 0
    var padW: Array[Int] = null // per-comp block-grid width (MCU-padded)
    var padH: Array[Int] = null
    var scansSeen = 0
    // per-component, per-coefficient lowest successive-approximation bit
    // (Al) delivered so far — a progression is COMPLETE only when every
    // coefficient of every component has been refined down to Al = 0
    // (T.81 G.1.1.1.1-2: the final scans carry the low-order bits)
    var cover: Array[Array[Int]] = null

    var sumLuma = 0L
    var decoded = false // a scan must actually have run (truncation guard)

    while (ip < bytes.length) {
      require(u8() == 0xff, "JPEG: expected marker")
      var m = u8()
      while (m == 0xff) m = u8() // fill bytes before a marker are legal
      m match {
        case 0xd9 => // EOI
          if (progressive) {
            require(scansSeen > 0, "JPEG: EOI before any scan")
            // reject INCOMPLETE progressions loud: an SOF2 stream whose
            // AC or refinement scans are missing would otherwise
            // reconstruct silently at reduced precision (r06 advice)
            for (c <- 0 until nComp; k <- 0 until 64)
              require(cover(c)(k) == 0, {
                val what = if (cover(c)(k) == 99) "never scanned"
                           else s"refined only to Al=${cover(c)(k)}"
                s"JPEG: incomplete progression — component $c coefficient $k $what"
              })
            // reconstruct the luma plane from the accumulated coefficients
            val q = quant(compQ(0))
            require(q != null, "JPEG: missing quantization table")
            val bw0 = padW(0)
            val yW = bw0 * 8
            val yPlane = new Array[Byte](yW * padH(0) * 8)
            val store = coefStore(0)
            val tmp = new Array[Double](64)
            val coef = new Array[Int](64)
            var bi = 0
            val nBlocks = padW(0) * padH(0)
            while (bi < nBlocks) {
              var i = 0
              while (i < 64) { coef(i) = store(bi * 64 + i) * q(i); i += 1 }
              var u = 0
              while (u < 8) {
                var x = 0
                while (x < 8) {
                  var s = 0.0
                  var v = 0
                  while (v < 8) { s += coef(u * 8 + v) * Basis(x)(v); v += 1 }
                  tmp(u * 8 + x) = s
                  x += 1
                }
                u += 1
              }
              val bx0 = (bi % bw0) * 8
              val by0 = (bi / bw0) * 8
              var y = 0
              while (y < 8) {
                var x = 0
                while (x < 8) {
                  var s = 0.0
                  var u2 = 0
                  while (u2 < 8) { s += Basis(y)(u2) * tmp(u2 * 8 + x); u2 += 1 }
                  val px = math.max(0, math.min(255, math.round(s).toInt + 128))
                  yPlane((by0 + y) * yW + bx0 + x) = px.toByte
                  x += 1
                }
                y += 1
              }
              bi += 1
            }
            var y = 0
            while (y < height) {
              var x = 0
              while (x < width) { sumLuma += yPlane(y * yW + x) & 0xff; x += 1 }
              y += 1
            }
            decoded = true
          }
          require(decoded, "JPEG: EOI before any scan")
          ip = bytes.length
        case 0xdb => // DQT
          var len = u16() - 2
          while (len > 0) {
            val pqtq = u8()
            require((pqtq >> 4) == 0, "JPEG: 16-bit quantization tables not supported")
            val tq = pqtq & 0x0f
            val t = new Array[Int](64)
            for (k <- 0 until 64) t(Zigzag(k)) = u8()
            quant(tq) = t
            len -= 65
          }
          require(len == 0, "JPEG: malformed DQT length")
        case 0xc4 => // DHT
          var len = u16() - 2
          while (len > 0) {
            val tcth = u8()
            val bits = Array.fill(16)(u8())
            val n = bits.sum
            require(n > 0 && n <= 256 && len >= 17 + n, "JPEG: malformed DHT")
            val vals = Array.fill(n)(u8())
            val h = new Huff(bits, vals)
            if ((tcth >> 4) == 0) dcTables(tcth & 0x0f) = h else acTables(tcth & 0x0f) = h
            len -= 17 + n
          }
          require(len == 0, "JPEG: malformed DHT length")
        case 0xc0 | 0xc1 | 0xc2 => // SOF0/1 sequential, SOF2 progressive
          u16()
          require(u8() == 8, "JPEG: only 8-bit precision supported")
          height = u16(); width = u16()
          require(width > 0 && height > 0 && width <= (1 << 16) && height <= (1 << 16) &&
            width.toLong * height <= Int.MaxValue / 8,
            s"JPEG: unsupported geometry ${width}x$height")
          nComp = u8()
          require(nComp == 1 || nComp == 3, s"JPEG: $nComp components not supported")
          compId = new Array[Int](nComp); compH = new Array[Int](nComp)
          compV = new Array[Int](nComp); compQ = new Array[Int](nComp)
          for (c <- 0 until nComp) {
            compId(c) = u8()
            val hv = u8()
            compH(c) = hv >> 4; compV(c) = hv & 0x0f
            require(compH(c) >= 1 && compH(c) <= 2 && compV(c) >= 1 && compV(c) <= 2,
              s"JPEG: sampling ${compH(c)}x${compV(c)} not supported")
            compQ(c) = u8()
          }
          require(compH(0) == compH.max && compV(0) == compV.max,
            "JPEG: luma must be the full-resolution component")
          if (m == 0xc2) {
            progressive = true
            val hmax = compH.max
            val vmax = compV.max
            mcusX = (width + 8 * hmax - 1) / (8 * hmax)
            mcusY = (height + 8 * vmax - 1) / (8 * vmax)
            padW = Array.tabulate(nComp)(c => mcusX * compH(c))
            padH = Array.tabulate(nComp)(c => mcusY * compV(c))
            coefStore = Array.tabulate(nComp)(c => new Array[Int](padW(c) * padH(c) * 64))
            cover = Array.fill(nComp)(Array.fill(64)(99)) // 99 = never scanned
          }
        case x if x >= 0xc3 && x <= 0xcf && x != 0xc8 && x != 0xc4 && x != 0xcc =>
          throw new IllegalArgumentException(
            f"JPEG: SOF$x%02x (lossless/arithmetic/hierarchical) not supported")
        case 0xdd => // DRI
          require(u16() == 4, "JPEG: malformed DRI")
          restartInterval = u16()
        case 0xda if progressive => // SOS — one progressive scan (T.81 G.2)
          u16()
          val ns = u8()
          require(ns >= 1 && ns <= nComp, "JPEG: bad scan component count")
          val scomp = new Array[Int](ns)
          val sDc = new Array[Int](ns)
          val sAc = new Array[Int](ns)
          for (i <- 0 until ns) {
            val cs = u8()
            val c = compId.indexOf(cs)
            require(c >= 0, s"JPEG: scan references unknown component $cs")
            scomp(i) = c
            val tdta = u8()
            sDc(i) = tdta >> 4
            sAc(i) = tdta & 0x0f
          }
          val ss = u8()
          val se = u8()
          val ahal = u8()
          val ah = ahal >> 4
          val al = ahal & 0x0f
          require(ss <= se && se < 64 && al <= 13 && ah <= 14,
            s"JPEG: bad progression parameters Ss=$ss Se=$se Ah=$ah Al=$al")
          if (ss == 0) require(se == 0, "JPEG: progressive DC scan must have Se=0")
          else require(ns == 1, "JPEG: progressive AC scans are single-component")
          if (ah > 0) require(ah == al + 1,
            "JPEG: successive approximation must refine one bit per scan")
          val br = new BitReader(bytes, ip)
          val pred = new Array[Int](ns)
          var eobrun = 0
          val p1 = 1 << al

          // append this block's correction bit to a nonzero-history coeff
          def refineOne(store: Array[Int], off: Int): Unit =
            if (br.bit() == 1 && (store(off) & p1) == 0)
              store(off) += (if (store(off) >= 0) p1 else -p1)

          def blockDc(i: Int, store: Array[Int], base: Int): Unit =
            if (ah == 0) {
              val h = dcTables(sDc(i))
              require(h != null, "JPEG: scan references missing DHT")
              val s0 = br.decode(h)
              require(s0 <= 11, "JPEG: invalid DC category")
              pred(i) += extend(br.receive(s0), s0)
              store(base) = pred(i) << al
            } else if (br.bit() == 1) store(base) |= p1

          def blockAcFirst(store: Array[Int], base: Int, h: Huff): Unit =
            if (eobrun > 0) eobrun -= 1
            else {
              var k = ss
              while (k <= se) {
                val rs = br.decode(h)
                val r = rs >> 4
                val s = rs & 15
                if (s == 0) {
                  if (r != 15) { // EOB run covers this + (eobrun) more blocks
                    eobrun = (1 << r) - 1 + (if (r > 0) br.receive(r) else 0)
                    k = se + 1
                  } else k += 16 // ZRL
                } else {
                  k += r
                  require(k <= se, "JPEG: AC run past spectral band")
                  store(base + Zigzag(k)) = extend(br.receive(s), s) << al
                  k += 1
                }
              }
            }

          // the successive-approximation AC refinement pass — the libjpeg
          // decode_mcu_AC_refine control flow: newly-significant coeffs
          // arrive as ±1<<Al; every nonzero-history coeff passed over
          // (including in EOB runs) carries a correction bit
          def blockAcRefine(store: Array[Int], base: Int, h: Huff): Unit = {
            var k = ss
            if (eobrun == 0) {
              var outer = true
              while (k <= se && outer) {
                val rs = br.decode(h)
                var r = rs >> 4
                val s = rs & 15
                var ins = 0
                if (s != 0) {
                  require(s == 1, "JPEG: AC refinement size must be 1")
                  ins = if (br.bit() == 1) p1 else -p1
                } else if (r != 15) {
                  eobrun = (1 << r) + (if (r > 0) br.receive(r) else 0)
                  outer = false // rest of the block joins the EOB-run path
                }
                if (outer) {
                  var inner = true
                  while (k <= se && inner) {
                    val off = base + Zigzag(k)
                    if (store(off) != 0) { refineOne(store, off); k += 1 }
                    else if (r == 0) {
                      if (s != 0) store(off) = ins
                      k += 1
                      inner = false
                    } else { r -= 1; k += 1 }
                  }
                }
              }
            }
            if (eobrun > 0) {
              while (k <= se) {
                val off = base + Zigzag(k)
                if (store(off) != 0) refineOne(store, off)
                k += 1
              }
              eobrun -= 1
            }
          }

          def maybeRestart(unit: Int): Unit =
            if (restartInterval > 0 && unit > 0 && unit % restartInterval == 0) {
              br.restart(((unit / restartInterval) - 1) % 8)
              java.util.Arrays.fill(pred, 0)
              eobrun = 0
            }

          if (ss == 0 && ns > 1) {
            // interleaved DC scan over the global MCU grid
            var mcu = 0
            var my = 0
            while (my < mcusY) {
              var mx = 0
              while (mx < mcusX) {
                maybeRestart(mcu)
                var i = 0
                while (i < ns) {
                  val c = scomp(i)
                  var vb = 0
                  while (vb < compV(c)) {
                    var hb = 0
                    while (hb < compH(c)) {
                      val base =
                        ((my * compV(c) + vb) * padW(c) + mx * compH(c) + hb) * 64
                      blockDc(i, coefStore(c), base)
                      hb += 1
                    }
                    vb += 1
                  }
                  i += 1
                }
                mcu += 1
                mx += 1
              }
              my += 1
            }
          } else {
            // non-interleaved scan (single-component DC, or any AC scan):
            // blocks in raster order over the component's UNPADDED grid
            val c = scomp(0)
            val hmax = compH.max
            val vmax = compV.max
            val bw = ((width * compH(c) + hmax - 1) / hmax + 7) / 8
            val bh = ((height * compV(c) + vmax - 1) / vmax + 7) / 8
            val acH = if (ss > 0) acTables(sAc(0)) else null
            if (ss > 0) require(acH != null, "JPEG: scan references missing DHT")
            var blk = 0
            var byi = 0
            while (byi < bh) {
              var bxi = 0
              while (bxi < bw) {
                maybeRestart(blk)
                val base = (byi * padW(c) + bxi) * 64
                if (ss == 0) blockDc(0, coefStore(c), base)
                else if (ah == 0) blockAcFirst(coefStore(c), base, acH)
                else blockAcRefine(coefStore(c), base, acH)
                blk += 1
                bxi += 1
              }
              byi += 1
            }
          }
          ip = br.ip
          // if the encoder's final padding byte was 0xFF its 0x00 stuffing
          // was never consumed — step past any such trailing pairs so the
          // marker loop lands on the real next marker
          while (ip + 1 < bytes.length && (bytes(ip) & 0xff) == 0xff &&
                 (bytes(ip + 1) & 0xff) == 0x00) ip += 2
          // record the band's achieved approximation level; EOI audits it
          for (i <- 0 until ns; k <- ss to se)
            cover(scomp(i))(k) = math.min(cover(scomp(i))(k), al)
          scansSeen += 1
        case 0xda => // SOS — entropy-coded scan follows
          require(width > 0, "JPEG: SOS before SOF")
          u16()
          val ns = u8()
          require(ns == nComp, "JPEG: multi-scan streams not supported")
          val scanDc = new Array[Huff](nComp)
          val scanAc = new Array[Huff](nComp)
          for (_ <- 0 until ns) {
            val cs = u8()
            val c = compId.indexOf(cs)
            require(c >= 0, s"JPEG: scan references unknown component $cs")
            val tdta = u8()
            scanDc(c) = dcTables(tdta >> 4)
            scanAc(c) = acTables(tdta & 0x0f)
            require(scanDc(c) != null && scanAc(c) != null, "JPEG: scan references missing DHT")
          }
          require(u8() == 0 && u8() == 63, "JPEG: non-baseline spectral selection")
          u8() // Ah/Al, zero for baseline
          for (c <- 0 until nComp)
            require(quant(compQ(c)) != null, "JPEG: missing quantization table")

          val hmax = compH.max
          val vmax = compV.max
          // single-component scans are never interleaved: MCU = 1 block
          val (mcusX, mcusY, effH, effV) =
            if (nComp == 1) ((width + 7) / 8, (height + 7) / 8, Array(1), Array(1))
            else ((width + 8 * hmax - 1) / (8 * hmax),
                  (height + 8 * vmax - 1) / (8 * vmax), compH, compV)
          val yW = mcusX * 8 * effH(0)
          val yPlane = new Array[Byte](yW * mcusY * 8 * effV(0))
          val br = new BitReader(bytes, ip)
          val pred = new Array[Int](nComp)
          val coef = new Array[Int](64)
          val tmp = new Array[Double](64)
          var mcu = 0
          var my = 0
          while (my < mcusY) {
            var mx = 0
            while (mx < mcusX) {
              if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
                br.restart(((mcu / restartInterval) - 1) % 8)
                java.util.Arrays.fill(pred, 0)
              }
              var c = 0
              while (c < nComp) {
                val q = quant(compQ(c))
                var vb = 0
                while (vb < effV(c)) {
                  var hb = 0
                  while (hb < effH(c)) {
                    java.util.Arrays.fill(coef, 0)
                    val s0 = br.decode(scanDc(c))
                    require(s0 <= 11, "JPEG: invalid DC category")
                    pred(c) += extend(br.receive(s0), s0)
                    coef(0) = pred(c) * q(0)
                    var k = 1
                    while (k < 64) {
                      val rs = br.decode(scanAc(c))
                      if (rs == 0x00) k = 64 // EOB
                      else if (rs == 0xF0) k += 16 // ZRL
                      else {
                        k += rs >> 4
                        require(k < 64, "JPEG: AC run past end of block")
                        coef(Zigzag(k)) = extend(br.receive(rs & 0x0f), rs & 0x0f) * q(Zigzag(k))
                        k += 1
                      }
                    }
                    if (c == 0) { // IDCT the luma block into the Y plane
                      var u = 0
                      while (u < 8) { // tmp = coef · basisᵀ (rows)
                        var x = 0
                        while (x < 8) {
                          var s = 0.0
                          var v = 0
                          while (v < 8) { s += coef(u * 8 + v) * Basis(x)(v); v += 1 }
                          tmp(u * 8 + x) = s
                          x += 1
                        }
                        u += 1
                      }
                      val bx0 = (mx * effH(0) + hb) * 8
                      val by0 = (my * effV(0) + vb) * 8
                      var y = 0
                      while (y < 8) {
                        var x = 0
                        while (x < 8) {
                          var s = 0.0
                          var u2 = 0
                          while (u2 < 8) { s += Basis(y)(u2) * tmp(u2 * 8 + x); u2 += 1 }
                          val px = math.max(0, math.min(255, math.round(s).toInt + 128))
                          yPlane((by0 + y) * yW + bx0 + x) = px.toByte
                          x += 1
                        }
                        y += 1
                      }
                    }
                    hb += 1
                  }
                  vb += 1
                }
                c += 1
              }
              mcu += 1
              mx += 1
            }
            my += 1
          }
          // mean luma over the TRUE w×h window (MCU padding excluded)
          var y = 0
          while (y < height) {
            var x = 0
            while (x < width) { sumLuma += yPlane(y * yW + x) & 0xff; x += 1 }
            y += 1
          }
          ip = br.ip
          decoded = true
        case 0x01 | (_: Int) if m == 0x01 || (m >= 0xd0 && m <= 0xd7) =>
          () // TEM / stray RST: no payload
        case _ => // APPn, COM, DNL, anything else with a length: skip
          val len = u16()
          require(len >= 2 && ip + len - 2 <= bytes.length, "JPEG: segment overruns payload")
          ip += len - 2
      }
    }
    require(decoded, "JPEG: truncated stream — no scan decoded")
    Decoded(width, height,
      sumLuma.toDouble / (width.toLong * height) / 255.0)
  }
}
