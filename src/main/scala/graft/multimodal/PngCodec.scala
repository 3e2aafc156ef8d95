package graft.multimodal

import java.util.zip.{CRC32, Deflater, Inflater}

/** A REAL compressed-image codec with zero dependencies: PNG (RFC 2083)
  * for 8-bit grayscale and truecolor, non-interlaced. PNG is zlib
  * (java.util.zip, the same Inflater the zarr chunk path uses) plus five
  * per-row predictive filters — all implementable in pure JVM byte
  * arithmetic, which retires the "compressed image formats stubbed"
  * caveat for the most common format: `image/png` payloads decode through
  * a genuine parser (signature, chunk CRCs, inflate, unfilter) in
  * [[Multimodal.extractFeatures]].
  *
  * The encoder cycles the filter type per row (none/sub/up/average/paeth)
  * so every decoded image exercises all five unfilter paths.
  */
object PngCodec {

  private val Sig: Array[Byte] =
    Array(137, 80, 78, 71, 13, 10, 26, 10).map(_.toByte)

  private def be4(v: Int): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def rdBe4(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  private def chunk(out: java.io.ByteArrayOutputStream, typ: String,
                    data: Array[Byte]): Unit = {
    out.write(be4(data.length))
    val t = typ.getBytes("ASCII")
    out.write(t)
    out.write(data)
    val crc = new CRC32()
    crc.update(t); crc.update(data)
    out.write(be4(crc.getValue.toInt))
  }

  /** Encode a row-major 8-bit grayscale image (top-down) as a PNG
    * (color type 0, bit depth 8, non-interlaced), with the filter type
    * cycling 0..4 by row so decoders must implement all five. */
  def encode(width: Int, height: Int, gray: Array[Byte]): Array[Byte] = {
    require(width > 0 && height > 0 && gray.length == width * height,
      s"need $width*$height=${width.toLong * height} pixels, got ${gray.length}")
    val filtered = new Array[Byte]((width + 1) * height)
    var y = 0
    while (y < height) {
      val ft = y % 5
      filtered(y * (width + 1)) = ft.toByte
      var x = 0
      while (x < width) {
        val raw = gray(y * width + x) & 0xff
        val left = if (x > 0) gray(y * width + x - 1) & 0xff else 0
        val up = if (y > 0) gray((y - 1) * width + x) & 0xff else 0
        val upLeft = if (x > 0 && y > 0) gray((y - 1) * width + x - 1) & 0xff else 0
        val pred = ft match {
          case 0 => 0
          case 1 => left
          case 2 => up
          case 3 => (left + up) / 2
          case _ => paeth(left, up, upLeft)
        }
        filtered(y * (width + 1) + 1 + x) = ((raw - pred) & 0xff).toByte
        x += 1
      }
      y += 1
    }
    val d = new Deflater()
    d.setInput(filtered); d.finish()
    val zOut = new java.io.ByteArrayOutputStream(filtered.length / 2 + 64)
    val buf = new Array[Byte](8192)
    while (!d.finished()) zOut.write(buf, 0, d.deflate(buf))
    d.end()

    val out = new java.io.ByteArrayOutputStream(zOut.size() + 64)
    out.write(Sig)
    val ihdr = new java.io.ByteArrayOutputStream(13)
    ihdr.write(be4(width)); ihdr.write(be4(height))
    ihdr.write(8); ihdr.write(0) // bit depth 8, color type 0 (grayscale)
    ihdr.write(0); ihdr.write(0); ihdr.write(0) // deflate, adaptive filter, no interlace
    chunk(out, "IHDR", ihdr.toByteArray)
    chunk(out, "IDAT", zOut.toByteArray)
    chunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Decoded image summary: dimensions + mean luma in [0,1] (gray value
    * for color type 0, (r+g+b)/3 for color type 2). */
  final case class Decoded(width: Int, height: Int, meanLuma: Double)

  /** Decode an 8-bit grayscale or truecolor non-interlaced PNG. Every
    * chunk length is bounds-checked and CRC-verified, the inflated size
    * must match the geometry exactly, and unknown filter types throw —
    * loud on malformed or adversarial payloads, never a hang or a
    * silent wrong answer. */
  def decode(bytes: Array[Byte]): Decoded = {
    require(bytes.length >= 8 + 12 && Sig.indices.forall(i => bytes(i) == Sig(i)),
      "not a PNG payload")
    var off = 8
    var width = -1; var height = -1; var colorType = -1
    val idat = new java.io.ByteArrayOutputStream()
    var done = false
    while (!done) {
      require(off + 8 <= bytes.length, "PNG: truncated chunk header")
      val len = rdBe4(bytes, off)
      // len >= 0 also rules out the negative-length walker hang
      require(len >= 0 && off + 12 + len <= bytes.length,
        s"PNG: chunk length $len overruns payload")
      val typ = new String(bytes, off + 4, 4, "ASCII")
      val crc = new CRC32()
      crc.update(bytes, off + 4, 4 + len)
      require(crc.getValue.toInt == rdBe4(bytes, off + 8 + len),
        s"PNG: CRC mismatch in $typ chunk")
      typ match {
        case "IHDR" =>
          require(len == 13, s"PNG: IHDR length $len != 13")
          width = rdBe4(bytes, off + 8)
          height = rdBe4(bytes, off + 12)
          val bitDepth = bytes(off + 16) & 0xff
          colorType = bytes(off + 17) & 0xff
          val interlace = bytes(off + 20) & 0xff
          require(width > 0 && height > 0 &&
            width.toLong * height <= Int.MaxValue / 4,
            s"PNG: unsupported geometry ${width}x$height")
          require(bitDepth == 8 && (colorType == 0 || colorType == 2) && interlace == 0,
            s"PNG: only 8-bit gray/truecolor non-interlaced supported " +
              s"(depth=$bitDepth color=$colorType interlace=$interlace)")
        case "IDAT" => idat.write(bytes, off + 8, len)
        case "IEND" => done = true
        case _ => () // ancillary chunks (tEXt, pHYs, ...) are skippable
      }
      off += 12 + len
    }
    require(width > 0 && colorType >= 0, "PNG: missing IHDR")
    require(idat.size() > 0, "PNG: missing IDAT")

    val bpp = if (colorType == 0) 1 else 3
    val stride = width * bpp
    val expect = (stride + 1) * height
    val raw = new Array[Byte](expect)
    val inf = new Inflater()
    inf.setInput(idat.toByteArray)
    var got = 0
    while (got < expect && !inf.finished()) {
      val n = inf.inflate(raw, got, expect - got)
      require(n > 0, "PNG: truncated or invalid IDAT stream") // 0 = stalled
      got += n
    }
    inf.end()
    require(got == expect, s"PNG: inflated $got of $expect filtered bytes")

    // unfilter in place, accumulating the luma sum
    var sum = 0L
    var y = 0
    while (y < height) {
      val rowOff = y * (stride + 1)
      val ft = raw(rowOff) & 0xff
      require(ft <= 4, s"PNG: unknown filter type $ft")
      var i = 0
      while (i < stride) {
        val x = rowOff + 1 + i
        val left = if (i >= bpp) raw(x - bpp) & 0xff else 0
        val up = if (y > 0) raw(x - stride - 1) & 0xff else 0
        val upLeft = if (y > 0 && i >= bpp) raw(x - stride - 1 - bpp) & 0xff else 0
        val pred = ft match {
          case 0 => 0
          case 1 => left
          case 2 => up
          case 3 => (left + up) / 2
          case _ => paeth(left, up, upLeft)
        }
        val v = ((raw(x) & 0xff) + pred) & 0xff
        raw(x) = v.toByte
        sum += v
        i += 1
      }
      y += 1
    }
    val n = width.toLong * height
    Decoded(width, height, sum.toDouble / bpp / n / 255.0)
  }
}
