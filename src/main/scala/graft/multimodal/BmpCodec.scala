package graft.multimodal

/** A REAL image codec with zero dependencies: uncompressed 24-bpp BMP
  * (BITMAPFILEHEADER + BITMAPINFOHEADER + bottom-up BGR rows padded to
  * 4 bytes). Pure byte arithmetic — no image library — so the decode
  * stage of the multimodal pipeline can be genuinely exercised in this
  * container: [[Multimodal.extractFeatures]] routes `image/bmp` payloads
  * here instead of the stub.
  */
object BmpCodec {

  private def le4(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
  private def le2(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def rdLe4(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
  private def rdLe2(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  /** Encode a row-major grayscale image (one byte per pixel, top-down)
    * as a standards-conforming 24-bpp BMP (b=g=r=value). */
  def encode(width: Int, height: Int, gray: Array[Byte]): Array[Byte] = {
    require(width > 0 && height > 0 && gray.length == width * height,
      s"need $width*$height=${width * height} pixels, got ${gray.length}")
    val rowBytes = width * 3
    val pad = (4 - rowBytes % 4) % 4
    val imageSize = (rowBytes + pad) * height
    val fileSize = 54 + imageSize
    val out = new java.io.ByteArrayOutputStream(fileSize)
    out.write('B'); out.write('M')
    out.write(le4(fileSize)); out.write(le4(0)); out.write(le4(54))
    out.write(le4(40)); out.write(le4(width)); out.write(le4(height))
    out.write(le2(1)); out.write(le2(24))
    out.write(le4(0)); out.write(le4(imageSize))
    out.write(le4(2835)); out.write(le4(2835)); out.write(le4(0)); out.write(le4(0))
    var y = height - 1 // bottom-up
    while (y >= 0) {
      var x = 0
      while (x < width) {
        val v = gray(y * width + x) & 0xff
        out.write(v); out.write(v); out.write(v) // B G R
        x += 1
      }
      var p = 0
      while (p < pad) { out.write(0); p += 1 }
      y -= 1
    }
    out.toByteArray
  }

  /** Decoded image summary: dimensions + mean luma in [0,1], where luma
    * of a pixel is (b+g+r)/3. */
  final case class Decoded(width: Int, height: Int, meanLuma: Double)

  /** Decode a 24-bpp uncompressed BMP (the [[encode]] subset: positive
    * height = bottom-up, BI_RGB). Throws on other BMP flavors — loud,
    * never silently wrong. */
  def decode(bytes: Array[Byte]): Decoded = {
    require(bytes.length >= 54 && bytes(0) == 'B' && bytes(1) == 'M',
      "not a BMP payload")
    val dataOffset = rdLe4(bytes, 10)
    val width = rdLe4(bytes, 18)
    val height = rdLe4(bytes, 22)
    val bpp = rdLe2(bytes, 28)
    val compression = rdLe4(bytes, 30)
    // bound geometry BEFORE multiplying and check sizes in Long, so a
    // hostile header (width ~ 2^30, negative dataOffset) fails the
    // documented way instead of overflowing into an array fault
    require(dataOffset >= 54 && dataOffset <= bytes.length,
      s"BMP pixel-data offset $dataOffset out of range")
    require(width > 0 && height > 0 && width <= (1 << 20) && height <= (1 << 20),
      s"unsupported BMP geometry ${width}x$height")
    require(bpp == 24 && compression == 0,
      s"only 24-bpp uncompressed BMP supported (got bpp=$bpp compression=$compression)")
    val rowBytes = width * 3
    val pad = (4 - rowBytes % 4) % 4
    require(bytes.length >= dataOffset.toLong + (rowBytes.toLong + pad) * height,
      "truncated BMP pixel data")
    var sum = 0L
    var y = 0
    while (y < height) {
      val rowOff = dataOffset + y * (rowBytes + pad)
      var x = 0
      while (x < width) {
        val o = rowOff + x * 3
        sum += (bytes(o) & 0xff) + (bytes(o + 1) & 0xff) + (bytes(o + 2) & 0xff)
        x += 1
      }
      y += 1
    }
    val n = width.toLong * height
    Decoded(width, height, sum.toDouble / 3.0 / n / 255.0)
  }

  /** Decode to the full grayscale pixel array (top-down row-major, one
    * byte per pixel), for downstream pixel analysis (perceptual hashing).
    * Gray = the blue channel — [[encode]] writes b=g=r, so for payloads
    * from this corpus it IS the original gray byte; a true color image
    * would need a luma transform here. Same header validation as
    * [[decode]]. */
  def decodeGray(bytes: Array[Byte]): (Int, Int, Array[Byte]) = {
    require(bytes.length >= 54 && bytes(0) == 'B' && bytes(1) == 'M',
      "not a BMP payload")
    val dataOffset = rdLe4(bytes, 10)
    val width = rdLe4(bytes, 18)
    val height = rdLe4(bytes, 22)
    val bpp = rdLe2(bytes, 28)
    val compression = rdLe4(bytes, 30)
    require(dataOffset >= 54 && dataOffset <= bytes.length,
      s"BMP pixel-data offset $dataOffset out of range")
    require(width > 0 && height > 0 && width <= (1 << 20) && height <= (1 << 20),
      s"unsupported BMP geometry ${width}x$height")
    require(bpp == 24 && compression == 0,
      s"only 24-bpp uncompressed BMP supported (got bpp=$bpp compression=$compression)")
    val rowBytes = width * 3
    val pad = (4 - rowBytes % 4) % 4
    require(bytes.length >= dataOffset.toLong + (rowBytes.toLong + pad) * height,
      "truncated BMP pixel data")
    val gray = new Array[Byte](width * height)
    var y = 0
    while (y < height) {
      // file rows are bottom-up; emit top-down
      val rowOff = dataOffset + (height - 1 - y) * (rowBytes + pad)
      var x = 0
      while (x < width) {
        gray(y * width + x) = bytes(rowOff + x * 3)
        x += 1
      }
      y += 1
    }
    (width, height, gray)
  }
}
