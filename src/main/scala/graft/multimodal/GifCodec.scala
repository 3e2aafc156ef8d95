package graft.multimodal

import java.io.ByteArrayOutputStream

/** Pure-JVM GIF87a/89a codec, written against the public GIF89a
  * specification (CompuServe, 1990) — no image libraries. Decode handles
  * global and local color tables, interlaced rasters (the four-pass row
  * schedule), multi-frame streams, graphic-control extensions
  * (transparency index surfaced, frames returned as standalone rasters —
  * feature extraction reads frames independently, it does not composite
  * disposal methods), and the full variable-width LZW scheme (code width
  * 3–12 bits LSB-first, clear/EOI, the deferred-clear rule). Encode
  * writes single-frame grayscale GIF89a with REAL LZW compression
  * (prefix-table construction, width growth, table-full clear), which
  * both this decoder and ImageIO must invert (CodecInteropSpec).
  *
  * Loud on malformed streams — truncation, bad LZW codes (a code beyond
  * the table's next slot), geometry bombs, missing color tables — never
  * a hang or a silent wrong answer. Like the reference's image policy,
  * arbitrary inputs either decode correctly or reject with a message
  * (mdio has no image layer; this serves the crawl-pipeline surface).
  */
object GifCodec {

  final case class Frame(left: Int, top: Int, width: Int, height: Int,
                         interlaced: Boolean, transparentIndex: Int,
                         indices: Array[Byte], palette: Array[Int]) {
    /** Integer per-pixel luma (299r+587g+114b)/1000 — exact for gray
      * palettes (r=g=b=v gives exactly v). */
    def lumaSum: Long = {
      var s = 0L
      var i = 0
      while (i < indices.length) {
        val rgb = palette(indices(i) & 0xff)
        s += (299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff) +
          114 * (rgb & 0xff)) / 1000
        i += 1
      }
      s
    }
  }

  final case class Decoded(width: Int, height: Int, frames: Vector[Frame]) {
    def meanLuma: Double = {
      val f = frames.head
      f.lumaSum.toDouble / (f.width.toLong * f.height) / 255.0
    }
  }

  private val MaxDim = 1 << 20

  // ---- decode ---------------------------------------------------------

  def decode(bytes: Array[Byte]): Decoded = {
    var ip = 0
    def u8(): Int = {
      require(ip < bytes.length, "GIF: truncated stream"); ip += 1
      bytes(ip - 1) & 0xff
    }
    def u16(): Int = u8() | (u8() << 8) // little-endian
    require(bytes.length >= 13, "not a GIF payload")
    val sig = new String(bytes, 0, 6, "US-ASCII")
    require(sig == "GIF87a" || sig == "GIF89a", s"not a GIF payload: '$sig'")
    ip = 6
    val width = u16()
    val height = u16()
    require(width > 0 && height > 0 && width <= MaxDim && height <= MaxDim,
      s"GIF: bad logical screen ${width}x$height")
    val packed = u8()
    u8(); u8() // background index, aspect ratio

    def readPalette(n: Int): Array[Int] = {
      require(ip + 3 * n <= bytes.length, "GIF: truncated color table")
      val p = new Array[Int](n)
      var i = 0
      while (i < n) {
        p(i) = ((bytes(ip) & 0xff) << 16) | ((bytes(ip + 1) & 0xff) << 8) |
          (bytes(ip + 2) & 0xff)
        ip += 3
        i += 1
      }
      p
    }

    val globalPalette =
      if ((packed & 0x80) != 0) readPalette(2 << (packed & 0x7))
      else null

    var transparent = -1
    val frames = Vector.newBuilder[Frame]
    var nFrames = 0
    var done = false
    while (!done) {
      u8() match {
        case 0x3b => done = true // trailer
        case 0x21 => // extension
          val label = u8()
          if (label == 0xf9) { // graphic control
            val len = u8()
            require(len == 4, s"GIF: bad GCE length $len")
            val flags = u8()
            u16() // delay
            val tIdx = u8()
            transparent = if ((flags & 1) != 0) tIdx else -1
            require(u8() == 0, "GIF: GCE missing terminator")
          } else {
            // skip sub-blocks (comment / application / plain text)
            var n = u8()
            while (n != 0) { ip += n; require(ip <= bytes.length, "GIF: truncated extension"); n = u8() }
          }
        case 0x2c => // image descriptor
          val left = u16(); val top = u16()
          val w = u16(); val h = u16()
          require(w > 0 && h > 0 && w <= MaxDim && h <= MaxDim &&
            w.toLong * h <= (1L << 26), s"GIF: bad frame geometry ${w}x$h")
          val fp = u8()
          val interlaced = (fp & 0x40) != 0
          val palette =
            if ((fp & 0x80) != 0) readPalette(2 << (fp & 0x7))
            else { require(globalPalette != null, "GIF: no color table for frame"); globalPalette }
          val indices = lzwDecode(w * h)
          // strict palette-bounds check: a stray index is corruption
          var i = 0
          while (i < indices.length) {
            require((indices(i) & 0xff) < palette.length,
              s"GIF: pixel index ${indices(i) & 0xff} outside ${palette.length}-color table")
            i += 1
          }
          val raster = if (interlaced) deinterlace(indices, w, h) else indices
          frames += Frame(left, top, w, h, interlaced, transparent, raster, palette)
          nFrames += 1
          require(nFrames <= 4096, "GIF: frame-count bomb")
          transparent = -1
        case other =>
          throw new IllegalArgumentException(f"GIF: unknown block 0x$other%02x")
      }
    }

    def lzwDecode(nPixels: Int): Array[Byte] = {
      val minCode = u8()
      require(minCode >= 2 && minCode <= 11, s"GIF: bad LZW min code size $minCode")
      val clear = 1 << minCode
      val eoi = clear + 1
      // dictionary as (prefix link, last byte); 4096 max entries
      val prefix = new Array[Short](4096)
      val suffix = new Array[Byte](4096)
      val out = new Array[Byte](nPixels)
      var op = 0
      var codeSize = minCode + 1
      var next = eoi + 1
      var prev = -1
      // bit reader over the 255-byte sub-blocks, LSB-first
      var acc = 0L; var nbits = 0; var blockLeft = 0
      var sawEoi = false
      def code(): Int = {
        while (nbits < codeSize) {
          if (blockLeft == 0) {
            blockLeft = u8()
            require(blockLeft > 0, "GIF: LZW data exhausted before EOI")
          }
          acc |= (u8().toLong << nbits); nbits += 8; blockLeft -= 1
        }
        val c = (acc & ((1 << codeSize) - 1)).toInt
        acc >>>= codeSize; nbits -= codeSize
        c
      }
      val stack = new Array[Byte](4096)
      while (op < nPixels && !sawEoi) {
        val c = code()
        if (c == clear) {
          codeSize = minCode + 1; next = eoi + 1; prev = -1
        } else if (c == eoi) {
          sawEoi = true
        } else {
          require(c < clear || c > eoi, s"GIF: control code $c in data position")
          // KwKwK: c == next means string(prev) + firstChar(prev). Reserve
          // the stack bottom (= the LAST pixel emitted, since the stack is
          // drained in reverse) and walk prev's chain instead; the slot is
          // patched with the chain's first literal once known.
          val kwkwk = c == next
          require(c < next || (kwkwk && prev >= 0),
            s"GIF: LZW code $c beyond table $next")
          var sp = 0
          var cur = c
          if (kwkwk) { sp = 1; cur = prev }
          while (cur >= clear + 2) { // walk the chain; literals are < clear
            stack(sp) = suffix(cur); sp += 1
            cur = prefix(cur)
            require(sp < 4096, "GIF: LZW chain loop")
          }
          require(cur < clear, s"GIF: corrupt LZW chain ends at control code $cur")
          val first = cur.toByte
          stack(sp) = first; sp += 1
          if (kwkwk) stack(0) = first
          // emit reversed
          require(op + sp <= nPixels, "GIF: LZW output overruns raster")
          while (sp > 0) { sp -= 1; out(op) = stack(sp); op += 1 }
          if (prev >= 0 && next < 4096) {
            prefix(next) = prev.toShort
            suffix(next) = first
            next += 1
            if (next == (1 << codeSize) && codeSize < 12) codeSize += 1
          }
          prev = c
        }
      }
      require(op == nPixels, s"GIF: LZW decoded $op of $nPixels pixels")
      // drain: optional EOI + the block terminator. If the terminator
      // itself arrives while hunting for EOI (a stream with no explicit
      // EOI), it is CONSUMED here — re-reading for it below would eat the
      // next top-level byte (e.g. the trailer) as a sub-block length.
      var terminated = false
      if (!sawEoi) {
        // the next code should be EOI; tolerate its absence only at exact fill
        var guard = 0
        var c = -1
        while (c != eoi && guard < 2) {
          if (blockLeft == 0 && nbits < codeSize) {
            val n = u8()
            if (n == 0) { c = eoi; terminated = true } // terminator reached, no explicit EOI
            else blockLeft = n
          }
          if (c != eoi) { c = code(); guard += 1 }
        }
      }
      // skip any residual sub-blocks to the terminator
      if (!terminated) {
        var n = if (blockLeft > 0) { ip += blockLeft; u8() } else u8()
        while (n != 0) { ip += n; require(ip <= bytes.length, "GIF: truncated LZW tail"); n = u8() }
      }
      out
    }

    val fs = frames.result()
    require(fs.nonEmpty, "GIF: no image data before trailer")
    Decoded(width, height, fs)
  }

  private def deinterlace(src: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val out = new Array[Byte](src.length)
    val passes = Array((0, 8), (4, 8), (2, 4), (1, 2))
    var srcRow = 0
    for ((start, step) <- passes) {
      var y = start
      while (y < h) {
        System.arraycopy(src, srcRow * w, out, y * w, w)
        srcRow += 1
        y += step
      }
    }
    out
  }

  // ---- encode ---------------------------------------------------------

  /** Single-frame grayscale GIF89a: 256-entry gray global palette
    * (index i = rgb(i,i,i)), real LZW compression. */
  def encode(width: Int, height: Int, gray: Array[Byte]): Array[Byte] = {
    require(width > 0 && height > 0 && gray.length == width * height,
      "GIF encode: dims must match pixel array")
    val out = new ByteArrayOutputStream(gray.length / 2 + 800)
    out.write("GIF89a".getBytes("US-ASCII"))
    def u16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    u16(width); u16(height)
    out.write(0x80 | 0x70 | 0x07) // global table, 8-bit color res, 256 entries
    out.write(0); out.write(0)
    var i = 0
    while (i < 256) { out.write(i); out.write(i); out.write(i); i += 1 }
    out.write(0x2c) // image descriptor
    u16(0); u16(0); u16(width); u16(height)
    out.write(0) // no local table, not interlaced
    out.write(8) // LZW min code size
    out.write(lzwEncode(gray, 8))
    out.write(0)    // block terminator
    out.write(0x3b) // trailer
    out.toByteArray
  }

  /** GIF-flavor LZW with the standard prefix-table scheme, emitting
    * 255-byte sub-blocks. */
  private def lzwEncode(data: Array[Byte], minCode: Int): Array[Byte] = {
    val clear = 1 << minCode
    val eoi = clear + 1
    val out = new ByteArrayOutputStream(data.length / 2 + 64)
    val block = new Array[Byte](255)
    var blockLen = 0
    var acc = 0L; var nbits = 0
    var codeSize = minCode + 1
    def flushByte(): Unit = {
      block(blockLen) = (acc & 0xff).toByte
      acc >>>= 8; nbits -= 8; blockLen += 1
      if (blockLen == 255) { out.write(255); out.write(block, 0, 255); blockLen = 0 }
    }
    def emit(code: Int): Unit = {
      acc |= (code.toLong << nbits); nbits += codeSize
      while (nbits >= 8) flushByte()
    }
    // table: (prefixCode << 8 | byte) -> code
    var table = new java.util.HashMap[Integer, Integer](8192)
    var next = eoi + 1
    emit(clear)
    var prev = data(0) & 0xff
    var i = 1
    while (i < data.length) {
      val k = data(i) & 0xff
      val key = Integer.valueOf((prev << 8) | k)
      val hit = table.get(key)
      if (hit != null) prev = hit.intValue()
      else {
        emit(prev)
        if (next < 4096) {
          table.put(key, Integer.valueOf(next))
          next += 1
          // GIF width-growth rule: the encoder bumps width when the NEXT
          // code to assign passes the current width's capacity
          if (next - 1 == (1 << codeSize) && codeSize < 12) codeSize += 1
        } else {
          emit(clear)
          table = new java.util.HashMap[Integer, Integer](8192)
          next = eoi + 1
          codeSize = minCode + 1
        }
        prev = k
      }
      i += 1
    }
    emit(prev)
    emit(eoi)
    while (nbits > 0) flushByte()
    if (blockLen > 0) { out.write(blockLen); out.write(block, 0, blockLen) }
    out.toByteArray
  }
}
