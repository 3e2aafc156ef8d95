package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

/** Pure-JVM ISO-BMFF (MP4) container codec: a minimal standards-layout
  * muxer and a real box-walking parser. This retires the last multimodal
  * stub: `video/mp4` payloads no longer fall back to the deterministic
  * fake — the sample tables (`stts`/`stsz`/`stss`/`stsc`/`stco`) are
  * genuinely parsed, which is exactly the part of video ingest a
  * training-data pipeline runs distributed (frame *sampling* reads the
  * container index and seeks; the per-frame pixel decode is the part that
  * stays in a specialist library and was never the Spark-side work).
  *
  * Reference context: TGSAI/mdio-cpp has no multimodal surface at all
  * (`mdio/dataset.h` is seismic arrays only), so this is beyond-reference
  * scope, built against the public ISO/IEC 14496-12 box layout.
  *
  * Wire layout produced by [[mux]] (all sizes deterministic in the sample
  * count `n`, which MUST be a positive multiple of 4):
  *
  * {{{
  * ftyp(24) moov(575+6n) mdat(8 + Σ sizes)
  *   moov = mvhd(108) trak(459+6n)
  *   trak = tkhd(92) mdia(359+6n)
  *   mdia = mdhd(32) hdlr(33) minf(286+6n)
  *   minf = vmhd(20) dinf(36) stbl(222+6n)
  *   stbl = stsd(102) stts(32: 2 runs) stss(16+4·n/4)
  *          stsz(20+4n) stsc(28: 1 entry, 4 samples/chunk) stco(16+4·n/4)
  * }}}
  *
  * so the first media byte sits at file offset `607 + 6n` — a closed form
  * the DuckDB oracle reproduces, which makes the parser's recovered
  * offsets (stco/stsc walk + stsz accumulation) SQL-certifiable.
  *
  * The parser is NOT layout-bound: it walks boxes by their size fields
  * (skipping unknown boxes), does all bounds arithmetic in Long (a
  * hostile 32-bit size cannot overflow into a negative index — same
  * discipline as the snappy decoder's literal bounds), and cross-checks
  * the redundant container invariants loudly: stts total sample count vs
  * stsz entry count, tkhd 16.16 dimensions vs stsd u16 dimensions, chunk
  * walk sample total vs sample count.
  */
object Mp4Codec {

  /** Per-track metadata recovered by [[parse]]. `offsets(i)` is the
    * absolute file offset of sample i (from the stsc/stco/stsz walk),
    * `pts(i)` its composition time in `timescale` ticks (stts
    * accumulation), `keyframes` the 0-based indices from stss. */
  case class Track(width: Int, height: Int, timescale: Long, duration: Long,
                   nSamples: Int, sizes: Array[Int], offsets: Array[Long],
                   pts: Array[Long], keyframes: Array[Int])

  val Timescale = 90000L
  val SamplesPerChunk = 4

  // ---- muxer ---------------------------------------------------------------

  /** Build a minimal valid MP4: one video track, `sizes.length` samples
    * (must be a positive multiple of [[SamplesPerChunk]]), two stts runs
    * (first half duration 1000 ticks, second half 1100), a keyframe every
    * 4th sample starting at sample 0, 4 samples per chunk. `payload(i)`
    * supplies sample i's media bytes and must match `sizes(i)`. */
  def mux(width: Int, height: Int, sizes: Array[Int],
          payload: Int => Array[Byte]): Array[Byte] = {
    val n = sizes.length
    require(n > 0 && n % SamplesPerChunk == 0,
      s"sample count must be a positive multiple of $SamplesPerChunk, got $n")
    val nKey = n / 4
    val nChunks = n / SamplesPerChunk
    val half = n / 2
    val durTicks = half * 1000L + (n - half) * 1100L
    val mediaBytes = sizes.map(_.toLong).sum
    require(mediaBytes <= Int.MaxValue - 4096, "media too large for one mdat")

    val stblSize = 222 + 6 * n
    val moovSize = 575 + 6 * n
    val dataStart = 607 + 6 * n
    val total = dataStart + mediaBytes.toInt
    val buf = ByteBuffer.allocate(total).order(ByteOrder.BIG_ENDIAN)

    def box(size: Int, tpe: String): Unit = {
      buf.putInt(size); buf.put(tpe.getBytes("US-ASCII"))
    }
    def fullBox(size: Int, tpe: String): Unit = { box(size, tpe); buf.putInt(0) }

    // ftyp
    box(24, "ftyp")
    buf.put("isom".getBytes("US-ASCII")); buf.putInt(0)
    buf.put("isom".getBytes("US-ASCII")); buf.put("iso2".getBytes("US-ASCII"))

    // moov/mvhd (v0): timescale + duration + boilerplate matrix
    box(moovSize, "moov")
    fullBox(108, "mvhd")
    buf.putInt(0); buf.putInt(0)                    // creation/modification
    buf.putInt(Timescale.toInt); buf.putInt(durTicks.toInt)
    buf.putInt(0x00010000); buf.putShort(0x0100.toShort); buf.putShort(0)
    buf.putInt(0); buf.putInt(0)                    // reserved
    val matrix = Array(0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)
    matrix.foreach(buf.putInt)
    (0 until 6).foreach(_ => buf.putInt(0))         // pre_defined
    buf.putInt(2)                                   // next_track_ID

    // trak/tkhd (v0): track 1, 16.16 fixed-point dimensions
    box(459 + 6 * n, "trak")
    box(92, "tkhd"); buf.putInt(0x000007)           // flags: enabled+in-movie
    buf.putInt(0); buf.putInt(0); buf.putInt(1); buf.putInt(0)
    buf.putInt(durTicks.toInt)
    buf.putInt(0); buf.putInt(0)                    // reserved
    buf.putShort(0); buf.putShort(0); buf.putShort(0); buf.putShort(0)
    matrix.foreach(buf.putInt)
    buf.putInt(width << 16); buf.putInt(height << 16)

    // mdia/mdhd (v0)
    box(359 + 6 * n, "mdia")
    fullBox(32, "mdhd")
    buf.putInt(0); buf.putInt(0)
    buf.putInt(Timescale.toInt); buf.putInt(durTicks.toInt)
    buf.putShort(0x55c4.toShort); buf.putShort(0)   // language 'und'
    // hdlr: 'vide', empty null-terminated name
    fullBox(33, "hdlr")
    buf.putInt(0); buf.put("vide".getBytes("US-ASCII"))
    (0 until 3).foreach(_ => buf.putInt(0)); buf.put(0.toByte)

    // minf
    box(286 + 6 * n, "minf")
    fullBox(20, "vmhd"); buf.putShort(0); (0 until 3).foreach(_ => buf.putShort(0))
    box(36, "dinf"); fullBox(28, "dref"); buf.putInt(1)
    fullBox(12, "url "); buf.position(buf.position() - 4); buf.putInt(1) // self-contained flag

    // stbl
    box(stblSize, "stbl")
    // stsd: one 86-byte 'mp4v' VisualSampleEntry, no extension boxes
    fullBox(102, "stsd"); buf.putInt(1)
    box(86, "mp4v")
    (0 until 6).foreach(_ => buf.put(0.toByte)); buf.putShort(1) // data_ref_index
    buf.putShort(0); buf.putShort(0); (0 until 3).foreach(_ => buf.putInt(0))
    buf.putShort(width.toShort); buf.putShort(height.toShort)
    buf.putInt(0x00480000); buf.putInt(0x00480000)  // 72 dpi
    buf.putInt(0); buf.putShort(1)                  // frame_count
    (0 until 32).foreach(_ => buf.put(0.toByte))    // compressorname
    buf.putShort(24); buf.putShort(0xffff.toShort)  // depth, pre_defined
    // stts: two runs
    fullBox(32, "stts"); buf.putInt(2)
    buf.putInt(half); buf.putInt(1000)
    buf.putInt(n - half); buf.putInt(1100)
    // stss: keyframes at 1-based samples 1, 5, 9, …
    fullBox(16 + 4 * nKey, "stss"); buf.putInt(nKey)
    (0 until nKey).foreach(k => buf.putInt(4 * k + 1))
    // stsz: per-sample sizes
    fullBox(20 + 4 * n, "stsz"); buf.putInt(0); buf.putInt(n)
    sizes.foreach(buf.putInt)
    // stsc: one run of 4 samples/chunk
    fullBox(28, "stsc"); buf.putInt(1)
    buf.putInt(1); buf.putInt(SamplesPerChunk); buf.putInt(1)
    // stco: chunk offsets = dataStart + cumulative chunk bytes
    fullBox(16 + 4 * nChunks, "stco"); buf.putInt(nChunks)
    var off = dataStart.toLong
    var i = 0
    while (i < n) {
      if (i % SamplesPerChunk == 0) buf.putInt(off.toInt)
      off += sizes(i); i += 1
    }

    // mdat
    box(8 + mediaBytes.toInt, "mdat")
    i = 0
    while (i < n) {
      val p = payload(i)
      require(p.length == sizes(i), s"payload $i: ${p.length} != ${sizes(i)}")
      buf.put(p); i += 1
    }
    require(buf.position() == total, s"layout bug: ${buf.position()} != $total")
    buf.array()
  }

  // ---- parser --------------------------------------------------------------

  private def u32(b: Array[Byte], p: Long): Long = {
    require(p >= 0 && p + 4 <= b.length, s"mp4: truncated read at $p")
    ((b(p.toInt) & 0xffL) << 24) | ((b(p.toInt + 1) & 0xffL) << 16) |
      ((b(p.toInt + 2) & 0xffL) << 8) | (b(p.toInt + 3) & 0xffL)
  }
  private def u16(b: Array[Byte], p: Long): Int = {
    require(p >= 0 && p + 2 <= b.length, s"mp4: truncated read at $p")
    ((b(p.toInt) & 0xff) << 8) | (b(p.toInt + 1) & 0xff)
  }
  private def fourcc(b: Array[Byte], p: Long): String = {
    require(p >= 0 && p + 4 <= b.length, s"mp4: truncated read at $p")
    new String(b, p.toInt, 4, "US-ASCII")
  }

  /** Walk the children of [start, end), calling `f(type, bodyStart,
    * bodyEnd)` per box. All arithmetic in Long: a hostile size can only
    * fail a require, never wrap into a negative index. */
  private def walk(b: Array[Byte], start: Long, end: Long)
                  (f: (String, Long, Long) => Unit): Unit = {
    var p = start
    while (p < end) {
      require(end - p >= 8, s"mp4: trailing garbage at $p")
      val size = u32(b, p)
      val tpe = fourcc(b, p + 4)
      require(size != 1, "mp4: 64-bit box sizes unsupported")
      val boxEnd = if (size == 0) end else p + size
      require(size == 0 || size >= 8, s"mp4: box '$tpe' size $size < 8")
      require(boxEnd <= end, s"mp4: box '$tpe' overruns parent ($boxEnd > $end)")
      f(tpe, p + 8, boxEnd)
      p = boxEnd
    }
  }

  /** Parse one video track's sample tables out of an MP4. Redundant
    * container invariants (stts vs stsz counts, tkhd vs stsd dimensions,
    * mdhd vs stts duration) are cross-checked loudly. */
  def parse(bytes: Array[Byte]): Track = {
    var timescale = 0L; var mdhdDur = -1L
    var tkW = -1; var tkH = -1; var sdW = -1; var sdH = -1
    var sizes: Array[Int] = null
    var sttsRuns: Array[(Int, Int)] = null
    var keyframes: Array[Int] = null
    var chunkOffsets: Array[Long] = null
    var stscRuns: Array[(Int, Int)] = null // (first_chunk, samples_per_chunk)

    def parseStbl(s: Long, e: Long): Unit = walk(bytes, s, e) {
      case ("stsd", bs, be) =>
        require(be - bs >= 8, "mp4: stsd truncated")
        if (u32(bytes, bs + 4) >= 1 && be - bs >= 8 + 36) {
          // first sample entry: VisualSampleEntry w/h at offset 24+8 from entry start
          val entry = bs + 8
          sdW = u16(bytes, entry + 32); sdH = u16(bytes, entry + 34)
        }
      case ("stts", bs, be) =>
        val count = u32(bytes, bs + 4)
        require(be - bs >= 8 + 8 * count, "mp4: stts truncated")
        sttsRuns = Array.tabulate(count.toInt) { i =>
          (u32(bytes, bs + 8 + 8L * i).toInt, u32(bytes, bs + 12 + 8L * i).toInt)
        }
      case ("stss", bs, be) =>
        val count = u32(bytes, bs + 4)
        require(be - bs >= 8 + 4 * count, "mp4: stss truncated")
        keyframes = Array.tabulate(count.toInt) { i =>
          u32(bytes, bs + 8 + 4L * i).toInt - 1 // 1-based → 0-based
        }
      case ("stsz", bs, be) =>
        val fixed = u32(bytes, bs + 4); val count = u32(bytes, bs + 8)
        require(count <= Int.MaxValue / 8, s"mp4: absurd sample count $count")
        if (fixed == 0) {
          require(be - bs >= 12 + 4 * count, "mp4: stsz truncated")
          sizes = Array.tabulate(count.toInt)(i => u32(bytes, bs + 12 + 4L * i).toInt)
        } else sizes = Array.fill(count.toInt)(fixed.toInt)
      case ("stsc", bs, be) =>
        val count = u32(bytes, bs + 4)
        require(be - bs >= 8 + 12 * count, "mp4: stsc truncated")
        stscRuns = Array.tabulate(count.toInt) { i =>
          (u32(bytes, bs + 8 + 12L * i).toInt, u32(bytes, bs + 12 + 12L * i).toInt)
        }
      case ("stco", bs, be) =>
        val count = u32(bytes, bs + 4)
        require(be - bs >= 8 + 4 * count, "mp4: stco truncated")
        chunkOffsets = Array.tabulate(count.toInt)(i => u32(bytes, bs + 8 + 4L * i))
      case _ => ()
    }

    def parseMinf(s: Long, e: Long): Unit = walk(bytes, s, e) {
      case ("stbl", bs, be) => parseStbl(bs, be)
      case _ => ()
    }
    def parseMdia(s: Long, e: Long): Unit = walk(bytes, s, e) {
      case ("mdhd", bs, be) =>
        require(be - bs >= 24 && bytes((bs).toInt) == 0, "mp4: mdhd v1 unsupported")
        timescale = u32(bytes, bs + 12); mdhdDur = u32(bytes, bs + 16)
      case ("minf", bs, be) => parseMinf(bs, be)
      case _ => ()
    }
    def parseTrak(s: Long, e: Long): Unit = walk(bytes, s, e) {
      case ("tkhd", bs, be) =>
        require(be - bs >= 84 && bytes(bs.toInt) == 0, "mp4: tkhd v1 unsupported")
        // v0 tkhd: width/height are the last two 16.16 fields of the box
        tkW = (u32(bytes, be - 8) >> 16).toInt
        tkH = (u32(bytes, be - 4) >> 16).toInt
      case ("mdia", bs, be) => parseMdia(bs, be)
      case _ => ()
    }

    var sawMoov = false
    walk(bytes, 0, bytes.length) {
      case ("moov", bs, be) =>
        sawMoov = true
        walk(bytes, bs, be) {
          case ("trak", ts, te) => parseTrak(ts, te)
          case _ => ()
        }
      case _ => ()
    }
    require(sawMoov, "mp4: no moov box")
    require(sizes != null && sttsRuns != null && stscRuns != null &&
      chunkOffsets != null, "mp4: incomplete sample tables")
    if (keyframes == null) keyframes = Array.empty

    val n = sizes.length
    // stts → per-sample pts; total count must agree with stsz
    val sttsTotal = sttsRuns.map(_._1.toLong).sum
    require(sttsTotal == n, s"mp4: stts covers $sttsTotal samples, stsz has $n")
    val pts = new Array[Long](n)
    var t = 0L; var si = 0
    sttsRuns.foreach { case (cnt, dur) =>
      var j = 0
      while (j < cnt) { pts(si) = t; t += dur; si += 1; j += 1 }
    }
    require(mdhdDur == t, s"mp4: mdhd duration $mdhdDur != stts total $t")
    // tkhd vs stsd dimension cross-check (when both present)
    require(sdW < 0 || tkW < 0 || (sdW == tkW && sdH == tkH),
      s"mp4: tkhd ${tkW}x$tkH != stsd ${sdW}x$sdH")
    // stsc/stco walk → per-sample offsets
    val offsets = new Array[Long](n)
    val nChunks = chunkOffsets.length
    var sample = 0
    var c = 0
    while (c < nChunks && sample < n) {
      // samples_per_chunk for chunk c+1: the last stsc run with first_chunk <= c+1
      var spc = stscRuns(0)._2
      stscRuns.foreach { case (fc, s2) => if (fc <= c + 1) spc = s2 }
      var off = chunkOffsets(c)
      var j = 0
      while (j < spc && sample < n) {
        offsets(sample) = off; off += sizes(sample); sample += 1; j += 1
      }
      c += 1
    }
    require(sample == n, s"mp4: chunk walk placed $sample of $n samples")
    keyframes.foreach(k => require(k >= 0 && k < n, s"mp4: stss sample ${k + 1} out of range"))
    Track(math.max(tkW, sdW), math.max(tkH, sdH), timescale, mdhdDur, n,
      sizes, offsets, pts, keyframes)
  }
}
