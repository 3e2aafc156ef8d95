package graft.zarr

import org.scalatest.funsuite.AnyFunSuite

class ChunkCodecSpec extends AnyFunSuite {

  private val doubles = Array(1.5, -2.25, 3.0, 0.0, Double.NaN, 1e300)
  private val longs = Array(1L, -2L, 300L, 0L, Long.MaxValue, Long.MinValue)

  test("float dtypes round-trip through encode/decode") {
    for (dt <- Seq("<f8")) {
      val got = ChunkCodec.decodeDoubles(ChunkCodec.encodeDoubles(doubles, dt), dt)
      assert(got.zip(doubles).forall { case (a, b) => a == b || (a.isNaN && b.isNaN) })
    }
    val f4 = Array(1.5, -2.25, 3.0)
    assert(ChunkCodec.decodeDoubles(ChunkCodec.encodeDoubles(f4, "<f4"), "<f4").toSeq == f4.toSeq)
  }

  test("int dtypes round-trip losslessly via longs") {
    val i8 = ChunkCodec.encodeDoubles(longs.map(_.toDouble), "<i8")
    // int64 via double loses precision at extremes — decodeLongs on the raw
    // little-endian buffer must still be exact for what encode produced
    val i4vals = Array(1L, -2L, 300L, Int.MaxValue.toLong)
    val raw = ChunkCodec.encodeDoubles(i4vals.map(_.toDouble), "<i4")
    assert(ChunkCodec.decodeLongs(raw, "<i4").toSeq == i4vals.toSeq)
    val i2vals = Array(1L, -2L, 300L, Short.MaxValue.toLong)
    assert(ChunkCodec.decodeLongs(ChunkCodec.encodeDoubles(i2vals.map(_.toDouble), "<i2"), "<i2").toSeq == i2vals.toSeq)
  }

  test("unsigned dtypes widen correctly (u1/u2/u4)") {
    val u1 = Array[Byte](0, -1, 127)  // -1 as u8 = 255
    assert(ChunkCodec.decodeLongs(u1, "|u1").toSeq == Seq(0L, 255L, 127L))
    val u4vals = Array(0L, 4294967295L, 17L)
    val raw = ChunkCodec.encodeDoubles(u4vals.map(_.toDouble), "<u4")
    assert(ChunkCodec.decodeLongs(raw, "<u4").toSeq == u4vals.toSeq)
  }

  test("bool dtype round-trips") {
    val raw = ChunkCodec.encodeDoubles(Array(1.0, 0.0, 1.0), "|b1")
    assert(ChunkCodec.decodeLongs(raw, "|b1").toSeq == Seq(1L, 0L, 1L))
  }

  test("compressors round-trip: zlib, zstd, lz4, null") {
    val raw = ChunkCodec.encodeDoubles(Array.tabulate(1000)(i => (i % 17).toDouble), "<f8")
    for (codec <- Seq(None, Some("zlib"), Some("zstd"), Some("lz4"))) {
      val comp = ChunkCodec.compress(raw, codec)
      if (codec.isDefined) assert(comp.length < raw.length, s"$codec did not compress")
      val back = ChunkCodec.decompress(comp, codec, raw.length)
      assert(back.toSeq == raw.toSeq, s"$codec round-trip failed")
    }
  }

  test("big-endian dtypes rejected") {
    intercept[IllegalArgumentException](ChunkCodec.decodeDoubles(Array[Byte](0, 0, 0, 0), ">f4"))
  }

  test("float16 round-trips through half conversion (representable values)") {
    val vals = Array(0.0, 1.0, -2.5, 0.5, 65504.0, Double.NaN)
    val raw = ChunkCodec.encodeDoubles(vals, "<f2")
    assert(raw.length == vals.length * 2)
    val back = ChunkCodec.decodeDoubles(raw, "<f2")
    assert(back.zip(vals).forall { case (a, b) => a == b || (a.isNaN && b.isNaN) })
    // subnormal half and overflow-to-inf behavior
    val tiny = ChunkCodec.decodeDoubles(ChunkCodec.encodeDoubles(Array(6.0e-8), "<f2"), "<f2")(0)
    assert(tiny > 0 && tiny < 1e-7)
    val inf = ChunkCodec.decodeDoubles(ChunkCodec.encodeDoubles(Array(1e6), "<f2"), "<f2")(0)
    assert(inf.isPosInfinity)
  }

  test("blosc single-block frame round-trips (lz4 and memcpy fallback)") {
    // compressible payload -> lz4 block
    val rep = ChunkCodec.encodeDoubles(Array.tabulate(2000)(i => (i % 7).toDouble), "<f8")
    val cRep = ChunkCodec.compress(rep, Some("blosc"))
    assert(cRep.length < rep.length)
    assert(ChunkCodec.decompress(cRep, Some("blosc"), rep.length).toSeq == rep.toSeq)
    // incompressible payload -> memcpy frame
    val rnd = new scala.util.Random(3)
    val noise = Array.fill(512)(rnd.nextInt().toByte)
    val cNoise = ChunkCodec.compress(noise, Some("blosc"))
    assert((cNoise(2) & 0x2) != 0, "expected memcpy flag for incompressible data")
    assert(ChunkCodec.decompress(cNoise, Some("blosc"), noise.length).toSeq == noise.toSeq)
  }

  test("blosc byte-shuffle round-trips at every element size × cname") {
    // slowly-varying values: shuffle groups the near-constant high bytes,
    // so the shuffled frame must also WIN on size for multi-byte types
    val rnd = new scala.util.Random(7)
    for (ts <- Seq(1, 2, 4, 8, 16);
         cname <- Seq("lz4", "lz4hc", "zlib", "zstd", "blosclz", "snappy")) {
      val n = 600 * ts
      val raw = Array.tabulate(n)(i => ((i / ts) % 31 + rnd.nextInt(2)).toByte)
      val b = ChunkCodec.Blosc(cname = cname, clevel = 5, shuffle = 1)
      val comp = ChunkCodec.compress(raw, Some("blosc"), ts, Some(b))
      if (ts > 1) // byte-shuffle is a no-op at typesize 1, flag stays clear
        assert((comp(2) & 0x1) != 0 || (comp(2) & 0x2) != 0, s"ts=$ts $cname: no shuffle flag")
      assert(comp(3) == ts.toByte || (comp(2) & 0x2) != 0)
      val back = ChunkCodec.decompress(comp, Some("blosc"), raw.length)
      assert(back.toSeq == raw.toSeq, s"ts=$ts $cname shuffle round-trip failed")
    }
  }

  test("blosc clevel 0 stores uncompressed") {
    val raw = Array.tabulate(256)(_.toByte)
    val stored = ChunkCodec.compress(raw, Some("blosc"), 4,
      Some(ChunkCodec.Blosc(clevel = 0)))
    assert((stored(2) & 0x2) != 0) // memcpy frame
    assert(ChunkCodec.decompress(stored, Some("blosc"), raw.length).toSeq == raw.toSeq)
  }

  test("blosc bit-shuffle transform matches the published layout exactly") {
    // plane (j*8 + b), byte i/8, bit i%8  =  bit b of byte j of element i
    // — pinned on single-bit inputs so a transposition mistake cannot
    // cancel out in a round-trip
    val a = new Array[Byte](8); a(3) = (1 << 5).toByte // ts=1: elem 3, bit 5
    ChunkCodec.bitshuffleInPlace(a, 0, 8, 1)
    val wantA = new Array[Byte](8); wantA(5) = (1 << 3).toByte
    assert(a.toSeq == wantA.toSeq)
    val c = new Array[Byte](16); c(2 * 2 + 1) = 1 // ts=2: elem 2, byte 1, bit 0
    ChunkCodec.bitshuffleInPlace(c, 0, 16, 2)
    val wantC = new Array[Byte](16); wantC(8) = (1 << 2).toByte // plane 8, bit 2
    assert(c.toSeq == wantC.toSeq)
    // non-multiple-of-8 element counts: c-blosc rounds down and memcpys
    // the tail raw
    val t = Array.tabulate(2 * 11)(i => (i * 37 + 5).toByte) // 11 elems of ts=2
    val orig = t.clone()
    ChunkCodec.bitshuffleInPlace(t, 0, t.length, 2)
    assert(t.slice(16, 22).toSeq == orig.slice(16, 22).toSeq, "tail must stay raw")
    ChunkCodec.bitunshuffleInPlace(t, 0, t.length, 2)
    assert(t.toSeq == orig.toSeq)
  }

  test("blosc bit-shuffle matches a naive per-bit transform over EVERY bit position") {
    // The optimized transform (word-packed 8x8 transpose) vs a reference
    // built ONLY from the published layout formula, bit by bit:
    //   out[(j*8 + b) * (n/8) + i/8]  bit (i % 8)  =  in[i*ts + j]  bit b
    // Exhaustive over all len*8 single-bit inputs plus dense payloads, so
    // no transposition or plane-order mistake can hide in sampling.
    def naive(in: Array[Byte], ts: Int): Array[Byte] = {
      val n = (in.length / ts) & ~7
      val out = in.clone() // tail beyond n*ts stays raw
      for (i <- 0 until n; j <- 0 until ts; b <- 0 until 8) {
        val bit = (in(i * ts + j) >> b) & 1
        val oIdx = (j * 8 + b) * (n / 8) + i / 8
        if (bit == 1) out(oIdx) = (out(oIdx) | (1 << (i % 8))).toByte
        else out(oIdx) = (out(oIdx) & ~(1 << (i % 8))).toByte
      }
      out
    }
    for (ts <- Seq(1, 2, 3, 4, 8); nElems <- Seq(8, 16, 19)) {
      val len = ts * nElems
      // every single-bit input
      for (pos <- 0 until len * 8) {
        val in = new Array[Byte](len)
        in(pos / 8) = (1 << (pos % 8)).toByte
        val got = in.clone()
        ChunkCodec.bitshuffleInPlace(got, 0, len, ts)
        assert(got.toSeq == naive(in, ts).toSeq,
          s"ts=$ts n=$nElems single bit $pos")
      }
      // dense deterministic payload
      val dense = Array.tabulate(len)(i => (i * 131 + 17).toByte)
      val got = dense.clone()
      ChunkCodec.bitshuffleInPlace(got, 0, len, ts)
      assert(got.toSeq == naive(dense, ts).toSeq, s"ts=$ts n=$nElems dense")
      val back = got.clone()
      ChunkCodec.bitunshuffleInPlace(back, 0, len, ts)
      assert(back.toSeq == dense.toSeq, s"ts=$ts n=$nElems inverse")
    }
  }

  test("blosc bit-shuffle round-trips at every element size × cname") {
    val rnd = new scala.util.Random(13)
    for (ts <- Seq(1, 2, 4, 8, 16);
         cname <- Seq("lz4", "zlib", "zstd", "blosclz", "snappy")) {
      val n = 600 * ts + (ts * (if (ts == 1) 5 else 3)) // ragged element count
      val raw = Array.tabulate(n)(i => ((i / ts) % 31 + rnd.nextInt(2)).toByte)
      val b = ChunkCodec.Blosc(cname = cname, clevel = 5, shuffle = 2)
      val comp = ChunkCodec.compress(raw, Some("blosc"), ts, Some(b))
      assert((comp(2) & 0x4) != 0 || (comp(2) & 0x2) != 0, s"ts=$ts $cname: no bitshuffle flag")
      val back = ChunkCodec.decompress(comp, Some("blosc"), raw.length)
      assert(back.toSeq == raw.toSeq, s"ts=$ts $cname bitshuffle round-trip failed")
    }
    // bitshuffle applies at typesize 1 too (unlike byte-shuffle)
    val ones = Array.fill(4096)(1.toByte)
    val comp1 = ChunkCodec.compress(ones, Some("blosc"), 1,
      Some(ChunkCodec.Blosc(cname = "zstd", clevel = 5, shuffle = 2)))
    assert((comp1(2) & 0x4) != 0)
    assert(ChunkCodec.decompress(comp1, Some("blosc"), ones.length).toSeq == ones.toSeq)
  }

  test("blosclz and snappy blocks round-trip across data shapes") {
    val rnd = new scala.util.Random(11)
    val page8191 = Array.fill(8191)(rnd.nextInt().toByte)
    val shapes: Seq[Array[Byte]] = Seq(
      Array[Byte](7),
      Array.tabulate(400)(i => (i % 7).toByte),           // short-distance matches
      Array.fill(70000)('x'.toByte),                      // long RLE, chained lengths
      Array.fill(10000)(rnd.nextInt().toByte),            // incompressible
      Array.tabulate(50000)(i => ((i / 64) % 251).toByte),
      page8191 ++ page8191,                               // distance exactly 8191 (near edge)
      Array.tabulate(9000)(i => (i % 255).toByte))        // distance 255 repeats
    for ((src, i) <- shapes.zipWithIndex) {
      val lz = ChunkCodec.blosclzCompress(src)
      val outLz = new Array[Byte](src.length)
      ChunkCodec.blosclzDecompress(lz, 0, lz.length, outLz, 0, src.length)
      assert(outLz.toSeq == src.toSeq, s"blosclz shape $i")
      val sn = ChunkCodec.snappyCompress(src)
      val outSn = new Array[Byte](src.length)
      ChunkCodec.snappyDecompress(sn, 0, sn.length, outSn, 0, src.length)
      assert(outSn.toSeq == src.toSeq, s"snappy shape $i")
    }
    // full frame path via compress/decompress with the Blosc settings
    for (cname <- Seq("blosclz", "snappy")) {
      val raw = ChunkCodec.encodeDoubles(Array.tabulate(3000)(i => (i % 97).toDouble / 8), "<f8")
      val b = ChunkCodec.Blosc(cname = cname, clevel = 5, shuffle = 1)
      val comp = ChunkCodec.compress(raw, Some("blosc"), 8, Some(b))
      assert(comp.length < raw.length, s"$cname did not compress")
      assert(((comp(2) & 0xff) >> 5) == (if (cname == "blosclz") 0 else 3))
      assert(ChunkCodec.decompress(comp, Some("blosc"), raw.length).toSeq == raw.toSeq)
    }
  }

  test("blosclz far-distance escape and snappy copy1/copy4 decode (hand-crafted)") {
    // blosclz: 9000 literal bytes then a 10-byte match at back-distance 9000
    // (d16 = 9000 - 8191 = 809): ctrl (7<<5)|31, ext 1, code 255, d16 BE.
    val lits = Array.tabulate(9000)(i => (i % 251).toByte)
    val bos = new java.io.ByteArrayOutputStream()
    var off = 0
    while (off < 9000) { // literal runs of 32
      val run = math.min(9000 - off, 32)
      bos.write(run - 1); bos.write(lits, off, run); off += run
    }
    bos.write((7 << 5) | 31); bos.write(10 - 2 - 7); bos.write(255)
    bos.write(809 >> 8); bos.write(809 & 0xff)
    val stream = bos.toByteArray
    val out = new Array[Byte](9010)
    ChunkCodec.blosclzDecompress(stream, 0, stream.length, out, 0, 9010)
    assert(out.take(9000).toSeq == lits.toSeq)
    assert(out.slice(9000, 9010).toSeq == lits.take(10).toSeq, "far match must copy from distance 9000")

    // snappy: literal "abcd", copy1 (len 4, dist 4), copy4 (len 4, dist 8)
    val sn = Array[Byte](
      12,                       // varint size 12
      ((4 - 1) << 2).toByte, 'a', 'b', 'c', 'd',
      (((4 - 4) << 2) | 1).toByte, 4,      // copy1: len 4, offset 4
      (((4 - 1) << 2) | 3).toByte, 8, 0, 0, 0) // copy4: len 4, offset 8
    val outSn = new Array[Byte](12)
    ChunkCodec.snappyDecompress(sn, 0, sn.length, outSn, 0, 12)
    assert(new String(outSn, "ASCII") == "abcdabcdabcd")
  }

  test("blosclz and snappy reject malformed streams loudly") {
    val out = new Array[Byte](100)
    // blosclz: match reaching before block start
    intercept[IllegalArgumentException] {
      ChunkCodec.blosclzDecompress(Array[Byte](0, 1, (1 << 5).toByte, 50), 0, 4, out, 0, 100)
    }
    // blosclz: truncated literal run
    intercept[IllegalArgumentException] {
      ChunkCodec.blosclzDecompress(Array[Byte](31, 1, 2), 0, 3, out, 0, 100)
    }
    // blosclz: decoded size mismatch
    intercept[IllegalArgumentException] {
      ChunkCodec.blosclzDecompress(Array[Byte](1, 5, 6), 0, 3, out, 0, 100)
    }
    // snappy: declared size != expected
    intercept[IllegalArgumentException] {
      ChunkCodec.snappyDecompress(Array[Byte](5, 0, 'a'), 0, 3, out, 0, 100)
    }
    // snappy: truncated length varint (continuation bit, no next byte)
    intercept[IllegalArgumentException] {
      ChunkCodec.snappyDecompress(Array[Byte](-128), 0, 1, out, 0, 100)
    }
    // snappy: copy before block start
    intercept[IllegalArgumentException] {
      ChunkCodec.snappyDecompress(Array[Byte](8, 0, 'a', (((4 - 4) << 2) | 1).toByte, 9), 0, 5, out, 0, 8)
    }
    // snappy: literal overruns input
    intercept[IllegalArgumentException] {
      ChunkCodec.snappyDecompress(Array[Byte](8, ((8 - 1) << 2).toByte, 'a'), 0, 3, out, 0, 8)
    }
    // snappy: hostile 4-byte literal length near Int.MaxValue — ip+nlit
    // wraps negative in Int; must fail the require, not escape to
    // ArrayIndexOutOfBoundsException inside System.arraycopy
    intercept[IllegalArgumentException] {
      ChunkCodec.snappyDecompress(Array[Byte](8, 0xFC.toByte,
        0xF0.toByte, 0xFF.toByte, 0xFF.toByte, 0x7F.toByte), 0, 6, out, 0, 8)
    }
  }

  test("gzip codec decodes RFC-1952 frames (zarr-python v3 gzip)") {
    val raw = ChunkCodec.encodeDoubles(Array.tabulate(500)(i => (i % 13).toDouble), "<f8")
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(raw); gz.close()
    val back = ChunkCodec.decompress(bos.toByteArray, Some("gzip"), raw.length)
    assert(back.toSeq == raw.toSeq)
    // and a raw-zlib frame under the gzip label must fail loudly, not decode garbage
    intercept[Exception] {
      ChunkCodec.decompress(ChunkCodec.compress(raw, Some("zlib")), Some("gzip"), raw.length)
    }
  }
}
