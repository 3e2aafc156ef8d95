package graft.zarr

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** Decode-side half of the random two-codebase codec differential: the
  * committed src/test/resources/codec_fuzz/ streams were encoded by the
  * INDEPENDENT python blosclz/snappy implementations
  * (tools/make_codec_fuzz_fixture.py over mixed-entropy payloads) and the
  * Scala decoders must invert them byte-exact. The encode-side half —
  * python decoding random streams these Scala encoders wrote — is
  * tools/check_codec_fuzz.py over graft.tools.CodecFuzzDump output.
  * (LzFuzzSpec covers self-roundtrip and corruption; this spec removes the
  * residual blind spot of two implementations sharing one bug.) */
class CodecFuzzDifferentialSpec extends AnyFunSuite {

  private val root = Paths.get("src/test/resources/codec_fuzz")

  private def cases: Seq[String] = {
    val ps = Files.list(root).toArray.map(_.toString)
      .filter(_.matches(".*payload_\\d+\\.bin")).sorted.toSeq
    assert(ps.nonEmpty, s"no committed fuzz payloads under $root")
    ps.map(_.replaceAll(".*payload_(\\d+)\\.bin", "$1"))
  }

  test("python-encoded blosclz streams decode byte-exact across all payload regimes") {
    for (i <- cases) {
      val want = Files.readAllBytes(root.resolve(s"payload_$i.bin"))
      val enc = Files.readAllBytes(root.resolve(s"pylz_$i.bin"))
      val got = new Array[Byte](want.length)
      ChunkCodec.blosclzDecompress(enc, 0, enc.length, got, 0, want.length)
      assert(java.util.Arrays.equals(got, want), s"blosclz case $i (${want.length} bytes)")
    }
  }

  test("python-encoded snappy streams decode byte-exact across all payload regimes") {
    for (i <- cases) {
      val want = Files.readAllBytes(root.resolve(s"payload_$i.bin"))
      val enc = Files.readAllBytes(root.resolve(s"pysn_$i.bin"))
      val got = new Array[Byte](want.length)
      ChunkCodec.snappyDecompress(enc, 0, enc.length, got, 0, want.length)
      assert(java.util.Arrays.equals(got, want), s"snappy case $i (${want.length} bytes)")
    }
  }

  test("python-encoded BITSHUFFLE blosc frames decode byte-exact (flag 0x4, mixed typesizes)") {
    for (i <- cases) {
      val want = Files.readAllBytes(root.resolve(s"payload_$i.bin"))
      val enc = Files.readAllBytes(root.resolve(s"pybit_$i.bin"))
      val got = ChunkCodec.decompress(enc, Some("blosc"), want.length)
      assert(java.util.Arrays.equals(got, want), s"bitshuffle case $i (${want.length} bytes)")
    }
  }
}
