package graft.tools

import graft.zarr.ChunkCodec
import java.nio.file.{Files, Paths}

/** Dump Scala-encoded blosclz/snappy streams of the committed codec-fuzz
  * payloads for the python differential (tools/check_codec_fuzz.py):
  * `sbt "runMain graft.tools.CodecFuzzDump /tmp/codec_fuzz"` writes
  * payload_i.bin (copied from src/test/resources/codec_fuzz/) next to
  * lz_i.bin / sn_i.bin encoded by zarr/ChunkCodec.scala. The python
  * decoders must invert them byte-exact — the encode-side half of the
  * two-codebase differential (CodecFuzzDifferentialSpec is the decode
  * half). */
object CodecFuzzDump {
  def main(args: Array[String]): Unit = {
    val out = Paths.get(if (args.nonEmpty) args(0) else "/tmp/codec_fuzz")
    Files.createDirectories(out)
    val src = Paths.get("src/test/resources/codec_fuzz")
    require(Files.isDirectory(src), s"fixture dir $src missing — run tools/make_codec_fuzz_fixture.py")
    val payloads = Files.list(src).toArray.map(_.toString)
      .filter(_.matches(".*payload_\\d+\\.bin")).sorted
    require(payloads.nonEmpty, s"no payload_*.bin under $src")
    val typesizes = Array(1, 2, 4, 8, 3, 16) // mirror make_codec_fuzz_fixture.py
    payloads.foreach { p =>
      val i = p.replaceAll(".*payload_(\\d+)\\.bin", "$1")
      val bytes = Files.readAllBytes(Paths.get(p))
      Files.write(out.resolve(s"payload_$i.bin"), bytes)
      Files.write(out.resolve(s"lz_$i.bin"), ChunkCodec.blosclzCompress(bytes))
      Files.write(out.resolve(s"sn_$i.bin"), ChunkCodec.snappyCompress(bytes))
      val ts = typesizes(i.toInt % typesizes.length)
      Files.write(out.resolve(s"bit_$i.bin"), ChunkCodec.compress(bytes, Some("blosc"), ts,
        Some(ChunkCodec.Blosc(cname = "zlib", clevel = 5, shuffle = 2))))
      println(s"case $i: ${bytes.length} bytes (bitshuffle ts=$ts)")
    }
    println(s"dumped to $out")
  }
}
