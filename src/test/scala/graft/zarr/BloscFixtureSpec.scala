package graft.zarr

import graft.SparkSpec

/** Reverse interop: the committed fixture at
  * src/test/resources/blosc_fixture/toy.mdio was written by an INDEPENDENT
  * python blosc implementation (tools/make_blosc_fixture.py + blosc_py.py:
  * zlib backend, byte-shuffle on, numpy shuffle) — the connector must read
  * it back exactly. The graft-writes/python-reads direction is covered by
  * tools/check_zarr_interop.py over graft.tools.MdioDemo output. Together
  * they play the reference's zarr-python acceptance-fixture role
  * (mdio/acceptance_test.cc:1350-1449). */
class BloscFixtureSpec extends SparkSpec {
  import spark.implicits._

  private val fixture = "src/test/resources/blosc_fixture/toy.mdio"

  test("python-blosc-written fixture reads back exactly (blosc+shuffle, zlib backend)") {
    val (_, arrays) = ZarrMeta.readGroup(ZarrMeta.path(fixture))
    assert(arrays("image")._1.compressor.contains("blosc"))
    assert(arrays("image")._1.blosc.contains(ChunkCodec.Blosc("zlib", 5, 1)))

    val df = spark.read.format("mdio").option("variables", "image,counts")
      .load(fixture)
      .select("inline", "crossline", "image", "counts")
      .as[(Long, Long, Float, Int)].collect().toSet
    val want = (for { i <- 0L until 6L; x <- 0L until 5L }
      yield (i, x, (i * 1000 + x).toFloat / 8.0f, (i * 7 + x * 3).toInt)).toSet
    assert(df == want)
  }

  test("python-written BITSHUFFLE (shuffle=2) array reads back exactly") {
    val (_, arrays) = ZarrMeta.readGroup(ZarrMeta.path(fixture))
    assert(arrays("phase")._1.blosc.contains(ChunkCodec.Blosc("zlib", 5, 2)))
    val df = spark.read.format("mdio").option("variables", "phase")
      .load(fixture)
      .select("trace", "sample", "phase")
      .as[(Long, Long, Float)].collect().toSet
    val want = (for { t <- 0L until 32L; s <- 0L until 64L }
      yield (t, s, ((t * 64 + s) % 360).toFloat / 16.0f)).toSet
    assert(df == want)
  }

  test("python-written blosclz and snappy cnames read back exactly") {
    val (_, arrays) = ZarrMeta.readGroup(ZarrMeta.path(fixture))
    assert(arrays("ampl")._1.blosc.contains(ChunkCodec.Blosc("blosclz", 5, 1)))
    assert(arrays("qc")._1.blosc.contains(ChunkCodec.Blosc("snappy", 5, 1)))

    val df = spark.read.format("mdio").option("variables", "ampl,qc")
      .load(fixture)
      .select("trace", "sample", "ampl", "qc")
      .as[(Long, Long, Float, Long)].collect().toSet
    val want = (for { t <- 0L until 32L; s <- 0L until 64L }
      yield (t, s, ((t * 64 + s) % 1000).toFloat / 4.0f, t * 31 + s * 7)).toSet
    assert(df == want)
  }
}
