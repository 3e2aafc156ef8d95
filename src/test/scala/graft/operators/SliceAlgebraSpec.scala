package graft.operators

import graft.SparkSpec

/** Property-style tests for the slice algebra (SURVEY §5 test plan:
  * "slice(a).slice(b) == slice(a∩b), clamp idempotence — cheap wins the
  * reference lacks"). Domain-bookkeeping only (no Spark job per case);
  * value-level equivalence is covered by MdioDatasetSpec on real data.
  * Deterministic seeded sampling (the scalatest/scalacheck bridge is not
  * in the offline artifact cache). */
class SliceAlgebraSpec extends SparkSpec {
  import spark.implicits._

  private lazy val grid: MdioDataset = {
    val data = Seq.tabulate(64)(i => (i.toLong % 8, i.toLong / 8, i * 1.0)).toDF("x", "y", "v")
    MdioDataset(data, Seq("x", "y"), Map("x" -> (0L, 8L), "y" -> (0L, 8L)))
  }

  private val rnd = new scala.util.Random(7)
  private def range(): (Long, Long) = {
    val a = rnd.between(-4L, 13L)
    (a, a + rnd.between(0L, 17L))
  }

  test("slice composition equals clamped intersection (500 samples)") {
    for (_ <- 1 to 500) {
      val r1 = range(); val r2 = range()
      val composed = grid.isel("x", r1._1, r1._2).isel("x", r2._1, r2._2)
      val lo = Seq(0L, r1._1, r2._1).max
      val hi = Seq(8L, r1._2, r2._2).min
      val wantWidth = math.max(0L, hi - lo)
      val (gotLo, gotHi) = composed.intervals("x")
      assert(gotLo >= 0L && gotHi <= 8L, s"r1=$r1 r2=$r2 out of domain: ($gotLo,$gotHi)")
      assert(gotHi - gotLo == wantWidth,
        s"r1=$r1 r2=$r2 got=($gotLo,$gotHi) want width $wantWidth")
    }
  }

  test("clamp is idempotent: re-slicing by the full domain changes nothing") {
    for (_ <- 1 to 200) {
      val r = range()
      val once = grid.isel("x", r._1, r._2)
      val again = once.isel("x", -1000L, 1000L)
      assert(again.intervals("x") == once.intervals("x"), s"r=$r")
    }
  }

  test("unknown-label no-op holds for any range") {
    for (_ <- 1 to 100) {
      val r = range()
      assert(grid.isel("zz", r._1, r._2).intervals == grid.intervals, s"r=$r")
    }
  }

  test("multi-range isel domain is the clamped hull of its sub-ranges") {
    for (_ <- 1 to 200) {
      val r1 = range(); val r2 = range()
      val g = grid.isel(Seq(("x", r1._1, r1._2), ("x", r2._1, r2._2)))
      val lo = math.max(0L, math.min(r1._1, r2._1))
      val hi = math.min(8L, math.max(r1._2, r2._2))
      val (gotLo, gotHi) = g.intervals("x")
      assert(gotLo == math.min(math.max(lo, 0L), 8L) && gotHi == math.max(gotLo, hi),
        s"r1=$r1 r2=$r2 got=($gotLo,$gotHi)")
    }
  }
}
