package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Randomized differential tests for the experiment-analysis cores:
  * fixed-seed random datasets (heavy ties, skew, tiny/degenerate sizes)
  * driven through the SAME DataFrame logic the queries use, compared
  * against brute-force Scala recomputations. The corpus-bound
  * StatsTestsSpec certifies the wiring; this spec certifies the algebra
  * across input shapes the corpus never exercises. */
class StatsDifferentialSpec extends SparkSpec {
  import spark.implicits._

  private val rng = new scala.util.Random(0xC0FFEE)

  private def bruteMedian(xs: Seq[Double]): Double = {
    val s = xs.sorted
    (s((s.length - 1) / 2) + s(s.length / 2)) / 2.0
  }

  test("medianMad: 20 random tied/skewed datasets match the sort-based answer") {
    for (round <- 1 to 20) {
      val n = 1 + rng.nextInt(400)
      val domain = 1 + rng.nextInt(12) // small domain → heavy ties
      val xs = Seq.fill(n)((rng.nextInt(domain) - domain / 2).toLong)
      val df = xs.toDF("x")
      val r = Relational7.medianMad(df, col("x")).head()
      val m = bruteMedian(xs.map(_.toDouble))
      val mad = bruteMedian(xs.map(v => math.abs(v - m)))
      assert(r.getLong(0) == n, s"round $round n")
      assert(r.getDouble(1) == m, s"round $round median ${r.getDouble(1)} vs $m (xs=$xs)")
      assert(r.getDouble(2) == mad, s"round $round mad ${r.getDouble(2)} vs $mad")
    }
  }

  test("mannWhitneyU: 20 random two-sample datasets match brute-force midranks") {
    for (round <- 1 to 20) {
      val n = 2 + rng.nextInt(300)
      val domain = 1 + rng.nextInt(10)
      val rows = Seq.fill(n)((rng.nextInt(domain).toLong, rng.nextBoolean())) match {
        // both arms must be non-empty for the z denominator
        case s if !s.exists(_._2)  => (s.head._1, true) +: s.tail
        case s if s.forall(_._2)   => (s.head._1, false) +: s.tail
        case s => s
      }
      val df = rows.toDF("v", "a")
      val r = Relational7.mannWhitneyU(df, col("v"), col("a")).head()
      val pooled = rows.map(_._1.toDouble).sorted
      val midrank = pooled.zipWithIndex.groupBy(_._1)
        .map { case (v, g) => v -> (g.map(_._2 + 1).sum.toDouble / g.length) }
      val aVals = rows.filter(_._2).map(_._1.toDouble)
      val n1 = aVals.length
      val u = aVals.map(midrank).sum - n1.toLong * (n1 + 1) / 2.0
      assert(r.getLong(0) == n1 && r.getLong(1) == n - n1, s"round $round arms")
      assert(math.abs(r.getDouble(2) - u) < 1e-9, s"round $round U ${r.getDouble(2)} vs $u")
      // z is NULL exactly when every pooled value ties (sigma = 0)
      val allTied = rows.map(_._1).distinct.length == 1
      assert(r.isNullAt(3) == allTied, s"round $round z null=${r.isNullAt(3)} tied=$allTied")
      if (!allTied) assert(!r.getDouble(3).isNaN, s"round $round z NaN")
    }
  }

  test("welchTtest: 10 random cent-grid datasets match a two-pass recomputation") {
    for (round <- 1 to 10) {
      val n = 4 + rng.nextInt(200)
      // cent-grid values, both arms guaranteed >= 2 members
      val rows = (0 until n).map { i =>
        (math.floor(rng.nextDouble() * 10000) / 100.0, i % 2 == 0)
      }
      val df = rows.toDF("x", "a")
      val r = Relational7.welchTtest(df, col("x"), col("a")).head()
      def mv(xs: Seq[Double]): (Double, Double) = {
        val m = xs.sum / xs.length
        (m, xs.map(v => (v - m) * (v - m)).sum / (xs.length - 1))
      }
      val (ma, va) = mv(rows.filter(_._2).map(_._1))
      val (mb, vb) = mv(rows.filterNot(_._2).map(_._1))
      val na = rows.count(_._2); val nb = n - na
      val t = (ma - mb) / math.sqrt(va / na + vb / nb)
      assert(r.getLong(0) == na && r.getLong(1) == nb, s"round $round arms")
      assert(math.abs(r.getDouble(2) - ma) < 1e-9 && math.abs(r.getDouble(3) - mb) < 1e-9,
        s"round $round means")
      assert(math.abs(r.getDouble(4) - t) < 1e-6, s"round $round t ${r.getDouble(4)} vs $t") // t is 1e-6-quantized
    }
  }

  test("giniBinned: random cent-grid datasets match brute force; uniform → 0, point mass → max") {
    for (round <- 1 to 10) {
      val n = 2 + rng.nextInt(300)
      val xs = Seq.fill(n)(math.floor(rng.nextDouble() * 100000) / 100.0 + 0.01)
      val df = xs.toDF("x")
      val width = 1 + rng.nextInt(500)
      val r = Relational7.giniBinned(df, col("x"), width).head()
      val bins = xs.groupBy(v => math.floor(v / width).toLong).toSeq.sortBy(_._1)
      var below = 0L; var t2 = BigDecimal(0)
      bins.foreach { case (_, g) =>
        t2 += BigDecimal(2L * below + g.length + 1) * g.map(BigDecimal(_)).sum
        below += g.length
      }
      val gini = (t2 / (BigDecimal(n) * xs.map(BigDecimal(_)).sum)).toDouble - (n + 1.0) / n
      assert(r.getLong(0) == n, s"round $round n")
      assert(math.abs(r.getDouble(1) - gini) < 1e-9,
        s"round $round gini ${r.getDouble(1)} vs $gini")
    }
    // all mass equal within one bin → gini 0
    val eq = Seq.fill(64)(100.0).toDF("x")
    assert(math.abs(Relational7.giniBinned(eq, col("x"), 500).head().getDouble(1)) < 1e-12)
    // one row owns (almost) everything, bins far apart → gini → (n-1)/n
    val point = (Seq.fill(63)(0.01) :+ 1e6).toDF("x")
    val g = Relational7.giniBinned(point, col("x"), 500).head().getDouble(1)
    assert(g > 0.95 && g <= 1.0, s"point-mass gini $g")
  }
}
