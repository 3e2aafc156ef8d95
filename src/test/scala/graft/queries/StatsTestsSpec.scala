package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the experiment-analysis additions (Relational7) against
  * straight-line Scala recomputations on the collected sf0.001 data —
  * the same numbers, derived without Spark aggregates, so an expression
  * rewrite that drifts the statistics fails here before the oracle. */
class StatsTestsSpec extends SparkSpec {
  import spark.implicits._

  private def arm(flag: String): Array[Double] =
    graft.Tables.lineitem(spark, sf)
      .filter(col("l_returnflag") === flag)
      .select(col("l_extendedprice").cast("double"))
      .as[Double].collect()

  test("agg_ttest: Welch t and dof match a direct two-pass recomputation") {
    val r = Relational7.qAggTtest(spark, sf).head()
    val (a, b) = (arm("R"), arm("A"))
    assert(r.getLong(0) == a.length && r.getLong(1) == b.length)
    def meanVar(x: Array[Double]): (Double, Double) = {
      val m = x.sum / x.length
      (m, x.map(v => (v - m) * (v - m)).sum / (x.length - 1))
    }
    val (ma, va) = meanVar(a); val (mb, vb) = meanVar(b)
    val se2 = va / a.length + vb / b.length
    val t = (ma - mb) / math.sqrt(se2)
    val dof = se2 * se2 / (math.pow(va / a.length, 2) / (a.length - 1) +
                           math.pow(vb / b.length, 2) / (b.length - 1))
    assert(math.abs(r.getDouble(2) - ma) < 1e-6, "mean_a")
    assert(math.abs(r.getDouble(3) - mb) < 1e-6, "mean_b")
    assert(math.abs(r.getDouble(4) - t) < 1e-6, s"t_stat ${r.getDouble(4)} vs $t")
    assert(math.abs(r.getDouble(5) - dof) < 1e-3, s"dof ${r.getDouble(5)} vs $dof")
  }

  test("agg_mannwhitney: U matches a brute-force midrank computation") {
    val r = Relational7.qAggMannWhitney(spark, sf).head()
    val li = graft.Tables.lineitem(spark, sf)
      .select(col("l_linestatus"), col("l_quantity").cast("double"))
      .as[(String, Double)].collect()
    val pooled = li.map(_._2).sorted
    // midrank of value v: average 1-based rank over its tied block
    val midrank: Map[Double, Double] = pooled.zipWithIndex.groupBy(_._1)
      .map { case (v, g) => v -> (g.map(_._2 + 1).sum.toDouble / g.length) }
    val aVals = li.filter(_._1 == "O").map(_._2)
    val n1 = aVals.length.toLong
    val n2 = li.length - n1
    val rA = aVals.map(midrank).sum
    val u = rA - n1 * (n1 + 1) / 2.0
    assert(r.getLong(0) == n1 && r.getLong(1) == n2)
    assert(math.abs(r.getDouble(2) - u) < 1e-6, s"u_stat ${r.getDouble(2)} vs $u")
    assert(r.getDouble(2) >= 0 && r.getDouble(2) <= n1.toDouble * n2, "U in [0, n1*n2]")
    assert(!r.getDouble(3).isNaN)
  }

  test("window_ewma: one key's smoothed head matches the literal 8-tap chain") {
    val daily = graft.Tables.lineitem(spark, sf)
      .groupBy(col("l_suppkey").as("k"),
               expr("datediff(l_shipdate, date'1992-01-01')").as("day"))
      .agg(graft.queries.dsum(col("l_quantity")).as("v"))
      .filter(col("k") === 1).orderBy(col("day"))
      .as[(Long, Int, Double)].collect()
    assume(daily.length >= 3, "supplier 1 needs a few observed days")
    val vs = daily.map(_._3)
    // adjusted EWMA at the last position, truncated to 8 taps
    val taps = (0 until math.min(8, vs.length)).map(j => (vs(vs.length - 1 - j), math.pow(0.5, j)))
    val expected = taps.map { case (v, w) => v * w }.sum / taps.map(_._2).sum
    val got = Relational7.qWindowEwma(spark, sf)
    // bucket sums are certified by the oracle; here certify the per-row
    // smoothing math via a manual rebuild of the same expression
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("k")).orderBy(col("day"))
    val sm = graft.Tables.lineitem(spark, sf)
      .groupBy(col("l_suppkey").as("k"),
               expr("datediff(l_shipdate, date'1992-01-01')").as("day"))
      .agg(graft.queries.dsum(col("l_quantity")).as("v"))
    val taps2 = (0 until 8).map { j =>
      val c = if (j == 0) col("v") else lag(col("v"), j).over(w)
      (c, math.pow(0.5, j))
    }
    val num = taps2.map { case (c, wt) => when(c.isNotNull, c * wt).otherwise(lit(0.0)) }.reduceLeft(_ + _)
    val den = taps2.map { case (c, wt) => when(c.isNotNull, lit(wt)).otherwise(lit(0.0)) }.reduceLeft(_ + _)
    val last = sm.withColumn("ewma", num / den).filter(col("k") === 1)
      .orderBy(col("day").desc).select("ewma").as[Double].head()
    assert(math.abs(last - expected) < 1e-9, s"ewma $last vs $expected")
    assert(got.columns.toSeq == Seq("bucket", "n_days", "sum_ewma"))
  }

  test("agg_median_mad: matches a sort-based median/MAD on collected values") {
    val r = Relational7.qAggMedianMad(spark, sf).head()
    val vs = graft.Tables.lineitem(spark, sf)
      .select(col("l_quantity").cast("long")).as[Long].collect().sorted
    def med(xs: Array[Double]): Double = {
      val s = xs.sorted
      (s((s.length - 1) / 2) + s(s.length / 2)) / 2.0
    }
    val m = med(vs.map(_.toDouble))
    val mad = med(vs.map(v => math.abs(v - m)))
    assert(r.getLong(0) == vs.length)
    assert(r.getDouble(1) == m, s"median ${r.getDouble(1)} vs $m")
    assert(r.getDouble(2) == mad, s"mad ${r.getDouble(2)} vs $mad")
  }

  test("agg_gini: matches the grouped-data estimator recomputed in Scala, and sits in [0,1)") {
    val r = Relational7.qAggGini(spark, sf).head()
    val xs = graft.Tables.orders(spark, sf)
      .select(col("o_totalprice").cast("double")).as[Double].collect()
    val bins = xs.groupBy(v => math.floor(v / 500).toLong).toSeq.sortBy(_._1)
    val n = xs.length.toDouble
    var below = 0L; var t2 = 0.0
    bins.foreach { case (_, g) =>
      val mr2 = 2L * below + g.length + 1
      t2 += mr2 * g.sum
      below += g.length
    }
    val gini = t2 / (n * xs.sum) - (n + 1) / n
    assert(r.getLong(0) == xs.length)
    assert(math.abs(r.getDouble(1) - gini) < 1e-9, s"gini ${r.getDouble(1)} vs $gini")
    assert(r.getDouble(1) >= 0.0 && r.getDouble(1) < 1.0)
  }

  test("pipeline_k_anonymity: invariants — suppression counts consistent, k_min positive") {
    val r = Relational7.qPipelineKAnonymity(spark, sf).head()
    val (nClasses, nRows, kMin, nSupp, nSmall) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    val total = graft.Tables.customer(spark, sf).count()
    assert(nRows == total, "classes must partition the table")
    assert(kMin >= 1 && nClasses <= nRows)
    assert(nSupp >= nSmall, "each small class has >= 1 row")
    assert(nSupp <= 5L * nSmall, "suppressed rows bounded by k x small classes")
    assert(r.getDouble(5) == nSupp.toDouble / nRows.toDouble)
  }

  test("agg_benford: digit histogram matches a Scala recount, mass preserved") {
    val rows = Relational7.qAggBenford(spark, sf)
      .as[(Int, Long, Double, Double)].collect()
    val expect = graft.Tables.orders(spark, sf)
      .select(col("o_totalprice").cast("double")).as[Double].collect()
      .map(v => math.floor(v * 100 + 0.5).toLong.toString.head.asDigit)
      .groupBy(identity).map { case (k, g) => k -> g.length.toLong }
    assert(rows.map(_._1).toSet.subsetOf((1 to 9).toSet))
    rows.foreach { case (digit, n, e, chi) =>
      assert(n == expect(digit), s"digit $digit: $n vs ${expect(digit)}")
      assert(e > 0 && chi >= 0)
    }
    assert(rows.map(_._2).sum == expect.values.sum)
    // expected mass sums back to N (the probabilities cover 1..9 exactly)
    val nTotal = rows.map(_._2).sum.toDouble
    assert(math.abs(rows.map(_._3).sum - nTotal) < 1e-3 * nTotal)
  }

  test("mdio_dip: tensor invariants — coherence in [0,1], dip finite, deterministic") {
    val rows = Relational7.qMdioDip(spark, sf)
      .as[(Int, Long, Double, Double)].collect()
    assert(rows.nonEmpty && rows.length <= 7)
    rows.foreach { case (x, n, dip, coh) =>
      assert(n > 0)
      assert(!dip.isNaN && !dip.isInfinite, s"x=$x dip=$dip")
      // Cauchy–Schwarz on the exact sums; quantization can nudge the
      // ratio by ~1e-4/gii at most
      assert(coh >= 0 && coh <= 1.0 + 1e-6, s"x=$x coherence=$coh")
    }
    val again = Relational7.qMdioDip(spark, sf).as[(Int, Long, Double, Double)].collect()
    assert(rows.toSeq == again.toSeq)
  }

  test("graph_item_cf: cosines recompute from raw co-occurrence counts") {
    val top = Relational7.qGraphItemCf(spark, sf)
      .as[(Long, Long, Long, Double)].collect()
    assert(top.length <= 10)
    assert(top.map(_._4).toSeq == top.map(_._4).sortBy(-_).toSeq, "sorted desc")
    val e = graft.Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .as[(Long, Long)].collect()
    val byPart = e.groupBy(_._2).map { case (p, g) => p -> g.map(_._1).toSet }
    top.foreach { case (pi, pj, cij, cosine) =>
      val (si, sj) = (byPart(pi), byPart(pj))
      val inter = (si intersect sj).size
      assert(inter == cij, s"($pi,$pj): c_ij $cij vs $inter")
      assert(cij >= 3)
      val expected = cij.toDouble / math.sqrt(si.size.toDouble * sj.size.toDouble)
      assert(math.abs(cosine - expected) < 1e-12, s"($pi,$pj): $cosine vs $expected")
    }
  }

  test("pipeline_experiment: arms partition the metric'd customers; both readouts coherent") {
    val r = Relational7.qPipelineExperiment(spark, sf).head()
    val (nA, nB) = (r.getLong(0), r.getLong(1))
    val withOrders = graft.Tables.orders(spark, sf)
      .select(col("o_custkey")).distinct().count()
    assert(nA + nB == withOrders, "every customer with orders lands in exactly one arm")
    // hash assignment should split roughly evenly (binomial 5-sigma)
    val dev = math.abs(nA - nB) / math.sqrt(nA + nB.toDouble)
    assert(dev < 5.0, s"arm imbalance $nA vs $nB ($dev sigma)")
    val (ma, mb, t) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
    assert(math.signum(t) == math.signum(ma - mb) || t == 0.0, "t sign follows mean gap")
    assert(r.getDouble(5) > 0, "dof positive")
    val u = r.getDouble(6)
    assert(u >= 0 && u <= nA.toDouble * nB, "U in range")
    assert(!r.isNullAt(7) && !r.getDouble(7).isNaN, "z defined on non-degenerate metric")
  }

  test("agg_autocorr: lag-1 ACF matches a straight-line recompute; all lags bounded") {
    val r = Relational7.qAggAutocorr(spark, sf).head()
    val daily = graft.Tables.lineitem(spark, sf)
      .groupBy(expr("datediff(l_shipdate, date'1992-01-01')").as("day"))
      .agg(graft.queries.dsum(col("l_extendedprice")).as("v"))
      .orderBy(col("day")).as[(Int, Double)].collect().map(_._2)
    assert(r.getLong(0) == daily.length)
    val mean = daily.sum / daily.length
    val dv = daily.map(_ - mean)
    def q(x: Double) = math.floor(x * 100 + 0.5) / 100 // the query's 1e2 grid
    val den = dv.map(x => q(x * x)).sum
    val num1 = dv.drop(1).zip(dv.dropRight(1)).map { case (a, b) => q(a * b) }.sum
    assert(math.abs(r.getDouble(1) - num1 / den) < 1e-9,
      s"acf_1 ${r.getDouble(1)} vs ${num1 / den}")
    for (k <- 1 to 7)
      assert(math.abs(r.getDouble(k)) <= 1.0 + 1e-9, s"acf_$k out of [-1,1]")
    // Ljung–Box Q: non-negative, and recomputable from the emitted ACFs
    val n = r.getLong(0).toDouble
    val lbWant = (1 to 7).map(k => r.getDouble(k) * r.getDouble(k) / (n - k)).sum * n * (n + 2)
    assert(math.abs(r.getDouble(8) - lbWant) < 1e-5, s"ljung_box ${r.getDouble(8)} vs $lbWant")
    assert(r.getDouble(8) >= 0)
  }

  test("pipeline_l_diversity: class algebra consistent with the k-anonymity audit") {
    val r = Relational7.qPipelineLDiversity(spark, sf).head()
    val (nClasses, nRows, lMin, nExposed, nLow) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    assert(nRows == graft.Tables.customer(spark, sf).count(), "classes partition the table")
    assert(lMin >= 1 && nClasses <= nRows)
    assert(nExposed >= nLow, "each low-l class has >= 1 row")
    assert(r.getDouble(5) == nExposed.toDouble / nRows.toDouble)
    // l is bounded by the sensitive-attribute cardinality
    val nSegments = graft.Tables.customer(spark, sf)
      .select(col("c_mktsegment")).distinct().count()
    assert(lMin <= nSegments)
  }

  test("graph_assortativity: coefficient bounded, edge count matches a recount") {
    val r = Relational7.qGraphAssortativity(spark, sf).head()
    val e = graft.Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .as[(Long, Long)].collect()
    val edges = e.groupBy(_._1).values.flatMap { g =>
      val ps = g.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- i + 1 until ps.length) yield (ps(i), ps(j))
    }.toSet
    assert(r.getLong(0) == edges.size, s"edges ${r.getLong(0)} vs ${edges.size}")
    assert(r.getDouble(1) >= -1.0 - 1e-9 && r.getDouble(1) <= 1.0 + 1e-9,
      s"assortativity ${r.getDouble(1)} out of [-1,1]")
  }

  test("events_seasonality: indices are n-weighted-normalized (Σ n·idx = N)") {
    val rows = Relational7.qEventsSeasonality(spark, sf)
      .as[(Long, Long, Long, Double)].collect()
    assert(rows.nonEmpty && rows.length <= 168)
    rows.foreach { case (dow, hod, n, idx) =>
      assert(dow >= 0 && dow < 7 && hod >= 0 && hod < 24)
      assert(n > 0)
    }
    val total = rows.map(_._3).sum.toDouble
    val weighted = rows.map { case (_, _, n, idx) => n * idx }.sum
    assert(math.abs(weighted - total) < 1e-6 * total,
      s"sum n*idx $weighted vs N $total — multiplicative indices must preserve mass")
  }
}
