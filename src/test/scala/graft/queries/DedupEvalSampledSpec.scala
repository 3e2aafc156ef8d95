package graft.queries

import graft.SparkSpec

/** Pins the `dedup_eval_sampled` variance documentation: the output row's
  * `precision_se_ppm`/`recall_se_ppm` columns must equal the closed-form
  * binomial standard error floor(1e6 * sqrt(p(1-p)/n)) computed from the
  * SAME row's counts, and the bound must exhibit the promised O(1/n)
  * variance shrink (se ~ 1/sqrt(n)). */
class DedupEvalSampledSpec extends SparkSpec {

  test("se columns equal the closed form from the row's own counts") {
    val row = Pipeline.qDedupEvalSampled(spark, sf).collect().head
    val nCand = row.getAs[Long]("n_cand").toDouble
    val nTrue = row.getAs[Long]("n_true").toDouble
    val nHit = row.getAs[Long]("n_hit").toDouble
    assert(nCand > 0 && nTrue > 0, "sampled scope must be non-degenerate at sf0.001")
    def se(n: Double): Long = {
      val p = nHit / math.max(n, 1.0)
      math.floor(1e6 * math.sqrt(p * (1 - p) / math.max(n, 1.0))).toLong
    }
    assert(row.getAs[Long]("precision_se_ppm") == se(nCand))
    assert(row.getAs[Long]("recall_se_ppm") == se(nTrue))
    // the band is meaningful: se > 0 unless the ratio is degenerate
    val pPpm = row.getAs[Long]("precision_ppm")
    if (pPpm != 0L && pPpm != 1000000L)
      assert(row.getAs[Long]("precision_se_ppm") > 0L)
  }

  test("the bound shrinks as 1/sqrt(n): 4x the pairs halves the se") {
    // closed form at fixed p: se(n) = 1e6*sqrt(p(1-p)/n) — the property
    // the docstring sells. Pin it numerically at the ppm resolution the
    // query ships (floor introduces at most 1 ppm of slack).
    val p = 0.37
    def se(n: Double): Double = 1e6 * math.sqrt(p * (1 - p) / n)
    for (n <- Seq(100.0, 1600.0, 25600.0)) {
      val ratio = se(n) / se(4 * n)
      assert(math.abs(ratio - 2.0) < 1e-9, s"n=$n ratio=$ratio")
    }
  }
}
