package graft.queries

import graft.SparkSpec

/** Semantic sanity for the round-7 curation additions (the DuckDB oracle
  * certifies cross-engine exactness; these pin the STATISTICS make
  * sense on the real corpus). */
class Pipeline3Spec extends SparkSpec {
  import spark.implicits._

  test("text_repetition: ppm signals are well-formed and bounded") {
    val rows = Pipeline3.qTextRepetition(spark, sf)
      .as[(String, Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (lang, n, dupTok, dup2, top2, flagged) =>
      assert(n > 0, lang)
      for (v <- Seq(dupTok, dup2, top2))
        assert(v >= 0 && v <= 1000000, s"$lang: ppm $v out of [0, 1e6]")
      assert(top2 <= math.max(dup2, top2), lang) // top gram mass within bounds
      assert(flagged >= 0 && flagged <= n, lang)
    }
  }

  test("pipeline_quality_irls: trained model separates the labeled class") {
    val rows = Pipeline3.qPipelineQualityIrls(spark, sf)
      .as[(String, Long, Double, Double, Double, Double)].collect()
    assert(rows.nonEmpty)
    val byLang = rows.map(r => r._1 -> r._3).toMap
    rows.foreach { case (lang, n, mq, b0, b1, b2) =>
      assert(n > 0, lang)
      assert(mq >= 0.0 && mq <= 1.0, s"$lang: mean quality $mq outside [0,1]")
      for (b <- Seq(b0, b1, b2))
        assert(!b.isNaN && !b.isInfinite, s"$lang: coefficient $b not finite")
    }
    // y = (lang == 'en') and x1 = English-stopword ratio: the trained
    // model must score English docs above every other language's mean
    if (byLang.contains("en"))
      byLang.filter(_._1 != "en").foreach { case (l, mq) =>
        assert(byLang("en") > mq, s"en ${byLang("en")} must beat $l $mq")
      }
    // the trained coefficient vector is a broadcast scalar: identical on
    // every output row (no sign assertion — on the synthetic corpus the
    // feature-label correlations are an artifact of the generator; the
    // separation check above is the semantic one)
    for (c <- Seq(rows.map(_._4), rows.map(_._5), rows.map(_._6)))
      assert(c.distinct.length == 1, "coefficients must be row-constant")
  }
}
