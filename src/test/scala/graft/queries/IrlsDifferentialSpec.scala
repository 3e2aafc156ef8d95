package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Guards `pipeline_quality_irls` against a silently-degenerate solve: a
  * broken IRLS (singular normal equations, det accidentally cancelling,
  * gradient sums wired to zero) would still produce SOME row — these pins
  * require the trained coefficients to be finite, directionally sane, and
  * RESPONSIVE: perturbing a single training label must move them. */
class IrlsDifferentialSpec extends SparkSpec {

  private def betas(dir: String): (Double, Double, Double) = {
    val r = Pipeline3.qPipelineQualityIrls(spark, dir).limit(1).collect().head
    (r.getAs[Double]("beta0"), r.getAs[Double]("beta1"), r.getAs[Double]("beta2"))
  }

  test("coefficients are finite and non-trivial on the corpus") {
    // direction is NOT pinned here: at sf0.001 the synthetic corpus's
    // stopword ratio happens to anti-correlate with lang='en'
    // (corr ≈ −0.09), so a faithful fit gives beta1 < 0; direction is
    // pinned below on a constructed corpus where the truth is known
    val (b0, b1, b2) = betas(sf)
    for ((b, n) <- Seq((b0, "beta0"), (b1, "beta1"), (b2, "beta2")))
      assert(!b.isNaN && !b.isInfinite, s"$n degenerate: $b")
    assert(b1 != 0.0 && (b0 != 0.0 || b2 != 0.0), "zeroed solve")
  }

  test("a separable constructed corpus trains the known direction") {
    // 100 'en' docs drenched in English stopwords, 100 'de' docs with
    // none: the stopword-ratio coefficient MUST come out positive and
    // the mean predicted quality must rank en above de — a sign flip in
    // the gradient, a transposed normal matrix, or a degenerate det all
    // fail this separation
    import spark.implicits._
    val docs = (0 until 200).map { i =>
      val en = i < 100
      val filler = if (en) "the of and to in" else "katze hund haus baum berg"
      val text = (filler + " ") * (5 + i % 7)
      (i.toLong, text.trim, if (en) "en" else "de", "synthetic", text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("graft_irls_sep")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = Pipeline3.qPipelineQualityIrls(spark, dir.toString).collect()
    val b1 = rows.head.getAs[Double]("beta1")
    assert(b1 > 0.0, s"separable corpus must train beta1 > 0, got $b1")
    val byLang = rows.map(r => r.getAs[String]("lang") -> r.getAs[Double]("mean_quality")).toMap
    assert(byLang("en") > byLang("de"),
      s"mean quality must separate: en=${byLang("en")} de=${byLang("de")}")
  }

  test("perturbing one training label moves the coefficients") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    // flip the label of the single lowest-id English doc: y changes for
    // exactly one row, features stay identical
    val victim = docs.filter(col("lang") === "en")
      .agg(min(col("doc_id"))).collect().head.getLong(0)
    val flipped = docs.withColumn("lang",
      when(col("doc_id") === victim, lit("xx")).otherwise(col("lang")))
    val dir = java.nio.file.Files.createTempDirectory("graft_irls_flip")
    flipped.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val (b0, b1, b2) = betas(sf)
    val (f0, f1, f2) = betas(dir.toString)
    assert((b0, b1, b2) != (f0, f1, f2),
      s"one flipped label left all coefficients unchanged: ($b0,$b1,$b2)")
    for (b <- Seq(f0, f1, f2)) assert(!b.isNaN && !b.isInfinite)
  }
}
