package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => TF}

/** Round-7 widening of the curation layer: the two classic corpus-quality
  * components every large-scale pretraining pipeline runs that were still
  * missing — repetition profiling (the Gopher/MassiveText "repetitious
  * document" signals) and a TRAINED quality classifier (the
  * wiki-vs-crawl logistic gate of the GPT-3/LLaMA data recipes), fit by
  * IRLS entirely inside the engine.
  *
  * Numeric discipline is the package standard: counts and integer ppm
  * ratios where possible; every COMPUTED double that crosses an
  * aggregation goes through the floor-quantized qsum pattern; the one
  * transcendental (the logistic sigmoid) is quantized at 1e9 right after
  * evaluation on an ALREADY-quantized argument, the geo_utm trig
  * discipline — so the DuckDB oracle re-derives the trained model
  * bit-for-bit.
  */
object Pipeline3 {
  type Q = (SparkSession, String) => DataFrame

  private def qsum(c: Column, scale: Double): Column =
    sum(floor(c * scale + 0.5)).cast("double") / scale
  private def sqlQsum(e: String, scale: String): String =
    s"CAST(SUM(CAST(floor(($e) * $scale + 0.5) AS BIGINT)) AS DOUBLE) / $scale"

  // ---------------------------------------------------------------------
  // REPETITION PROFILE — the MassiveText/Gopher repetition signals
  // (Rae et al. 2021, table A1): fraction of tokens inside duplicate
  // n-grams and the mass of the single most frequent n-gram, the filters
  // that catch boilerplate and degenerate generations. Spark-first: two
  // explode → map-side-combined groupBy passes keyed by (doc, gram) —
  // the per-doc profile never materializes more state than the doc's
  // distinct grams, so the shape is flat at any corpus size. All ratios
  // are integer ppm (x * 1000000 div y) — hash-exact on the oracle.
  // ---------------------------------------------------------------------

  val qTextRepetition: Q = (s, d) => {
    graft.GraftFunctions.register(s)
    val docs = documents(s, d)
    val toks = TF.tokens(col("text"))
    val base = docs.select(col("doc_id"), col("lang"), toks.as("toks"),
      call_function("word_ngrams", toks, lit(2)).as("grams"))
    // per-doc token duplication: nt, distinct tokens
    val tokStats = base.select(col("doc_id"), explode(col("toks")).as("t"))
      .groupBy(col("doc_id"), col("t")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("nt"), count(lit(1)).as("ndist"))
    // per-doc bigram duplication: total grams, duplicated-gram mass, top mass
    val gramStats = base.select(col("doc_id"), explode(col("grams")).as("g"))
      .groupBy(col("doc_id"), col("g")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("ng"),
           sum(when(col("c") > 1, col("c")).otherwise(0L)).as("dupg"),
           max(col("c")).as("topg"))
    val perDoc = base.select(col("doc_id"), col("lang"))
      .join(tokStats, Seq("doc_id")).join(gramStats, Seq("doc_id"))
      .select(col("lang"),
        expr("(nt - ndist) * 1000000 div nt").as("dup_tok_ppm"),
        expr("dupg * 1000000 div ng").as("dup_2gram_ppm"),
        expr("topg * 1000000 div ng").as("top_2gram_ppm"))
    perDoc.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        expr("sum(dup_tok_ppm) div count(1)").as("avg_dup_tok_ppm"),
        expr("sum(dup_2gram_ppm) div count(1)").as("avg_dup_2gram_ppm"),
        expr("sum(top_2gram_ppm) div count(1)").as("avg_top_2gram_ppm"),
        // the Gopher-style gate: docs whose top bigram carries >20% of
        // the mass or whose duplicate-bigram mass exceeds 30%
        sum(when(col("top_2gram_ppm") > 200000 || col("dup_2gram_ppm") > 300000,
          1L).otherwise(0L)).as("n_flagged"))
      .orderBy(col("lang"))
  }

  val qTextRepetitionSql: String = """
    WITH t AS (
      SELECT doc_id, lang, regexp_split_to_array(trim(text), '\s+') AS toks
      FROM documents),
    g AS (
      SELECT doc_id, lang, toks,
             CASE WHEN len(toks) >= 2
               THEN list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])
               ELSE [array_to_string(toks, ' ')] END AS grams
      FROM t),
    ts AS (
      SELECT doc_id, CAST(SUM(c) AS BIGINT) AS nt, CAST(COUNT(*) AS BIGINT) AS ndist
      FROM (SELECT doc_id, tk, COUNT(*) AS c
            FROM (SELECT doc_id, unnest(toks) AS tk FROM g) GROUP BY 1, 2)
      GROUP BY 1),
    gs AS (
      SELECT doc_id, CAST(SUM(c) AS BIGINT) AS ng,
             CAST(SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT) AS dupg,
             CAST(MAX(c) AS BIGINT) AS topg
      FROM (SELECT doc_id, gm, COUNT(*) AS c
            FROM (SELECT doc_id, unnest(grams) AS gm FROM g) GROUP BY 1, 2)
      GROUP BY 1),
    pd AS (
      SELECT g.lang,
             CAST((nt - ndist) * 1000000 // nt AS BIGINT) AS dup_tok_ppm,
             CAST(dupg * 1000000 // ng AS BIGINT) AS dup_2gram_ppm,
             CAST(topg * 1000000 // ng AS BIGINT) AS top_2gram_ppm
      FROM g JOIN ts USING (doc_id) JOIN gs USING (doc_id))
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(dup_tok_ppm) // COUNT(*) AS BIGINT) AS avg_dup_tok_ppm,
           CAST(SUM(dup_2gram_ppm) // COUNT(*) AS BIGINT) AS avg_dup_2gram_ppm,
           CAST(SUM(top_2gram_ppm) // COUNT(*) AS BIGINT) AS avg_top_2gram_ppm,
           CAST(SUM(CASE WHEN top_2gram_ppm > 200000 OR dup_2gram_ppm > 300000
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged
    FROM pd GROUP BY 1 ORDER BY 1"""

  // ---------------------------------------------------------------------
  // TRAINED QUALITY CLASSIFIER — logistic regression fit by IRLS inside
  // the engine (the wiki-vs-crawl quality gate of the GPT-3/LLaMA data
  // recipes, with engineered features instead of a bag-of-words): label
  // y = (lang = 'en'), features x1 = English-stopword ratio, x2 =
  // capped token count / 1000, model p = sigmoid(b0 + b1*x1 + b2*x2).
  //
  // Spark-first at 100 TB: each IRLS iteration is ONE map-side-combined
  // aggregation pass (9 quantized sums) + a free scalar 3x3 solve via
  // the adjugate — no gradient-descent loop, no driver-side data.
  //   iter 1 (beta = 0, p = 1/2, W = 1/4): beta1 = 4 (X'X)^-1 X'(y - 1/2)
  //   iter 2: z = x·beta1 (quantized 1e6), p = sigmoid(z) (quantized 1e9
  //           — the one transcendental, geo_utm trig discipline),
  //           beta2 = beta1 + (X'WX)^-1 X'(y - p),  W = p(1-p)
  // Every sum is floor-quantized (qsum 1e9) so both engines aggregate
  // identical integers; the scalar chains are textually mirrored, and
  // the readout quantizes at 1e6. Output: trained coefficients plus the
  // per-lang mean predicted quality — the artifact a curation pipeline
  // actually thresholds on.
  // ---------------------------------------------------------------------

  val qPipelineQualityIrls: Q = (s, d) => {
    val docs = documents(s, d)
    val nt = TF.tokenCount(col("text"))
    val feats = docs.select(
      col("lang"),
      when(col("lang") === "en", 1.0).otherwise(0.0).as("y"),
      TF.stopwordRatio(col("text"), "en").as("x1"),
      (least(nt, lit(1000L)).cast("double") / 1000.0).as("x2"))

    def solve3(pre: String): Seq[Column] = {
      // adjugate of the symmetric [ [n s1 s2], [s1 s11 s12], [s2 s12 s22] ]
      val n = col(s"${pre}n"); val s1 = col(s"${pre}s1"); val s2 = col(s"${pre}s2")
      val s11 = col(s"${pre}s11"); val s12 = col(s"${pre}s12"); val s22 = col(s"${pre}s22")
      val g0 = col(s"${pre}g0"); val g1 = col(s"${pre}g1"); val g2 = col(s"${pre}g2")
      val c11 = s11 * s22 - s12 * s12
      val c12 = s12 * s2 - s1 * s22
      val c13 = s1 * s12 - s11 * s2
      val c22 = n * s22 - s2 * s2
      val c23 = s1 * s2 - n * s12
      val c33 = n * s11 - s1 * s1
      val det = n * c11 + s1 * c12 + s2 * c13
      Seq((c11 * g0 + c12 * g1 + c13 * g2) / det,
          (c12 * g0 + c22 * g1 + c23 * g2) / det,
          (c13 * g0 + c23 * g1 + c33 * g2) / det)
    }
    def q9(c: Column): Column = floor(c * 1e9 + 0.5) / 1e9

    // ---- iteration 1: one aggregation pass, closed-form Newton step ----
    val agg1 = feats.agg(
      count(lit(1)).cast("double").as("an"),
      qsum(col("x1"), 1e9).as("as1"), qsum(col("x2"), 1e9).as("as2"),
      qsum(col("x1") * col("x1"), 1e9).as("as11"),
      qsum(col("x1") * col("x2"), 1e9).as("as12"),
      qsum(col("x2") * col("x2"), 1e9).as("as22"),
      qsum(col("y") - 0.5, 1e9).as("ag0"),
      qsum((col("y") - 0.5) * col("x1"), 1e9).as("ag1"),
      qsum((col("y") - 0.5) * col("x2"), 1e9).as("ag2"))
    val Seq(r0, r1, r2) = solve3("a")
    val beta1 = agg1.select(
      q9(r0 * 4.0).as("b0"), q9(r1 * 4.0).as("b1"), q9(r2 * 4.0).as("b2"))

    // ---- iteration 2: score with beta1, one weighted aggregation pass ----
    val scored = feats.crossJoin(broadcast(beta1))
      .withColumn("z",
        floor((col("b0") + col("b1") * col("x1") + col("b2") * col("x2")) * 1e6 + 0.5) / 1e6)
      .withColumn("p", floor(lit(1.0) / (lit(1.0) + exp(-col("z"))) * 1e9 + 0.5) / 1e9)
      .withColumn("w", col("p") * (lit(1.0) - col("p")))
    val agg2 = scored.agg(
      qsum(col("w"), 1e9).as("bn"),
      qsum(col("w") * col("x1"), 1e9).as("bs1"),
      qsum(col("w") * col("x2"), 1e9).as("bs2"),
      qsum(col("w") * col("x1") * col("x1"), 1e9).as("bs11"),
      qsum(col("w") * col("x1") * col("x2"), 1e9).as("bs12"),
      qsum(col("w") * col("x2") * col("x2"), 1e9).as("bs22"),
      qsum(col("y") - col("p"), 1e9).as("bg0"),
      qsum((col("y") - col("p")) * col("x1"), 1e9).as("bg1"),
      qsum((col("y") - col("p")) * col("x2"), 1e9).as("bg2"))
    val Seq(d0, d1, d2) = solve3("b")
    val beta2 = agg2.crossJoin(broadcast(beta1)).select(
      (floor((col("b0") + d0) * 1e6 + 0.5) / 1e6).as("beta0"),
      (floor((col("b1") + d1) * 1e6 + 0.5) / 1e6).as("beta1"),
      (floor((col("b2") + d2) * 1e6 + 0.5) / 1e6).as("beta2"))

    // ---- readout: per-lang mean predicted quality under the iter-1 model ----
    scored.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
           (floor(qsum(col("p"), 1e9) / count(lit(1)) * 1e6 + 0.5) / 1e6)
             .as("mean_quality"))
      .crossJoin(broadcast(beta2))
      .select(col("lang"), col("n_docs"), col("mean_quality"),
        col("beta0"), col("beta1"), col("beta2"))
      .orderBy(col("lang"))
  }

  val qPipelineQualityIrlsSql: String = {
    val sqlSolve3 = (p: String) => (
      s"""${p}s11 * ${p}s22 - ${p}s12 * ${p}s12""",
      s"""${p}s12 * ${p}s2 - ${p}s1 * ${p}s22""",
      s"""${p}s1 * ${p}s12 - ${p}s11 * ${p}s2""",
      s"""${p}n * ${p}s22 - ${p}s2 * ${p}s2""",
      s"""${p}s1 * ${p}s2 - ${p}n * ${p}s12""",
      s"""${p}n * ${p}s11 - ${p}s1 * ${p}s1""")
    val (ac11, ac12, ac13, ac22, ac23, ac33) = sqlSolve3("a")
    val (bc11, bc12, bc13, bc22, bc23, bc33) = sqlSolve3("b")
    s"""
    WITH f AS (
      SELECT lang,
             CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y,
             CAST(len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
               t -> list_contains(['the','a','of','and','to','in','is','it','that','for'], t))) AS DOUBLE)
               / GREATEST(CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS DOUBLE), 1.0) AS x1,
             CAST(LEAST(len(regexp_split_to_array(trim(text), '\\s+')), 1000) AS DOUBLE) / 1000.0 AS x2
      FROM documents),
    a AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS an,
             ${sqlQsum("x1", "1e9")} AS as1, ${sqlQsum("x2", "1e9")} AS as2,
             ${sqlQsum("x1 * x1", "1e9")} AS as11,
             ${sqlQsum("x1 * x2", "1e9")} AS as12,
             ${sqlQsum("x2 * x2", "1e9")} AS as22,
             ${sqlQsum("y - 0.5", "1e9")} AS ag0,
             ${sqlQsum("(y - 0.5) * x1", "1e9")} AS ag1,
             ${sqlQsum("(y - 0.5) * x2", "1e9")} AS ag2
      FROM f),
    b1 AS (
      SELECT floor((($ac11) * ag0 + ($ac12) * ag1 + ($ac13) * ag2) / det * 4.0 * 1e9 + 0.5) / 1e9 AS b0,
             floor((($ac12) * ag0 + ($ac22) * ag1 + ($ac23) * ag2) / det * 4.0 * 1e9 + 0.5) / 1e9 AS b1,
             floor((($ac13) * ag0 + ($ac23) * ag1 + ($ac33) * ag2) / det * 4.0 * 1e9 + 0.5) / 1e9 AS b2
      FROM (SELECT *, an * ($ac11) + as1 * ($ac12) + as2 * ($ac13) AS det FROM a) t),
    sc AS (
      SELECT f.lang, f.y, f.x1, f.x2,
             floor(1.0 / (1.0 + exp(-z)) * 1e9 + 0.5) / 1e9 AS p
      FROM (SELECT f.*, floor((b1.b0 + b1.b1 * x1 + b1.b2 * x2) * 1e6 + 0.5) / 1e6 AS z
            FROM f, b1) f),
    w AS (SELECT *, p * (1.0 - p) AS wt FROM sc),
    b AS (
      SELECT ${sqlQsum("wt", "1e9")} AS bn,
             ${sqlQsum("wt * x1", "1e9")} AS bs1, ${sqlQsum("wt * x2", "1e9")} AS bs2,
             ${sqlQsum("wt * x1 * x1", "1e9")} AS bs11,
             ${sqlQsum("wt * x1 * x2", "1e9")} AS bs12,
             ${sqlQsum("wt * x2 * x2", "1e9")} AS bs22,
             ${sqlQsum("y - p", "1e9")} AS bg0,
             ${sqlQsum("(y - p) * x1", "1e9")} AS bg1,
             ${sqlQsum("(y - p) * x2", "1e9")} AS bg2
      FROM w),
    b2 AS (
      SELECT floor((b1.b0 + (($bc11) * bg0 + ($bc12) * bg1 + ($bc13) * bg2) / det) * 1e6 + 0.5) / 1e6 AS beta0,
             floor((b1.b1 + (($bc12) * bg0 + ($bc22) * bg1 + ($bc23) * bg2) / det) * 1e6 + 0.5) / 1e6 AS beta1,
             floor((b1.b2 + (($bc13) * bg0 + ($bc23) * bg1 + ($bc33) * bg2) / det) * 1e6 + 0.5) / 1e6 AS beta2
      FROM (SELECT *, bn * ($bc11) + bs1 * ($bc12) + bs2 * ($bc13) AS det FROM b) t, b1)
    SELECT lang, n_docs, mean_quality, beta0, beta1, beta2
    FROM (
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
             floor(${sqlQsum("p", "1e9")} / COUNT(*) * 1e6 + 0.5) / 1e6 AS mean_quality
      FROM sc GROUP BY 1) m, b2
    ORDER BY lang"""
  }

  val queries: Map[String, Q] = Map(
    "text_repetition"        -> qTextRepetition,
    "pipeline_quality_irls"  -> qPipelineQualityIrls)

  val oracleSql: Map[String, String] = Map(
    "text_repetition"        -> qTextRepetitionSql,
    "pipeline_quality_irls"  -> qPipelineQualityIrlsSql)
}
