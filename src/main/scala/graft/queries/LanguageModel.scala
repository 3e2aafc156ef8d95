package graft.queries

import org.apache.spark.sql.functions._

/** Bigram language-model perplexity scoring — the classic "how surprising
  * is this document under the corpus's own statistics" quality signal
  * (the KenLM-style filter of public LLM-data pipelines, reduced to its
  * Spark-native core: the model IS a count table, and scoring IS a join).
  *
  * Model: add-one-smoothed bigram LM trained on the corpus itself —
  * p(w2|w1) = (c(w1 w2) + 1) / (c(w1) + V), V = |vocab|. Per document,
  * the score is the mean negative log-likelihood over its bigrams and
  * the perplexity exp(nll).
  *
  * Scale shape (100 TB posture): the model is never collected — unigram
  * and bigram counts are distributed aggregates joined back to the
  * exploded bigram stream on their natural keys (sort-merge at scale,
  * AQE-broadcast when small), then one partial-agg'd per-doc sum. Three
  * shuffles total (two count aggs + the score join), all on Zipf-bounded
  * keys; nothing is quadratic and no driver state exists.
  *
  * Numeric determinism: counts and V are integer-exact; (cb+1)/(cu+V) is
  * one correctly-rounded double divide; ln() may differ from DuckDB's in
  * the last ulp, so each term is cast to DECIMAL(27,6) before the exact
  * decimal sum (the dsum discipline) and the final mean/perplexity are
  * ROUND(...,5) on BOTH sides — the geo_utm trig convention.
  */
object LanguageModel {

  /** Top-10 most-surprising documents under the corpus's own bigram LM. */
  val qTextPerplexity: Q = (s, d) => {
    val toks = split(trim(col("text")), "\\s+")
    val docs = documents(s, d)
      .filter(size(toks) >= 2)
      .select(col("doc_id"),
        slice(toks, lit(1), size(toks) - 1).as("w1s"),
        slice(toks, lit(2), size(toks) - 1).as("w2s"))
    val bigrams = docs
      .select(col("doc_id"), explode(arrays_zip(col("w1s"), col("w2s"))).as("p"))
      .select(col("doc_id"), col("p.w1s").as("w1"), col("p.w2s").as("w2"))
    // V counts the full vocabulary (every token, including each doc's
    // final one, which never leads a bigram)
    val vocab = documents(s, d)
      .select(explode(split(trim(col("text")), "\\s+")).as("tok"))
      .agg(countDistinct(col("tok")).as("v"))
    val big = bigrams.groupBy(col("w1").as("b_w1"), col("w2").as("b_w2"))
      .agg(count(lit(1)).as("cb"))
    // unigram context counts fold from the (much smaller) bigram count
    // table — c(w1) = Σ_w2 c(w1,w2) — instead of re-aggregating the full
    // bigram stream: one less shuffle of the exploded corpus
    val uni = big.groupBy(col("b_w1").as("u_tok"))
      .agg(sum(col("cb")).as("cu"))
    val nll = -log((col("cb") + lit(1)).cast("double") /
                   (col("cu") + col("v")).cast("double"))
    bigrams
      .join(uni, col("w1") === col("u_tok"))
      .join(big, col("w1") === col("b_w1") && col("w2") === col("b_w2"))
      .crossJoin(broadcast(vocab))
      .groupBy(col("doc_id"))
      .agg((dsum(nll) / count(lit(1)).cast("double")).as("raw_nll"),
           count(lit(1)).as("n_bigrams"))
      .select(col("doc_id"), col("n_bigrams"),
        round(col("raw_nll"), 5).as("nll"),
        round(exp(col("raw_nll")), 5).as("ppl"))
      .orderBy(col("ppl").desc, col("doc_id"))
      .limit(10)
  }

  val qTextPerplexitySql: String = """
    WITH t AS (
      SELECT doc_id, string_split(trim(text), ' ') AS w
      FROM documents WHERE len(string_split(trim(text), ' ')) >= 2),
    b AS (
      SELECT doc_id, w[CAST(i AS INTEGER)] AS w1, w[CAST(i AS INTEGER) + 1] AS w2
      FROM t, UNNEST(range(1, len(w))) AS u(i)),
    big AS (SELECT w1 AS b_w1, w2 AS b_w2, COUNT(*) AS cb FROM b GROUP BY w1, w2),
    uni AS (SELECT b_w1 AS u_tok, CAST(SUM(cb) AS BIGINT) AS cu FROM big GROUP BY b_w1),
    vocab AS (
      SELECT COUNT(DISTINCT tok) AS v
      FROM (SELECT UNNEST(string_split(trim(text), ' ')) AS tok FROM documents)),
    scored AS (
      SELECT doc_id,
             CAST(SUM(CAST(-ln(CAST(cb + 1 AS DOUBLE) / CAST(cu + v AS DOUBLE))
                           AS DECIMAL(27,6))) AS DOUBLE) /
               CAST(COUNT(*) AS DOUBLE) AS raw_nll,
             CAST(COUNT(*) AS BIGINT) AS n_bigrams
      FROM b
      JOIN uni ON w1 = u_tok
      JOIN big ON w1 = b_w1 AND w2 = b_w2
      CROSS JOIN vocab
      GROUP BY doc_id)
    SELECT doc_id, n_bigrams,
           ROUND(raw_nll, 5) AS nll, ROUND(exp(raw_nll), 5) AS ppl
    FROM scored
    ORDER BY ppl DESC, doc_id LIMIT 10"""

  /** Character-entropy quality signal: Shannon entropy of each document's
    * character distribution — the cheap gibberish/boilerplate filter
    * (near-zero entropy = repeated filler, ≈log2(alphabet) = random
    * noise). One explode + two aggregations, map-side combined; per-term
    * −p·log2(p) goes through the decimal dsum and the final value is
    * ROUND(...,5) on both engines (the ln/exp discipline). */
  val qTextEntropy: Q = (s, d) => {
    val chars = documents(s, d)
      .select(col("doc_id"), explode(split(col("text"), "")).as("ch"))
    val hist = chars.groupBy(col("doc_id"), col("ch")).agg(count(lit(1)).as("cnt"))
    val lens = chars.groupBy(col("doc_id")).agg(count(lit(1)).as("len"))
    val p = col("cnt").cast("double") / col("len").cast("double")
    hist.join(lens, Seq("doc_id"))
      .select(col("doc_id"), col("len"),
        (-p * log(2.0, p)).as("term"))
      .groupBy(col("doc_id"))
      .agg(round(dsum(col("term")), 5).as("entropy_bits"),
           first(col("len")).as("n_chars"))
      .orderBy(col("entropy_bits").desc, col("doc_id"))
      .limit(10)
  }

  val qTextEntropySql: String = s"""
    WITH c AS (
      SELECT doc_id, UNNEST(string_split(text, '')) AS ch FROM documents),
    h AS (SELECT doc_id, ch, CAST(COUNT(*) AS BIGINT) AS cnt FROM c GROUP BY doc_id, ch),
    l AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS len FROM c GROUP BY doc_id),
    t AS (
      SELECT h.doc_id, l.len,
             -(CAST(cnt AS DOUBLE) / CAST(len AS DOUBLE)) *
               log2(CAST(cnt AS DOUBLE) / CAST(len AS DOUBLE)) AS term
      FROM h JOIN l ON h.doc_id = l.doc_id)
    SELECT doc_id, ROUND(${sqlDsum("term")}, 5) AS entropy_bits,
           CAST(MIN(len) AS BIGINT) AS n_chars
    FROM t GROUP BY doc_id
    ORDER BY entropy_bits DESC, doc_id LIMIT 10"""

  // ---- registration -------------------------------------------------------

  val queries: Map[String, Q] = Map(
    "text_perplexity" -> qTextPerplexity,
    "text_entropy"    -> qTextEntropy,
  )

  val oracleSql: Map[String, String] = Map(
    "text_perplexity" -> qTextPerplexitySql,
    "text_entropy"    -> qTextEntropySql,
  )
}
