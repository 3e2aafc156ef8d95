package graft.queries

import graft.SparkSpec

/** Catch-all plan hygiene over the ENTIRE query inventory: no query may
  * plan a cartesian product or nested-loop join unless it is one by
  * definition — the class of regression that stays invisible at sf0.01
  * and detonates at 100 TB. */
class PlanHygieneSpec extends SparkSpec {

  // deliberate exceptions: join_cross IS a cross join; text_tfidf and
  // text_fluency attach the corpus token/doc count via
  // crossJoin(broadcast(<one-row aggregate>)) — a single-row build side
  // is O(rows), the canonical scalar attach; pipeline_shuffle assembles
  // its report row by crossJoining four ONE-ROW aggregates
  private val allowCartesian =
    Set("join_cross", "text_tfidf", "text_fluency", "pipeline_shuffle",
      // one-row aggregate pairs assembled by crossJoin
      "mdio_extract", "mdio_reshard",
      // q22 attaches the scalar avg-balance subquery; text_perplexity the
      // one-row vocabulary size; agg_hll_intersect assembles three one-row
      // estimates — all single-row broadcast builds, the scalar attach
      "q22_global_sales", "text_perplexity", "agg_hll_intersect",
      // q11 attaches the one-row total-stock-value aggregate for the
      // HAVING value > fraction * total gate — the same scalar attach
      "q11_important_stock",
      // text_bm25 attaches the one-row (N, avgdl) corpus aggregate
      "text_bm25",
      // dedup_eval (and its sampled-block twin) assembles three one-row counts
      "dedup_eval", "dedup_eval_sampled",
      // join_spatial attaches the one-row data-derived coordinate span;
      // graph_pagerank the one-row node count (once per iteration);
      // graph_triangles assembles its three one-row counts
      "join_spatial", "graph_pagerank", "graph_triangles",
      // pipeline_incremental attaches the one-row day-cut scalar;
      // graph_kcore assembles its one-row edge count
      "pipeline_incremental", "graph_kcore",
      // embedding_pca attaches the one-row norm/eigenvalue scalar (twice,
      // once per power iteration); text_bpe_train the one-row winning
      // pair per merge round — both the canonical scalar attach
      "embedding_pca", "text_bpe_train",
      // the experiment-analysis family attaches one-row totals the same
      // way: seasonality the global mean, median/MAD the n and the
      // median scalars, benford the digit total
      "events_seasonality", "agg_median_mad", "agg_benford",
      // pipeline_experiment zips its two one-row readouts;
      // agg_autocorr attaches the one-row series mean
      "pipeline_experiment", "agg_autocorr",
      // pipeline_quality_irls attaches the one-row trained coefficient
      // vector (per IRLS iteration) — the canonical scalar attach
      "pipeline_quality_irls")

  test("no accidental cartesian/nested-loop joins across the inventory") {
    val offenders = graft.SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val plan =
          try fn(spark, sf).queryExecution
            .explainString(org.apache.spark.sql.execution.SimpleMode)
          catch { case e: Throwable => s"BUILD FAILED: ${e.getMessage}" }
        if (plan.startsWith("BUILD FAILED")) Some(name -> plan.take(120))
        else if (!allowCartesian(name) &&
          (plan.contains("CartesianProduct") || plan.contains("BroadcastNestedLoopJoin")))
          Some(name -> "cartesian/nested-loop join in plan")
        else None
    }
    assert(offenders.isEmpty, offenders.map { case (n, w) => s"$n: $w" }.mkString("\n"))
  }
}
