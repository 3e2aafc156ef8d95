package graft.queries

import graft.SparkSpec

/** Unpartitioned-window hygiene over the ENTIRE query inventory: a
  * `Window.orderBy(...)` with no partitionSpec funnels its whole input
  * through ONE task — fine over a bounded-domain histogram (a few
  * thousand distinct recency days / bucket ids), a detonator over
  * anything that grows with the corpus (the r8 `events_rfm` monetary
  * histogram, whose distinct-value count was ~n_users).
  *
  * The tree's global windows were each justified in prose as
  * "histogram-input, driver-tiny"; `events_rfm` proved prose rots. This
  * spec makes the claim STRUCTURAL, per VERDICT r9 item 3: every Window
  * operator with an empty partitionSpec in every inventory query's
  * optimized plan must have, in its input subtree, an Aggregate with
  * non-empty grouping (the value-histogram shape — window input
  * cardinality is #distinct values, never #rows), AND the query must
  * carry an annotation here stating why that grouping's DOMAIN is
  * bounded (the part no static check can prove). A new global window
  * without both fails loudly.
  */
class WindowHygieneSpec extends SparkSpec {

  /** query → why the unpartitioned window's histogram domain is bounded.
    * These are load-bearing review notes, not an allowlist: the
    * structural Aggregate-below-Window requirement is enforced
    * regardless, and a stale entry (query no longer planning a global
    * window) also fails. */
  private val boundedDomain: Map[String, String] = Map(
    "agg_median_mad" -> "distinct l_quantity values (1..50 grid) and their |v-median| deviations",
    "agg_gini" -> "binned Lorenz: fixed bin-count histogram",
    "agg_ks_test" -> "distinct value grid of the two samples' quantized statistic",
    "agg_autocorr" -> "per-day aggregate series: domain = corpus span in days",
    "agg_chi2" -> "contingency cells: event_type x day-of-week crosses",
    "agg_mannwhitney" -> "distinct-value table of the quantized metric (midranks over value groups)",
    "pipeline_experiment" -> "distinct-value table of the per-arm metric (rank probes over grouped counts)",
    "window_percent_rank" -> "acctbal value histogram (decimal(15,2) bounded range); tie-break rank partitioned by value",
    "events_rfm" -> "recency-days / per-user-count / 65536-wide monetary-bucket histograms (two-pass bucketed quartiles)",
    "graph_linkpred" -> "score-threshold histogram over quantized scores"
  )

  test("every unpartitioned window sits over a bounded-domain histogram, annotated") {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
    val results = graft.SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      try {
        val plan = fn(spark, sf).queryExecution.optimizedPlan
        val globals = plan.collect { case w: LWindow if w.partitionSpec.isEmpty => w }
        val structuralOk = globals.forall { w =>
          // single-row inputs (ungrouped-agg scalar attaches) are safe
          // without a histogram; otherwise require the histogram shape
          w.child.maxRows.exists(_ <= 1L) ||
            w.child.exists {
              case a: Aggregate => a.groupingExpressions.nonEmpty
              case _            => false
            }
        }
        (name, globals.nonEmpty, structuralOk, Option.empty[String])
      } catch {
        case e: Throwable =>
          (name, false, true, Some(s"BUILD FAILED: ${e.getMessage}".take(120)))
      }
    }
    val broken = results.collect { case (n, _, _, Some(err)) => s"$n: $err" }
    assert(broken.isEmpty, broken.mkString("\n"))
    val structural = results.collect {
      case (n, true, false, _) =>
        s"$n: unpartitioned window whose input is not a grouped histogram (nor single-row)"
    }
    assert(structural.isEmpty, structural.mkString("\n"))
    val withGlobal = results.collect { case (n, true, _, _) => n }.toSet
    val unannotated = (withGlobal -- boundedDomain.keySet).toSeq.sorted
    assert(unannotated.isEmpty,
      s"queries planning an unpartitioned window without a bounded-domain annotation: " +
        unannotated.mkString(", "))
    val stale = (boundedDomain.keySet -- withGlobal).toSeq.sorted
    assert(stale.isEmpty,
      s"stale annotations (no unpartitioned window in the optimized plan): ${stale.mkString(", ")}")
  }
}
