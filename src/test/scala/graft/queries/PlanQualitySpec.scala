package graft.queries

import graft.SparkSpec

/** Regression tests for the plan shapes the engine's scale posture depends
  * on — a correct result with a degraded plan (lost pushdown, dropped
  * broadcast, missing partial aggregation) is a 100 TB failure even when
  * the hash matches at sf0.01. */
class PlanQualitySpec extends SparkSpec {

  private def plan(name: String): String = {
    val df = graft.SparkEntry.queries(name)(spark, sf)
    df.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
  }

  test("q6: every predicate reaches the parquet scan (PushedFilters)") {
    val p = plan("q6_forecast_revenue")
    assert(p.contains("PushedFilters:"), p.take(500))
    assert(p.contains("GreaterThanOrEqual(l_shipdate") && p.contains("LessThan(l_quantity,24.0)"),
      "expected shipdate+quantity filters pushed to the scan")
    // column pruning: the scan must not read the full 11-column lineitem
    assert(!p.contains("l_orderkey"), "scan reads unprojected columns")
  }

  test("q5: dimension hops broadcast, no cartesian products") {
    val p = plan("q5_region_revenue")
    assert(p.contains("BroadcastHashJoin"), "dimension joins must broadcast")
    assert(!p.contains("CartesianProduct"), "unexpected cartesian product")
  }

  test("q1: aggregation has a partial (map-side) phase") {
    val p = plan("q1_pricing_summary")
    assert(p.contains("partial_"), "no map-side partial aggregation in q1")
  }

  test("sort_topk plans as TakeOrderedAndProject, not a global sort") {
    val p = plan("sort_topk")
    assert(p.contains("TakeOrderedAndProject"), p.take(400))
  }

  test("zarr_pushdown: dim ranges absorbed into the connector scan") {
    val p = plan("zarr_pushdown")
    assert(p.contains("ranges=inline:[8,24)"), "chunk-range pushdown missing:\n" + p.take(600))
  }

  test("join_semi plans as a semi join (no full materialization)") {
    val p = plan("join_semi")
    assert(p.contains("LeftSemi"), p.take(400))
  }
}
