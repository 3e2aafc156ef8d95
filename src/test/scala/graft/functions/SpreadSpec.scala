package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the r19 [[Spread]] contracts:
  *  1. byKey widens to the session shuffle parallelism and never changes
  *     results (hash partitioning on a real key — deterministic);
  *  2. the non-deterministic barrier actually blocks predicate pushdown
  *     below the exchange (the whole point: optimizer-inferred filters
  *     referencing a downstream kernel must not sink into the
  *     single-task scan) while a filter applied BELOW the spread still
  *     reaches the source;
  *  3. byKeyIfNarrow is a NO-OP on an already-parallel input (the
  *     real-scale posture: no extra exchange when the scan is wide). */
class SpreadSpec extends SparkSpec {

  test("byKey widens to session shuffle parallelism, results unchanged") {
    val n = spark.sessionState.conf.numShufflePartitions
    val df = spark.range(0, 1000, 1, 1).select(col("id"), (col("id") % 7).as("k"))
    assert(df.rdd.getNumPartitions == 1)
    val wide = Spread.byKey(df, col("id"))
    assert(wide.rdd.getNumPartitions == n)
    assert(wide.agg(sum(col("id")), count(lit(1))).head() ==
           df.agg(sum(col("id")), count(lit(1))).head())
  }

  test("filters keep pushing through the spread (pinned: no barrier holds)") {
    // Spark 4.1 pushes deterministic predicates below the repartition —
    // even a non-deterministic always-true filter did not block it
    // (measured r19), so Spread deliberately carries no barrier; this
    // pin documents the engine behavior the operator design assumes
    val df = spark.range(0, 100, 1, 1).toDF("id")
    val above = Spread.byKey(df, col("id")).filter(col("id") % 2 === 0)
    val planAbove = above.queryExecution.optimizedPlan.toString
    val repartIdx = planAbove.indexOf("Repartition")
    val filterIdx = planAbove.indexOf("((id")
    assert(repartIdx >= 0, planAbove)
    assert(filterIdx > repartIdx,
      s"expected the deterministic filter to push below the spread:\n$planAbove")
    assert(above.count() == 50)
    // filter BELOW the spread behaves identically
    val below = Spread.byKey(df.filter(col("id") < 10), col("id"))
    assert(below.count() == 10)
  }

  test("byKey no-ops on inputs that already crossed a shuffle") {
    val agg = spark.range(0, 100, 1, 1).toDF("id")
      .groupBy((col("id") % 10).as("k")).count()
    val out = Spread.byKey(agg, col("k"))
    assert(out.queryExecution.analyzed eq agg.queryExecution.analyzed,
      "post-shuffle input must pass through unchanged")
  }

  test("byKeyIfNarrow no-ops on an already-parallel input") {
    val n = spark.sessionState.conf.numShufflePartitions
    val wideInput = spark.range(0, 100, 1, n + 2).toDF("id")
    val out = Spread.byKeyIfNarrow(wideInput, col("id"))
    assert(out.rdd.getNumPartitions == n + 2, "must not insert an exchange")
    val narrowInput = spark.range(0, 100, 1, 1).toDF("id")
    assert(Spread.byKeyIfNarrow(narrowInput, col("id")).rdd.getNumPartitions == n)
  }
}
