package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the [[Spread]] contracts:
  *  1. byKey widens to the session shuffle parallelism and never changes
  *     results (hash partitioning on a real key — deterministic);
  *  2. Spark 4.1 pushes deterministic predicates below the repartition —
  *     no filter-shaped barrier holds (an always-true rand() filter was
  *     measured doing nothing in r19 and removed), so Spread carries
  *     none; the test pins that engine behavior, which the r20
  *     InferFiltersFromGenerate session exclusion works around for the
  *     optimizer-INFERRED kernel predicates;
  *  3. byKey/byKeyIfNarrow are NO-OPs on post-shuffle and already-
  *     parallel inputs, and byKey additionally no-ops on a file scan
  *     whose size already splits to cluster parallelism (the real-scale
  *     posture: no extra exchange when the scan is wide). */
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

  test("byKey no-ops on a distinct()-ed input (Deduplicate in the analyzed plan)") {
    // distinct() is Deduplicate until the optimizer rewrites it to
    // Aggregate; the guard walks the ANALYZED plan, so Deduplicate must
    // be in the pass-through set or a distinct()-ed input gains a
    // redundant full-table exchange (the exact pessimization the guard
    // exists to prevent)
    val dd = spark.range(0, 100, 1, 1).toDF("id").distinct()
    val out = Spread.byKey(dd, col("id"))
    assert(out.queryExecution.analyzed eq dd.queryExecution.analyzed,
      "distinct()-ed input must pass through unchanged")
  }

  test("byKey no-ops on a file scan wide enough to split to cluster parallelism") {
    val dir = java.nio.file.Files.createTempDirectory("spread_wide").toString
    spark.range(0, 10000, 1, 1).selectExpr("id", "repeat('x', 64) AS pad")
      .write.mode("overwrite").parquet(dir)
    val prev = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try {
      // shrink the split size so this small file ESTIMATES to >= default
      // parallelism splits — the same arithmetic a multi-TB table hits at
      // the default 128m split size
      spark.conf.set("spark.sql.files.maxPartitionBytes", "1024")
      val df = spark.read.parquet(dir).filter(col("id") >= 0)
      val out = Spread.byKey(df, col("id"))
      assert(out.queryExecution.analyzed eq df.queryExecution.analyzed,
        "a wide file scan must pass through byKey unchanged")
    } finally spark.conf.set("spark.sql.files.maxPartitionBytes", prev)
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
