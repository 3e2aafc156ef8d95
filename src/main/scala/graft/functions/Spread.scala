package graft.functions

import org.apache.spark.sql.{Column, DataFrame}

/** Deterministic parallelism widener for CPU-heavy per-row stages
  * (optimization guide §2.5 "input skew: one huge unsplittable file …
  * repartition immediately after the read", §8 "fix the per-task work").
  *
  * The bench corpus writes every table as ONE parquet row group, so every
  * scan is a single split and every per-row kernel downstream of it —
  * shingling, minhash signatures, winnow fingerprints, image
  * encode/decode — runs on one core while 31 idle (measured r19:
  * dedup_ngram_jaccard spent 8.8 s of 10.7 s in a 1-task stage;
  * multimodal_mjpeg 5.3 s of 5.75 s). Hash-repartitioning on the row key
  * right before the kernel spreads that stage across the session's
  * shuffle parallelism.
  *
  * Scale posture: the exchange ships only the kernel's INPUT columns
  * (id + text — far smaller than the kernel's exploded output, which
  * was already being shuffled downstream), the partition count comes
  * from `spark.sql.shuffle.partitions` (the cluster-sized knob, not a
  * local constant), and the key is a real column — deterministic under
  * task retry, unlike round-robin repartition (guide §2.5 / SPARK-38388;
  * also no sort-before-repartition cost). The explicit partition count
  * keeps AQE from coalescing the kernel stage back to one task by its
  * (tiny) byte size.
  */
object Spread {

  /** Hash-repartition `df` on `key` to the session's shuffle parallelism.
    * Use immediately upstream of an expensive per-row kernel whose input
    * is (or may be) a single-split scan.
    *
    * Known residual: optimizer-inferred predicates that reference the
    * downstream kernel (InferFiltersFromGenerate's `size(sh) > 0` under
    * an explode) sink through the repartition into the scan stage and
    * evaluate the kernel there, single-task. Spark 4.1's predicate
    * pushdown crosses even non-deterministic filters, so no
    * filter-shaped barrier holds (measured: an always-true rand()
    * filter here changed nothing — SpreadSpec pins the actual
    * behavior). The sunk predicate costs ~0.3-0.6 s warm on the bench
    * corpus; the heavy work above it (signatures, explode fan-out, join
    * probes, per-pair aggregation) is what this exchange parallelizes,
    * and that is where the measured wins come from. */
  def byKey(df: DataFrame, key: Column): DataFrame = {
    val n = df.sparkSession.sessionState.conf.numShufflePartitions
    if (!isNarrowScan(df) || isWideFileScan(df)) df
    else df.repartition(n, key)
  }

  /** True iff `df` is a scan plus narrow operators (project/filter/
    * generate...) — no aggregate, join, window, repartition or union
    * upstream. Operators whose inputs already crossed a shuffle are
    * parallel at the session's shuffle partitioning, and spreading them
    * again measured as a pure extra exchange (r19: the dedup recipe's
    * minhash pass over its line-deduped — aggregated — text). Plan walk
    * only; never triggers execution (safe on post-shuffle inputs where
    * an `rdd.getNumPartitions` gate would materialize AQE stages). */
  private def isNarrowScan(df: DataFrame): Boolean = {
    import org.apache.spark.sql.catalyst.plans.logical._
    df.queryExecution.analyzed.collectFirst {
      case _: Aggregate | _: Join | _: Window | _: Distinct | _: Union |
           _: RepartitionOperation | _: GlobalLimit | _: Sort |
           _: Deduplicate | _: Expand => ()
    }.isEmpty
  }

  /** True iff a file-source leaf of `df` is big enough that its scan
    * already splits to at least the cluster's default parallelism
    * (sizeInBytes / maxPartitionBytes — a lower bound on Spark's split
    * count). At real scale a multi-TB table passes isNarrowScan (it IS a
    * narrow scan) but needs NO widening exchange — the scan is thousands
    * of splits; inserting one there would shuffle the whole input for
    * nothing. Statistics-only (no execution, no file listing walk);
    * non-file leaves (local relations, RDD scans) report not-wide, which
    * keeps the spread — the conservative bench-shaped default. */
  private def isWideFileScan(df: DataFrame): Boolean = {
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    val sess = df.sparkSession
    val maxSplit = math.max(sess.sessionState.conf.filesMaxPartitionBytes, 1L)
    val want = sess.sparkContext.defaultParallelism.toLong
    df.queryExecution.analyzed.collectFirst {
      case lr: LogicalRelation if lr.relation.isInstanceOf[HadoopFsRelation] &&
        lr.relation.asInstanceOf[HadoopFsRelation].sizeInBytes / maxSplit >= want => ()
    }.isDefined
  }

  /** [[byKey]] gated on the input's ACTUAL scan parallelism: a no-op when
    * the source already has at least `defaultParallelism` partitions.
    * For plain scan→aggregate queries the spread is purely a
    * narrow-input fix (a single-row-group file caps the whole partial
    * aggregation at one core); at real scale the scan is thousands of
    * splits and adding a full-table exchange would be a pessimization —
    * this variant inserts nothing there.
    *
    * ONLY call this on an exchange-free input (a scan plus narrow
    * projections/filters): the gate reads `df.rdd.getNumPartitions`,
    * and materializing the RDD of a plan that already contains exchanges
    * would execute those stages eagerly under AQE. Operator-internal
    * call sites whose inputs may carry upstream shuffles use the
    * unconditional [[byKey]] instead. */
  def byKeyIfNarrow(df: DataFrame, key: Column): DataFrame = {
    val want = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= want) df else byKey(df, key)
  }
}
