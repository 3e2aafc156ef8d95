package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable sampling and dataset splitting.
  *
  * A training-data pipeline needs train/val/test assignment that is (a)
  * stable across runs and engines — a document's split must never change
  * when the pipeline is re-run, resumed, or re-implemented — and (b) a
  * pure map: no shuffle, no global state, no `rand()` whose value depends
  * on partitioning. Hash-based assignment gives both: the split is a
  * deterministic function of the id alone. Built on the same portable
  * mod-2^31−1 mix as [[Sketches]], so the DuckDB oracle reproduces every
  * assignment bit-for-bit ([[splitSql]]).
  */
object Sampling {

  /** Denominator of the split space: fractions resolve to 1e-6. */
  private val D = 1000000L

  private def bucketOf(id: Column): Column = Sketches.portableMix(id.cast("long")) % D

  /** Adds `out` = the split name assigned to each row by hashing `id`.
    * `splits` are (name, fraction) with fractions summing to 1; the last
    * split absorbs rounding. A row's assignment depends only on its id —
    * stable under re-runs, resumes, repartitioning, and engines. */
  def assignSplit(df: DataFrame, id: Column,
                  splits: Seq[(String, Double)],
                  out: String = "split"): DataFrame = {
    require(splits.nonEmpty && math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"split fractions must sum to 1: $splits")
    val cuts = splits.init.scanLeft(0L) { case (acc, (_, f)) => acc + math.round(f * D) }.tail
    val b = bucketOf(id)
    val expr = splits.init.zip(cuts).reverse.foldLeft(lit(splits.last._1): Column) {
      case (elseExpr, ((name, _), cut)) => when(b < cut, name).otherwise(elseExpr)
    }
    df.withColumn(out, expr)
  }

  /** Keep a deterministic `fraction` of rows by id hash — the stable
    * subsample (same rows every run, any engine, any partitioning). */
  def sampleByHash(df: DataFrame, id: Column, fraction: Double): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction in [0,1]: $fraction")
    df.filter(bucketOf(id) < math.round(fraction * D))
  }

  /** EXACT-COUNT stratified sampling: the `n` rows of each category with
    * the smallest id-hash priority — "exactly n documents per domain",
    * where [[sampleByHash]] only bounds the expected fraction. Stable:
    * the kept set is a deterministic function of the ids present (a new
    * id enters only by evicting the current max-priority member). One
    * row_number window per category after a hash shuffle — no global
    * sort, same scale shape as a grouped top-k. */
  def sampleStratified(df: DataFrame, id: Column, categoryCol: String,
                       n: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(categoryCol)).orderBy(col("__pri"), id)
    df.withColumn("__pri", Sketches.portableMix(id.cast("long")))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= n)
      .drop("__pri", "__rn")
  }

  /** Temperature-reweighted DOMAIN MIXTURE targets — the standard LLM
    * data-recipe knob: per-domain sampling weight ∝ count^alpha, so
    * alpha = 1 keeps natural proportions, alpha → 0 flattens toward
    * uniform (rare domains over-represented relative to size), the
    * T = 1/alpha "mixture temperature" of multilingual/multi-domain
    * pretraining recipes. Deterministic driver-side integer arithmetic:
    * exact floor targets plus largest-remainder distribution of the
    * leftover (ties broken by domain name), each capped at the domain's
    * count (selection-only — upsampling is epoch repetition, not row
    * duplication). Input counts MUST be name-sorted; output sums to
    * min(totalTarget, Σ counts) when no cap binds. */
  def temperatureTargets(counts: Seq[(String, Long)], totalTarget: Long,
                         alpha: Double): Seq[(String, Long)] = {
    require(counts.nonEmpty && totalTarget >= 0 && alpha > 0.0,
      s"need non-empty counts, target >= 0, alpha > 0; got $totalTarget, $alpha")
    require(counts == counts.sortBy(_._1), "counts must be sorted by name")
    val w = counts.map { case (_, c) => math.pow(c.toDouble, alpha) }
    val tw = w.sum
    val raw = w.map(x => totalTarget * x / tw)
    val base = raw.map(math.floor(_).toLong)
    var left = totalTarget - base.sum
    // largest fractional remainder first, ties by name (already sorted)
    val order = raw.zip(base).map { case (r, b) => r - b }.zipWithIndex
      .sortBy { case (fr, i) => (-fr, counts(i)._1) }.map(_._2)
    val extra = new Array[Long](counts.size)
    for (i <- order if left > 0) { extra(i) = 1; left -= 1 }
    counts.zipWithIndex.map { case ((name, c), i) =>
      (name, math.min(c, base(i) + extra(i))) }
  }

  /** Apply mixture targets: keep each domain's `target` rows with the
    * smallest (portable-mix(id), id) priority — [[sampleStratified]]'s
    * exact-count selection with a per-domain n. The targets table is
    * driver-small (one row per domain) and broadcast; the data pays one
    * hash shuffle on the domain column and one window, same scale shape
    * as a grouped top-k. Domains absent from `targets` are dropped. */
  def mixture(df: DataFrame, id: Column, categoryCol: String,
              targets: Seq[(String, Long)]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val t = broadcast(targets.toDF(categoryCol, "__tgt"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(categoryCol)).orderBy(col("__pri"), id)
    df.join(t, categoryCol)
      .withColumn("__pri", Sketches.portableMix(id.cast("long")))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= col("__tgt"))
      .drop("__pri", "__rn", "__tgt")
  }

  /** Epoch-seeded deterministic shuffle key: the global training order as
    * a pure function of (id, epoch). Training runs need the corpus in a
    * pseudo-random order that is reproducible (resume mid-epoch, re-run,
    * re-implement — same order) and decorrelated across epochs; keying
    * each row with the portable mix of `id·31 + epoch` gives both, with
    * no `rand()`, no global state, and bit-identical keys in DuckDB. */
  def shuffleKey(id: Column, epoch: Long = 0L): Column = {
    require(epoch >= 0L, s"epoch must be >= 0: $epoch")
    Sketches.portableMix(id.cast("long") * lit(31L) + lit(epoch))
  }

  /** The corpus in deterministic epoch-`epoch` training order: adds the
    * [[shuffleKey]] column and sorts by (key, id) — ties (the key space
    * is 2^31) break on the id, so the order is total and engine-stable.
    *
    * Scale shape: the sort is ONE range shuffle (Spark samples the key
    * distribution, which is uniform by construction, so partitions
    * balance); writing the result yields globally ordered training
    * shards. Per epoch that is one pass over the corpus — the minimum any
    * order-materializing shuffle pays. When only per-shard order matters,
    * `df.repartition(n, key).sortWithinPartitions(key, id)` drops the
    * range-partitioner sampling pass. */
  def shuffled(df: DataFrame, id: Column, epoch: Long = 0L,
               out: String = "shuffle_key"): DataFrame =
    df.withColumn(out, shuffleKey(id, epoch)).orderBy(col(out), id)

  /** [[shuffleKey]] as DuckDB SQL for the oracle. */
  def shuffleKeySql(idExpr: String, epoch: Long): String =
    mixSql(s"($idExpr) * 31 + $epoch")

  /** The raw portable mix as DuckDB SQL (the [[Sketches.portableMix]]
    * twin; [[bucketSql]] = this mod the split denominator). */
  def mixSql(idExpr: String): String =
    s"""xor(
       |  (CAST(1013904223 AS BIGINT) *
       |     xor(((CAST(1103515245 AS BIGINT) * (($idExpr) % 2147483647) + 12345) % 2147483647),
       |         ((CAST(1103515245 AS BIGINT) * (($idExpr) % 2147483647) + 12345) % 2147483647) >> 15)
       |   + 390451572) % 2147483647,
       |  ((CAST(1013904223 AS BIGINT) *
       |     xor(((CAST(1103515245 AS BIGINT) * (($idExpr) % 2147483647) + 12345) % 2147483647),
       |         ((CAST(1103515245 AS BIGINT) * (($idExpr) % 2147483647) + 12345) % 2147483647) >> 15)
       |   + 390451572) % 2147483647) >> 13)""".stripMargin

  /** The DuckDB recomputation of [[assignSplit]]'s bucket for the oracle:
    * same mix, same denominator — assignments match bit-for-bit. */
  def bucketSql(idExpr: String): String = s"(${mixSql(idExpr)}) % $D"

  /** The split-name CASE expression for the oracle (mirrors
    * [[assignSplit]]'s cumulative thresholds exactly). */
  def splitSql(idExpr: String, splits: Seq[(String, Double)]): String = {
    val cuts = splits.init.scanLeft(0L) { case (acc, (_, f)) => acc + math.round(f * D) }.tail
    val whens = splits.init.zip(cuts)
      .map { case ((name, _), cut) => s"WHEN ${bucketSql(idExpr)} < $cut THEN '$name'" }
      .mkString(" ")
    s"CASE $whens ELSE '${splits.last._1}' END"
  }
}
