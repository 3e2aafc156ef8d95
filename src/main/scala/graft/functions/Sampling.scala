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

  /** The DuckDB recomputation of [[assignSplit]]'s bucket for the oracle:
    * same mix, same denominator — assignments match bit-for-bit. */
  def bucketSql(idExpr: String): String =
    s"""xor(
       |  (CAST(1013904223 AS BIGINT) *
       |     xor(((CAST(1103515245 AS BIGINT) * (($idExpr) % 2147483647) + 12345) % 2147483647),
       |         ((CAST(1103515245 AS BIGINT) * (($idExpr) % 2147483647) + 12345) % 2147483647) >> 15)
       |   + 390451572) % 2147483647,
       |  ((CAST(1013904223 AS BIGINT) *
       |     xor(((CAST(1103515245 AS BIGINT) * (($idExpr) % 2147483647) + 12345) % 2147483647),
       |         ((CAST(1103515245 AS BIGINT) * (($idExpr) % 2147483647) + 12345) % 2147483647) >> 15)
       |   + 390451572) % 2147483647) >> 13) % $D""".stripMargin

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
