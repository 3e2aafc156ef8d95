package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering for multi-dimensional locality.
  *
  * A 100 TB table queried by ranges on SEVERAL columns cannot be sorted to
  * serve them all — but it can be ordered along a space-filling curve:
  * interleaving the bits of the (bucketized) dimensions gives a single
  * sort key under which rows close in ANY dimension tend to land in the
  * same file/row-group, so min/max statistics prune scans for range
  * predicates on every interleaved column, not just the leading one. The
  * same trick orders multi-dim MDIO cell writes for chunk locality. Pure
  * bit arithmetic — the DuckDB oracle reproduces z-values exactly
  * ([[zvalueSql]]).
  */
object ZOrder {

  /** The Morton code of `cols`, `bits` low bits each (`bits * n <= 63`):
    * bit i of column j lands at position `i * n + j`. Callers pre-scale
    * values into [0, 2^bits) — out-of-range values wrap (the key is for
    * LOCALITY, so wrapping trades cluster quality, never correctness). */
  def zvalue(cols: Seq[Column], bits: Int): Column = {
    val n = cols.size
    require(n >= 1 && bits >= 1 && bits * n <= 63, s"need bits*cols <= 63, got $bits*$n")
    cols.zipWithIndex.map { case (c, j) =>
      val m = pmod(c.cast("long"), lit(1L << bits))
      (0 until bits).map { i =>
        shiftleft(shiftright(m, i).bitwiseAND(lit(1L)), i * n + j)
      }.reduce(_.bitwiseOR(_))
    }.reduce(_.bitwiseOR(_))
  }

  /** Rewrite `df` into `numPartitions` z-ordered partitions: range-
    * partition on the z-value, sort within partitions. Written out (e.g.
    * parquet), each file covers a compact z-range, so per-file min/max
    * stats are selective on EVERY interleaved column. One shuffle —
    * exactly what a plain global sort would cost. */
  def cluster(df: DataFrame, cols: Seq[Column], bits: Int,
              numPartitions: Int): DataFrame = {
    val z = zvalue(cols, bits)
    df.repartitionByRange(numPartitions, z).sortWithinPartitions(z)
  }

  /** The DuckDB recomputation of [[zvalue]] for the oracle: same
    * interleave, same wrap (SQL `%` is signed-remainder like pmod on the
    * nonneg values callers supply). */
  def zvalueSql(exprs: Seq[String], bits: Int): String = {
    val n = exprs.size
    exprs.zipWithIndex.flatMap { case (e, j) =>
      (0 until bits).map { i =>
        s"((((($e) % ${1L << bits}) >> $i) & 1) << ${i * n + j})"
      }
    }.mkString(" + ") // disjoint bit positions: + == OR
  }
}
