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

  /** HILBERT-curve index of the 2-D points in columns `x`, `y` (each in
    * [0, 2^order)), appended as column `hd` — the locality upgrade over
    * [[zvalue]]: the Hilbert curve has no Morton "seams" (consecutive
    * indices are ALWAYS grid neighbors), so range scans over the sort key
    * touch tighter bounding boxes. The classic xy2d walk is a per-level
    * state update (quadrant digit + rotation), which a single Column
    * expression can't iterate without 4^order subtree blowup — instead
    * each level is ONE narrow projection over named columns (`hx`, `hy`,
    * `hd`), and the `order` chained selects fuse into a single codegen
    * stage. Integer-exact; the oracle replays the identical chain as
    * generated CTEs ([[hilbertSql]]). */
  def hilbertD(df: DataFrame, x: Column, y: Column, order: Int): DataFrame = {
    require(order >= 1 && 2 * order <= 62, s"need 1 <= order <= 31, got $order")
    var cur = df.withColumn("hx", pmod(x.cast("long"), lit(1L << order)))
      .withColumn("hy", pmod(y.cast("long"), lit(1L << order)))
      .withColumn("hd", lit(0L))
    val keep = df.columns.map(col)
    for (lev <- (order - 1) to 0 by -1) {
      val s = 1L << lev
      val rx = col("hx").bitwiseAND(lit(s)) > 0
      val ry = col("hy").bitwiseAND(lit(s)) > 0
      val quad = when(!rx && !ry, lit(0L)).when(!rx && ry, lit(1L))
        .when(rx && !ry, lit(3L)).otherwise(lit(2L))
      val nx = when(ry, col("hx")).when(rx, lit(s - 1) - col("hy")).otherwise(col("hy"))
      val ny = when(ry, col("hy")).when(rx, lit(s - 1) - col("hx")).otherwise(col("hx"))
      cur = cur.select(keep :+ nx.as("hx") :+ ny.as("hy") :+
        (col("hd") + lit(s * s) * quad).as("hd"): _*)
    }
    cur.select(keep :+ col("hd"): _*)
  }

  /** The oracle's replay of [[hilbertD]]: `order` generated CTEs, one per
    * curve level, over a source relation exposing `hx`, `hy`, `hd` (= 0)
    * and any carried columns. Returns (cteChain, finalCteName). */
  def hilbertSql(srcCte: String, carry: Seq[String], order: Int): (String, String) = {
    val carryCols = if (carry.isEmpty) "" else carry.mkString("", ", ", ", ")
    val levels = ((order - 1) to 0 by -1).zipWithIndex.map { case (lev, i) =>
      val s = 1L << lev
      val prev = if (i == 0) srcCte else s"hl${i - 1}"
      s"""hl$i AS (
      SELECT $carryCols
             CASE WHEN (hy & $s) > 0 THEN hx
                  WHEN (hx & $s) > 0 THEN ${s - 1} - hy ELSE hy END AS hx,
             CASE WHEN (hy & $s) > 0 THEN hy
                  WHEN (hx & $s) > 0 THEN ${s - 1} - hx ELSE hx END AS hy,
             hd + ${s * s} * (CASE WHEN (hx & $s) = 0 AND (hy & $s) = 0 THEN 0
                                   WHEN (hx & $s) = 0 THEN 1
                                   WHEN (hy & $s) = 0 THEN 3 ELSE 2 END) AS hd
      FROM $prev)"""
    }
    (levels.mkString(",\n    "), s"hl${order - 1}")
  }
}
