package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Portable cardinality sketches.
  *
  * Spark's own `approx_count_distinct` is a fine HLL++ — but its hash and
  * register encoding are engine-internal, so its output can never be
  * verified against an independent engine. This module implements a plain
  * HyperLogLog (Flajolet et al. 2007) over a PORTABLE hash whose every step
  * is exact integer / dyadic-rational arithmetic, reproducible bit-for-bit
  * in any engine with 64-bit integers (the DuckDB oracle recomputes it from
  * scratch in SQL and the estimates hash-match).
  *
  * Scale shape: registers are `MAX` per (keys, bucket) — a two-level
  * codegen hash aggregate with map-side partial combine. Shuffle volume is
  * capped at 2^p rows per group per mapper regardless of input size, and
  * the register merge (MAX) is associative/commutative, so the sketch is
  * mergeable across partitions, stages, or incremental runs by
  * construction. No UDAF, no object hash aggregate — the whole pipeline
  * stays in whole-stage codegen.
  *
  * Reference surface: mdio-cpp exposes summary statistics over huge arrays
  * (mdio/stats.h histogram/summary machinery); distinct-cardinality at
  * 100 TB needs the same one-pass, fixed-state treatment — exact distinct
  * would shuffle every value.
  */
object Sketches {

  /** Mersenne prime 2^31-1: products of two residues fit in a Long, so the
    * chain never overflows — the property that makes the hash portable to
    * engines (DuckDB) whose BIGINT arithmetic throws on overflow rather
    * than wrapping.
    */
  private val M = 2147483647L

  /** Two rounds of (affine mod M, xor-shift). The xor-shift between the
    * affine rounds breaks the arithmetic-progression structure that a pure
    * LCG chain preserves (sequential keys hash to an AP, which biases
    * trailing-zero ranks); two rounds measure ≤ ~5% HLL error at p=8
    * across 2e2..1e5 cardinalities, within the 1.04/sqrt(m) theory bound.
    */
  def portableMix(v: Column): Column = {
    val h0 = (lit(1103515245L) * (v % M) + lit(12345L)) % M
    val h1 = h0.bitwiseXOR(shiftright(h0, 15))
    val h2 = (lit(1013904223L) * h1 + lit(390451572L)) % M
    h2.bitwiseXOR(shiftright(h2, 13))
  }

  /** HLL distinct-count estimate of `value` per `keys` group.
    *
    * p register-index bits (m = 2^p registers, standard error
    * 1.04/sqrt(m)); the remaining 31-p hash bits feed the rank. The rank
    * is the trailing-zero count + 1, tracked as the lowest-set-bit VALUE
    * (a power of two) so `MAX` orders registers and `1/(2*maxl)` yields
    * the exact dyadic 2^-rank — every partial sum is an exact double, so
    * the estimate is independent of aggregation order. Small-range
    * correction (linear counting) below 2.5m follows the paper; its `ln`
    * is the one non-exact step, absorbed by rounding to 4 decimals.
    */
  def hllDistinct(df: DataFrame, keys: Seq[String], value: Column,
                  p: Int = 8, out: String = "hll_distinct"): DataFrame =
    hllFinalize(hllRegisters(df, keys, value, p), keys, p, out)

  /** The MERGEABLE half of [[hllDistinct]]: the (keys, bucket) → max-low-bit
    * register table. This is the state a live system maintains — registers
    * merge by MAX across partitions, days, or micro-batches (the streaming
    * sketch-maintenance query keeps exactly this aggregation as its
    * stateful operator: fixed 2^p rows per group, no watermark needed). */
  def hllRegisters(df: DataFrame, keys: Seq[String], value: Column,
                   p: Int = 8): DataFrame = {
    require(p >= 4 && p <= 16, s"p must be in [4,16], got $p")
    val m = 1 << p
    val h = portableMix(value.cast("long"))
    val t = shiftright(h, p) // 31-p rank bits, decorrelated from the bucket
    val lowbit = when(t === 0L, lit(1L << (31 - p)))
      .otherwise(t.bitwiseAND(-t))
    val keyCols = keys.map(col)
    df.select(keyCols :+ (h % m).as("__bucket") :+ lowbit.as("__l"): _*)
      .groupBy(keyCols :+ col("__bucket"): _*)
      .agg(max(col("__l")).as("__maxl"))
  }

  /** The read-side fold of [[hllDistinct]]: registers → estimate. */
  def hllFinalize(regs: DataFrame, keys: Seq[String], p: Int = 8,
                  out: String = "hll_distinct"): DataFrame = {
    val m = 1 << p
    val keyCols = keys.map(col)
    val alpha = 0.7213 / (1.0 + 1.079 / m.toDouble)
    regs
      .groupBy(keyCols: _*)
      .agg(count(lit(1)).as("__present"),
        sum(lit(1.0) / (lit(2.0) * col("__maxl"))).as("__sump"))
      .withColumn("__zeros", lit(m.toLong) - col("__present"))
      .withColumn("__raw",
        lit(alpha) * lit(m.toDouble * m) / (col("__sump") + (lit(m.toLong) - col("__present"))))
      .withColumn(out,
        round(when(col("__raw") <= lit(2.5 * m) && col("__zeros") > 0,
          lit(m.toDouble) * log(lit(m.toDouble) / col("__zeros")))
          .otherwise(col("__raw")), 4))
      .select(keyCols :+ col(out): _*)
  }

  /** Row-seeded portable bucket for the count-min sketch: an affine
    * re-seed of [[portableMix]] per sketch row ((2r+1)·h + r·c mod M,
    * the minhash_poly family shape), folded to `width` buckets. All
    * integer, overflow-free (h < 2^31, 2r+1 ≤ 2·depth+1), bit-equal in
    * any 64-bit-integer engine. */
  private def cmBucket(h: Column, r: Int, width: Int): Column =
    ((lit(2L * r + 1) * h + lit(r.toLong * 1013904223L)) % M) % width

  /** Count-min sketch (Cormode & Muthukrishnan 2005) of `value`
    * frequencies per `keys` group, AS A TABLE: one row per
    * (keys, sketch row, bucket) with its collision-summed count.
    *
    * Scale shape: `depth` hashed copies per input row, then ONE hash
    * aggregate — shuffle volume is capped at depth·width rows per group
    * per mapper regardless of input size, and counters merge by SUM, so
    * sketches from different partitions, days, or incremental runs
    * combine with a further groupBy-sum. Point-frequency estimates
    * ([[cmEstimate]]) read min over rows; estimates only ever
    * OVER-count (by ≤ e·N/width with prob 1-(1/e)^depth), never under.
    * A 100 TB frequency table this way is depth·width counters, not a
    * distinct-count shuffle. */
  def countMin(df: DataFrame, keys: Seq[String], value: Column,
               depth: Int = 4, width: Int = 1024,
               weight: Column = lit(1L)): DataFrame = {
    require(depth >= 1 && depth <= 16, s"depth in [1,16], got $depth")
    require(width >= 2, s"width >= 2, got $width")
    val keyCols = keys.map(col)
    val h = portableMix(value.cast("long"))
    df.select(keyCols :+ h.as("__h") :+ weight.cast("long").as("__w"): _*)
      .select(keyCols :+ col("__h") :+ col("__w") :+
        explode(array((0 until depth).map(lit(_)): _*)).as("__r"): _*)
      .withColumn("__bucket",
        (0 until depth).foldLeft(lit(-1L)) { (acc, r) =>
          when(col("__r") === r, cmBucket(col("__h"), r, width)).otherwise(acc)
        })
      .groupBy(keyCols :+ col("__r") :+ col("__bucket"): _*)
      // weight defaults to 1 (plain frequency); a weight column (token
      // counts, bytes) makes this a weighted-frequency sketch — same
      // one-sided guarantee, since weights are nonnegative
      .agg(sum(col("__w")).as("__cnt"))
  }

  /** Point-frequency estimates from an ungrouped [[countMin]] sketch for
    * the given probe values: min over sketch rows, 0 for never-seen
    * buckets. Probe buckets are computed driver-side with the SAME
    * integer arithmetic as the sketch (the sketch is tiny; the probe
    * join broadcasts). For a grouped sketch, filter to one group first —
    * a right join cannot carry group keys for absent buckets. */
  def cmEstimate(sketch: DataFrame, probes: Seq[Long],
                 depth: Int = 4, width: Int = 1024,
                 out: String = "cm_est"): DataFrame = {
    val spark = sketch.sparkSession
    import spark.implicits._
    def mixScala(v: Long): Long = {
      val h0 = (1103515245L * (v % M) + 12345L) % M
      val h1 = h0 ^ (h0 >> 15)
      val h2 = (1013904223L * h1 + 390451572L) % M
      h2 ^ (h2 >> 13)
    }
    val rows = for { p <- probes; r <- 0 until depth } yield
      (p, r, ((2L * r + 1) * mixScala(p) + r.toLong * 1013904223L) % M % width)
    val probeDf = rows.toDF("__probe", "__r", "__bucket")
    sketch
      .join(broadcast(probeDf), Seq("__r", "__bucket"), "right")
      .groupBy(col("__probe"))
      .agg(min(coalesce(col("__cnt"), lit(0L))).as(out))
  }

  /** [[cmEstimate]] for a GROUPED sketch: estimates per (group, probe),
    * including zero rows for (group, probe) pairs whose buckets were
    * never touched — built by crossing the sketch's distinct group keys
    * with the probe set (both tiny) and left-joining the counters. */
  def cmEstimateGrouped(sketch: DataFrame, keys: Seq[String], probes: Seq[Long],
                        depth: Int = 4, width: Int = 1024,
                        out: String = "cm_est"): DataFrame = {
    require(keys.nonEmpty, "use cmEstimate for an ungrouped sketch")
    val spark = sketch.sparkSession
    import spark.implicits._
    def mixScala(v: Long): Long = {
      val h0 = (1103515245L * (v % M) + 12345L) % M
      val h1 = h0 ^ (h0 >> 15)
      val h2 = (1013904223L * h1 + 390451572L) % M
      h2 ^ (h2 >> 13)
    }
    val rows = for { p <- probes; r <- 0 until depth } yield
      (p, r, ((2L * r + 1) * mixScala(p) + r.toLong * 1013904223L) % M % width)
    val probeDf = rows.toDF("__probe", "__r", "__bucket")
    val keyCols = keys.map(col)
    sketch.select(keyCols: _*).distinct()
      .crossJoin(broadcast(probeDf))
      .join(sketch, keys ++ Seq("__r", "__bucket"), "left")
      .groupBy(keyCols :+ col("__probe"): _*)
      .agg(min(coalesce(col("__cnt"), lit(0L))).as(out))
  }

  /** The DuckDB recomputation of [[countMin]]+[[cmEstimate]] for the
    * oracle: the same mix, the same row-seeded buckets, the same
    * sketch-then-min — bit-exact (pure integer arithmetic). */
  def cmEstimateSql(table: String, valueExpr: String, probes: Seq[Long],
                    depth: Int = 4, width: Int = 1024,
                    out: String = "cm_est"): String = {
    val probeList = probes.mkString(", ")
    s"""
    WITH m1 AS (
      SELECT ((CAST(1103515245 AS BIGINT) * (($valueExpr) % 2147483647) + 12345) % 2147483647) AS a
      FROM $table
    ), m2 AS (
      SELECT (CAST(1013904223 AS BIGINT) * xor(a, a >> 15) + 390451572) % 2147483647 AS c FROM m1
    ), h AS (
      SELECT xor(c, c >> 13) AS h FROM m2
    ), sketch AS (
      SELECT r, ((CAST(2*r+1 AS BIGINT) * h + CAST(r AS BIGINT) * 1013904223) % 2147483647) % $width AS bucket,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM h CROSS JOIN (SELECT unnest(range($depth)) AS r)
      GROUP BY r, bucket
    ), pm1 AS (
      SELECT p, ((CAST(1103515245 AS BIGINT) * (p % 2147483647) + 12345) % 2147483647) AS a
      FROM (SELECT unnest([$probeList]) AS p)
    ), pm2 AS (
      SELECT p, (CAST(1013904223 AS BIGINT) * xor(a, a >> 15) + 390451572) % 2147483647 AS c FROM pm1
    ), ph AS (
      SELECT p, xor(c, c >> 13) AS h FROM pm2
    ), probes AS (
      SELECT p, r, ((CAST(2*r+1 AS BIGINT) * h + CAST(r AS BIGINT) * 1013904223) % 2147483647) % $width AS bucket
      FROM ph CROSS JOIN (SELECT unnest(range($depth)) AS r)
    )
    SELECT probes.p AS __probe,
           CAST(MIN(COALESCE(sketch.cnt, 0)) AS BIGINT) AS $out
    FROM probes LEFT JOIN sketch ON probes.r = sketch.r AND probes.bucket = sketch.bucket
    GROUP BY probes.p"""
  }

  /** Histogram-CDF quantile estimates per `keys` group: count values into
    * `bins` uniform buckets over [lo, lo + bins*width) (outliers clamp to
    * the edge bins, the [[graft.operators.MdioStats]] convention), then
    * for each requested quantile q report the UPPER EDGE of the first
    * bucket whose cumulative count reaches ceil(q*n). Resolution is
    * `width`; everything else is exact integer counting plus one shared
    * IEEE edge expression — so unlike `percentile_approx` (whose KLL-ish
    * state is engine-internal) the approximate answer itself is
    * reproducible bit-for-bit in the DuckDB oracle ([[histQuantilesSql]]).
    * Mergeable by construction: bucket counts SUM across partitions,
    * days, or incremental runs. One codegen hash aggregate of at most
    * `bins` rows per group per mapper — the fixed-state one-pass shape a
    * 100 TB quantile needs. */
  def histQuantiles(df: DataFrame, keys: Seq[String], value: Column,
                    lo: Double, width: Double, bins: Int,
                    qs: Seq[Double], out: String = "q_est"): DataFrame = {
    require(bins >= 1 && width > 0 && qs.nonEmpty && qs.forall(q => q > 0 && q <= 1))
    val spark = df.sparkSession
    import spark.implicits._
    val keyCols = keys.map(col)
    val bucket = least(greatest(floor((value.cast("double") - lit(lo)) / lit(width)), lit(0L))
      .cast("long"), lit(bins.toLong - 1))
    val counts = df.select(keyCols :+ bucket.as("__b"): _*)
      .groupBy(keyCols :+ col("__b"): _*)
      .agg(count(lit(1)).as("__c"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols: _*).orderBy(col("__b"))
    val cum = counts
      .withColumn("__cum", sum(col("__c")).over(w))
      .withColumn("__n", sum(col("__c")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(keyCols: _*)))
    // attach the quantile probes by exploding a literal array — a pure
    // projection, not a (nested-loop) join against a literal table
    cum.withColumn("__q", explode(array(qs.map(lit(_)): _*)))
      .filter(col("__cum") >= ceil(col("__q") * col("__n")).cast("long"))
      .groupBy(keyCols :+ col("__q"): _*)
      .agg(min(col("__b")).as("__qb"))
      .withColumn(out, lit(lo) + (col("__qb") + lit(1L)).cast("double") * lit(width))
      .select(keyCols :+ col("__q") :+ col(out): _*)
  }

  /** The DuckDB recomputation of [[histQuantiles]] for the oracle. */
  def histQuantilesSql(table: String, keys: Seq[String], valueExpr: String,
                       lo: Double, width: Double, bins: Int,
                       qs: Seq[Double], out: String = "q_est"): String = {
    val ks = keys.mkString(", ")
    val kq = if (keys.isEmpty) "" else s"$ks, "
    val qList = qs.mkString(", ")
    s"""
    WITH b AS (
      SELECT $kq LEAST(GREATEST(CAST(FLOOR((CAST($valueExpr AS DOUBLE) - CAST($lo AS DOUBLE)) / CAST($width AS DOUBLE)) AS BIGINT), 0), ${bins - 1}) AS bk
      FROM $table
    ), c AS (
      SELECT $kq bk, CAST(COUNT(*) AS BIGINT) AS cnt FROM b GROUP BY ${if (keys.isEmpty) "bk" else s"$ks, bk"}
    ), cum AS (
      SELECT $kq bk, cnt,
             CAST(SUM(cnt) OVER (${if (keys.isEmpty) "ORDER BY bk" else s"PARTITION BY $ks ORDER BY bk"}) AS BIGINT) AS cum,
             CAST(SUM(cnt) OVER (${if (keys.isEmpty) "" else s"PARTITION BY $ks"}) AS BIGINT) AS n
      FROM c
    )
    SELECT $kq __q, CAST($lo AS DOUBLE) + CAST(qb + 1 AS DOUBLE) * CAST($width AS DOUBLE) AS $out
    FROM (
      SELECT $kq __q, MIN(bk) AS qb
      FROM cum CROSS JOIN (SELECT unnest([$qList]) AS __q)
      WHERE cum >= CAST(CEIL(__q * n) AS BIGINT)
      GROUP BY ${if (keys.isEmpty) "__q" else s"$ks, __q"}
    ) t"""
  }

  /** The DuckDB recomputation of [[hllDistinct]] for the oracle. Kept
    * adjacent to the Spark arithmetic so the two stay in lockstep.
    */
  def hllDistinctSql(table: String, keys: Seq[String], valueExpr: String,
                     p: Int = 8, out: String = "hll_distinct"): String = {
    val m = 1 << p
    val ks = keys.mkString(", ")
    s"""
    WITH m1 AS (
      SELECT $ks, ((CAST(1103515245 AS BIGINT) * (($valueExpr) % 2147483647) + 12345) % 2147483647) AS a
      FROM $table
    ), m2 AS (
      SELECT $ks, (CAST(1013904223 AS BIGINT) * xor(a, a >> 15) + 390451572) % 2147483647 AS c FROM m1
    ), h AS (
      SELECT $ks, xor(c, c >> 13) AS h FROM m2
    ), reg AS (
      SELECT $ks, h % $m AS bucket,
             MAX(CASE WHEN (h >> $p) = 0 THEN ${1L << (31 - p)}
                      ELSE (h >> $p) & (-(h >> $p)) END) AS maxl
      FROM h GROUP BY $ks, bucket
    ), est AS (
      SELECT $ks, COUNT(*) AS present,
             SUM(CAST(1.0 AS DOUBLE) / (CAST(2.0 AS DOUBLE) * maxl)) AS sump
      FROM reg GROUP BY $ks
    )
    SELECT $ks,
           ROUND(CASE WHEN raw <= ${2.5 * m}e0 AND zeros > 0
                      THEN ${m}e0 * LN(${m}e0 / zeros) ELSE raw END, 4) AS $out
    FROM (
      SELECT $ks,
             (0.7213e0 / (1.0e0 + 1.079e0 / ${m}e0)) * ${m.toLong * m}e0 / (sump + ($m - present)) AS raw,
             $m - present AS zeros
      FROM est
    ) t"""
  }
}
