package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-6 continuation: the experiment-analysis / time-series layer a
  * production data platform runs on top of the engine — parametric and
  * rank-based two-sample tests (the A/B-test readout pair to the existing
  * chi-square and KS entries), exponentially-weighted smoothing, and
  * calendar-free seasonality profiling.
  *
  * Numeric discipline is the package standard (see [[queries]] scaladoc):
  * counts and decimal-exact sums come out of the aggregation; every
  * downstream scalar (mean, variance, t, z, index) is a fixed chain of
  * IEEE exact-rounded ops on those identical inputs, so both engines
  * produce bit-identical doubles and every query sits on the DuckDB hash
  * oracle with NO tolerance.
  */
object Relational7 {

  /** Same floor-quantized order-independent double sum as Relational6
    * (see the [[Relational6]] scaladoc for why decimal casts are not
    * enough for COMPUTED doubles). */
  private def qsum(c: Column, scale: Double): Column =
    sum(floor(c * scale + 0.5)).cast("double") / scale
  private def sqlQsum(e: String, scale: String): String =
    s"CAST(SUM(CAST(floor(($e) * $scale + 0.5) AS BIGINT)) AS DOUBLE) / $scale"

  // ---------------------------------------------------------------------
  // WELCH'S TWO-SAMPLE T-TEST — the standard unequal-variance A/B-test
  // readout. One conditional-aggregation pass over the fact table (no
  // join, no second scan): n / Σx / Σx² per arm, then mean, sample
  // variance, t, and the Welch–Satterthwaite degrees of freedom as pure
  // scalar arithmetic on the exact aggregates. At 100 TB this is one
  // map-side-combined scan producing a single row — the cheapest possible
  // distribution shape for the statistic.
  // ---------------------------------------------------------------------

  /** Core of the Welch test over any (value, arm) frame — reused by the
    * randomized differential spec. `x` must live on the decimal grid. */
  def welchTtest(df: DataFrame, x: Column, a: Column): DataFrame = {
    val agg = df.agg(
      sum(when(a, 1L).otherwise(0L)).as("n_a"),
      sum(when(!a, 1L).otherwise(0L)).as("n_b"),
      sum(when(a, x.cast("decimal(27,6)"))).cast("double").as("s_a"),
      sum(when(!a, x.cast("decimal(27,6)"))).cast("double").as("s_b"),
      sum(when(a, (x * x).cast("decimal(30,6)"))).cast("double").as("ss_a"),
      sum(when(!a, (x * x).cast("decimal(30,6)"))).cast("double").as("ss_b"))
    val na = col("n_a").cast("double"); val nb = col("n_b").cast("double")
    val ma = col("s_a") / na; val mb = col("s_b") / nb
    // sample variance from exact sums: (Σx² − (Σx)²/n) / (n−1); every op
    // is one exact-rounded IEEE operation on engine-identical inputs
    val va = (col("ss_a") - col("s_a") * col("s_a") / na) / (na - 1)
    val vb = (col("ss_b") - col("s_b") * col("s_b") / nb) / (nb - 1)
    val sea = va / na; val seb = vb / nb
    val se2 = sea + seb
    agg.select(
      col("n_a"), col("n_b"),
      ma.as("mean_a"), mb.as("mean_b"),
      // the t/dof chains associate differently at the last ulp across
      // engine compilers on some data shapes (dof at sf0.01 lineitem;
      // t on the per-customer metric) — both derived statistics are
      // floor-quantized at 1e-6 like every computed-double aggregate
      (floor((ma - mb) / sqrt(se2) * 1e6 + 0.5) / 1e6).as("t_stat"),
      (floor(se2 * se2 / (sea * sea / (na - 1) + seb * seb / (nb - 1)) * 1e6 + 0.5) / 1e6)
        .as("dof"))
  }

  val qAggTtest: Q = (s, d) =>
    // filter below the spread (keeps parquet pushdown), then widen the
    // single-split scan for the decimal moment sums
    welchTtest(graft.functions.Spread.byKeyIfNarrow(
        lineitem(s, d).filter(col("l_returnflag").isin("R", "A"))
          .select(col("l_returnflag"), col("l_extendedprice"), col("l_orderkey")),
        col("l_orderkey")),
      col("l_extendedprice"), col("l_returnflag") === "R")

  val qAggTtestSql: String = """
    WITH agg AS (
      SELECT
        CAST(count_if(l_returnflag = 'R') AS BIGINT) AS n_a,
        CAST(count_if(l_returnflag = 'A') AS BIGINT) AS n_b,
        CAST(SUM(CASE WHEN l_returnflag = 'R'
                 THEN CAST(l_extendedprice AS DECIMAL(27,6)) END) AS DOUBLE) AS s_a,
        CAST(SUM(CASE WHEN l_returnflag = 'A'
                 THEN CAST(l_extendedprice AS DECIMAL(27,6)) END) AS DOUBLE) AS s_b,
        CAST(SUM(CASE WHEN l_returnflag = 'R'
                 THEN CAST(l_extendedprice * l_extendedprice AS DECIMAL(30,6)) END)
             AS DOUBLE) AS ss_a,
        CAST(SUM(CASE WHEN l_returnflag = 'A'
                 THEN CAST(l_extendedprice * l_extendedprice AS DECIMAL(30,6)) END)
             AS DOUBLE) AS ss_b
      FROM lineitem WHERE l_returnflag IN ('R', 'A'))
    SELECT n_a, n_b,
           s_a / na AS mean_a, s_b / nb AS mean_b,
           floor((s_a / na - s_b / nb) / sqrt(va / na + vb / nb) * 1e6 + 0.5) / 1e6
             AS t_stat,
           floor((va / na + vb / nb) * (va / na + vb / nb) /
             ((va / na) * (va / na) / (na - 1) + (vb / nb) * (vb / nb) / (nb - 1))
             * 1e6 + 0.5) / 1e6 AS dof
    FROM (SELECT *,
            CAST(n_a AS DOUBLE) AS na, CAST(n_b AS DOUBLE) AS nb,
            (ss_a - s_a * s_a / CAST(n_a AS DOUBLE)) / (CAST(n_a AS DOUBLE) - 1) AS va,
            (ss_b - s_b * s_b / CAST(n_b AS DOUBLE)) / (CAST(n_b AS DOUBLE) - 1) AS vb
          FROM agg) t"""

  // ---------------------------------------------------------------------
  // MANN–WHITNEY U — the rank-based (distribution-free) two-sample test,
  // with the normal approximation's tie-corrected z. Spark-first shape:
  // ranks are NEVER assigned per row — the value domain is grouped first
  // (l_quantity has ~50 distinct values), so the rank computation is a
  // window over the DISTINCT-VALUE table, not over the fact table. At
  // 100 TB the per-value aggregate is one map-side-combined scan and the
  // windowed rank table stays driver-tiny regardless of row count —
  // the textbook per-row rank() implementation would shuffle the entire
  // fact table into one ordered partition.
  // Average midrank for a tied block: (# below) + (block + 1)/2 — exact
  // half-integer arithmetic, summed through decimal (half-integers are
  // on the decimal grid, so dsum is exact).
  // ---------------------------------------------------------------------

  /** Core of the U test over any (value, arm) frame — reused by the
    * randomized differential spec. `v` must be exactly representable
    * (integer/decimal-grid); `isA` marks the first sample. */
  def mannWhitneyU(df: DataFrame, v: Column, isA: Column): DataFrame = {
    val byVal = df.groupBy(v.as("v"))
      .agg(sum(when(isA, 1L).otherwise(0L)).as("c_a"),
           count(lit(1)).as("c_all"))
    val w = Window.orderBy(col("v")).rowsBetween(Window.unboundedPreceding, -1)
    val ranked = byVal.withColumn("below", coalesce(sum(col("c_all")).over(w), lit(0L)))
      .withColumn("midrank",
        col("below").cast("double") + (col("c_all") + 1).cast("double") / 2.0)
    val agg = ranked.agg(
      sum(col("c_a")).as("n_a"),
      sum(col("c_all") - col("c_a")).as("n_b"),
      sum((col("c_a").cast("double") * col("midrank")).cast("decimal(27,6)"))
        .cast("double").as("r_a"),
      // tie term Σ(c³−c) through decimal: a BIGINT cube wraps silently
      // (non-ANSI) once a tie block passes ~2.1e6 rows — at 100 TB a
      // 50-distinct-value column has ~1e10-row blocks. (13,0)³ caps at
      // (38,0): exact to c ≤ 4.6e12 per block / Σ ≤ 1e38, and overflow
      // past that is a LOUD null, never a wrapped statistic
      sum({
        val c = col("c_all").cast("decimal(13,0)")
        c * c * c - c
      }).as("ties"))
    val na = col("n_a").cast("double"); val nb = col("n_b").cast("double")
    val nn = na + nb
    val u = col("r_a") - na * (na + 1) / 2.0
    val mu = na * nb / 2.0
    val sigma = sqrt(na * nb / 12.0 *
      ((nn + 1) - col("ties").cast("double") / (nn * (nn - 1))))
    // sigma = 0 iff every pooled value ties (the correction cancels
    // (nn+1) exactly) — z is undefined there, surfaced as NULL instead
    // of an ANSI divide-by-zero
    agg.select(col("n_a"), col("n_b"), u.as("u_stat"),
      when(sigma > 0, floor((u - mu) / sigma * 1e6 + 0.5) / 1e6).as("z_stat"))
  }

  val qAggMannWhitney: Q = (s, d) =>
    mannWhitneyU(lineitem(s, d).filter(col("l_linestatus").isin("O", "F")),
      col("l_quantity"), col("l_linestatus") === "O")

  val qAggMannWhitneySql: String = """
    WITH byval AS (
      SELECT l_quantity AS v,
             CAST(count_if(l_linestatus = 'O') AS BIGINT) AS c_a,
             CAST(COUNT(*) AS BIGINT) AS c_all
      FROM lineitem WHERE l_linestatus IN ('O', 'F') GROUP BY 1),
    ranked AS (
      SELECT c_a, c_all,
             CAST(COALESCE(SUM(c_all) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS DOUBLE)
               + CAST(c_all + 1 AS DOUBLE) / 2.0 AS midrank
      FROM byval),
    agg AS (
      SELECT CAST(SUM(c_a) AS BIGINT) AS n_a,
             CAST(SUM(c_all - c_a) AS BIGINT) AS n_b,
             CAST(SUM(CAST(CAST(c_a AS DOUBLE) * midrank AS DECIMAL(27,6))) AS DOUBLE) AS r_a,
             CAST(SUM(CAST(c_all AS HUGEINT) * c_all * c_all - c_all) AS DOUBLE) AS ties
      FROM ranked)
    SELECT n_a, n_b,
           r_a - na * (na + 1) / 2.0 AS u_stat,
           CASE WHEN sqrt(na * nb / 12.0 *
                  ((na + nb + 1) - ties / ((na + nb) * (na + nb - 1)))) > 0
                THEN floor((r_a - na * (na + 1) / 2.0 - na * nb / 2.0) /
                  sqrt(na * nb / 12.0 *
                       ((na + nb + 1) - ties / ((na + nb) * (na + nb - 1))))
                  * 1e6 + 0.5) / 1e6
           END AS z_stat
    FROM (SELECT *, CAST(n_a AS DOUBLE) AS na, CAST(n_b AS DOUBLE) AS nb FROM agg) t"""

  // ---------------------------------------------------------------------
  // TRUNCATED EWMA — exponentially-weighted smoothing of a per-key daily
  // series, the feature-engineering step behind every "recent activity"
  // signal. α = 1/2 truncated at 8 lags: the weights are exact powers of
  // two, so every product is ONE exact-rounded IEEE op (in fact exact —
  // power-of-two scaling only shifts the exponent) and the 8-term
  // numerator is a fixed left-to-right chain, identical in both engines.
  // Head-of-series positions renormalize by the PRESENT weights (the
  // standard adjusted EWMA), via the same case-guarded chain.
  // Spark-first: one groupBy (daily totals), one window partitioned by
  // key with 8 lag() taps — no self-join, no explode; at 100 TB the
  // state per key is 8 doubles.
  // ---------------------------------------------------------------------

  val qWindowEwma: Q = (s, d) => {
    // spread the single-split scan by the grouping/window key k: ONE
    // exchange then serves the daily aggregation AND the per-key window
    // (hash(k) satisfies both distributions), and the aggregation runs
    // on all cores instead of the scan's lone split (r19; the old plan
    // spent ~1.1 s in a one-effective-task partial aggregate)
    val daily = graft.functions.Spread.byKeyIfNarrow(
        lineitem(s, d).select(col("l_suppkey").as("k"),
          expr("datediff(l_shipdate, date'1992-01-01')").as("day"),
          col("l_quantity")),
        col("k"))
      .groupBy(col("k"), col("day"))
      .agg(dsum(col("l_quantity")).as("v"))
    val w = Window.partitionBy(col("k")).orderBy(col("day"))
    // each lag tap evaluated ONCE (num and den both reference it; inlining
    // both chains extracted 14 window buffers where 7 suffice)
    val lagged = daily.select(col("k") +: col("day") +: col("v") +:
      (1 until 8).map(j => lag(col("v"), j).over(w).as(s"__l$j")): _*)
    val taps = (0 until 8).map { j =>
      val c = if (j == 0) col("v") else col(s"__l$j")
      (c, math.pow(0.5, j))
    }
    val num = taps.map { case (c, wt) => when(c.isNotNull, c * wt).otherwise(lit(0.0)) }
      .reduceLeft(_ + _)
    val den = taps.map { case (c, wt) => when(c.isNotNull, lit(wt)).otherwise(lit(0.0)) }
      .reduceLeft(_ + _)
    lagged.withColumn("ewma", num / den)
      .groupBy((col("k") % 100).as("bucket"))
      .agg(count(lit(1)).as("n_days"), qsum(col("ewma"), 1e6).as("sum_ewma"))
      .orderBy(col("bucket"))
  }

  val qWindowEwmaSql: String = {
    val lagN = (j: Int) =>
      if (j == 0) "v" else s"LAG(v, $j) OVER (PARTITION BY k ORDER BY day)"
    val num = (0 until 8).map { j =>
      s"CASE WHEN ${lagN(j)} IS NOT NULL THEN ${lagN(j)} * ${math.pow(0.5, j)} ELSE 0.0 END"
    }.mkString(" + ")
    val den = (0 until 8).map { j =>
      s"CASE WHEN ${lagN(j)} IS NOT NULL THEN ${math.pow(0.5, j)} ELSE 0.0 END"
    }.mkString(" + ")
    s"""
    WITH daily AS (
      SELECT l_suppkey AS k, datediff('day', DATE '1992-01-01', l_shipdate) AS day,
             ${sqlDsum("l_quantity")} AS v
      FROM lineitem GROUP BY 1, 2),
    sm AS (SELECT k, ($num) / ($den) AS ewma FROM daily)
    SELECT k % 100 AS bucket, CAST(COUNT(*) AS BIGINT) AS n_days,
           ${sqlQsum("ewma", "1e6")} AS sum_ewma
    FROM sm GROUP BY 1 ORDER BY 1"""
  }

  // ---------------------------------------------------------------------
  // SEASONALITY PROFILE — multiplicative (day-of-week × hour-of-day)
  // seasonal indices over the event stream: bucket mean ÷ global mean.
  // Calendar-free bucketing (epoch-day mod 7, epoch-hour mod 24) keeps
  // the arithmetic integer and engine-portable — no timezone/locale
  // dayofweek() semantics to reconcile. One conditional-aggregation scan
  // + a broadcast one-row global — at any scale this is two map-side-
  // combined passes over the same shuffle-free scan shape.
  // ---------------------------------------------------------------------

  val qEventsSeasonality: Q = (s, d) => {
    val ev = events(s, d).select(
      (expr("unix_micros(ts) div 86400000000") % 7).as("dow"),
      (expr("unix_micros(ts) div 3600000000") % 24).as("hod"),
      col("value"))
    val buckets = ev.groupBy(col("dow"), col("hod"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("s"))
    val overall = ev.agg(count(lit(1)).as("gn"), dsum(col("value")).as("gs"))
    buckets.crossJoin(broadcast(overall))
      .select(col("dow"), col("hod"), col("n_events"),
        ((col("s") / col("n_events").cast("double")) /
         (col("gs") / col("gn").cast("double"))).as("seasonal_idx"))
      .orderBy(col("dow"), col("hod"))
  }

  val qEventsSeasonalitySql: String = s"""
    WITH ev AS (
      SELECT (epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000) % 7 AS dow,
             (epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000) % 24 AS hod,
             value
      FROM events),
    buckets AS (
      SELECT dow, hod, CAST(COUNT(*) AS BIGINT) AS n_events,
             ${sqlDsum("value")} AS s
      FROM ev GROUP BY 1, 2),
    overall AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS gn, ${sqlDsum("value")} AS gs FROM ev)
    SELECT dow, hod, n_events,
           (s / CAST(n_events AS DOUBLE)) / (gs / CAST(gn AS DOUBLE)) AS seasonal_idx
    FROM buckets, overall ORDER BY dow, hod"""

  // ---------------------------------------------------------------------
  // MEDIAN + MAD — the robust location/scale pair (the outlier-resistant
  // alternative to mean/stddev that data-quality gates actually want).
  // Spark-first shape: exact order statistics WITHOUT collecting values —
  // the value domain is grouped (l_quantity: ~50 distinct), the
  // cumulative-count window runs over that driver-tiny table, and the
  // k-th smallest is "min v with cum ≥ k". The quantile_cont convention
  // (average the two middles when n is even) falls out of two rank
  // probes. MAD repeats the same shape on |v − median| (a second tiny
  // regroup, not a second fact scan — the per-value table is reused).
  // Exactness: values and medians live on the ¼-integer grid, so every
  // number is an exact double and the oracle hashes with no tolerance.
  // The built-in percentile() would collect per-group value buffers —
  // exactly the thing that does not survive 100 TB.
  // ---------------------------------------------------------------------

  /** Core of the grouped-count median/MAD over any long-valued column —
    * reused by the randomized differential spec. */
  def medianMad(df: DataFrame, v: Column): DataFrame = {
    val byVal = df
      .groupBy(v.cast("long").as("v"))
      .agg(count(lit(1)).as("c"))
    val w = Window.orderBy(col("v")).rowsBetween(Window.unboundedPreceding, 0)
    val tot = byVal.agg(sum(col("c")).as("n"))
    // floor((n+1)/2) / floor((n+2)/2): the two middle ranks (equal when n
    // is odd); computed BEFORE the aggregate so no nested aggregates
    val kd = byVal.withColumn("cum", sum(col("c")).over(w))
      .crossJoin(broadcast(tot))
      .withColumn("k_lo", floor((col("n") + 1) / 2))
      .withColumn("k_hi", floor((col("n") + 2) / 2))
    // ungrouped agg (n is constant across kd, max(n) = n) so Catalyst can
    // prove maxRows = 1 and the crossJoins below are recognized as the
    // canonical single-row scalar attach (PlanHygieneSpec auto-exemption)
    val med = kd
      .agg(max(col("n")).as("n"),
           min(when(col("cum") >= col("k_lo"), col("v"))).as("x_lo"),
           min(when(col("cum") >= col("k_hi"), col("v"))).as("x_hi"))
      .select(col("n"), ((col("x_lo") + col("x_hi")).cast("double") / 2.0).as("median"))
      // empty input: the ungrouped agg emits one all-null row where a
      // grouped plan would emit zero — drop it so the crossJoins below
      // propagate emptiness instead of a null median (Filter preserves
      // maxRows, so the single-row scalar-attach exemption still applies)
      .filter(col("n").isNotNull)
    val dev = byVal.crossJoin(broadcast(med))
      .groupBy(abs(col("v").cast("double") - col("median")).as("dv"))
      .agg(sum(col("c")).as("c"))
    val wd = Window.orderBy(col("dv")).rowsBetween(Window.unboundedPreceding, 0)
    dev.withColumn("cum", sum(col("c")).over(wd))
      .crossJoin(broadcast(med))
      .withColumn("k_lo", floor((col("n") + 1) / 2))
      .withColumn("k_hi", floor((col("n") + 2) / 2))
      .groupBy(col("n"), col("median"))
      .agg(min(when(col("cum") >= col("k_lo"), col("dv"))).as("d_lo"),
           min(when(col("cum") >= col("k_hi"), col("dv"))).as("d_hi"))
      .select(col("n"), col("median"), ((col("d_lo") + col("d_hi")) / 2.0).as("mad"))
  }

  val qAggMedianMad: Q = (s, d) => medianMad(lineitem(s, d), col("l_quantity"))

  val qAggMedianMadSql: String = """
    WITH byval AS (
      SELECT CAST(l_quantity AS BIGINT) AS v, CAST(COUNT(*) AS BIGINT) AS c
      FROM lineitem GROUP BY 1),
    tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM byval),
    kd AS (
      SELECT v, n,
             CAST(SUM(c) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
             floor((n + 1) / 2) AS k_lo, floor((n + 2) / 2) AS k_hi
      FROM byval, tot),
    med AS (
      SELECT n,
             CAST(MIN(CASE WHEN cum >= k_lo THEN v END)
                + MIN(CASE WHEN cum >= k_hi THEN v END) AS DOUBLE) / 2.0 AS median
      FROM kd GROUP BY n),
    dev AS (
      SELECT abs(CAST(v AS DOUBLE) - median) AS dv, CAST(SUM(c) AS BIGINT) AS c
      FROM byval, med GROUP BY 1),
    dcum AS (
      SELECT dv, n, median,
             CAST(SUM(c) OVER (ORDER BY dv
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
             floor((n + 1) / 2) AS k_lo, floor((n + 2) / 2) AS k_hi
      FROM dev, med)
    SELECT n, median,
           (MIN(CASE WHEN cum >= k_lo THEN dv END)
            + MIN(CASE WHEN cum >= k_hi THEN dv END)) / 2.0 AS mad
    FROM dcum GROUP BY n, median"""

  // ---------------------------------------------------------------------
  // BINNED GINI — inequality profile of the order-value distribution
  // (the grouped-data Gini estimator over fixed-width bins, the standard
  // formulation when per-row global ranks are unaffordable). Spark-first:
  // one map-side-combined groupBy into ~constant bins, one window over
  // the BIN table for cumulative counts, one scalar readout — at 100 TB
  // the only full-data pass is the binning scan; everything ranked is
  // O(bins). Σ(midrank·x) accumulates in DECIMAL(38,4) (exact — products
  // of integer 2·midrank with cent-grid bin sums) and both engines
  // round the SAME decimal to double only at the final ratio.
  // ---------------------------------------------------------------------

  /** Core of the binned Gini over any cent-grid value column — reused by
    * the randomized differential spec. */
  def giniBinned(df: DataFrame, x: Column, binWidth: Int): DataFrame = {
    val bins = df
      .groupBy(floor(x / binWidth).cast("long").as("b"))
      .agg(count(lit(1)).as("c"),
           // per-bin cent-grid sum, re-capped to (24,2) so the midrank
           // product below stays inside decimal-38 with NO rounding:
           // (13,0) × (24,2) = (38,2), summed at (38,2) — all exact.
           // mr2 ≈ 2·n_rows needs 13 digits to stay exact to n ≤ 5e12
           // rows (a (10,0) cap overflowed at ~5e9 — far short of the
           // 100 TB row counts this estimator exists for); past either
           // bound Spark yields a LOUD null, never a rounded statistic
           sum(x.cast("decimal(24,2)")).cast("decimal(24,2)").as("s"))
    val w = Window.orderBy(col("b")).rowsBetween(Window.unboundedPreceding, -1)
    val ranked = bins
      .withColumn("below", coalesce(sum(col("c")).over(w), lit(0L)))
      .withColumn("mr2", lit(2) * col("below") + col("c") + 1) // 2×midrank (long)
    val agg = ranked.agg(
      sum(col("c")).as("n"),
      sum(col("s")).cast("double").as("total"),
      sum(col("mr2").cast("decimal(13,0)") * col("s"))
        .cast("double").as("t2")) // Σ 2·midrank·x, rounded once from exact decimal
    val n = col("n").cast("double")
    agg.select(col("n").as("n_orders"),
      (col("t2") / (n * col("total")) - (n + 1) / n).as("gini"))
  }

  val qAggGini: Q = (s, d) => giniBinned(orders(s, d), col("o_totalprice"), 500)

  val qAggGiniSql: String = """
    WITH bins AS (
      SELECT CAST(floor(o_totalprice / 500) AS BIGINT) AS b,
             CAST(COUNT(*) AS BIGINT) AS c,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(24,2))) AS DECIMAL(24,2)) AS s
      FROM orders GROUP BY 1),
    ranked AS (
      SELECT c, s,
             2 * CAST(COALESCE(SUM(c) OVER (ORDER BY b
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
               + c + 1 AS mr2
      FROM bins),
    agg AS (
      SELECT CAST(SUM(c) AS BIGINT) AS n,
             CAST(SUM(s) AS DOUBLE) AS total,
             CAST(SUM(CAST(mr2 AS DECIMAL(13,0)) * s) AS DOUBLE) AS t2
      FROM ranked)
    SELECT n AS n_orders,
           t2 / (CAST(n AS DOUBLE) * total)
             - (CAST(n AS DOUBLE) + 1) / CAST(n AS DOUBLE) AS gini
    FROM agg"""

  // ---------------------------------------------------------------------
  // K-ANONYMITY AUDIT — the privacy gate a training-data release runs
  // before shipping: group by quasi-identifiers, measure the smallest
  // equivalence class, and count the rows that would need suppression at
  // k = 5. One map-side-combined groupBy + one constant-size rollup — the
  // same two-scan-free shape at any corpus size. The acctbal band uses
  // floor(x/1000) on an exact cent-grid double — identical in both
  // engines.
  // ---------------------------------------------------------------------

  val qPipelineKAnonymity: Q = (s, d) => {
    val classes = customer(s, d)
      .groupBy(col("c_nationkey"), col("c_mktsegment"),
               floor(col("c_acctbal") / 1000).cast("long").as("bal_band"))
      .agg(count(lit(1)).as("k"))
    classes.agg(
      count(lit(1)).as("n_classes"),
      sum(col("k")).as("n_rows"),
      min(col("k")).as("k_min"),
      sum(when(col("k") < 5, col("k")).otherwise(0L)).as("n_suppressed"),
      sum(when(col("k") < 5, 1L).otherwise(0L)).as("n_small_classes"))
      .withColumn("suppressed_frac",
        col("n_suppressed").cast("double") / col("n_rows").cast("double"))
  }

  val qPipelineKAnonymitySql: String = """
    WITH classes AS (
      SELECT c_nationkey, c_mktsegment,
             CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_band,
             CAST(COUNT(*) AS BIGINT) AS k
      FROM customer GROUP BY 1, 2, 3)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_classes,
           CAST(SUM(k) AS BIGINT) AS n_rows,
           CAST(MIN(k) AS BIGINT) AS k_min,
           CAST(SUM(CASE WHEN k < 5 THEN k ELSE 0 END) AS BIGINT) AS n_suppressed,
           CAST(SUM(CASE WHEN k < 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_small_classes,
           CAST(SUM(CASE WHEN k < 5 THEN k ELSE 0 END) AS DOUBLE)
             / CAST(SUM(k) AS DOUBLE) AS suppressed_frac
    FROM classes"""

  // ---------------------------------------------------------------------
  // BENFORD FIRST-DIGIT AUDIT — the classic anomaly screen over monetary
  // values (fabricated or re-binned data drifts from the log law). The
  // leading digit is extracted in exact integer space: the cent-grid
  // amount rounds to a BIGINT once (floor(x·100 + 0.5), the engine-
  // portable half-up), and the first digit comes off the decimal string —
  // both engines print integers identically, so there is no float log10
  // anywhere. Expected probabilities log10(1 + 1/d) are computed once in
  // Scala and embedded as shared double literals. One map-side-combined
  // scan into 9 rows; the chi-square contribution per digit is a fixed
  // exact-rounded chain.
  // ---------------------------------------------------------------------

  private val benfordP: Seq[Double] = (1 to 9).map(dd => math.log10(1.0 + 1.0 / dd))

  val qAggBenford: Q = (s, d) => {
    val digits = orders(s, d)
      .select(substring(floor(col("o_totalprice") * 100 + 0.5).cast("long").cast("string"), 1, 1)
        .cast("int").as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n_obs"))
    val tot = digits.agg(sum(col("n_obs")).as("n_total"))
    val pTab = typedlit(benfordP)
    digits.crossJoin(broadcast(tot))
      // N·p floor-quantized at 1e-6: DuckDB routes the probability array
      // literal through DECIMAL before ::DOUBLE[], which can land 1 ulp
      // off the JVM double — quantizing E (and computing χ² FROM the
      // quantized E) makes every downstream number engine-identical by
      // construction
      .withColumn("expected_n",
        floor(col("n_total").cast("double") * element_at(pTab, col("digit")) * 1e6 + 0.5) / 1e6)
      .select(col("digit"), col("n_obs"),
        col("expected_n"),
        (floor((col("n_obs").cast("double") - col("expected_n")) *
               (col("n_obs").cast("double") - col("expected_n")) / col("expected_n")
               * 1e6 + 0.5) / 1e6)
          .as("chi_contrib"))
      .orderBy(col("digit"))
  }

  val qAggBenfordSql: String = s"""
    WITH digits AS (
      SELECT CAST(substr(CAST(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS VARCHAR), 1, 1)
               AS INT) AS digit,
             CAST(COUNT(*) AS BIGINT) AS n_obs
      FROM orders GROUP BY 1),
    tot AS (SELECT CAST(SUM(n_obs) AS BIGINT) AS n_total FROM digits),
    p AS (SELECT ${sqlVecD(benfordP)}::DOUBLE[] AS tab)
    SELECT digit, n_obs, expected_n,
           floor((CAST(n_obs AS DOUBLE) - expected_n)
             * (CAST(n_obs AS DOUBLE) - expected_n)
             / expected_n * 1e6 + 0.5) / 1e6 AS chi_contrib
    FROM (SELECT digit, n_obs,
            floor(CAST(n_total AS DOUBLE) * tab[digit] * 1e6 + 0.5) / 1e6 AS expected_n
          FROM digits, tot, p) t ORDER BY digit"""

  private def sqlVecD(v: Seq[Double]): String = v.mkString("[", ", ", "]")

  // ---------------------------------------------------------------------
  // STRUCTURE-TENSOR DIP — the local-slope attribute interpreters run
  // after the envelope: directional derivatives from two lag windows
  // (exact decimal differences), then per-crossline gradient-tensor
  // sums (g_ii, g_xx, g_ix) and the least-squares dip g_ix / g_ii.
  // Same two-window shape as mdio_gradient — one hash shuffle per
  // direction, no neighborhood self-join — with every computed-double
  // sum floor-quantized ([[qsum]]) so the tensor (and the ratio of its
  // entries) is bit-identical across engines. Output is one profile row
  // per crossline position: bounded by the grid's second extent, not by
  // data volume.
  // ---------------------------------------------------------------------

  val qMdioDip: Q = (s, d) => {
    val wI = Window.partitionBy(col("x")).orderBy(col("i"))
    val wX = Window.partitionBy(col("i")).orderBy(col("x"))
    // spread the single-split scan: the per-cell decimal aggregation is
    // the heavy stage and hash(i) serves the grouping too (guide §2.5)
    val cells = graft.functions.Spread.byKeyIfNarrow(
        lineitem(s, d).select(col("l_orderkey").as("i"),
          col("l_linenumber").as("x"), col("l_quantity")),
        col("i"))
      .groupBy(col("i"), col("x"))
      .agg(dsum(col("l_quantity")).as("q"))
    val g = cells.select(col("x"),
        (col("q") - lag(col("q"), 1).over(wI)).as("gi"),
        (col("q") - lag(col("q"), 1).over(wX)).as("gx"))
      .filter(col("gi").isNotNull && col("gx").isNotNull)
    g.groupBy(col("x"))
      .agg(count(lit(1)).as("n"),
           qsum(col("gi") * col("gi"), 1e4).as("gii"),
           qsum(col("gx") * col("gx"), 1e4).as("gxx"),
           qsum(col("gi") * col("gx"), 1e4).as("gix"))
      .select(col("x"), col("n"),
        (col("gix") / col("gii")).as("dip"),
        (col("gix") * col("gix") / (col("gii") * col("gxx"))).as("coherence"))
      .orderBy(col("x"))
  }

  val qMdioDipSql: String = s"""
    WITH cells AS (
      SELECT l_orderkey AS i, l_linenumber AS x, ${sqlDsum("l_quantity")} AS q
      FROM lineitem GROUP BY 1, 2),
    g AS (
      SELECT x,
             q - LAG(q, 1) OVER (PARTITION BY x ORDER BY i) AS gi,
             q - LAG(q, 1) OVER (PARTITION BY i ORDER BY x) AS gx
      FROM cells),
    t AS (
      SELECT x, CAST(COUNT(*) AS BIGINT) AS n,
             ${sqlQsum("gi * gi", "1e4")} AS gii,
             ${sqlQsum("gx * gx", "1e4")} AS gxx,
             ${sqlQsum("gi * gx", "1e4")} AS gix
      FROM g WHERE gi IS NOT NULL AND gx IS NOT NULL GROUP BY x)
    SELECT x, n, gix / gii AS dip,
           gix * gix / (gii * gxx) AS coherence
    FROM t ORDER BY x"""

  // ---------------------------------------------------------------------
  // ITEM-ITEM COLLABORATIVE FILTERING — "customers who bought X also
  // bought Y" over the order/part bipartite graph: cosine similarity
  // c_ij / √(c_i·c_j) on co-occurrence counts. Spark-first: the pair
  // expansion self-joins WITHIN orders (per-order work bounded by
  // basket size² — the same bounded-quadratic contract as the triangle
  // count), then one groupBy per pair and two equi joins back to the
  // per-item counts. A support floor (c_ij ≥ 3) keeps the pair table
  // honest before ranking; the readout is a top-10
  // TakeOrderedAndProject, never a global sort. All similarity math is
  // exact-rounded integer-sourced arithmetic.
  // ---------------------------------------------------------------------

  val qGraphItemCf: Q = (s, d) => {
    import graft.functions.LineageCut.CutOps
    // the distinct (order, part) edge set feeds the per-item counts AND
    // both pair-expansion sides; materialize it once instead of
    // re-running the distinct per consumer (guide §2.4/§5)
    val e = lineitem(s, d).select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      .distinct().lineageCut
    val cnt = e.groupBy(col("p")).agg(count(lit(1)).as("c"))
    val a = e.select(col("o"), col("p").as("pi"))
    val b = e.select(col("o"), col("p").as("pj"))
    val pairs = a.join(b, Seq("o")).filter(col("pi") < col("pj"))
      .groupBy(col("pi"), col("pj")).agg(count(lit(1)).as("c_ij"))
      .filter(col("c_ij") >= 3)
    pairs
      .join(cnt.select(col("p").as("pi"), col("c").as("c_i")), Seq("pi"))
      .join(cnt.select(col("p").as("pj"), col("c").as("c_j")), Seq("pj"))
      .select(col("pi"), col("pj"), col("c_ij"),
        (col("c_ij").cast("double") /
         sqrt(col("c_i").cast("double") * col("c_j").cast("double"))).as("cosine"))
      .orderBy(col("cosine").desc, col("pi"), col("pj"))
      .limit(10)
  }

  val qGraphItemCfSql: String = """
    WITH e AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
    cnt AS (SELECT p, CAST(COUNT(*) AS BIGINT) AS c FROM e GROUP BY 1),
    pairs AS (
      SELECT a.p AS pi, b.p AS pj, CAST(COUNT(*) AS BIGINT) AS c_ij
      FROM e a JOIN e b ON a.o = b.o AND a.p < b.p
      GROUP BY 1, 2 HAVING COUNT(*) >= 3)
    SELECT pi, pj, c_ij,
           CAST(c_ij AS DOUBLE) / sqrt(CAST(ci.c AS DOUBLE) * CAST(cj.c AS DOUBLE)) AS cosine
    FROM pairs
    JOIN cnt ci ON ci.p = pi
    JOIN cnt cj ON cj.p = pj
    ORDER BY cosine DESC, pi, pj LIMIT 10"""

  // ---------------------------------------------------------------------
  // COMPOSED EXPERIMENT READOUT — the whole A/B pipeline as ONE lazy
  // dataflow on ONE oracle: deterministic hash assignment (the same
  // portable-mix split the curation splits use — stable under re-runs,
  // repartitioning, and engines), a per-customer revenue metric, then
  // BOTH readouts (Welch t on the cent-grid metric, Mann–Whitney U on
  // the dollar-binned metric) side by side in a single row. Nothing
  // materializes between stages. The U test's rank table is bounded by
  // the metric's DOLLAR-value domain (binned-rank statistics, the same
  // contract as the binned Gini), not by the customer count.
  // ---------------------------------------------------------------------

  val qPipelineExperiment: Q = (s, d) => {
    val assigned = graft.functions.Sampling.assignSplit(
      customer(s, d).select(col("c_custkey")), col("c_custkey"),
      Seq("treat" -> 0.5, "control" -> 0.5), out = "arm")
    val rev = orders(s, d).groupBy(col("o_custkey"))
      .agg(sum(col("o_totalprice").cast("decimal(25,2)")).cast("decimal(25,2)").as("rev"))
    val units = assigned
      .join(rev, col("c_custkey") === col("o_custkey"))
      .select(col("rev").cast("double").as("x"),
              floor(col("rev").cast("double") / 100).cast("long").as("vd"),
              (col("arm") === "treat").as("a"))
    val t = welchTtest(units, col("x"), col("a"))
    val u = mannWhitneyU(units, col("vd"), col("a"))
      .select(col("u_stat"), col("z_stat"))
    t.crossJoin(broadcast(u))
  }

  val qPipelineExperimentSql: String = {
    val armCase = graft.functions.Sampling.splitSql("c_custkey",
      Seq("treat" -> 0.5, "control" -> 0.5))
    s"""
    WITH assigned AS (
      SELECT c_custkey, $armCase AS arm FROM customer),
    rev AS (
      SELECT o_custkey,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(25,2))) AS DECIMAL(25,2)) AS rev
      FROM orders GROUP BY 1),
    units AS (
      SELECT CAST(rev AS DOUBLE) AS x,
             CAST(floor(CAST(rev AS DOUBLE) / 100) AS BIGINT) AS vd,
             arm = 'treat' AS a
      FROM assigned JOIN rev ON c_custkey = o_custkey),
    tagg AS (
      SELECT
        CAST(count_if(a) AS BIGINT) AS n_a,
        CAST(count_if(NOT a) AS BIGINT) AS n_b,
        CAST(SUM(CASE WHEN a THEN CAST(x AS DECIMAL(27,6)) END) AS DOUBLE) AS s_a,
        CAST(SUM(CASE WHEN NOT a THEN CAST(x AS DECIMAL(27,6)) END) AS DOUBLE) AS s_b,
        CAST(SUM(CASE WHEN a THEN CAST(x * x AS DECIMAL(30,6)) END) AS DOUBLE) AS ss_a,
        CAST(SUM(CASE WHEN NOT a THEN CAST(x * x AS DECIMAL(30,6)) END) AS DOUBLE) AS ss_b
      FROM units),
    tstat AS (
      SELECT n_a, n_b,
             s_a / na AS mean_a, s_b / nb AS mean_b,
             floor((s_a / na - s_b / nb) / sqrt(va / na + vb / nb) * 1e6 + 0.5) / 1e6
               AS t_stat,
             floor((va / na + vb / nb) * (va / na + vb / nb) /
               ((va / na) * (va / na) / (na - 1) + (vb / nb) * (vb / nb) / (nb - 1))
               * 1e6 + 0.5) / 1e6 AS dof
      FROM (SELECT *,
              CAST(n_a AS DOUBLE) AS na, CAST(n_b AS DOUBLE) AS nb,
              (ss_a - s_a * s_a / CAST(n_a AS DOUBLE)) / (CAST(n_a AS DOUBLE) - 1) AS va,
              (ss_b - s_b * s_b / CAST(n_b AS DOUBLE)) / (CAST(n_b AS DOUBLE) - 1) AS vb
            FROM tagg) t),
    byval AS (
      SELECT vd AS v,
             CAST(count_if(a) AS BIGINT) AS c_a,
             CAST(COUNT(*) AS BIGINT) AS c_all
      FROM units GROUP BY 1),
    ranked AS (
      SELECT c_a, c_all,
             CAST(COALESCE(SUM(c_all) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS DOUBLE)
               + CAST(c_all + 1 AS DOUBLE) / 2.0 AS midrank
      FROM byval),
    uagg AS (
      SELECT CAST(SUM(c_a) AS BIGINT) AS un_a,
             CAST(SUM(c_all - c_a) AS BIGINT) AS un_b,
             CAST(SUM(CAST(CAST(c_a AS DOUBLE) * midrank AS DECIMAL(27,6))) AS DOUBLE) AS r_a,
             CAST(SUM(CAST(c_all AS HUGEINT) * c_all * c_all - c_all) AS BIGINT) AS ties
      FROM ranked),
    ustat AS (
      SELECT r_a - na * (na + 1) / 2.0 AS u_stat,
             CASE WHEN sqrt(na * nb / 12.0 *
                    ((na + nb + 1) - CAST(ties AS DOUBLE) / ((na + nb) * (na + nb - 1)))) > 0
                  THEN floor((r_a - na * (na + 1) / 2.0 - na * nb / 2.0) /
                       sqrt(na * nb / 12.0 *
                            ((na + nb + 1) - CAST(ties AS DOUBLE) / ((na + nb) * (na + nb - 1))))
                       * 1e6 + 0.5) / 1e6
             END AS z_stat
      FROM (SELECT *, CAST(un_a AS DOUBLE) AS na, CAST(un_b AS DOUBLE) AS nb FROM uagg) t)
    SELECT * FROM tstat, ustat"""
  }

  // ---------------------------------------------------------------------
  // AUTOCORRELATION FUNCTION — lag-1..7 ACF of the daily revenue series,
  // the time-series diagnostic behind seasonality/forecast choices (the
  // serial sibling of the existing Pearson corr). One map-side-combined
  // daily rollup (the only full-data pass), then the lag taps run over
  // the ~2500-row OBSERVED day sequence — driver-tiny at any corpus
  // size, same contract as the rank statistics. Deviations are exact
  // (decimal-sourced mean), products floor-quantized, and each ACF is a
  // division of engine-identical doubles.
  // ---------------------------------------------------------------------

  val qAggAutocorr: Q = (s, d) => {
    val daily = lineitem(s, d)
      .groupBy(expr("datediff(l_shipdate, date'1992-01-01')").as("day"))
      .agg(dsum(col("l_extendedprice")).as("v"))
    val m = daily.agg(davg(col("v")).as("mean"), count(lit(1)).as("n_days"))
    val w = Window.orderBy(col("day"))
    val dev = daily.crossJoin(broadcast(m)).withColumn("dv", col("v") - col("mean"))
    val lags = 1 to 7
    val tapped = dev.select(
      (col("dv") +: col("n_days") +:
        lags.map(k => lag(col("dv"), k).over(w).as(s"dv_$k"))): _*)
    val aggCols = first(col("n_days")).as("n_days") +:
      qsum(col("dv") * col("dv"), 1e2).as("den") +:
      lags.map(k => qsum(col("dv") * col(s"dv_$k"), 1e2).as(s"num_$k"))
    val agg = tapped.agg(aggCols.head, aggCols.tail: _*)
    // Ljung–Box Q over the 7 lags: n(n+2)·Σ acf_k²/(n−k) — the standard
    // whiteness test, a pure exact-rounded chain on the quantized ACFs
    val nD = col("n_days").cast("double")
    val lb = lags.map { k =>
      val a = col(s"num_$k") / col("den")
      a * a / (nD - k)
    }.reduceLeft(_ + _) * nD * (nD + 2)
    agg.select(
      (col("n_days") +:
        lags.map(k => (col(s"num_$k") / col("den")).as(s"acf_$k"))) :+
        (floor(lb * 1e6 + 0.5) / 1e6).as("ljung_box_q"): _*)
  }

  val qAggAutocorrSql: String = {
    val lags = 1 to 7
    val taps = lags.map(k =>
      s"LAG(dv, $k) OVER (ORDER BY day) AS dv_$k").mkString(",\n             ")
    val nums = lags.map(k =>
      s"${sqlQsum(s"dv * dv_$k", "1e2")} AS num_$k").mkString(",\n             ")
    val acfs = lags.map(k => s"num_$k / den AS acf_$k").mkString(", ")
    val lb = lags.map(k =>
      s"(num_$k / den) * (num_$k / den) / (CAST(n_days AS DOUBLE) - $k)")
      .mkString(" + ")
    s"""
    WITH daily AS (
      SELECT datediff('day', DATE '1992-01-01', l_shipdate) AS day,
             ${sqlDsum("l_extendedprice")} AS v
      FROM lineitem GROUP BY 1),
    m AS (SELECT ${sqlDavg("v")} AS mean, CAST(COUNT(*) AS BIGINT) AS n_days
          FROM daily),
    dev AS (SELECT day, v - mean AS dv, n_days FROM daily, m),
    tapped AS (
      SELECT dv, n_days,
             $taps
      FROM dev),
    agg AS (
      SELECT ANY_VALUE(n_days) AS n_days,
             ${sqlQsum("dv * dv", "1e2")} AS den,
             $nums
      FROM tapped)
    SELECT n_days, $acfs,
           floor(($lb) * CAST(n_days AS DOUBLE) * (CAST(n_days AS DOUBLE) + 2)
                 * 1e6 + 0.5) / 1e6 AS ljung_box_q
    FROM agg"""
  }

  // ---------------------------------------------------------------------
  // L-DIVERSITY AUDIT — k-anonymity's companion: within each
  // quasi-identifier class, how many DISTINCT values of the sensitive
  // attribute appear? A class can be large (k-anonymous) yet expose its
  // members if everyone shares one sensitive value. QI here is
  // (nation, acctbal band); sensitive is the market segment. Same
  // two-level map-side-combined rollup shape as the k audit — the
  // distinct count rides the same shuffle via a two-key pre-aggregation
  // (never count(distinct) over raw rows at scale).
  // ---------------------------------------------------------------------

  val qPipelineLDiversity: Q = (s, d) => {
    val pairs = customer(s, d)
      .groupBy(col("c_nationkey"),
               floor(col("c_acctbal") / 1000).cast("long").as("bal_band"),
               col("c_mktsegment"))
      .agg(count(lit(1)).as("nv"))
    val classes = pairs
      .groupBy(col("c_nationkey"), col("bal_band"))
      .agg(count(lit(1)).as("l"), sum(col("nv")).as("k"))
    classes.agg(
      count(lit(1)).as("n_classes"),
      sum(col("k")).as("n_rows"),
      min(col("l")).as("l_min"),
      sum(when(col("l") < 3, col("k")).otherwise(0L)).as("n_exposed"),
      sum(when(col("l") < 3, 1L).otherwise(0L)).as("n_low_l_classes"))
      .withColumn("exposed_frac",
        col("n_exposed").cast("double") / col("n_rows").cast("double"))
  }

  val qPipelineLDiversitySql: String = """
    WITH pairs AS (
      SELECT c_nationkey, CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_band,
             c_mktsegment, CAST(COUNT(*) AS BIGINT) AS nv
      FROM customer GROUP BY 1, 2, 3),
    classes AS (
      SELECT c_nationkey, bal_band,
             CAST(COUNT(*) AS BIGINT) AS l, CAST(SUM(nv) AS BIGINT) AS k
      FROM pairs GROUP BY 1, 2)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_classes,
           CAST(SUM(k) AS BIGINT) AS n_rows,
           CAST(MIN(l) AS BIGINT) AS l_min,
           CAST(SUM(CASE WHEN l < 3 THEN k ELSE 0 END) AS BIGINT) AS n_exposed,
           CAST(SUM(CASE WHEN l < 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_low_l_classes,
           CAST(SUM(CASE WHEN l < 3 THEN k ELSE 0 END) AS DOUBLE)
             / CAST(SUM(k) AS DOUBLE) AS exposed_frac
    FROM classes"""

  // ---------------------------------------------------------------------
  // DEGREE ASSORTATIVITY — do high-degree items co-occur with high-degree
  // items? Newman's r: the Pearson correlation of endpoint degrees over
  // all DIRECTED edges (each undirected edge counted both ways, which
  // symmetrizes the sums). Same bounded-quadratic within-order pair
  // expansion as the triangle count / item-CF; degrees and all five
  // moment sums stay in exact integer arithmetic end to end — the only
  // floating-point op is the final quantized coefficient.
  // ---------------------------------------------------------------------

  val qGraphAssortativity: Q = (s, d) => {
    import graft.functions.LineageCut.CutOps
    val e = lineitem(s, d).select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
    val a = e.select(col("o"), col("p").as("pi"))
    val b = e.select(col("o"), col("p").as("pj"))
    // materialize the pair expansion ONCE: the old plan referenced this
    // subtree four times (degree build + both unionAll arms + the count),
    // re-running the within-order self-join each time (guide §2.4 /
    // §5 "recomputing is more expensive"); the checkpointed edge table is
    // O(pairs) longs, the iterative-graph discipline used everywhere else
    val edges = a.join(b, Seq("o")).filter(col("pi") < col("pj"))
      .select(col("pi"), col("pj")).distinct().lineageCut
    val deg = edges.select(col("pi").as("p")).unionAll(edges.select(col("pj").as("p")))
      .groupBy(col("p")).agg(count(lit(1)).as("deg")).lineageCut
    // moment regrouping (exact integer identities over the SAME sums):
    // the old plan attached degrees to the DIRECTED edge set (each
    // undirected edge both ways — 2·|edges| join rows) and summed du,
    // du², du·dv over it. Every directed sum folds onto the undirected
    // edge set — (i,j) contributes (di+dj), (di²+dj²), 2·di·dj — and
    // m2 = 2·|edges|, so ONE aggregation over HALF the join rows yields
    // the identical four integers.
    val agg = edges
      .join(deg.select(col("p").as("pi"), col("deg").as("di")), Seq("pi"))
      .join(deg.select(col("p").as("pj"), col("deg").as("dj")), Seq("pj"))
      .agg(count(lit(1)).as("ne"),
           sum(col("di") + col("dj")).as("sx"),
           sum(col("di") * col("di") + col("dj") * col("dj")).as("sxx"),
           sum(col("di") * col("dj")).as("sp"))
      .select((col("ne") * 2).as("m2"), col("sx"), col("sxx"),
              (col("sp") * 2).as("sxy"))
    val m = col("m2").cast("double")
    val sx = col("sx").cast("double")
    val sxx = col("sxx").cast("double")
    val sxy = col("sxy").cast("double")
    // symmetrized: Σy = Σx and Σy² = Σx², so r collapses to one ratio
    val r = (sxy - sx * sx / m) / (sxx - sx * sx / m)
    agg.select(expr("m2 div 2").as("n_edges"),
      (floor(r * 1e6 + 0.5) / 1e6).as("assortativity"))
  }

  val qGraphAssortativitySql: String = """
    WITH e AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
    edges AS (
      SELECT DISTINCT a.p AS pi, b.p AS pj
      FROM e a JOIN e b ON a.o = b.o AND a.p < b.p),
    deg AS (
      SELECT p, CAST(COUNT(*) AS BIGINT) AS deg
      FROM (SELECT pi AS p FROM edges UNION ALL SELECT pj FROM edges) t
      GROUP BY 1),
    directed AS (
      SELECT du.deg AS x, dv.deg AS y
      FROM (SELECT pi AS u, pj AS v FROM edges
            UNION ALL SELECT pj, pi FROM edges) de
      JOIN deg du ON du.p = de.u
      JOIN deg dv ON dv.p = de.v),
    agg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS m2,
             CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             CAST(SUM(x * y) AS BIGINT) AS sxy
      FROM directed)
    SELECT m2 // 2 AS n_edges,
           floor((CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
                    / CAST(m2 AS DOUBLE))
                 / (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
                    / CAST(m2 AS DOUBLE)) * 1e6 + 0.5) / 1e6 AS assortativity
    FROM agg"""

  val queries: Map[String, Q] = Map(
    "pipeline_l_diversity" -> qPipelineLDiversity,
    "graph_assortativity"  -> qGraphAssortativity,
    "agg_ttest"          -> qAggTtest,
    "agg_mannwhitney"    -> qAggMannWhitney,
    "window_ewma"        -> qWindowEwma,
    "events_seasonality" -> qEventsSeasonality,
    "agg_median_mad"     -> qAggMedianMad,
    "agg_gini"           -> qAggGini,
    "pipeline_k_anonymity" -> qPipelineKAnonymity,
    "agg_benford"        -> qAggBenford,
    "mdio_dip"           -> qMdioDip,
    "graph_item_cf"      -> qGraphItemCf,
    "pipeline_experiment" -> qPipelineExperiment,
    "agg_autocorr"       -> qAggAutocorr,
  )

  val oracleSql: Map[String, String] = Map(
    "agg_ttest"          -> qAggTtestSql,
    "agg_mannwhitney"    -> qAggMannWhitneySql,
    "window_ewma"        -> qWindowEwmaSql,
    "events_seasonality" -> qEventsSeasonalitySql,
    "agg_median_mad"     -> qAggMedianMadSql,
    "agg_gini"           -> qAggGiniSql,
    "pipeline_k_anonymity" -> qPipelineKAnonymitySql,
    "agg_benford"        -> qAggBenfordSql,
    "mdio_dip"           -> qMdioDipSql,
    "graph_item_cf"      -> qGraphItemCfSql,
    "pipeline_experiment" -> qPipelineExperimentSql,
    "agg_autocorr"       -> qAggAutocorrSql,
    "pipeline_l_diversity" -> qPipelineLDiversitySql,
    "graph_assortativity"  -> qGraphAssortativitySql,
  )
}
