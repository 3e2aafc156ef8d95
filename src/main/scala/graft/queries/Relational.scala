package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** General relational surface: aggregations, joins, windows, sorts, set
  * ops, scalar functions — the capabilities the reference lacks natively
  * (SURVEY.md §2.3-2.7 "absent → Spark built-ins") plus TPC-H-style
  * headline queries used by Bench.
  *
  * Scale notes (100 TB posture):
  *  - all dimension joins (`region`, `nation`, small `customer`/`supplier`
  *    subsets) are explicitly `broadcast()` — no shuffle of the fact table
  *    for dimension enrichment;
  *  - fact-fact joins keep an equi-key so Catalyst picks sort-merge with
  *    both sides hash-partitioned on the key, never a cartesian;
  *  - aggregations are expressed so partial (map-side) aggregation applies;
  *  - every filter is a plain column predicate → parquet pushdown.
  */
object Relational {

  // ---- aggregations -------------------------------------------------------

  /** TPC-H Q1: pricing summary report (flagship aggregate). */
  val q1PricingSummary: Q = (s, d) =>
    // filter BELOW the spread (keeps the parquet pushdown), then widen the
    // single-split scan so the eight decimal aggregates run on all cores
    // (no-op once the scan is parallel — guide §2.5)
    graft.functions.Spread.byKeyIfNarrow(
        lineitem(s, d)
          .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
          .select(col("l_orderkey"), col("l_returnflag"), col("l_linestatus"),
            col("l_quantity"), col("l_extendedprice"), col("l_discount"), col("l_tax")),
        col("l_orderkey"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))).as("sum_charge"),
        davg(col("l_quantity")).as("avg_qty"),
        davg(col("l_extendedprice")).as("avg_price"),
        davg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))

  val q1PricingSummarySql: String = s"""
    SELECT l_returnflag, l_linestatus,
      ${sqlDsum("l_quantity")} AS sum_qty,
      ${sqlDsum("l_extendedprice")} AS sum_base_price,
      ${sqlDsum("l_extendedprice * (1.0 - l_discount)")} AS sum_disc_price,
      ${sqlDsum("l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)")} AS sum_charge,
      ${sqlDavg("l_quantity")} AS avg_qty,
      ${sqlDavg("l_extendedprice")} AS avg_price,
      ${sqlDavg("l_discount")} AS avg_disc,
      COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus"""

  /** TPC-H Q3: shipping priority (join + agg + top-k). */
  val q3ShippingPriority: Q = (s, d) => {
    val cust = customer(s, d).filter(col("c_mktsegment") === "BUILDING")
    val ord  = orders(s, d).filter(col("o_orderdate") < lit("1998-03-15").cast("timestamp"))
    val li   = lineitem(s, d).filter(col("l_shipdate") > lit("1998-03-15").cast("timestamp"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  val q3ShippingPrioritySql: String = s"""
    SELECT l_orderkey, o_orderdate,
           ${sqlDsum("l_extendedprice * (1.0 - l_discount)")} AS revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15'
      AND l_shipdate  > TIMESTAMP '1998-03-15'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey LIMIT 10"""

  /** TPC-H Q5-style: revenue per region through the full star join.
    * All dimension hops are broadcast; only lineitem⋈orders shuffles. */
  val q5RegionRevenue: Q = (s, d) => {
    val geo = customer(s, d)
      .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .select(col("c_custkey"), col("r_name"))
    lineitem(s, d)
      .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(geo), col("o_custkey") === col("c_custkey"))
      .groupBy(col("r_name"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
           count(lit(1)).as("n_items"))
  }

  val q5RegionRevenueSql: String = s"""
    SELECT r_name,
           ${sqlDsum("l_extendedprice * (1.0 - l_discount)")} AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY r_name"""

  /** TPC-H Q6: forecasting revenue change — pure filter+sum, the pushdown
    * showcase (all three predicates reach the parquet scan). */
  val q6ForecastRevenue: Q = (s, d) =>
    lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
              col("l_shipdate") <  lit("1997-01-01").cast("timestamp") &&
              col("l_discount").between(0.03, 0.07) &&
              col("l_quantity") < 24)
      .agg(dsum(col("l_extendedprice") * col("l_discount")).as("revenue"))

  val q6ForecastRevenueSql: String = s"""
    SELECT ${sqlDsum("l_extendedprice * l_discount")} AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 24"""

  /** TPC-H Q10-style: returned-item losses per customer (top 20). */
  val q10ReturnedItems: Q = (s, d) =>
    lineitem(s, d).filter(col("l_returnflag") === "R")
      .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)

  val q10ReturnedItemsSql: String = s"""
    SELECT c_custkey, c_name, n_name,
           ${sqlDsum("l_extendedprice * (1.0 - l_discount)")} AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey LIMIT 20"""

  /** COUNT(DISTINCT) — exact distinct via partial aggregation. */
  val qAggDistinct: Q = (s, d) =>
    lineitem(s, d).groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_suppkey")).as("n_supp"),
           countDistinct(col("l_partkey")).as("n_part"))

  val qAggDistinctSql: String = """
    SELECT l_returnflag, COUNT(DISTINCT l_suppkey) AS n_supp,
           COUNT(DISTINCT l_partkey) AS n_part
    FROM lineitem GROUP BY l_returnflag"""

  /** ROLLUP over two keys (grouping-set aggregation). */
  val qAggRollup: Q = (s, d) =>
    lineitem(s, d).rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))

  val qAggRollupSql: String = s"""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
           ${sqlDsum("l_quantity")} AS sum_qty
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)"""

  /** CUBE over two keys. */
  val qAggCube: Q = (s, d) =>
    orders(s, d).cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sum_price"))

  val qAggCubeSql: String = s"""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
           ${sqlDsum("o_totalprice")} AS sum_price
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)"""

  /** Explicit GROUPING SETS (SQL form; Catalyst Expand operator). */
  val qAggGroupingSets: Q = (s, d) => {
    orders(s, d).createOrReplaceTempView("graft_orders_gs")
    s.sql(s"""
      SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
      FROM graft_orders_gs
      GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""")
  }

  val qAggGroupingSetsSql: String = """
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
    FROM orders GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())"""

  /** Histogram with fixed-width buckets (SURVEY §2.4 A2 semantics:
    * EdgeDefinedHistogram with uniform widths) over l_extendedprice. */
  val qAggHistogram: Q = (s, d) =>
    lineitem(s, d)
      .select(floor(col("l_extendedprice") / lit(50000.0)).cast("long").as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("n"))

  val qAggHistogramSql: String = """
    SELECT CAST(FLOOR(l_extendedprice / 50000.0) AS BIGINT) AS bucket, COUNT(*) AS n
    FROM lineitem GROUP BY 1"""

  /** Argmax via max_by (SURVEY §2.4 A4: argmax/argmin of amplitude). */
  val qAggArgmax: Q = (s, d) =>
    lineitem(s, d).agg(
      max_by(col("l_orderkey"), struct(col("l_extendedprice"), col("l_orderkey"), col("l_linenumber"))).as("argmax_orderkey"),
      min_by(col("l_orderkey"), struct(col("l_extendedprice"), col("l_orderkey"), col("l_linenumber"))).as("argmin_orderkey"),
      max(col("l_extendedprice")).as("max_price"),
      min(col("l_extendedprice")).as("min_price"))

  val qAggArgmaxSql: String = """
    SELECT (SELECT l_orderkey FROM lineitem
            ORDER BY l_extendedprice DESC, l_orderkey DESC, l_linenumber DESC LIMIT 1) AS argmax_orderkey,
           (SELECT l_orderkey FROM lineitem
            ORDER BY l_extendedprice ASC, l_orderkey ASC, l_linenumber ASC LIMIT 1) AS argmin_orderkey,
           MAX(l_extendedprice) AS max_price,
           MIN(l_extendedprice) AS min_price
    FROM lineitem"""

  // ---- joins --------------------------------------------------------------

  /** Left outer join preserving customers with zero orders. */
  val qJoinLeftOuter: Q = (s, d) =>
    customer(s, d)
      .join(orders(s, d), col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_mktsegment"))
      .agg(count(col("o_orderkey")).as("n_orders"),
           sum(when(col("o_orderkey").isNull, 1L).otherwise(0L)).as("n_custless"))

  val qJoinLeftOuterSql: String = """
    SELECT c_mktsegment, COUNT(o_orderkey) AS n_orders,
           CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_custless
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_mktsegment"""

  /** Left-semi join: customers having at least one urgent open order. */
  val qJoinSemi: Q = (s, d) => {
    val urgent = orders(s, d)
      .filter(col("o_orderpriority") === "1-URGENT" && col("o_orderstatus") === "O")
      .select(col("o_custkey"))
    customer(s, d).join(urgent, col("c_custkey") === col("o_custkey"), "left_semi")
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
  }

  val qJoinSemiSql: String = """
    SELECT c_mktsegment, COUNT(*) AS n
    FROM customer WHERE EXISTS (
      SELECT 1 FROM orders WHERE o_custkey = c_custkey
        AND o_orderpriority = '1-URGENT' AND o_orderstatus = 'O')
    GROUP BY c_mktsegment"""

  /** Left-anti join: customers with no orders at all. */
  val qJoinAnti: Q = (s, d) =>
    customer(s, d)
      .join(orders(s, d).select(col("o_custkey")), col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))

  val qJoinAntiSql: String = """
    SELECT c_mktsegment, COUNT(*) AS n
    FROM customer WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY c_mktsegment"""

  /** Range join with an equi-key anchor: lineitems shipped within 60 days
    * of their order's date. Equi-key keeps it a sort-merge join (no BNLJ). */
  val qJoinRange: Q = (s, d) =>
    lineitem(s, d)
      .join(orders(s, d),
        col("l_orderkey") === col("o_orderkey") &&
        col("l_shipdate") >= col("o_orderdate") &&
        col("l_shipdate") <= col("o_orderdate") + expr("INTERVAL 60 DAYS"))
      .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n_fast_items"))

  val qJoinRangeSql: String = """
    SELECT o_orderpriority, COUNT(*) AS n_fast_items
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      AND l_shipdate >= o_orderdate
      AND l_shipdate <= o_orderdate + INTERVAL 60 DAY
    GROUP BY o_orderpriority"""

  /** SPATIAL join by grid bucketing — the canonical no-cartesian shape
    * for "all pairs within distance R": snap both point sets to an R-sized
    * grid, explode the probe side into its 3×3 neighbor cells, equi-join
    * on the cell, then apply the exact distance predicate post-join. Work
    * is Σ per-cell |A|·|B| over occupied neighbor pairs — never global
    * N·M — and the explode is a fixed ×9, so the plan is a plain
    * shuffle-hash join at any scale. Point coordinates derive integer-
    * exactly from the events table (click points vs purchase points);
    * sqrt is correctly rounded in both engines, so pair counts AND summed
    * distances sit on the oracle exactly. */
  val qJoinSpatial: Q = (s, d) => {
    val r = 5.0
    val ev = events(s, d)
    // coordinate span scales with the dataset (⌈√n⌉·4 per axis): density —
    // and therefore pairs-per-point — stays CONSTANT as data grows, the
    // way real spatial data grows in area. A fixed span would densify and
    // make the pair count quadratic in data size (the first cut of this
    // query tripped the 2x bench gate exactly that way at sf0.1).
    val m = ev.agg((ceil(sqrt(count(lit(1)).cast("double"))) * 4).cast("long").as("m"))
    def pts(t: String, dy: Int) = ev
      .filter(col("event_type") === t)
      .crossJoin(broadcast(m))
      .select(col("event_id"),
        (col("event_id") % col("m")).cast("double").as("x"),
        (col("event_id") % (col("m") - dy)).cast("double").as("y"))
    val a = pts("click", 8)
      .select(col("event_id").as("a_id"), col("x").as("ax"), col("y").as("ay"),
        floor(col("x") / r).cast("long").as("cx"),
        floor(col("y") / r).cast("long").as("cy"))
    val b = pts("purchase", 12)
      .select(col("event_id").as("b_id"), col("x").as("bx"), col("y").as("by"),
        floor(col("x") / r).cast("long").as("bcx"),
        floor(col("y") / r).cast("long").as("bcy"))
      .select(col("b_id"), col("bx"), col("by"),
        explode(sequence(col("bcx") - 1, col("bcx") + 1)).as("cx"),
        col("bcy"))
      .select(col("b_id"), col("bx"), col("by"), col("cx"),
        explode(sequence(col("bcy") - 1, col("bcy") + 1)).as("cy"))
    val dist = sqrt((col("ax") - col("bx")) * (col("ax") - col("bx")) +
                    (col("ay") - col("by")) * (col("ay") - col("by")))
    a.join(b, Seq("cx", "cy"))
      .filter(dist <= r)
      .agg(count(lit(1)).as("n_pairs"),
           countDistinct(col("a_id")).as("n_a_matched"),
           dsum(dist).as("sum_dist"))
  }

  val qJoinSpatialSql: String = s"""
    WITH mm AS (
      SELECT CAST(ceil(sqrt(CAST(COUNT(*) AS DOUBLE))) * 4 AS BIGINT) AS m
      FROM events),
    a AS (
      SELECT event_id AS a_id,
             CAST(event_id % m AS DOUBLE) AS ax,
             CAST(event_id % (m - 8) AS DOUBLE) AS ay,
             CAST(floor(CAST(event_id % m AS DOUBLE) / 5.0) AS BIGINT) AS cx,
             CAST(floor(CAST(event_id % (m - 8) AS DOUBLE) / 5.0) AS BIGINT) AS cy
      FROM events, mm WHERE event_type = 'click'),
    b0 AS (
      SELECT event_id AS b_id,
             CAST(event_id % m AS DOUBLE) AS bx,
             CAST(event_id % (m - 12) AS DOUBLE) AS by,
             CAST(floor(CAST(event_id % m AS DOUBLE) / 5.0) AS BIGINT) AS bcx,
             CAST(floor(CAST(event_id % (m - 12) AS DOUBLE) / 5.0) AS BIGINT) AS bcy
      FROM events, mm WHERE event_type = 'purchase'),
    b AS (
      SELECT b_id, bx, by, bcx + dx.i AS cx, bcy + dy.i AS cy
      FROM b0, range(-1, 2) dx(i), range(-1, 2) dy(i)),
    p AS (
      SELECT a_id, sqrt((ax - bx) * (ax - bx) + (ay - by) * (ay - by)) AS dist
      FROM a JOIN b USING (cx, cy)
      WHERE sqrt((ax - bx) * (ax - bx) + (ay - by) * (ay - by)) <= 5.0)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(COUNT(DISTINCT a_id) AS BIGINT) AS n_a_matched,
           ${sqlDsum("dist")} AS sum_dist
    FROM p"""

  /** Fuzzy (edit-distance ≤ 2) self-join on part names via
    * [[graft.functions.Fuzzy.editDistancePairs]] — distinct-value fold,
    * prefix-filtered q-gram candidates, exact Levenshtein verify — then
    * row-level pair counts recovered from the per-name multiplicities
    * (same-name pairs are the dist-0 diagonal: C(cnt, 2)). The DuckDB
    * oracle runs the NAIVE all-pairs join, so the hash match certifies
    * the filtered plan is lossless, not just plausible. */
  val qJoinFuzzy: Q = (s, d) => {
    val parts = part(s, d)
    val near = graft.functions.Fuzzy.editDistancePairs(parts, "p_name", k = 2)
      .groupBy(col("dist"))
      .agg(count(lit(1)).as("n_name_pairs"),
           sum(col("cnt_a") * col("cnt_b")).as("n_row_pairs"))
    val same = parts.groupBy(col("p_name")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= 2)
      .agg(lit(0L).as("dist"), count(lit(1)).as("n_name_pairs"),
           expr("CAST(sum(cnt * (cnt - 1)) DIV 2 AS BIGINT)").as("n_row_pairs"))
      .filter(col("n_name_pairs") > 0) // empty diagonal → no dist-0 row
    same.union(near).orderBy(col("dist"))
  }

  val qJoinFuzzySql: String = """
    WITH j AS (
      SELECT a.p_name AS na, b.p_name AS nb,
             levenshtein(a.p_name, b.p_name) AS dist
      FROM part a JOIN part b ON a.p_partkey < b.p_partkey
      WHERE abs(len(a.p_name) - len(b.p_name)) <= 2
        AND levenshtein(a.p_name, b.p_name) <= 2)
    SELECT CAST(dist AS BIGINT) AS dist,
           CAST(COUNT(DISTINCT least(na, nb) || '|' || greatest(na, nb)) AS BIGINT)
             AS n_name_pairs,
           CAST(COUNT(*) AS BIGINT) AS n_row_pairs
    FROM j GROUP BY dist ORDER BY dist"""

  /** As-of semantics: for every purchase event, the most recent prior
    * 'click' timestamp of the same user. Expressed as a running
    * conditional max over an ordered window — one shuffle on user_id,
    * no self-join, scales linearly with events. */
  val qJoinAsof: Q = (s, d) => {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"))
      .rowsBetween(Window.unboundedPreceding, -1)
    events(s, d)
      .withColumn("prev_click_ts",
        max(when(col("event_type") === "click", col("ts"))).over(w))
      .filter(col("event_type") === "purchase")
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_purchases"),
           count(col("prev_click_ts")).as("n_with_prior_click"))
  }

  val qJoinAsofSql: String = """
    SELECT user_id, COUNT(*) AS n_purchases, COUNT(prev_click_ts) AS n_with_prior_click
    FROM (
      SELECT user_id, event_type,
             MAX(CASE WHEN event_type = 'click' THEN ts END) OVER (
               PARTITION BY user_id ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_click_ts
      FROM events) t
    WHERE event_type = 'purchase'
    GROUP BY user_id"""

  // ---- windows ------------------------------------------------------------

  /** Top-3 orders by totalprice per priority (dense pattern: row_number). */
  val qWindowTopkPerGroup: Q = (s, d) => {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    orders(s, d)
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 3)
      .select(col("o_orderpriority"), col("rn"), col("o_orderkey"), col("o_totalprice"))
  }

  val qWindowTopkPerGroupSql: String = """
    SELECT o_orderpriority, rn, o_orderkey, o_totalprice FROM (
      SELECT o_orderpriority, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders) t
    WHERE rn <= 3"""

  /** Running (cumulative) sum per user over event time; decimal inside the
    * window keeps the prefix sums exact and order-independent of planning. */
  val qWindowRunningSum: Q = (s, d) => {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events(s, d)
      .withColumn("running_value", sum(col("value").cast("decimal(27,6)")).over(w).cast("double"))
      .groupBy(col("user_id"))
      .agg(max(col("running_value")).as("final_running"), count(lit(1)).as("n"))
  }

  val qWindowRunningSumSql: String = """
    SELECT user_id, MAX(running_value) AS final_running, COUNT(*) AS n
    FROM (
      SELECT user_id,
             CAST(SUM(CAST(value AS DECIMAL(27,6))) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value
      FROM events) t
    GROUP BY user_id"""

  /** LAG delta: change in value vs the user's previous event. */
  val qWindowLagDelta: Q = (s, d) => {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events(s, d)
      .withColumn("delta", col("value") - lag(col("value"), 1).over(w))
      .groupBy(col("event_type"))
      .agg(dsum(col("delta")).as("sum_delta"), count(col("delta")).as("n_deltas"))
  }

  val qWindowLagDeltaSql: String = s"""
    SELECT event_type, ${sqlDsum("delta")} AS sum_delta, COUNT(delta) AS n_deltas
    FROM (
      SELECT event_type, value - LAG(value, 1) OVER (
        PARTITION BY user_id ORDER BY ts, event_id) AS delta
      FROM events) t
    GROUP BY event_type"""

  /** Moving average over the trailing 3 rows (exact via decimal). */
  val qWindowMovingAvg: Q = (s, d) => {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(-2, Window.currentRow)
    events(s, d)
      .withColumn("mov3",
        (sum(col("value").cast("decimal(27,6)")).over(w) /
          count(col("value")).over(w)).cast("double"))
      .groupBy(col("user_id"))
      .agg(dsum(col("mov3")).as("sum_mov3"), count(lit(1)).as("n"))
  }

  val qWindowMovingAvgSql: String = s"""
    SELECT user_id, ${sqlDsum("mov3")} AS sum_mov3, COUNT(*) AS n
    FROM (
      SELECT user_id, CAST(
        SUM(CAST(value AS DECIMAL(27,6))) OVER w / COUNT(value) OVER w AS DOUBLE) AS mov3
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)) t
    GROUP BY user_id"""

  /** percent_rank + ntile over suppliers by account balance.
    *
    * NOT the naive `Window.orderBy(acctbal, suppkey)` — that funnels
    * every supplier through one task. The global rank decomposes exactly:
    * rank = (rows with smaller acctbal, from the acctbal value-HISTOGRAM's
    * cumulative count — a bounded-domain global window, decimal(15,2)
    * range) + (tie-break row_number within the acctbal group — a
    * PARTITIONED window). The order key (acctbal, suppkey) is unique, so
    * rank == row_number and percent_rank's gap semantics cannot differ.
    * ntile's uneven-bucket rule (first n mod 4 buckets get the extra row)
    * is closed-form in the rank. WindowHygieneSpec pins the shape. */
  val qWindowPercentRank: Q = (s, d) => {
    val sup = supplier(s, d)
    val wq = Window.orderBy(col("v")).rowsBetween(Window.unboundedPreceding, -1)
    val below = sup.groupBy(col("s_acctbal").as("v")).agg(count(lit(1)).as("c"))
      .withColumn("below", coalesce(sum(col("c")).over(wq), lit(0L)))
      .select(col("v").as("s_acctbal"), col("below"))
    val tot = sup.agg(count(lit(1)).as("n_tot"))
    val wg = Window.partitionBy(col("s_acctbal")).orderBy(col("s_suppkey"))
    val ranked = sup
      // histogram side is one row per distinct acctbal — broadcast-size
      // at any corpus (the domain bound IS the scale argument here)
      .join(broadcast(below), Seq("s_acctbal"))
      .withColumn("rk", col("below") + row_number().over(wg))
      .crossJoin(broadcast(tot))
    // ntile(4): q = n div 4 rows per bucket, the first r = n mod 4
    // buckets hold one extra
    val ranked2 = ranked
      .withColumn("q", expr("n_tot div 4")).withColumn("r", col("n_tot") % 4)
      .withColumn("cut", col("r") * (col("q") + 1))
      .withColumn("pr",
        when(col("n_tot") > 1,
          (col("rk") - 1).cast("double") / (col("n_tot") - 1).cast("double"))
          .otherwise(lit(0.0)))
      .withColumn("quartile",
        when(col("rk") <= col("cut"), expr("(rk - 1) div (q + 1)") + 1)
          .otherwise(col("r") + expr("(rk - 1 - cut) div q") + 1).cast("long"))
    ranked2
      .groupBy(col("quartile"))
      .agg(count(lit(1)).as("n"), dsum(col("pr")).as("sum_pr"),
           min(col("s_acctbal")).as("lo"), max(col("s_acctbal")).as("hi"))
  }

  val qWindowPercentRankSql: String = s"""
    SELECT quartile, COUNT(*) AS n, ${sqlDsum("pr")} AS sum_pr,
           MIN(s_acctbal) AS lo, MAX(s_acctbal) AS hi
    FROM (
      SELECT s_acctbal,
             PERCENT_RANK() OVER (ORDER BY s_acctbal, s_suppkey) AS pr,
             NTILE(4) OVER (ORDER BY s_acctbal, s_suppkey) AS quartile
      FROM supplier) t
    GROUP BY quartile"""

  // ---- sorts / limits / top-k --------------------------------------------

  /** Global top-k: TakeOrderedAndProject, no full sort at scale. */
  val qSortTopk: Q = (s, d) =>
    orders(s, d)
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority"))
      .limit(15)

  val qSortTopkSql: String = """
    SELECT o_orderkey, o_totalprice, o_orderpriority
    FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 15"""

  /** Z-order (Morton) sort key ([[graft.functions.ZOrder.zvalue]]): the
    * space-filling-curve ordering that gives multi-dim file/row-group
    * locality at 100 TB. Pure bit interleave — the oracle recomputes
    * z-values exactly; top-k by z stays TakeOrderedAndProject. */
  val qSortZorder: Q = (s, d) =>
    lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
        graft.functions.ZOrder.zvalue(Seq(col("l_orderkey"), col("l_suppkey")), 8).as("z"))
      .orderBy(col("z"), col("l_orderkey"), col("l_linenumber"))
      .limit(100)

  val qSortZorderSql: String = {
    val z = graft.functions.ZOrder.zvalueSql(Seq("l_orderkey", "l_suppkey"), 8)
    s"""
    SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber, $z AS z
    FROM lineitem ORDER BY z, l_orderkey, l_linenumber LIMIT 100"""
  }

  /** Multi-key stable ordering with deterministic tie-break (SURVEY §2.5
    * O1/O2: sortSelectionByKey lexicographic multi-key sort). */
  val qSortMultikey: Q = (s, d) =>
    events(s, d).filter(col("event_type") === "signup")
      .orderBy(col("user_id"), col("ts"), col("event_id"))
      .select(col("user_id"), col("event_id"), col("value"))
      .limit(100)

  val qSortMultikeySql: String = """
    SELECT user_id, event_id, value
    FROM events WHERE event_type = 'signup'
    ORDER BY user_id, ts, event_id LIMIT 100"""

  // ---- set operations ------------------------------------------------------

  /** INTERSECT: suppliers appearing in both R-returned and A-returned items. */
  val qSetIntersect: Q = (s, d) => {
    val li = lineitem(s, d)
    li.filter(col("l_returnflag") === "R").select(col("l_suppkey"))
      .intersect(li.filter(col("l_returnflag") === "A").select(col("l_suppkey")))
      .agg(count(lit(1)).as("n"), min(col("l_suppkey")).as("lo"), max(col("l_suppkey")).as("hi"))
  }

  val qSetIntersectSql: String = """
    SELECT COUNT(*) AS n, MIN(l_suppkey) AS lo, MAX(l_suppkey) AS hi FROM (
      SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'R'
      INTERSECT
      SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'A') t"""

  /** EXCEPT: parts never shipped. */
  val qSetExcept: Q = (s, d) =>
    part(s, d).select(col("p_partkey"))
      .except(lineitem(s, d).select(col("l_partkey").as("p_partkey")))
      .agg(count(lit(1)).as("n_never_shipped"))

  val qSetExceptSql: String = """
    SELECT COUNT(*) AS n_never_shipped FROM (
      SELECT p_partkey FROM part
      EXCEPT
      SELECT l_partkey FROM lineitem) t"""

  /** UNION ALL of two typed projections then re-aggregate. */
  val qSetUnion: Q = (s, d) => {
    val a = customer(s, d).select(col("c_nationkey").cast("int").as("nationkey"), lit("customer").as("side"))
    val b = supplier(s, d).select(col("s_nationkey").cast("int").as("nationkey"), lit("supplier").as("side"))
    a.unionByName(b).groupBy(col("nationkey")).agg(count(lit(1)).as("n"))
  }

  val qSetUnionSql: String = """
    SELECT nationkey, COUNT(*) AS n FROM (
      SELECT c_nationkey AS nationkey FROM customer
      UNION ALL
      SELECT s_nationkey AS nationkey FROM supplier) t
    GROUP BY nationkey"""

  // ---- scalar functions ----------------------------------------------------

  /** String functions: substring/upper/length/concat/position. */
  val qFnString: Q = (s, d) =>
    part(s, d)
      .select(
        upper(substring(col("p_name"), 1, 1)).as("initial"),
        length(col("p_name")).cast("long").as("name_len"),
        when(instr(col("p_type"), "BRASS") > 0, 1L).otherwise(0L).as("is_brass"))
      .groupBy(col("initial"))
      .agg(count(lit(1)).as("n"), sum(col("name_len")).as("sum_len"), sum(col("is_brass")).as("n_brass"))

  val qFnStringSql: String = """
    SELECT UPPER(SUBSTRING(p_name, 1, 1)) AS initial, COUNT(*) AS n,
           CAST(SUM(CAST(LENGTH(p_name) AS BIGINT)) AS BIGINT) AS sum_len,
           CAST(SUM(CASE WHEN STRPOS(p_type, 'BRASS') > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_brass
    FROM part GROUP BY 1"""

  /** Regex extraction from the JSON-ish props column. */
  val qFnRegex: Q = (s, d) =>
    events(s, d)
      .select(col("event_type"),
        nullif(regexp_extract(col("props"), "\"k\": (\\d+)", 1), lit("")).cast("long").as("k"))
      .groupBy(col("event_type"))
      .agg(sum(col("k")).as("sum_k"), count(lit(1)).as("n"))

  val qFnRegexSql: String = """
    SELECT event_type,
           CAST(SUM(CAST(NULLIF(regexp_extract(props, '"k": (\d+)', 1), '') AS BIGINT)) AS BIGINT) AS sum_k,
           COUNT(*) AS n
    FROM events GROUP BY event_type"""

  /** Date functions: truncation + extraction + datediff. */
  val qFnDate: Q = (s, d) =>
    orders(s, d)
      .select(
        date_trunc("month", col("o_orderdate")).as("month"),
        year(col("o_orderdate")).cast("long").as("yr"),
        datediff(lit("2002-01-01").cast("date"), col("o_orderdate").cast("date")).cast("long").as("age_days"),
        col("o_totalprice"))
      .groupBy(col("month"), col("yr"))
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("revenue"), min(col("age_days")).as("min_age"))

  val qFnDateSql: String = s"""
    SELECT date_trunc('month', o_orderdate) AS month,
           CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS yr,
           COUNT(*) AS n, ${sqlDsum("o_totalprice")} AS revenue,
           MIN(CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS BIGINT)) AS min_age
    FROM orders GROUP BY 1, 2"""

  /** Math functions (IEEE-exact set: sqrt/abs/floor + arithmetic).
    * Highest power kept at value² — at value⁴ (~3e10) the double's ULP
    * exceeds the decimal(_,6) quantum and engines' double→decimal
    * rounding modes diverge. */
  val qFnMath: Q = (s, d) =>
    events(s, d)
      .select(col("event_type"),
        sqrt(abs(col("value"))).as("rt"),
        col("value").as("v"))
      .groupBy(col("event_type"))
      .agg(dsum(col("rt")).as("sum_sqrt"), dsumsq(col("v")).as("sum_sq"))

  val qFnMathSql: String = s"""
    SELECT event_type, ${sqlDsum("sqrt(abs(value))")} AS sum_sqrt,
           ${sqlDsumsq("value")} AS sum_sq
    FROM events GROUP BY event_type"""

  /** CASE/WHEN bucketing. */
  val qFnCase: Q = (s, d) =>
    customer(s, d)
      .select(
        when(col("c_acctbal") < 0, "negative")
          .when(col("c_acctbal") < 5000, "low")
          .when(col("c_acctbal") < 20000, "mid")
          .otherwise("high").as("bal_bucket"))
      .groupBy(col("bal_bucket")).agg(count(lit(1)).as("n"))

  val qFnCaseSql: String = """
    SELECT CASE WHEN c_acctbal < 0 THEN 'negative'
                WHEN c_acctbal < 5000 THEN 'low'
                WHEN c_acctbal < 20000 THEN 'mid'
                ELSE 'high' END AS bal_bucket,
           COUNT(*) AS n
    FROM customer GROUP BY 1"""

  // ---- event-time patterns -------------------------------------------------

  /** Tumbling 1-hour windows (batch equivalent of the Structured Streaming
    * aggregation in graft.streaming; same grouping semantics). */
  val qStreamTumbling: Q = (s, d) =>
    events(s, d)
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))

  val qStreamTumblingSql: String = s"""
    SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour, event_type,
           COUNT(*) AS n, ${sqlDsum("value")} AS sum_value
    FROM events GROUP BY 1, 2"""

  /** Sliding event-time windows in batch (1 h length, 15 min slide):
    * `window()` works in a batch groupBy exactly as in streaming — each
    * event lands in 4 overlapping windows. Oracle: the closed form
    * start_k = bucket_15min(ts) - k·15min for k ∈ 0..3. */
  val qStreamSliding: Q = (s, d) =>
    events(s, d)
      .groupBy(window(col("ts"), "1 hour", "15 minutes"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
      .select(col("window.start").as("ws"), col("n"), col("sum_value"))

  val qStreamSlidingSql: String = s"""
    SELECT time_bucket(INTERVAL 15 MINUTES, CAST(ts AS TIMESTAMP))
             - k * INTERVAL 15 MINUTES AS ws,
           COUNT(*) AS n, ${sqlDsum("value")} AS sum_value
    FROM events CROSS JOIN range(0, 4) r(k)
    GROUP BY 1"""

  /** Gap-based sessionization (30-min inactivity) via windowed cumsum —
    * the batch analog of flatMapGroupsWithState sessionization. */
  val qEventsSessionize: Q = (s, d) => {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events(s, d)
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
             unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")) > 1800, 1L).otherwise(0L))
      .withColumn("session_id", sum(col("new_session")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"))
      .agg(max(col("session_id")).as("n_sessions"), count(lit(1)).as("n_events"))
  }

  val qEventsSessionizeSql: String = """
    SELECT user_id, CAST(MAX(session_id) AS BIGINT) AS n_sessions, COUNT(*) AS n_events
    FROM (
      SELECT user_id,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM (
        SELECT user_id, ts, event_id,
               CASE WHEN LAG(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                      OR date_diff('second', LAG(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id), ts) > 1800
                    THEN 1 ELSE 0 END AS new_session
        FROM events) a) b
    GROUP BY user_id"""

  // ---- registry ------------------------------------------------------------

  val queries: Map[String, Q] = Map(
    "q1_pricing_summary"   -> q1PricingSummary,
    "q3_shipping_priority" -> q3ShippingPriority,
    "q5_region_revenue"    -> q5RegionRevenue,
    "q6_forecast_revenue"  -> q6ForecastRevenue,
    "q10_returned_items"   -> q10ReturnedItems,
    "agg_distinct"         -> qAggDistinct,
    "agg_rollup"           -> qAggRollup,
    "agg_cube"             -> qAggCube,
    "agg_grouping_sets"    -> qAggGroupingSets,
    "agg_histogram"        -> qAggHistogram,
    "agg_argmax"           -> qAggArgmax,
    "join_left_outer"      -> qJoinLeftOuter,
    "join_semi"            -> qJoinSemi,
    "join_anti"            -> qJoinAnti,
    "join_range"           -> qJoinRange,
    "join_spatial"         -> qJoinSpatial,
    "join_fuzzy"           -> qJoinFuzzy,
    "join_asof"            -> qJoinAsof,
    "window_topk_per_group"-> qWindowTopkPerGroup,
    "window_running_sum"   -> qWindowRunningSum,
    "window_lag_delta"     -> qWindowLagDelta,
    "window_moving_avg"    -> qWindowMovingAvg,
    "window_percent_rank"  -> qWindowPercentRank,
    "sort_topk"            -> qSortTopk,
    "sort_zorder"          -> qSortZorder,
    "sort_multikey"        -> qSortMultikey,
    "set_intersect"        -> qSetIntersect,
    "set_except"           -> qSetExcept,
    "set_union"            -> qSetUnion,
    "fn_string"            -> qFnString,
    "fn_regex"             -> qFnRegex,
    "fn_date"              -> qFnDate,
    "fn_math"              -> qFnMath,
    "fn_case"              -> qFnCase,
    "stream_tumbling"      -> qStreamTumbling,
    "stream_sliding"       -> qStreamSliding,
    "events_sessionize"    -> qEventsSessionize,
  )

  val oracleSql: Map[String, String] = Map(
    "q1_pricing_summary"   -> q1PricingSummarySql,
    "q3_shipping_priority" -> q3ShippingPrioritySql,
    "q5_region_revenue"    -> q5RegionRevenueSql,
    "q6_forecast_revenue"  -> q6ForecastRevenueSql,
    "q10_returned_items"   -> q10ReturnedItemsSql,
    "agg_distinct"         -> qAggDistinctSql,
    "agg_rollup"           -> qAggRollupSql,
    "agg_cube"             -> qAggCubeSql,
    "agg_grouping_sets"    -> qAggGroupingSetsSql,
    "agg_histogram"        -> qAggHistogramSql,
    "agg_argmax"           -> qAggArgmaxSql,
    "join_left_outer"      -> qJoinLeftOuterSql,
    "join_semi"            -> qJoinSemiSql,
    "join_anti"            -> qJoinAntiSql,
    "join_range"           -> qJoinRangeSql,
    "join_spatial"         -> qJoinSpatialSql,
    "join_fuzzy"           -> qJoinFuzzySql,
    "join_asof"            -> qJoinAsofSql,
    "window_topk_per_group"-> qWindowTopkPerGroupSql,
    "window_running_sum"   -> qWindowRunningSumSql,
    "window_lag_delta"     -> qWindowLagDeltaSql,
    "window_moving_avg"    -> qWindowMovingAvgSql,
    "window_percent_rank"  -> qWindowPercentRankSql,
    "sort_topk"            -> qSortTopkSql,
    "sort_zorder"          -> qSortZorderSql,
    "sort_multikey"        -> qSortMultikeySql,
    "set_intersect"        -> qSetIntersectSql,
    "set_except"           -> qSetExceptSql,
    "set_union"            -> qSetUnionSql,
    "fn_string"            -> qFnStringSql,
    "fn_regex"             -> qFnRegexSql,
    "fn_date"              -> qFnDateSql,
    "fn_math"              -> qFnMathSql,
    "fn_case"              -> qFnCaseSql,
    "stream_tumbling"      -> qStreamTumblingSql,
    "stream_sliding"       -> qStreamSlidingSql,
    "events_sessionize"    -> qEventsSessionizeSql,
  )
}
