package graft.queries

import org.apache.spark.sql.functions._

/** TPC-H completion (Q2/Q11/Q12/Q16/Q20/Q21, adapted) — with
  * [[Relational]] (q1/q3/q5/q6/q10) and [[Relational3]] this closes the
  * full 22-query decision-support suite on the harness star schema.
  *
  * The harness corpus has no `partsupp` table and no
  * shipmode/commitdate/receiptdate columns, so the five queries that need
  * them are adapted — each notes its surrogate. The SHAPES are preserved:
  * Q2's correlated-min subquery, Q11's scalar-subquery HAVING, Q12's
  * two-way CASE pivot, Q16's NOT-IN + count-distinct, Q20's nested-IN
  * chain, Q21's EXISTS/NOT-EXISTS double witness.
  *
  * Scale notes (100 TB posture), same discipline as [[Relational3]]:
  * the partsupp surrogate (per-(part,supplier) aggregates of lineitem) is
  * ONE partial-agg-friendly shuffle of the fact table, after which every
  * per-part/per-supplier table is orders of magnitude smaller than the
  * facts; dimension hops broadcast; correlated subqueries are
  * de-correlated into aggregate + equi-join by hand.
  */
object Relational4 {

  /** TPC-H Q2 (adapted): minimum-cost supplier. No `partsupp`, so the
    * supply cost of (part, supplier) is the minimum unit price at which
    * that supplier ever shipped that part — min(l_extendedprice /
    * l_quantity), one IEEE-exact divide so both engines agree bitwise.
    * Shape preserved: region-scoped suppliers, correlated min-cost
    * subquery per part (de-correlated into a min agg + equi-join on the
    * exact double). */
  val q2MinCostSupplier: Q = (s, d) => {
    val ps = lineitem(s, d)
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(min(col("l_extendedprice") / col("l_quantity")).as("cost"))
    val euro = supplier(s, d)
      .join(broadcast(nation(s, d)), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region(s, d).filter(col("r_name") === "EUROPE")),
            col("n_regionkey") === col("r_regionkey"))
      .select(col("s_suppkey"), col("s_name"), col("s_acctbal"), col("n_name"))
    val pse = ps.join(broadcast(euro), col("l_suppkey") === col("s_suppkey"))
    val minCost = pse.groupBy(col("l_partkey").as("mp"))
      .agg(min(col("cost")).as("mincost"))
    pse
      .join(minCost, col("l_partkey") === col("mp") && col("cost") === col("mincost"))
      .join(broadcast(part(s, d)
              .filter(col("p_type") === "LARGE" &&
                      col("p_size").between(10, 15))),
            col("p_partkey") === col("l_partkey"))
      .select(col("s_acctbal"), col("s_name"), col("n_name"),
              col("p_partkey"), col("p_name"), col("cost"))
      .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"), col("p_partkey"))
      .limit(20)
  }

  val q2MinCostSupplierSql: String = """
    WITH ps AS (
      SELECT l_partkey, l_suppkey, min(l_extendedprice / l_quantity) AS cost
      FROM lineitem GROUP BY 1, 2),
    euro AS (
      SELECT s_suppkey, s_name, s_acctbal, n_name
      FROM supplier
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey AND r_name = 'EUROPE'),
    pse AS (SELECT * FROM ps JOIN euro ON l_suppkey = s_suppkey),
    mn AS (SELECT l_partkey AS mp, min(cost) AS mincost FROM pse GROUP BY 1)
    SELECT s_acctbal, s_name, n_name, p_partkey, p_name, cost
    FROM pse
    JOIN mn ON l_partkey = mp AND cost = mincost
    JOIN part ON p_partkey = l_partkey
    WHERE p_type = 'LARGE' AND p_size BETWEEN 10 AND 15
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 20"""

  /** TPC-H Q11 (adapted): important stock identification. The stock value
    * of a part held by NATION_7's suppliers is the decimal-exact revenue
    * those suppliers shipped of it (surrogate for ps_supplycost *
    * ps_availqty). Shape preserved: per-part value agg, scalar-subquery
    * total (a one-row broadcast, never re-evaluated per row), HAVING
    * value > fraction * total. */
  val q11ImportantStock: Q = (s, d) => {
    val n7supp = supplier(s, d)
      .join(broadcast(nation(s, d).filter(col("n_name") === "NATION_7")),
            col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"))
    val v = lineitem(s, d)
      .join(broadcast(n7supp), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("l_partkey"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("value"))
    val tot = v.agg(sum(col("value")).as("tot"))
    v.crossJoin(broadcast(tot))
      .filter(col("value") > lit(0.001) * col("tot"))
      .select(col("l_partkey"), col("value"))
      .orderBy(col("value").desc, col("l_partkey"))
  }

  val q11ImportantStockSql: String = s"""
    WITH v AS (
      SELECT l_partkey, ${sqlDsum("l_extendedprice * (1.0 - l_discount)")} AS value
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE n_name = 'NATION_7'
      GROUP BY 1),
    t AS (SELECT SUM(value) AS tot FROM v)
    SELECT l_partkey, value FROM v, t
    WHERE value > 0.001 * tot
    ORDER BY value DESC, l_partkey"""

  /** TPC-H Q12 (adapted): shipping-mode / order-priority pivot. No
    * l_shipmode column, so lines group by l_linestatus; no receipt/commit
    * dates, so a "late" line is one shipped more than 75 days after its
    * order date. Shape preserved: the two-way CASE pivot counting
    * critical- vs non-critical-priority orders per mode. */
  val q12ShipmodePriority: Q = (s, d) => {
    val hi = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
              col("l_shipdate") <  lit("1997-01-01").cast("timestamp"))
      .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 75 DAYS"))
      .groupBy(col("l_linestatus"))
      .agg(sum(when(hi, 1L).otherwise(0L)).as("high_line_count"),
           sum(when(hi, 0L).otherwise(1L)).as("low_line_count"))
      .orderBy(col("l_linestatus"))
  }

  val q12ShipmodePrioritySql: String = """
    SELECT l_linestatus,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_shipdate > o_orderdate + INTERVAL 75 DAY
    GROUP BY l_linestatus
    ORDER BY l_linestatus"""

  /** TPC-H Q16 (adapted): parts/supplier relationship. The (part,
    * supplier) relation is the distinct pairs observed in lineitem
    * (surrogate for partsupp); the "customer complaints" exclusion is
    * suppliers with negative account balance. Shape preserved: descriptor
    * filters, NOT IN subquery, count-distinct suppliers per descriptor.
    * The NOT IN side is a tiny aggregate → broadcast anti join, never a
    * shuffle of the pair table. */
  val q16PartSupplierCnt: Q = (s, d) => {
    val pairs = lineitem(s, d)
      .select(col("l_partkey"), col("l_suppkey")).distinct()
    val complaints = supplier(s, d)
      .filter(col("s_acctbal") < 0).select(col("s_suppkey"))
    pairs
      .join(broadcast(complaints), col("l_suppkey") === col("s_suppkey"),
            "left_anti")
      .join(broadcast(part(s, d)
              .filter(col("p_brand") =!= "Brand#1" && col("p_type") =!= "PROMO" &&
                      col("p_size").isin(1, 4, 7, 10, 15, 23, 38, 45))),
            col("p_partkey") === col("l_partkey"))
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
               col("p_size"))
  }

  val q16PartSupplierCntSql: String = """
    WITH pairs AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM pairs
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
      AND p_size IN (1, 4, 7, 10, 15, 23, 38, 45)
      AND l_suppkey NOT IN
          (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size"""

  /** TPC-H Q20 (adapted): potential part promotion. No ps_availqty, so a
    * supplier has "excess stock" of a part when more than half of
    * everything it ever shipped of that part went out in 1997 — the
    * correlated half-of-shipments predicate becomes one conditional sum
    * against the all-time sum in the SAME per-(part,supplier) aggregate
    * (decimal-exact both). Shape preserved: name-prefix part scope,
    * nested IN chain, nation filter on the outer supplier list. */
  val q20ExcessStock: Q = (s, d) => {
    val smallParts = part(s, d)
      .filter(col("p_name").startsWith("small")).select(col("p_partkey"))
    val natSupp = supplier(s, d)
      .join(broadcast(nation(s, d).filter(col("n_name").startsWith("NATION_1"))),
            col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"))
    // pre-filter the fact table with broadcast SEMI joins BEFORE the
    // per-(part,supplier) aggregation (guide §3.2 — reduce the big side
    // before shuffling it): both join keys are GROUP KEYS and the
    // part/supplier keys are unique, so filtering rows first computes
    // the identical aggregate over exactly the groups the old post-agg
    // joins kept — the aggregation now shuffles only the small-part,
    // one-nation-prefix slice of lineitem instead of all of it
    val q = lineitem(s, d)
      .join(broadcast(smallParts), col("l_partkey") === col("p_partkey"), "left_semi")
      .join(broadcast(natSupp.select(col("s_suppkey"))),
            col("l_suppkey") === col("s_suppkey"), "left_semi")
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(dsum(when(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
                     col("l_shipdate") <  lit("1998-01-01").cast("timestamp"),
                     col("l_quantity")).otherwise(lit(0.0))).as("q97"),
           dsum(col("l_quantity")).as("qall"))
    q.filter(col("q97") > lit(0.5) * col("qall"))
      .join(broadcast(natSupp), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_name")).distinct()
      .orderBy(col("s_name"))
  }

  val q20ExcessStockSql: String = s"""
    WITH q AS (
      SELECT l_partkey, l_suppkey,
             ${sqlDsum("CASE WHEN l_shipdate >= TIMESTAMP '1997-01-01' " +
                       "AND l_shipdate < TIMESTAMP '1998-01-01' " +
                       "THEN l_quantity ELSE 0.0 END")} AS q97,
             ${sqlDsum("l_quantity")} AS qall
      FROM lineitem GROUP BY 1, 2)
    SELECT DISTINCT s_name
    FROM q
    JOIN part ON p_partkey = l_partkey AND p_name LIKE 'small%'
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation ON s_nationkey = n_nationkey AND n_name LIKE 'NATION_1%'
    WHERE q97 > 0.5 * qall
    ORDER BY s_name"""

  /** TPC-H Q21 (adapted): suppliers who kept orders waiting. No
    * receipt/commit dates, so the "late" witness is a returned line
    * (l_returnflag = 'R') on a completed order (o_orderstatus = 'F'); the
    * EXISTS (another supplier contributed) / NOT EXISTS (no OTHER
    * supplier's line was returned) pair de-correlates into one per-order
    * aggregate: distinct suppliers, distinct returned suppliers, and the
    * unique culprit when exactly one supplier was returned. */
  val q21WaitingSupplier: Q = (s, d) => {
    val per = lineitem(s, d)
      .join(orders(s, d).filter(col("o_orderstatus") === "F"),
            col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"))
      .agg(countDistinct(col("l_suppkey")).as("ns"),
           countDistinct(when(col("l_returnflag") === "R", col("l_suppkey")))
             .as("nr"),
           max(when(col("l_returnflag") === "R", col("l_suppkey")))
             .as("culprit"))
    per.filter(col("ns") > 1 && col("nr") === 1)
      .join(broadcast(supplier(s, d)), col("s_suppkey") === col("culprit"))
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(20)
  }

  val q21WaitingSupplierSql: String = """
    WITH per AS (
      SELECT l_orderkey,
             COUNT(DISTINCT l_suppkey) AS ns,
             COUNT(DISTINCT CASE WHEN l_returnflag = 'R'
                                 THEN l_suppkey END) AS nr,
             MAX(CASE WHEN l_returnflag = 'R' THEN l_suppkey END) AS culprit
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey AND o_orderstatus = 'F'
      GROUP BY 1)
    SELECT s_name, COUNT(*) AS numwait
    FROM per
    JOIN supplier ON s_suppkey = culprit
    WHERE ns > 1 AND nr = 1
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20"""

  // ---- registration -------------------------------------------------------

  val queries: Map[String, Q] = Map(
    "q2_min_cost_supplier"  -> q2MinCostSupplier,
    "q11_important_stock"   -> q11ImportantStock,
    "q12_shipmode_priority" -> q12ShipmodePriority,
    "q16_part_supplier_cnt" -> q16PartSupplierCnt,
    "q20_excess_stock"      -> q20ExcessStock,
    "q21_waiting_supplier"  -> q21WaitingSupplier,
  )

  val oracleSql: Map[String, String] = Map(
    "q2_min_cost_supplier"  -> q2MinCostSupplierSql,
    "q11_important_stock"   -> q11ImportantStockSql,
    "q12_shipmode_priority" -> q12ShipmodePrioritySql,
    "q16_part_supplier_cnt" -> q16PartSupplierCntSql,
    "q20_excess_stock"      -> q20ExcessStockSql,
    "q21_waiting_supplier"  -> q21WaitingSupplierSql,
  )
}
