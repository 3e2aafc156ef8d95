package graft.queries

import org.apache.spark.sql.functions._

/** TPC-H decision-support widening (Q4/Q7/Q8/Q9/Q13/Q14/Q15/Q17/Q18/Q19/
  * Q22, adapted to the harness star schema — no `partsupp`, no
  * commit/receipt dates, no phone numbers; each adaptation is noted on its
  * query). These complete the relational surface beyond the five headline
  * queries in [[Relational]]: every classic subquery shape is covered —
  * EXISTS (semi), NOT EXISTS (anti), scalar subquery against an aggregate,
  * correlated per-group aggregate subquery, IN over a HAVING group, and an
  * outer-join histogram.
  *
  * Scale notes (100 TB posture), same discipline as [[Relational]]:
  *  - dimension hops (`part`, `supplier`, `nation`, `region`, filtered
  *    `customer`) are explicit `broadcast()`s — the lineitem fact table is
  *    never shuffled for enrichment;
  *  - the only shuffles are fact⋈fact equi-joins (lineitem⋈orders) and the
  *    final aggregations, all partial-agg friendly;
  *  - correlated subqueries are de-correlated by hand into aggregate +
  *    equi-join (the plan Catalyst's own de-correlation would emit), so
  *    nothing re-executes per outer row;
  *  - scalar subqueries (Q15's max, Q22's avg) are one-row broadcasts, not
  *    per-row re-evaluation.
  */
object Relational3 {

  /** TPC-H Q4 (adapted): order-priority checking. The reference predicate
    * `l_commitdate < l_receiptdate` has no counterpart columns here; the
    * EXISTS witness is "some lineitem of the order was returned". Shape
    * preserved: quarter filter + EXISTS → left-semi join + priority agg. */
  val q4OrderPriority: Q = (s, d) => {
    val returned = lineitem(s, d).filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"))
    orders(s, d)
      .filter(col("o_orderdate") >= lit("1996-07-01").cast("timestamp") &&
              col("o_orderdate") <  lit("1996-10-01").cast("timestamp"))
      .join(returned, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))
  }

  val q4OrderPrioritySql: String = """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-07-01'
      AND o_orderdate <  TIMESTAMP '1996-10-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority"""

  /** TPC-H Q7: volume shipping between two nations, by year. The nation
    * dimension joins twice under different roles (supplier side n1,
    * customer side n2) — both broadcast. */
  val q7VolumeShipping: Q = (s, d) => {
    val n1 = nation(s, d).select(col("n_nationkey").as("n1_key"),
                                 col("n_name").as("supp_nation"))
    val n2 = nation(s, d).select(col("n_nationkey").as("n2_key"),
                                 col("n_name").as("cust_nation"))
    val supp = supplier(s, d)
      .join(broadcast(n1), col("s_nationkey") === col("n1_key"))
      .select(col("s_suppkey"), col("supp_nation"))
    val cust = customer(s, d)
      .join(broadcast(n2), col("c_nationkey") === col("n2_key"))
      .select(col("c_custkey"), col("cust_nation"))
    lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
              col("l_shipdate") <= lit("1997-12-31").cast("timestamp"))
      .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .filter((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
              (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
      .groupBy(col("supp_nation"), col("cust_nation"),
               year(col("l_shipdate")).cast("long").as("l_year"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
      .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
  }

  val q7VolumeShippingSql: String = s"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l_shipdate) AS BIGINT) AS l_year,
           ${sqlDsum("l_extendedprice * (1.0 - l_discount)")} AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
      AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year"""

  /** TPC-H Q8: national market share — NATION_3's share of ECONOMY-part
    * revenue sold into ASIA customers, by order year. The share is a
    * conditional-sum / sum ratio: both sums are decimal-exact, the final
    * divide is one IEEE-exact double op, so the oracle matches bitwise. */
  val q8MarketShare: Q = (s, d) => {
    val asiaCust = customer(s, d)
      .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region(s, d).filter(col("r_name") === "ASIA")),
            col("n_regionkey") === col("r_regionkey"))
      .select(col("c_custkey"))
    val suppNation = supplier(s, d)
      .join(broadcast(nation(s, d).select(col("n_nationkey").as("sn_key"),
                                          col("n_name").as("supp_nation"))),
            col("s_nationkey") === col("sn_key"))
      .select(col("s_suppkey"), col("supp_nation"))
    val econParts = part(s, d).filter(col("p_type") === "ECONOMY")
      .select(col("p_partkey"))
    val vol = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    lineitem(s, d)
      .join(broadcast(econParts), col("l_partkey") === col("p_partkey"))
      .join(orders(s, d).filter(
              col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
              col("o_orderdate") <= lit("1997-12-31").cast("timestamp")),
            col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(asiaCust), col("o_custkey") === col("c_custkey"), "left_semi")
      .join(broadcast(suppNation), col("l_suppkey") === col("s_suppkey"))
      .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
      .agg((dsum(when(col("supp_nation") === "NATION_3", vol).otherwise(lit(0.0))) /
            dsum(vol)).as("mkt_share"))
      .orderBy(col("o_year"))
  }

  val q8MarketShareSql: String = s"""
    SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
           ${sqlDsum("CASE WHEN n2.n_name = 'NATION_3' THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END")} /
           ${sqlDsum("l_extendedprice * (1.0 - l_discount)")} AS mkt_share
    FROM lineitem
    JOIN part     ON l_partkey = p_partkey
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation n1 ON c_nationkey = n1.n_nationkey
    JOIN region    ON n1.n_regionkey = r_regionkey
    JOIN nation n2 ON s_nationkey = n2.n_nationkey
    WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
      AND o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
    GROUP BY o_year
    ORDER BY o_year"""

  /** TPC-H Q9 (adapted): product-type profit by nation and year. The
    * reference's `ps_supplycost` lives in the absent `partsupp` table; the
    * cost proxy is 10% of the part's retail price per unit — same join
    * graph (part⋈lineitem⋈supplier⋈orders⋈nation), same LIKE filter. */
  val q9ProductProfit: Q = (s, d) => {
    val redParts = part(s, d).filter(col("p_name").like("%red%"))
      .select(col("p_partkey"), col("p_retailprice"))
    val suppNation = supplier(s, d)
      .join(broadcast(nation(s, d)), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name"))
    val amount = col("l_extendedprice") * (lit(1.0) - col("l_discount")) -
      col("p_retailprice") * lit(0.1) * col("l_quantity")
    lineitem(s, d)
      .join(broadcast(redParts), col("l_partkey") === col("p_partkey"))
      .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(suppNation), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("n_name").as("sell_nation"),
               year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(dsum(amount).as("sum_profit"))
      .orderBy(col("sell_nation"), col("o_year"))
  }

  val q9ProductProfitSql: String = s"""
    SELECT n_name AS sell_nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
           ${sqlDsum("l_extendedprice * (1.0 - l_discount) - p_retailprice * 0.1 * l_quantity")} AS sum_profit
    FROM lineitem
    JOIN part     ON l_partkey = p_partkey
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%red%'
    GROUP BY sell_nation, o_year
    ORDER BY sell_nation, o_year"""

  /** TPC-H Q13: customer order-count distribution — LEFT OUTER join with a
    * predicate on the right side (non-urgent orders only), then a
    * histogram of counts. Customers with zero qualifying orders survive
    * the outer join and land in the c_count=0 bucket. */
  val q13CustomerDistribution: Q = (s, d) =>
    customer(s, d)
      .join(orders(s, d).filter(col("o_orderpriority") =!= "1-URGENT"),
            col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)

  val q13CustomerDistributionSql: String = """
    SELECT c_count, COUNT(*) AS custdist
    FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count
          FROM customer LEFT OUTER JOIN orders
            ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
          GROUP BY c_custkey)
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC"""

  /** TPC-H Q14: promotion effect — percent of one month's revenue from
    * PROMO-type parts. Conditional-sum ratio, decimal-exact both sides. */
  val q14PromoRevenue: Q = (s, d) => {
    val vol = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1997-09-01").cast("timestamp") &&
              col("l_shipdate") <  lit("1997-10-01").cast("timestamp"))
      .join(broadcast(part(s, d).select(col("p_partkey"), col("p_type"))),
            col("l_partkey") === col("p_partkey"))
      .agg((lit(100.0) *
            dsum(when(col("p_type") === "PROMO", vol).otherwise(lit(0.0))) /
            dsum(vol)).as("promo_revenue"))
  }

  val q14PromoRevenueSql: String = s"""
    SELECT 100.0 * ${sqlDsum("CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END")} /
           ${sqlDsum("l_extendedprice * (1.0 - l_discount)")} AS promo_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-09-01'
      AND l_shipdate <  TIMESTAMP '1997-10-01'"""

  /** TPC-H Q15: top supplier — suppliers whose quarterly revenue equals
    * the maximum. The scalar subquery (max over the revenue view) is a
    * one-row aggregate broadcast-crossed against the view, never a per-row
    * re-evaluation; the double equality is safe because both engines
    * derive the doubles from identical decimal sums. */
  val q15TopSupplier: Q = (s, d) => {
    val revenue = lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
              col("l_shipdate") <  lit("1996-04-01").cast("timestamp"))
      .groupBy(col("l_suppkey"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("total_revenue"))
    val maxRev = revenue.agg(max(col("total_revenue")).as("max_revenue"))
    revenue.crossJoin(broadcast(maxRev))
      .filter(col("total_revenue") === col("max_revenue"))
      .join(broadcast(supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
      .orderBy(col("s_suppkey"))
  }

  val q15TopSupplierSql: String = s"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             ${sqlDsum("l_extendedprice * (1.0 - l_discount)")} AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s_suppkey"""

  /** TPC-H Q17: small-quantity-order revenue — lineitems of Brand#3 parts
    * whose quantity is below 20% of that part's average quantity. The
    * correlated per-part subquery is de-correlated into a grouped average
    * + broadcast equi-join (restricting the average input to Brand#3
    * parts' lineitems first — per-part averages are unchanged and the
    * aggregate shrinks 25×). */
  val q17SmallQtyRevenue: Q = (s, d) => {
    val b3Keys = part(s, d).filter(col("p_brand") === "Brand#3")
      .select(col("p_partkey"))
    val b3Items = lineitem(s, d)
      .join(broadcast(b3Keys), col("l_partkey") === col("p_partkey"), "left_semi")
    val perPartAvg = b3Items.groupBy(col("l_partkey").as("pk"))
      .agg((davg(col("l_quantity")) * lit(0.2)).as("qty_threshold"))
    b3Items
      .join(broadcast(perPartAvg), col("l_partkey") === col("pk"))
      .filter(col("l_quantity") < col("qty_threshold"))
      .agg((dsum(col("l_extendedprice")) / lit(7.0)).as("avg_yearly"))
  }

  val q17SmallQtyRevenueSql: String = s"""
    SELECT ${sqlDsum("l_extendedprice")} / 7.0 AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
    JOIN (SELECT l_partkey AS pk,
                 ${sqlDavg("l_quantity")} * 0.2 AS qty_threshold
          FROM lineitem
          WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_brand = 'Brand#3')
          GROUP BY l_partkey) t ON pk = p_partkey
    WHERE p_brand = 'Brand#3' AND l_quantity < qty_threshold"""

  /** TPC-H Q18: large-volume customers — orders whose total quantity
    * exceeds 250, with customer context. The IN-over-HAVING subquery is
    * the grouped aggregate itself reused as the probe side. */
  val q18LargeVolume: Q = (s, d) => {
    val bigOrders = lineitem(s, d).groupBy(col("l_orderkey").as("big_okey"))
      .agg(dsum(col("l_quantity")).as("sum_qty"))
      .filter(col("sum_qty") > 250.0)
    orders(s, d)
      .join(bigOrders, col("o_orderkey") === col("big_okey"))
      .join(broadcast(customer(s, d)), col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
              col("o_orderdate"), col("o_totalprice"), col("sum_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(20)
  }

  val q18LargeVolumeSql: String = s"""
    SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice, sum_qty
    FROM orders
    JOIN (SELECT l_orderkey AS big_okey, ${sqlDsum("l_quantity")} AS sum_qty
          FROM lineitem GROUP BY l_orderkey
          HAVING ${sqlDsum("l_quantity")} > 250.0) ON o_orderkey = big_okey
    JOIN customer ON o_custkey = c_custkey
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 20"""

  /** TPC-H Q19: discounted revenue — three OR'd brand/size/quantity
    * blocks. The part predicates stay on the broadcast dimension and the
    * quantity bounds on the fact scan (the OR of per-block quantity ranges
    * relaxes to l_quantity BETWEEN 1 AND 30, pushed to parquet; the exact
    * block predicate applies post-join). */
  val q19DiscountedRevenue: Q = (s, d) => {
    val p = broadcast(part(s, d).filter(
      col("p_brand").isin("Brand#1", "Brand#2", "Brand#3") && col("p_size") >= 1)
      .select(col("p_partkey"), col("p_brand"), col("p_size")))
    lineitem(s, d)
      .filter(col("l_quantity") >= 1 && col("l_quantity") <= 30)
      .join(p, col("l_partkey") === col("p_partkey"))
      .filter(
        (col("p_brand") === "Brand#1" && col("p_size").between(1, 15) &&
         col("l_quantity").between(1, 11)) ||
        (col("p_brand") === "Brand#2" && col("p_size").between(1, 25) &&
         col("l_quantity").between(10, 20)) ||
        (col("p_brand") === "Brand#3" && col("p_size").between(1, 35) &&
         col("l_quantity").between(20, 30)))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
           count(lit(1)).as("n_items"))
  }

  val q19DiscountedRevenueSql: String = s"""
    SELECT ${sqlDsum("l_extendedprice * (1.0 - l_discount)")} AS revenue,
           COUNT(*) AS n_items
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)"""

  /** TPC-H Q22 (adapted): global sales opportunity — well-funded customers
    * (balance above the positive-balance average) who never placed an
    * URGENT order. The reference's phone-prefix country code has no
    * counterpart column; the group key is `c_nationkey % 5`, and the
    * reference's NOT EXISTS over all orders is narrowed to URGENT orders
    * (this corpus has no order-less customers, which would make the
    * original predicate vacuous). Scalar subquery = one-row broadcast;
    * NOT EXISTS = anti join. */
  val q22GlobalSales: Q = (s, d) => {
    val avgBal = customer(s, d).filter(col("c_acctbal") > 0.0)
      .agg(davg(col("c_acctbal")).as("avg_bal"))
    val urgent = orders(s, d).filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey"))
    customer(s, d)
      .crossJoin(broadcast(avgBal))
      .filter(col("c_acctbal") > col("avg_bal"))
      .join(urgent, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy((col("c_nationkey") % 5).as("cust_group"))
      .agg(count(lit(1)).as("numcust"), dsum(col("c_acctbal")).as("totacctbal"))
      .orderBy(col("cust_group"))
  }

  val q22GlobalSalesSql: String = s"""
    SELECT c_nationkey % 5 AS cust_group, COUNT(*) AS numcust,
           ${sqlDsum("c_acctbal")} AS totacctbal
    FROM customer
    WHERE c_acctbal > (SELECT ${sqlDavg("c_acctbal")} FROM customer WHERE c_acctbal > 0.0)
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
    GROUP BY cust_group
    ORDER BY cust_group"""

  // ---- registration -------------------------------------------------------

  val queries: Map[String, Q] = Map(
    "q4_order_priority"        -> q4OrderPriority,
    "q7_volume_shipping"       -> q7VolumeShipping,
    "q8_market_share"          -> q8MarketShare,
    "q9_product_profit"        -> q9ProductProfit,
    "q13_customer_distribution" -> q13CustomerDistribution,
    "q14_promo_revenue"        -> q14PromoRevenue,
    "q15_top_supplier"         -> q15TopSupplier,
    "q17_small_qty_revenue"    -> q17SmallQtyRevenue,
    "q18_large_volume"         -> q18LargeVolume,
    "q19_discounted_revenue"   -> q19DiscountedRevenue,
    "q22_global_sales"         -> q22GlobalSales,
  )

  val oracleSql: Map[String, String] = Map(
    "q4_order_priority"        -> q4OrderPrioritySql,
    "q7_volume_shipping"       -> q7VolumeShippingSql,
    "q8_market_share"          -> q8MarketShareSql,
    "q9_product_profit"        -> q9ProductProfitSql,
    "q13_customer_distribution" -> q13CustomerDistributionSql,
    "q14_promo_revenue"        -> q14PromoRevenueSql,
    "q15_top_supplier"         -> q15TopSupplierSql,
    "q17_small_qty_revenue"    -> q17SmallQtyRevenueSql,
    "q18_large_volume"         -> q18LargeVolumeSql,
    "q19_discounted_revenue"   -> q19DiscountedRevenueSql,
    "q22_global_sales"         -> q22GlobalSalesSql,
  )
}
