package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the round-6 analytics batch: BFS semantics, OLS exactness against
  * an independently computed fit, the expectations verdicts, ntile binning
  * invariants, and collocation score bounds. */
class Relational5Spec extends SparkSpec {
  import spark.implicits._

  test("graph_bfs: dist 0 is the single seed and frontiers are disjoint") {
    val rows = Relational5.qGraphBfs(spark, sf)
      .as[(Int, Long)].collect().toMap
    assert(rows.getOrElse(0, 0L) == 1L, s"seed level must be one node: $rows")
    assert(rows.keys.forall(k => k >= 0 && k <= 6))
    // every counted node is counted at exactly one distance (histogram sums
    // to the visited-set size, which is bounded by the node universe)
    assert(rows.values.forall(_ > 0))
  }

  test("graph_bfs: distances obey the triangle property on a known edge") {
    // any neighbor of the seed must be at distance exactly 1 — recompute
    // one neighborhood independently
    val e0 = graft.Tables.lineitem(spark, sf)
      .join(graft.Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
      .select((col("o_custkey") * 2).as("src"), (col("l_suppkey") * 2 + 1).as("dst"))
      .distinct()
    val und = e0.unionAll(e0.select(col("dst").as("src"), col("src").as("dst")))
    val seed = und.agg(min(col("src"))).as[Long].head()
    val nbrs = und.filter(col("src") === seed).select(col("dst")).as[Long].collect().toSet
    val hist = Relational5.qGraphBfs(spark, sf).as[(Int, Long)].collect().toMap
    assert(hist.getOrElse(1, 0L) == nbrs.size.toLong,
      s"level-1 count ${hist.get(1)} != direct neighbor count ${nbrs.size}")
  }

  test("agg_linreg matches an independent least-squares fit") {
    val got = Relational5.qAggLinreg(spark, sf)
      .as[(String, Long, Double, Double)].collect()
      .map(r => r._1 -> (r._3, r._4)).toMap
    // independent fit on the same cent-quantized inputs, in plain Scala
    val rows = graft.Tables.lineitem(spark, sf)
      .select(col("l_returnflag"),
        (col("l_quantity").cast("decimal(18,2)") * 100).cast("long"),
        (col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long"))
      .as[(String, Long, Long)].collect()
    rows.groupBy(_._1).foreach { case (flag, rs) =>
      val n = rs.length.toDouble
      val sx = rs.map(_._2.toDouble).sum; val sy = rs.map(_._3.toDouble).sum
      val sxy = rs.map(r => r._2.toDouble * r._3).sum
      val sxx = rs.map(r => r._2.toDouble * r._2).sum
      val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
      val icept = (sy * sxx - sx * sxy) / ((n * sxx - sx * sx) * 100.0)
      val (gs, gi) = got(flag)
      assert(math.abs(gs - slope) < 1e-9 * math.abs(slope),
        s"$flag slope $gs vs $slope")
      assert(math.abs(gi - icept) < 1e-6 * math.abs(icept),
        s"$flag intercept $gi vs $icept")
    }
  }

  test("pipeline_expectations: verdicts match violations and tax rule fails") {
    val rows = Relational5.qPipelineExpectations(spark, sf)
      .as[(String, String, Long, Long, Long)].collect()
    assert(rows.length == 9)
    rows.foreach { case (tab, rule, checked, viol, pass) =>
      assert(checked > 0, s"$tab.$rule checked nothing")
      assert(viol >= 0 && viol <= checked)
      assert(pass == (if (viol == 0) 1L else 0L), s"$tab.$rule verdict wrong")
    }
    val tax = rows.find(r => r._2 == "tax_le_005").get
    assert(tax._4 > 0, "the tax rule is designed to fail on this corpus")
    val refs = rows.filter(_._2.endsWith("_in_orders"))
    assert(refs.forall(_._4 == 0L), "referential integrity should hold")
  }

  test("pipeline_binning: bins are ordered, near-equal, and cover each segment") {
    val rows = Relational5.qPipelineBinning(spark, sf)
      .selectExpr("segment", "bin", "n", "lo", "hi")
      .as[(String, Int, Long, Double, Double)].collect()
    rows.groupBy(_._1).foreach { case (seg, bins) =>
      assert(bins.map(_._2).sorted.toSeq == (1 to 5), s"$seg missing bins")
      // equal-frequency: ntile sizes differ by at most 1
      val ns = bins.map(_._3)
      assert(ns.max - ns.min <= 1, s"$seg sizes $ns")
      // value ranges are non-overlapping in bin order (ties may touch)
      val ord = bins.sortBy(_._2)
      ord.sliding(2).foreach {
        case Array(a, b) => assert(a._5 <= b._4, s"$seg bins overlap: $a $b")
        case _           => ()
      }
    }
  }

  test("text_collocations: scores are valid Dice ppm and sorted") {
    val rows = Relational5.qTextCollocations(spark, sf)
      .as[(String, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (gram, nxy, ppm) =>
      assert(gram.split(" ").length == 2)
      assert(nxy >= 5)
      assert(ppm >= 0 && ppm <= 1000000, s"$gram dice $ppm out of range")
    }
    assert(rows.map(_._3).toSeq == rows.map(_._3).sortBy(-_).toSeq, "not sorted")
  }
}
