package graft.functions

import graft.SparkSpec
import graft.Tables
import org.apache.spark.sql.functions._

/** Portable HLL: estimate quality vs exact distinct, the sketch invariants
  * (duplicate-blind, partition-order-independent), and the plan shape
  * (pure hash aggregates — no object agg, no UDF).
  */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private def li = Tables.lineitem(spark, sf)

  test("estimate within HLL error bound of exact distinct per group") {
    val est = Sketches.hllDistinct(li, Seq("l_returnflag"), col("l_partkey"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val exact = li.groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.keySet == exact.keySet)
    exact.foreach { case (k, n) =>
      val rel = math.abs(est(k) - n) / n.toDouble
      // 1.04/sqrt(256) = 6.5% std error; allow 3 sigma
      assert(rel < 0.20, s"$k: est=${est(k)} exact=$n rel=$rel")
    }
  }

  test("duplicating every row leaves the estimate bit-identical") {
    val once = Sketches.hllDistinct(li, Seq("l_returnflag"), col("l_partkey"))
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSet
    val twice = Sketches.hllDistinct(li.union(li), Seq("l_returnflag"), col("l_partkey"))
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSet
    assert(once == twice)
  }

  test("estimate independent of partitioning (register merge is exact)") {
    val a = Sketches.hllDistinct(li.repartition(7), Seq("l_returnflag"), col("l_partkey"))
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSet
    val b = Sketches.hllDistinct(li.coalesce(1), Seq("l_returnflag"), col("l_partkey"))
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSet
    assert(a == b)
  }

  test("linear-counting regime (m >> n) is near-exact") {
    // 200 distinct partkeys per flag at sf0.001; p=12 gives 4096 registers,
    // so the small-range correction applies and the estimate tightens to
    // the linear-counting bound (~1/sqrt(m) relative).
    val est = Sketches.hllDistinct(li, Seq("l_returnflag"), col("l_partkey"), p = 12)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    est.values.foreach { e =>
      assert(math.abs(e - 200.0) / 200.0 < 0.05, s"est=$e for n=200 at p=12")
    }
  }

  test("plan is two codegen hash aggregates — no UDAF, no object agg") {
    val plan = Sketches.hllDistinct(li, Seq("l_returnflag"), col("l_partkey"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate"))
    assert(!plan.contains("ObjectHashAggregate"), "sketch must stay codegen")
    assert(!plan.toLowerCase.contains("udf"))
  }

  test("histogram quantiles bracket the exact quantile within one bucket width") {
    import spark.implicits._
    val (lo, width, bins) = (900.0, 1024.0, 128)
    val qs = Seq(0.25, 0.5, 0.9)
    val est = Sketches.histQuantiles(li, Seq("l_returnflag"), col("l_extendedprice"),
        lo, width, bins, qs)
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    val flags = li.select("l_returnflag").distinct().as[String].collect()
    for (f <- flags; q <- qs) {
      val exact = li.filter(col("l_returnflag") === f)
        .stat.approxQuantile("l_extendedprice", Array(q), 0.0).head
      val e = est((f, q))
      assert(exact <= e && e - exact <= width + 1e-6,
        s"q=$q flag=$f: exact=$exact est=$e (must be upper edge of exact's bucket)")
    }
    // partitioning independence: bucket counting is exact arithmetic
    val a = Sketches.histQuantiles(li.repartition(11), Seq("l_returnflag"),
      col("l_extendedprice"), lo, width, bins, qs).collect()
      .map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    assert(a == est)
  }

  test("count-min never under-counts, is exact at generous width, and merges by sum") {
    import spark.implicits._
    val probes = Seq(1L, 2L, 3L, 5L, 8L, 999999L)
    val exact = li.groupBy(col("l_suppkey")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def estimates(depth: Int, width: Int): Map[Long, Long] = {
      val sk = Sketches.countMin(li, Nil, col("l_suppkey"), depth, width)
      Sketches.cmEstimate(sk, probes, depth, width)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    // the one-sided error guarantee: estimate >= true count, always
    val narrow = estimates(depth = 4, width = 32)
    probes.foreach { p =>
      assert(narrow(p) >= exact.getOrElse(p, 0L), s"CM under-counted key $p")
    }
    // width >> distinct keys: every probe resolves exactly (incl. absent -> 0)
    val wide = estimates(depth = 4, width = 4096)
    probes.foreach { p =>
      assert(wide(p) == exact.getOrElse(p, 0L), s"wide CM not exact for $p: ${wide(p)}")
    }
    // weighted sketch: quantity-weighted supplier mass, exact at width
    val wSk = Sketches.countMin(li, Nil, col("l_suppkey"), 4, 4096,
      weight = col("l_quantity").cast("long"))
    val wEst = Sketches.cmEstimate(wSk, probes, 4, 4096)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val wExact = li.groupBy(col("l_suppkey"))
      .agg(sum(col("l_quantity").cast("long")).as("w"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    probes.foreach { p =>
      assert(wEst(p) == wExact.getOrElse(p, 0L), s"weighted CM wrong for $p")
    }
    // grouped estimates: per-flag counts, exact at generous width
    val gSk = Sketches.countMin(li, Seq("l_returnflag"), col("l_suppkey"), 4, 4096)
    val gEst = Sketches.cmEstimateGrouped(gSk, Seq("l_returnflag"), probes, 4, 4096)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val gExact = li.groupBy(col("l_returnflag"), col("l_suppkey")).count()
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val flags = li.select("l_returnflag").distinct().as[String].collect()
    for (f <- flags; p <- probes)
      assert(gEst((f, p)) == gExact.getOrElse((f, p), 0L),
        s"grouped CM wrong for ($f, $p)")
    // mergeability: sum of two half-corpus sketches == whole-corpus sketch
    val parts = li.randomSplit(Array(0.5, 0.5), seed = 7)
    val merged = Sketches.countMin(parts(0), Nil, col("l_suppkey"), 4, 256)
      .unionAll(Sketches.countMin(parts(1), Nil, col("l_suppkey"), 4, 256))
      .groupBy(col("__r"), col("__bucket")).agg(sum(col("__cnt")).as("__cnt"))
    val whole = Sketches.countMin(li, Nil, col("l_suppkey"), 4, 256)
    assert(merged.select("__r", "__bucket", "__cnt").as[(Int, Long, Long)].collect().toSet ==
      whole.select("__r", "__bucket", "__cnt").as[(Int, Long, Long)].collect().toSet)
  }
}
