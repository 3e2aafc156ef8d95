package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RelationalSpec extends SparkSpec {
  import spark.implicits._

  test("agg_approx stays within declared error of exact answers") {
    val approx = Relational2.qAggApprox(spark, sf)
      .select("l_returnflag", "approx_parts", "approx_median")
      .as[(String, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val exact = graft.Tables.lineitem(spark, sf).groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("parts"),
           expr("percentile(l_extendedprice, 0.5)").as("median"))
      .as[(String, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    exact.foreach { case (flag, (parts, median)) =>
      val (aParts, aMedian) = approx(flag)
      assert(math.abs(aParts - parts).toDouble / parts < 0.1,
        s"$flag: approx distinct $aParts vs $parts")
      assert(math.abs(aMedian - median) / median < 0.1,
        s"$flag: approx median $aMedian vs $median")
    }
  }

  test("entry (flagship) returns rows") {
    assert(graft.SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key has a matching query") {
    val qs = graft.SparkEntry.queries.keySet
    val orphans = graft.SparkEntry.oracleSql.keySet -- qs
    assert(orphans.isEmpty, s"oracleSql without queries: $orphans")
  }
}
