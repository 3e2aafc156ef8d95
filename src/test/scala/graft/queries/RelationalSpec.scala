package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RelationalSpec extends SparkSpec {
  import spark.implicits._

  test("agg_approx verdict columns certify the sketch error bounds") {
    val rows = Relational2.qAggApprox(spark, sf)
      .select("l_returnflag", "exact_parts", "hll_in_3sigma", "pctl_in_band")
      .as[(String, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (flag, parts, hllOk, pctlOk) =>
      assert(parts > 0, s"$flag: exact distinct must be positive")
      assert(hllOk == 1L, s"$flag: HLL estimate outside 3-sigma of $parts")
      assert(pctlOk == 1L, s"$flag: approx median outside the p49-p51 band")
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
