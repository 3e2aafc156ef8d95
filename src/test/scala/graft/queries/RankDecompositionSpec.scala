package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Differential pin for the histogram-decomposed global ranking behind
  * `window_percent_rank` (Relational.qWindowPercentRank): rank =
  * cumulative-count-below from the value histogram + partitioned
  * row_number, percent_rank = (rk-1)/(n-1), and the CLOSED-FORM ntile
  * bucket rule (first n mod b buckets take ceil(n/b) rows) — each
  * checked against Spark's own `percent_rank()`/`ntile()` over the naive
  * unpartitioned window on randomized duplicate-heavy data. The naive
  * window is the single-task plan we refuse to ship; here it is the
  * ORACLE for the decomposition that replaces it. */
class RankDecompositionSpec extends SparkSpec {

  test("histogram-decomposed rank/percent_rank/ntile equals Spark's window functions") {
    import spark.implicits._
    val r = new scala.util.Random(7)
    for (trial <- 1 to 4) {
      val n = Seq(37, 96, 100, 257)(trial - 1) // exercises n mod 4 = 1, 0, 0, 1
      val b = Seq(4, 7, 4, 13)(trial - 1)
      // duplicate-heavy values force the tie-break path
      val rows = (0 until n).map(i => (i.toLong, (r.nextInt(12) * 25).toLong))
      val df = rows.toDF("id", "v")

      // naive single-window oracle
      val w = Window.orderBy(col("v"), col("id"))
      val expect = df
        .withColumn("pr", percent_rank().over(w))
        .withColumn("bucket", ntile(b).over(w).cast("long"))
        .select("id", "pr", "bucket")
        .as[(Long, Double, Long)].collect().sortBy(_._1)

      // the decomposition under test (mirrors qWindowPercentRank)
      val wq = Window.orderBy(col("hv")).rowsBetween(Window.unboundedPreceding, -1)
      val below = df.groupBy(col("v").as("hv")).agg(count(lit(1)).as("c"))
        .withColumn("below", coalesce(sum(col("c")).over(wq), lit(0L)))
        .select(col("hv").as("v"), col("below"))
      val tot = df.agg(count(lit(1)).as("n_tot"))
      val wg = Window.partitionBy(col("v")).orderBy(col("id"))
      val got = df
        .join(broadcast(below), Seq("v"))
        .withColumn("rk", col("below") + row_number().over(wg))
        .crossJoin(broadcast(tot))
        .withColumn("q", expr(s"n_tot div $b")).withColumn("r", col("n_tot") % b)
        .withColumn("cut", col("r") * (col("q") + 1))
        .withColumn("pr",
          when(col("n_tot") > 1,
            (col("rk") - 1).cast("double") / (col("n_tot") - 1).cast("double"))
            .otherwise(lit(0.0)))
        .withColumn("bucket",
          when(col("rk") <= col("cut"), expr("(rk - 1) div (q + 1)") + 1)
            .otherwise(col("r") + expr("(rk - 1 - cut) div q") + 1).cast("long"))
        .select("id", "pr", "bucket")
        .as[(Long, Double, Long)].collect().sortBy(_._1)

      assert(got.length == expect.length, s"trial $trial: row counts differ")
      got.zip(expect).foreach { case ((idG, prG, bkG), (idE, prE, bkE)) =>
        assert(idG == idE, s"trial $trial: id order")
        assert(prG == prE, s"trial $trial id=$idG: percent_rank $prG != $prE")
        assert(bkG == bkE, s"trial $trial id=$idG: ntile($b) $bkG != $bkE")
      }
    }
  }
}
