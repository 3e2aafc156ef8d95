package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin result equals the plain join on skewed data") {
    // 90% of big rows share key 1 — the degenerate case
    val big = (1 to 2000).map(i => (if (i % 10 == 0) i.toLong % 5 + 2 else 1L, i))
      .toDF("k", "payload")
    val small = Seq((1L, "hot"), (2L, "warm"), (3L, "cool")).toDF("k", "label")
    val plain = big.join(small, Seq("k")).select("k", "payload", "label")
      .as[(Long, Int, String)].collect().toSet
    val salted = Skew.saltedJoin(big, small, "k", salts = 8)
      .select("k", "payload", "label").as[(Long, Int, String)].collect().toSet
    assert(salted == plain && plain.nonEmpty)
  }

  test("saltedJoin spreads the hot key across salt buckets") {
    val big = (1 to 1000).map(i => (1L, i)).toDF("k", "payload")
    val small = Seq((1L, "x")).toDF("k", "label")
    val scatter = pmod(xxhash64(col("k"), monotonically_increasing_id()), lit(8))
    val nSalts = big.withColumn("__salt", scatter)
      .select("__salt").distinct().count()
    assert(nSalts >= 6, s"hot key landed in only $nSalts salt buckets")
  }

  test("heavyHitters surfaces the dominant keys in order") {
    val df = (1 to 100).map(i => if (i <= 60) 7L else if (i <= 90) 3L else i.toLong)
      .toDF("k")
    val top = Skew.heavyHitters(df, col("k"), 2).as[(Long, Long)].collect()
    assert(top(0) == (7L, 60L) && top(1) == (3L, 30L))
  }
}
