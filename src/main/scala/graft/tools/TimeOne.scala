package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc single-query warm timer at bench conditions (local[32], sf0.1):
  * `runMain graft.tools.TimeOne <query> [sfDir]` — one warm-up pass, then
  * two timed passes through the noop sink, exactly Bench's shape. For
  * setting a first budget on a new query without a full 274-query run. */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val d = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", s"${64 * 1024 * 1024}")
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def run(): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, d)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"[timeone] $name warmup=${run()}%.3f pass1=${run()}%.3f pass2=${run()}%.3f")
    spark.stop()
  }
}
