package graft.tools

import org.apache.spark.sql.SparkSession

/** A/B a single SQL conf across queries in ONE JVM (same JIT, same page
  * cache): `runMain graft.tools.AbConf <key> <valA> <valB> <query...>`.
  * Two child sessions of one context, per-session conf, alternating
  * warm reps; prints min-of-3 per arm. */
object AbConf {
  def main(args: Array[String]): Unit = {
    val Array(key, valA, valB, queries @ _*) = args.toSeq.toArray
    val root = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", s"${64 * 1024 * 1024}")
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    root.sparkContext.setLogLevel("ERROR")
    val sA = root.newSession(); sA.conf.set(key, valA)
    val sB = root.newSession(); sB.conf.set(key, valB)
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    queries.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      def run(s: SparkSession): Double = {
        val t0 = System.nanoTime()
        fn(s, d).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      run(sA); run(sB) // warm both arms
      val (as, bs) = (Array.fill(3)(0.0), Array.fill(3)(0.0))
      for (i <- 0 until 3) { as(i) = run(sA); bs(i) = run(sB) }
      println(f"[ab] $name  $key=$valA min=${as.min}%.2f  $key=$valB min=${bs.min}%.2f")
    }
    root.stop()
  }
}
