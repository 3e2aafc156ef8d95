package graft.tools

import org.apache.spark.sql.functions._
import graft.functions.{Curation, Dedup, TextFunctions => TF}

/** Stage-level wall profile of pipeline_dedup_recipe (round-9 drift hunt). */
object ProfileDedupRecipe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val s = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $name ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    for (pass <- 1 to 2) {
      println(s"[profile] pass $pass")
      val w = org.apache.spark.sql.expressions.Window.partitionBy(md5(col("text")))
      val exact = time("exact") {
        val e = graft.Tables.documents(s, d)
          .withColumn("__keep", min(col("doc_id")).over(w))
          .filter(col("doc_id") === col("__keep"))
          .select(col("doc_id"), col("text"))
        e.count(); e
      }
      val cleaned = time("lineDedup") {
        val c = Curation.lineDedup(exact, "doc_id",
            Curation.tokenWindows(col("text"), 3), minDf = 3L)
          .select(col("id").as("doc_id"), col("text_clean"))
        c.count(); c
      }
      val pairs = time("minhashLsh") {
        val p = Dedup.minhashLsh(cleaned, "doc_id", "text_clean",
          numHashes = 16, bands = 8, shingleK = 2, threshold = 0.4)
        p.count(); p
      }
      val dropped = time("components") {
        val dr = Dedup.connectedComponents(pairs, "id_a", "id_b")
          .filter(col("id") =!= col("label"))
          .select(col("id").as("doc_id"))
        dr.count(); dr
      }
      time("final agg") {
        cleaned.join(dropped, Seq("doc_id"), "left_anti")
          .agg(count(lit(1)).as("n_kept"),
               sum(TF.tokenCount(col("text_clean"))).as("kept_tokens"),
               coalesce(sum(col("doc_id")), lit(0L)).as("id_checksum"))
          .collect()
      }
    }
    s.stop()
  }
}
