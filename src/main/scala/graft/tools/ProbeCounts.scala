package graft.tools

import org.apache.spark.sql.functions._
import graft.functions.{Curation, Dedup}

/** Throwaway sizing probe (r20): pair/edge counts feeding CC. */
object ProbeCounts {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val s = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val w = org.apache.spark.sql.expressions.Window.partitionBy(md5(col("text")))
    val exact = graft.Tables.documents(s, d)
      .withColumn("__keep", min(col("doc_id")).over(w))
      .filter(col("doc_id") === col("__keep"))
      .select(col("doc_id"), col("text"))
    val cleaned = Curation.lineDedup(exact, "doc_id",
        Curation.tokenWindows(col("text"), 3), minDf = 3L)
      .select(col("id").as("doc_id"), col("text_clean"))
    val recipePairs = Dedup.minhashLsh(cleaned, "doc_id", "text_clean",
      numHashes = 16, bands = 8, shingleK = 2, threshold = 0.4)
    println(s"[probe] recipe pairs = ${recipePairs.count()}")
    val compPairs = Dedup.ngramJaccardDups(graft.Tables.documents(s, d), "doc_id", "text",
      blockCol = col("lang"), shingleK = 2, threshold = 0.25)
    println(s"[probe] components pairs = ${compPairs.count()}")
    val evalPairs = Dedup.minhashLsh(graft.Tables.documents(s, d), "doc_id", "text",
      numHashes = 16, bands = 8, shingleK = 2, threshold = 0.4)
    println(s"[probe] eval-style minhash pairs over raw docs = ${evalPairs.count()}")
    s.stop()
  }
}
