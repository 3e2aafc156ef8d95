package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed (pre-shuffled) tables for co-located joins.
  *
  * At 100 TB the dominant cost of a fact-fact equi-join is shuffling both
  * sides. Writing each side bucketed+sorted by the join key moves that
  * shuffle to WRITE time, once; every subsequent join on the key is a
  * zero-exchange sort-merge join (Spark reads matching buckets pairwise).
  * This is the engine's co-location contract — the same idea as the
  * chunk-aligned MDIO writes, applied to relational fact tables.
  */
object Bucketing {

  /** Persist `df` as a bucketed+sorted managed table. */
  def writeBucketed(df: DataFrame, key: String, buckets: Int, table: String): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Join two same-bucketing tables on their bucket key — plans with no
    * Exchange on either side (verified in BucketingSpec). */
  def cojoin(spark: SparkSession, leftTable: String, rightTable: String,
             key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), Seq(key))
}
