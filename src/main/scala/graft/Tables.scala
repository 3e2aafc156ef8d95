package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the harness corpus (TESTDATA.md): TPC-H-ish star schema +
  * `events` + `documents` + `embeddings`, one parquet per table under a
  * scale-factor directory.
  *
  * All loads are plain `spark.read.parquet` so Catalyst keeps full pushdown
  * (PushedFilters / ReadSchema) into the parquet scan. Nothing is cached
  * here: at 100 TB the tables do not fit in memory, and caching would hide
  * scan-pruning regressions from the benchmarks.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  /** events.ts is Parquet TIMESTAMP(NANOS), which Spark's reader rejects
    * ([PARQUET_TYPE_ILLEGAL]). Read it as raw nanos (legacy nanosAsLong)
    * and convert ns → µs with integer division (the corpus has no sub-µs
    * components, so this is lossless; a double-division would lose
    * precision at ~1.7e18 ns). */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(s, d, "events")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** `events` as a STREAMING DataFrame (file source over the same parquet,
    * same ns → µs conversion as [[events]]). `maxFilesPerTrigger` is left
    * default so the whole directory is one micro-batch locally; at scale
    * the same pipeline tails a landing directory incrementally. */
  def eventsStream(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = s.read.parquet(s"$d/events.parquet").schema
    // the file source wants a directory: stream the sf dir, globbed to the
    // events file
    s.readStream.schema(schema).option("pathGlobFilter", "events.parquet")
      .parquet(d)
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  }

  /** `documents` as a STREAMING DataFrame — the crawl-landing-directory
    * shape: locally one micro-batch over the corpus file; at scale the
    * same pipeline tails the landing directory incrementally. */
  def documentsStream(s: SparkSession, d: String): DataFrame = {
    val schema = s.read.parquet(s"$d/documents.parquet").schema
    s.readStream.schema(schema).option("pathGlobFilter", "documents.parquet")
      .parquet(d)
  }

  /** `embeddings` as a STREAMING DataFrame — the embedding-service
    * landing-directory shape (vectors arrive as they're computed). */
  def embeddingsStream(s: SparkSession, d: String): DataFrame = {
    val schema = s.read.parquet(s"$d/embeddings.parquet").schema
    s.readStream.schema(schema).option("pathGlobFilter", "embeddings.parquet")
      .parquet(d)
  }
}
