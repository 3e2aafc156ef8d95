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
  /** events.ts has shipped in two physical encodings across corpus
    * generations: Parquet TIMESTAMP(NANOS) — which Spark's reader rejects
    * ([PARQUET_TYPE_ILLEGAL]) unless read as raw longs — and plain
    * TIMESTAMP(MICROS) NTZ. Normalize BOTH to session-zone TimestampType
    * so every downstream query sees one shape: nanos read as longs and
    * convert ns → µs with integer division (lossless — the corpus has no
    * sub-µs components; double-division would lose precision at ~1.7e18
    * ns); NTZ micros cast straight across (session zone is UTC
    * everywhere here, so the instant is unchanged). */
  private[graft] def normalizeTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    df.schema("ts").dataType match {
      case LongType => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast("timestamp"))
      case _ => df
    }
  }
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeTs(load(s, d, "events"))
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
    normalizeTs(
      s.readStream.schema(schema).option("pathGlobFilter", "events.parquet")
        .parquet(d))
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
