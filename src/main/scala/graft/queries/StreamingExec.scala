package graft.queries

import graft.Tables
import graft.streaming.Streams
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Oracle-checked queries that execute through REAL Structured Streaming
  * runs (file source → watermarked stateful operator → memory sink), not
  * batch twins: the driver's DuckDB oracle then certifies the streaming
  * engine's output itself. Complement to the `stream_*` batch-equivalence
  * entries in [[Relational]] and the MemoryStream semantics tests in
  * StreamsSpec. */
object StreamingExec {
  type Q = (SparkSession, String) => DataFrame

  /** Run a streaming DataFrame to completion into a memory sink and hand
    * back the materialized result. Query names are unique per invocation —
    * Verify and the two Bench passes run each entry repeatedly in one
    * session. */
  private def runToMemory(df: DataFrame, mode: String): DataFrame = {
    val qname = "stream_exec_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    val q = df.writeStream.format("memory").queryName(qname)
      .outputMode(mode).option("checkpointLocation", ckpt).start()
    try {
      q.processAllAvailable()
    } finally q.stop()
    df.sparkSession.table(qname)
  }

  /** [[Streams.tumblingCounts]] executed AS A STREAM over the events
    * corpus; the window/group counts must match DuckDB exactly.
    * (sum_value is dropped: the streaming operator's plain double sum is
    * order-dependent across engines; counts are exact.) */
  val qStreamTumblingExec: Q = (s, d) => {
    val counts = Streams.tumblingCounts(Tables.eventsStream(s, d),
      window_ = "1 hour", watermark = "2 hours")
    runToMemory(counts, "complete")
      .select(col("window.start").as("hour"), col("event_type"), col("n"))
  }

  val qStreamTumblingExecSql: String = """
    SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour, event_type,
           COUNT(*) AS n
    FROM events GROUP BY 1, 2"""

  /** Watermarked streaming dedup executed as a stream: event counts per
    * type after dropping duplicate event_ids. The corpus has unique ids,
    * so the oracle is the plain per-type count — the value of the check is
    * that the stateful dedup operator ran and dropped nothing it
    * shouldn't. */
  val qStreamDedupExec: Q = (s, d) => {
    val deduped = Streams.dedupStream(Tables.eventsStream(s, d), "event_id", "2 hours")
      .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
    runToMemory(deduped, "complete")
  }

  val qStreamDedupExecSql: String = """
    SELECT event_type, COUNT(DISTINCT event_id) AS n
    FROM events GROUP BY 1"""

  /** Streaming CURATION INGEST executed as a stream: the crawl-tail shape
    * — documents arrive, a quality gate filters (token band + stopword
    * ratio, the pipeline_compose gate), and a stateful aggregation groups
    * surviving docs by (lang, content hash), yielding the live dedup
    * group table. One stateful operator (streaming aggregations don't
    * chain), complete mode; counts are exact and order-independent, so
    * the streaming engine's own output sits on the DuckDB oracle. */
  val qStreamCurationExec: Q = (s, d) => {
    import graft.functions.{TextFunctions => TF}
    val docs = Tables.documentsStream(s, d)
    val toks = TF.tokens(col("text"))
    val gated = docs
      .withColumn("n_toks", size(toks).cast("long"))
      .withColumn("sr", TF.stopwordRatio(col("text"), "en"))
      .filter(col("n_toks") >= 5 && col("n_toks") <= 1000 && col("sr") <= 0.6)
    val groups = gated
      .groupBy(col("lang"), md5(col("text")).as("content_hash"))
      .agg(count(lit(1)).as("n_copies"), sum(col("n_toks")).as("sum_toks"))
    runToMemory(groups, "complete")
  }

  val qStreamCurationExecSql: String = """
    WITH gated AS (
      SELECT lang, text,
             CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_toks,
             CAST(len(list_filter(regexp_split_to_array(trim(text), '\s+'),
               t -> list_contains(['the','a','of','and','to','in','is','it','that','for'], t))) AS DOUBLE)
               / GREATEST(CAST(len(regexp_split_to_array(trim(text), '\s+')) AS DOUBLE), 1.0) AS sr
      FROM documents)
    SELECT lang, md5(text) AS content_hash,
           CAST(COUNT(*) AS BIGINT) AS n_copies,
           CAST(SUM(n_toks) AS BIGINT) AS sum_toks
    FROM gated
    WHERE n_toks >= 5 AND n_toks <= 1000 AND sr <= 0.6
    GROUP BY lang, md5(text)"""

  val queries: Map[String, Q] = Map(
    "stream_tumbling_exec" -> qStreamTumblingExec,
    "stream_dedup_exec"    -> qStreamDedupExec,
    "stream_curation_exec" -> qStreamCurationExec)

  val oracleSql: Map[String, String] = Map(
    "stream_tumbling_exec" -> qStreamTumblingExecSql,
    "stream_dedup_exec"    -> qStreamDedupExecSql,
    "stream_curation_exec" -> qStreamCurationExecSql)
}
