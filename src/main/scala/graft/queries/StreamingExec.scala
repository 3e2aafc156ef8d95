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

  val queries: Map[String, Q] = Map(
    "stream_tumbling_exec" -> qStreamTumblingExec,
    "stream_dedup_exec"    -> qStreamDedupExec)

  val oracleSql: Map[String, String] = Map(
    "stream_tumbling_exec" -> qStreamTumblingExecSql,
    "stream_dedup_exec"    -> qStreamDedupExecSql)
}
