package graft.streaming

import graft.SparkSpec
import graft.queries.StreamingExec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** The memory sink is at-least-once: a retried task can re-append its
  * slice of a micro-batch. Every append-mode `stream_*_exec` fold
  * therefore dedups the sink table on the rows' natural key before
  * aggregating ([[StreamingExec.dedupSink]]). These tests pin both legs
  * of that contract: (1) a sink table with artificially-duplicated rows
  * folds to IDENTICAL output, and (2) the natural keys really are unique
  * on the real corpus, so the dedup can never drop a genuine row. */
class IdempotentFoldSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int): Timestamp = new Timestamp(60000L * (minute + 100000))
  private def ev(id: Long, minute: Int, user: Long, typ: String, v: Double) =
    Streams.Event(id, ts(minute), user, typ, v)

  /** The batch twin of the stream-stream join's pair table (same columns
    * the streaming sink lands). */
  private def batchPairs: DataFrame = {
    val events = spark.read.parquet(s"$sf/events.parquet")
    val c = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
    val p = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"),
        col("event_id").as("purchase_id"), col("value"))
    p.join(c, col("p_user") === col("c_user") &&
      col("click_ts") <= col("purchase_ts") &&
      col("click_ts") >= col("purchase_ts") - expr("INTERVAL 3600 SECONDS"))
  }

  private def foldPairs(sink: DataFrame): Array[(Long, Long, Long, java.math.BigDecimal)] =
    StreamingExec.dedupSink(sink, Seq("purchase_id", "click_id"))
      .groupBy(col("p_user").as("user_id"))
      .agg(count(lit(1)).as("n_pairs"),
           countDistinct(col("purchase_id")).as("n_attributed"),
           sum(col("value").cast("decimal(20,6)")).as("sum_value"))
      .orderBy(col("user_id"))
      .as[(Long, Long, Long, java.math.BigDecimal)].collect()

  test("artificially-duplicated sink table folds to identical output") {
    val pairs = batchPairs.cache()
    try {
      assert(pairs.count() > 0, "fixture must produce pairs")
      // duplicate a slice twice over — a worst-case double retry
      val dup = pairs.limit(13)
      val clean = foldPairs(pairs)
      val dirty = foldPairs(pairs.union(dup).union(dup))
      assert(dirty.toSeq == clean.toSeq)
    } finally pairs.unpersist()
  }

  test("join-pair natural key (purchase_id, click_id) is unique on the corpus") {
    val pairs = batchPairs
    assert(pairs.count() ==
      pairs.select("purchase_id", "click_id").distinct().count())
  }

  test("session natural key (user_id, session_start) is unique") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Streams.Event]
    val q = Streams.sessionize(spark, in.toDS(), gapSeconds = 600, watermark = "10 minutes")
      .writeStream.format("memory").queryName("idem_sessions").outputMode("append").start()
    try {
      // two users, each closing two sessions (gap 10 min; events 20 min apart)
      in.addData(ev(1, 0, 7, "click", 1.0), ev(2, 1, 7, "click", 1.0),
                 ev(3, 0, 9, "view", 1.0))
      q.processAllAvailable()
      in.addData(ev(4, 40, 7, "click", 1.0), ev(5, 40, 9, "view", 1.0))
      q.processAllAvailable()
      in.addData(ev(6, 120, 7, "click", 1.0), ev(7, 120, 9, "view", 1.0))
      q.processAllAvailable()
      val sink = spark.table("idem_sessions")
      assert(sink.count() >= 4, "fixture must close several sessions")
      assert(sink.count() ==
        sink.select("user_id", "session_start").distinct().count())
      // and the idempotent fold is a no-op on the clean table
      assert(StreamingExec.dedupSink(sink, Seq("user_id", "session_start")).count()
        == sink.count())
    } finally q.stop()
  }

  test("cusum alarm natural key (event_type, event_id) is unique") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Streams.Event]
    val q = Streams.cusumAlarms(spark, in.toDS(), driftCents = 100L, thresholdCents = 500L)
      .toDF().writeStream.format("memory").queryName("idem_alarms")
      .outputMode("append").start()
    try {
      in.addData(ev(1, 0, 7, "click", 3.0), ev(2, 1, 7, "click", 3.0),
                 ev(3, 2, 7, "click", 3.0), ev(4, 3, 7, "click", 3.0))
      q.processAllAvailable()
      in.addData(ev(5, 4, 7, "click", 3.0))
      q.processAllAvailable()
      val sink = spark.table("idem_alarms")
      assert(sink.count() >= 2, "fixture must alarm repeatedly")
      assert(sink.count() ==
        sink.select("event_type", "event_id").distinct().count())
    } finally q.stop()
  }
}
