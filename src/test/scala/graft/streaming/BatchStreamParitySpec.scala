package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Batch and streaming share one engine: the same windowed aggregation over
  * the same corpus rows must produce identical results whether the rows
  * arrive as a table or as micro-batches. */
class BatchStreamParitySpec extends SparkSpec {
  import spark.implicits._

  test("tumbling windows: streaming result equals batch result on corpus data") {
    implicit val sqlCtx = spark.sqlContext
    val rows = graft.Tables.events(spark, sf)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[Streams.Event].collect().toSeq

    val batch = graft.Tables.events(spark, sf)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").cast("long").as("w"), col("event_type"), col("n"))
      .as[(Long, String, Long)].collect().toSet

    val in = MemoryStream[Streams.Event]
    val q = Streams.tumblingCounts(in.toDF(), window_ = "1 hour", watermark = "24 hours")
      .select(col("window.start").cast("long").as("w"), col("event_type"), col("n"))
      .writeStream.format("memory").queryName("parity").outputMode("complete").start()
    try {
      rows.grouped(1500).foreach { chunk =>
        in.addData(chunk)
        q.processAllAvailable()
      }
      val streamed = spark.table("parity")
        .select(col("w"), col("event_type"), col("n").cast("long"))
        .as[(Long, String, Long)].collect().toSet
      assert(streamed == batch,
        s"stream/batch divergence: ${(streamed diff batch).take(3)} vs ${(batch diff streamed).take(3)}")
    } finally q.stop()
  }
}
