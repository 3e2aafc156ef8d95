package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** The bounded-state structural pin in [[StreamingExec.pinBoundedState]]
  * must REJECT the two plan shapes that run fine at test scale and
  * detonate at 100 TB/day — an unwatermarked stream-stream join and an
  * unwatermarked append-mode streaming aggregate — and ACCEPT the
  * watermarked forms every inventory query uses. */
class StreamingPinsSpec extends SparkSpec {
  import spark.implicits._

  private def sideA = {
    implicit val sqlCtx = spark.sqlContext
    MemoryStream[(Long, Timestamp)].toDF().toDF("k", "ts")
  }
  private def sideB = {
    implicit val sqlCtx = spark.sqlContext
    MemoryStream[(Long, Timestamp)].toDF().toDF("k2", "ts2")
  }

  test("rejects a stream-stream join with no watermarks") {
    val joined = sideA.join(sideB, col("k") === col("k2"))
    val e = intercept[IllegalArgumentException] {
      StreamingExec.pinBoundedState(joined, "append")
    }
    assert(e.getMessage.contains("watermarks"))
  }

  test("rejects a stream-stream join watermarked on only one side") {
    val joined = sideA.withWatermark("ts", "1 hour")
      .join(sideB, col("k") === col("k2"))
    intercept[IllegalArgumentException] {
      StreamingExec.pinBoundedState(joined, "append")
    }
  }

  test("rejects an unwatermarked append-mode streaming aggregate") {
    val agg = sideA.groupBy(window(col("ts"), "10 minutes"))
      .agg(count(lit(1)).as("n"))
    val e = intercept[IllegalArgumentException] {
      StreamingExec.pinBoundedState(agg, "append")
    }
    assert(e.getMessage.contains("watermark"))
  }

  test("accepts the watermarked join and aggregate shapes") {
    val joined = sideA.withWatermark("ts", "1 hour").join(
      sideB.withWatermark("ts2", "1 hour"),
      col("k") === col("k2") && col("ts2") <= col("ts") &&
        col("ts2") >= col("ts") - expr("INTERVAL 600 SECONDS"))
    StreamingExec.pinBoundedState(joined, "append")
    val agg = sideA.withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "10 minutes")).agg(count(lit(1)).as("n"))
    StreamingExec.pinBoundedState(agg, "append")
    // complete mode: O(#groups) by definition, no watermark required
    StreamingExec.pinBoundedState(
      sideA.groupBy(col("k")).agg(count(lit(1)).as("n")), "complete")
  }
}
