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

  test("rejects an append aggregate whose grouping ignores the watermarked column") {
    // the r10/r11 ADVICE shape: a watermark EXISTS in the subtree but the
    // aggregate windows an UNRELATED column — its state never evicts
    val agg = sideA.withWatermark("ts", "1 hour")
      .withColumn("other_ts", col("ts") + expr("INTERVAL 1 SECOND"))
      .groupBy(window(col("other_ts"), "10 minutes"))
      .agg(count(lit(1)).as("n"))
    val e = intercept[IllegalArgumentException] {
      StreamingExec.pinBoundedState(agg, "append")
    }
    assert(e.getMessage.contains("grouping"), e.getMessage)
  }

  test("rejects a watermarked stream-stream join whose condition has no time bound") {
    // Spark ACCEPTS this plan (inner equi-join, both sides watermarked)
    // and then buffers both sides forever — the exact shape the pin is for
    val joined = sideA.withWatermark("ts", "1 hour")
      .join(sideB.withWatermark("ts2", "1 hour"), col("k") === col("k2"))
    val e = intercept[IllegalArgumentException] {
      StreamingExec.pinBoundedState(joined, "append")
    }
    assert(e.getMessage.contains("time bound"), e.getMessage)
  }

  test("rejects window functions in streaming plans (WindowHygiene coverage)") {
    import org.apache.spark.sql.expressions.{Window => W}
    // a window over the STREAMING side: Spark would reject it at stream
    // start; the pin rejects it pre-execution with a directive message
    val overStream = sideA.withWatermark("ts", "1 hour")
      .withColumn("r", row_number().over(W.partitionBy(col("k")).orderBy(col("ts"))))
    val e = intercept[IllegalArgumentException] {
      StreamingExec.pinBoundedState(overStream, "append")
    }
    assert(e.getMessage.contains("streaming input"), e.getMessage)
    // an UNPARTITIONED window on a batch subplan joined into the stream:
    // a single-task funnel every micro-batch
    val batchRanked = spark.range(10).toDF("k2")
      .withColumn("rank", row_number().over(W.orderBy(col("k2"))))
    val e2 = intercept[IllegalArgumentException] {
      StreamingExec.pinBoundedState(
        sideA.withWatermark("ts", "1 hour").join(batchRanked, col("k") === col("k2")),
        "append")
    }
    assert(e2.getMessage.contains("unpartitioned window"), e2.getMessage)
    // the PARTITIONED batch-side window passes
    val batchOk = spark.range(10).toDF("k2")
      .withColumn("rank", row_number().over(W.partitionBy(col("k2") % 2).orderBy(col("k2"))))
    StreamingExec.pinBoundedState(
      sideA.withWatermark("ts", "1 hour").join(batchOk, col("k") === col("k2")), "append")
    // bounded-input exemption (WindowHygieneSpec's batch rule, mirrored):
    // an UNPARTITIONED window over a provably ≤1-row input — the scalar
    // attach from an ungrouped aggregate — is a one-row "funnel" and passes
    val scalarRanked = spark.range(10).toDF("k2")
      .agg(max(col("k2")).as("k2"))
      .withColumn("rank", row_number().over(W.orderBy(col("k2"))))
    StreamingExec.pinBoundedState(
      sideA.withWatermark("ts", "1 hour")
        .join(scalarRanked, col("k") === col("k2")), "append")
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
