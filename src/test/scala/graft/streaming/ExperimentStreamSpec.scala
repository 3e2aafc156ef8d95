package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The streaming experiment readout's per-arm moment state, driven
  * through real MemoryStream micro-batches — the cross-batch folding the
  * one-file stream_experiment_exec run cannot exercise: moments built in
  * batch 1 must merge exactly with batch 2's before the t readout. */
class ExperimentStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ev(id: Long, user: Long, v: Double) =
    Streams.Event(id, new Timestamp(60000L * (id + 100000)), user, "x", v)

  test("per-arm moments fold across micro-batches into the exact batch statistic") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Streams.Event]
    val armed = graft.functions.Sampling.assignSplit(
      in.toDS().toDF(), col("user_id"),
      Seq("treat" -> 0.5, "control" -> 0.5), out = "arm")
    val moments = armed.groupBy(col("arm"))
      .agg(count(lit(1)).as("n"),
           sum(col("value").cast("decimal(27,6)")).as("s"),
           sum((col("value") * col("value")).cast("decimal(30,6)")).as("ss"))
    val q = moments.writeStream.format("memory").queryName("exp_moments")
      .outputMode("complete").start()
    val rows = (1L to 40L).map(i => ev(i, i, (i % 7).toDouble + 0.25))
    try {
      in.addData(rows.take(25): _*)
      q.processAllAvailable()
      in.addData(rows.drop(25): _*) // state must MERGE, not restart
      q.processAllAvailable()
      val streamed = spark.table("exp_moments")
        .as[(String, Long, BigDecimal, BigDecimal)].collect()
        .map { case (arm, n, sm, ss) => arm -> ((n, sm, ss)) }.toMap
      // batch recompute over the same rows through the same expressions
      val batch = graft.functions.Sampling.assignSplit(
          rows.toDF(), col("user_id"), Seq("treat" -> 0.5, "control" -> 0.5), out = "arm")
        .groupBy(col("arm"))
        .agg(count(lit(1)).as("n"),
             sum(col("value").cast("decimal(27,6)")).as("s"),
             sum((col("value") * col("value")).cast("decimal(30,6)")).as("ss"))
        .as[(String, Long, BigDecimal, BigDecimal)].collect()
        .map { case (arm, n, sm, ss) => arm -> ((n, sm, ss)) }.toMap
      assert(streamed.keySet == batch.keySet && streamed.keySet == Set("treat", "control"),
        s"arms: streamed=${streamed.keySet} batch=${batch.keySet}")
      assert(streamed == batch, s"streamed moments $streamed != batch $batch")
      assert(streamed.values.map(_._1).sum == 40L, "all rows accounted for")
    } finally q.stop()
  }
}
