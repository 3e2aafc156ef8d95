package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** [[Streams.cusumAlarms]]'s recurrence semantics, driven through real
  * MemoryStream micro-batches — the cross-batch state carry the one-file
  * stream_cusum_exec run cannot exercise. */
class CusumStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ev(id: Long, typ: String, v: Double) =
    Streams.Event(id, new Timestamp(60000L * (id + 100000)), 1L, typ, v)

  test("state carries across micro-batches: excursion built in batch 1 alarms in batch 2") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Streams.Event]
    // drift 100 cents, threshold 500 cents: each 3.00 event adds +200
    val alarms = Streams.cusumAlarms(spark, in.toDS(), driftCents = 100L, thresholdCents = 500L)
    val q = alarms.toDF().writeStream.format("memory").queryName("cusum_x")
      .outputMode("append").start()
    try {
      in.addData(ev(1, "a", 3.0), ev(2, "a", 3.0)) // P: 200, 400 — no alarm yet
      q.processAllAvailable()
      assert(spark.table("cusum_x").count() == 0)
      in.addData(ev(3, "a", 3.0)) // carried P=400 → 600 > 500: alarms NOW
      q.processAllAvailable()
      val rows = spark.table("cusum_x").as[Streams.CusumAlarm].collect().toSeq
      assert(rows == Seq(Streams.CusumAlarm("a", 3L, 600L)))
    } finally q.stop()
  }

  test("running-minimum reset: a negative excursion re-arms the detector") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Streams.Event]
    val alarms = Streams.cusumAlarms(spark, in.toDS(), driftCents = 100L, thresholdCents = 300L)
    val q = alarms.toDF().writeStream.format("memory").queryName("cusum_y")
      .outputMode("append").start()
    try {
      // dip first, then climb: S measures from the dip's floor
      in.addData(ev(1, "b", 0.0), ev(2, "b", 0.0), // P: −100, −200 (minP −200)
        ev(3, "b", 3.0), ev(4, "b", 3.0))          // P: 0, 200
      q.processAllAvailable()
      // S_3 = 0 − (−200) = 200 ≤ 300; S_4 = 200 − (−200) = 400 > 300 → alarm at 4
      val rows = spark.table("cusum_y").as[Streams.CusumAlarm].collect().toSeq
      assert(rows == Seq(Streams.CusumAlarm("b", 4L, 400L)))
    } finally q.stop()
  }

  test("types are independent state machines") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Streams.Event]
    val alarms = Streams.cusumAlarms(spark, in.toDS(), driftCents = 0L, thresholdCents = 100L)
    val q = alarms.toDF().writeStream.format("memory").queryName("cusum_z")
      .outputMode("append").start()
    try {
      in.addData(ev(1, "a", 2.0), ev(2, "b", 0.5))
      q.processAllAvailable()
      val rows = spark.table("cusum_z").as[Streams.CusumAlarm].collect().toSet
      // a: S=200 alarms; b: S=50 stays quiet
      assert(rows == Set(Streams.CusumAlarm("a", 1L, 200L)))
    } finally q.stop()
  }
}
