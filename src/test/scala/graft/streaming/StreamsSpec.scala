package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Streaming semantics driven through MemoryStream micro-batches. */
class StreamsSpec extends SparkSpec {
  import spark.implicits._

  // offset well above epoch: the initial watermark is 0, and rows AT the
  // watermark are considered late by stateful dedup
  private def ts(minute: Int): Timestamp = new Timestamp(60000L * (minute + 100000))

  private def ev(id: Long, minute: Int, user: Long, typ: String, v: Double) =
    Streams.Event(id, ts(minute), user, typ, v)

  test("tumblingCounts groups by event-time window across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Streams.Event]
    val q = Streams.tumblingCounts(in.toDF(), window_ = "10 minutes", watermark = "1 hour")
      .writeStream.format("memory").queryName("tumbling").outputMode("complete").start()
    try {
      in.addData(ev(1, 1, 1, "click", 1.0), ev(2, 5, 1, "click", 2.0))
      q.processAllAvailable()
      in.addData(ev(3, 11, 2, "click", 3.0), ev(4, 12, 2, "view", 4.0))
      q.processAllAvailable()
      val rows = spark.table("tumbling")
        .select(col("window.start").cast("long").as("w"), col("event_type"), col("n"))
        .as[(Long, String, Long)].collect().toSet
      val base = 100000L * 60L
      assert(rows == Set((base, "click", 2L), (base + 600L, "click", 1L), (base + 600L, "view", 1L)))
    } finally q.stop()
  }

  test("a row arriving behind the watermark is DROPPED from windowed counts") {
    // The late-data contract itself: watermark = max event time − 1 h, and
    // a row older than the watermark at arrival never reaches the window
    // state. Append mode so the assertion sees exactly the closed windows.
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Streams.Event]
    val q = Streams.tumblingCounts(in.toDF(), window_ = "10 minutes", watermark = "1 hour")
      .writeStream.format("memory").queryName("late_drop").outputMode("append").start()
    try {
      // batch 1: minute 5, and minute 200 — watermark advances to 200-60=140
      in.addData(ev(1, 5, 1, "click", 1.0), ev(2, 200, 1, "click", 1.0))
      q.processAllAvailable()
      // batch 2: minute 50 — its window [50,60) ended long before wm 140 →
      // the row must be dropped, not resurrect a closed window. minute 400
      // rides along to close the minute-200 window downstream.
      in.addData(ev(3, 50, 1, "click", 99.0), ev(4, 400, 1, "click", 1.0))
      q.processAllAvailable()
      val rows = spark.table("late_drop")
        .select(col("window.start").cast("long").as("w"), col("n"))
        .as[(Long, Long)].collect().toMap
      val base = 100000L * 60L
      assert(rows.get(base) === Some(1L), s"minute-5 window wrong: $rows")
      assert(!rows.contains(base + 50 * 60L),
        s"late minute-50 row resurrected a closed window: $rows")
      assert(rows.get(base + 200 * 60L) === Some(1L),
        s"minute-200 window should have closed clean: $rows")
    } finally q.stop()
  }

  test("sessionize closes a session after the inactivity gap") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Streams.Event]
    val q = Streams.sessionize(spark, in.toDS(), gapSeconds = 600)
      .writeStream.format("memory").queryName("sessions").outputMode("append").start()
    try {
      // user 1: events at minute 0 and 5 (one session), then minute 30
      // (gap 25 min > 10 min -> first session closes on arrival)
      in.addData(ev(1, 0, 1, "click", 1.0), ev(2, 5, 1, "click", 2.0))
      q.processAllAvailable()
      in.addData(ev(3, 30, 1, "click", 4.0))
      q.processAllAvailable()
      val sessions = spark.table("sessions").as[Streams.Session].collect()
      assert(sessions.length == 1)
      assert(sessions(0).n_events == 2 && sessions(0).total_value == 3.0)
      assert(sessions(0).session_start == ts(0))
    } finally q.stop()
  }

  test("sessionize emits the trailing session when the watermark passes the gap") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Streams.Event]
    val q = Streams.sessionize(spark, in.toDS(), gapSeconds = 600, watermark = "10 minutes")
      .writeStream.format("memory").queryName("trailing_sessions").outputMode("append").start()
    try {
      in.addData(ev(1, 0, 1, "click", 1.0), ev(2, 5, 1, "click", 2.0))
      q.processAllAvailable()
      // a much later event from ANOTHER user advances the watermark past
      // user 1's last+gap (minute 15): the event-time timeout must close
      // user 1's session even though user 1 never spoke again
      in.addData(ev(3, 60, 2, "click", 9.0))
      q.processAllAvailable()
      in.addData(ev(4, 61, 2, "click", 1.0)) // one more batch so the timeout fires
      q.processAllAvailable()
      val sessions = spark.table("trailing_sessions").as[Streams.Session].collect()
        .filter(_.user_id == 1L)
      assert(sessions.length == 1)
      assert(sessions(0).n_events == 2 && sessions(0).total_value == 3.0)
    } finally q.stop()
  }

  test("funnelConversions advances steps across micro-batches, emits once") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Streams.Event]
    val conv = Streams.funnelConversions(spark, in.toDS(), windowUs = 48L * 3600L * 1000000L)
    val q = conv.writeStream.format("memory").queryName("funnel_conv")
      .outputMode("append").start()
    try {
      // batch 1: u1 views and clicks (qualified); u2 clicks BEFORE viewing
      in.addData(ev(1, 0, 1, "view", 1.0), ev(2, 5, 1, "click", 50.0),
                 ev(3, 0, 2, "click", 50.0), ev(4, 5, 2, "view", 1.0))
      q.processAllAvailable()
      assert(spark.table("funnel_conv").count() == 0, "no purchases yet")
      // batch 2: purchases — u1 converts (steps held across batches);
      // u2 does not (its click preceded its view, steps only advance);
      // a second u1 purchase must NOT re-emit
      in.addData(ev(5, 10, 1, "purchase", 70.0), ev(6, 11, 1, "purchase", 70.0),
                 ev(7, 10, 2, "purchase", 70.0))
      q.processAllAvailable()
      val rows = spark.table("funnel_conv")
        .as[Streams.FunnelConv].collect().toSeq
      assert(rows.map(_.user_id) == Seq(1L), s"got $rows")
      val base = 100000L * 60L * 1000000L
      assert(rows.head.t1_us == base && rows.head.t2_us == base + 5L * 60000000L &&
             rows.head.t3_us == base + 10L * 60000000L)
      // batch 3: u2 finally clicks after its view, then purchases -> converts now
      in.addData(ev(8, 20, 2, "click", 50.0), ev(9, 25, 2, "purchase", 70.0))
      q.processAllAvailable()
      assert(spark.table("funnel_conv").as[Streams.FunnelConv]
        .collect().map(_.user_id).toSet == Set(1L, 2L))
    } finally q.stop()
  }

  test("dedupStream drops duplicate ids within the watermark horizon") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Streams.Event]
    val q = Streams.dedupStream(in.toDF(), watermark = "1 hour")
      .writeStream.format("memory").queryName("deduped").outputMode("append").start()
    try {
      in.addData(ev(1, 0, 1, "click", 1.0), ev(1, 0, 1, "click", 1.0), ev(2, 1, 1, "view", 2.0))
      q.processAllAvailable()
      in.addData(ev(2, 1, 1, "view", 2.0), ev(3, 2, 2, "click", 3.0))
      q.processAllAvailable()
      assert(spark.table("deduped").count() == 3)
    } finally q.stop()
  }

  test("chunkAlignedSink lands micro-batches into the MDIO store") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("mdio_stream").resolve("s.mdio").toString
    graft.sources.MdioWriter.create(graft.spec.MdioSpec.fromJson(
      """{
        |  "metadata": {"name": "s", "apiVersion": "v1.0", "createdOn": "2026-01-01T00:00:00Z"},
        |  "variables": [
        |    {"name": "cell", "dataType": "int64", "dimensions": [{"name": "cell", "size": 16}]},
        |    {"name": "v", "dataType": "float64", "dimensions": [{"name": "cell", "size": 16}],
        |     "metadata": {"chunkGrid": {"name": "regular", "configuration": {"chunkShape": [4]}}}}
        |  ]
        |}""".stripMargin), dir)
    val in = MemoryStream[(Long, Double)]
    val q = in.toDF().toDF("cell", "v")
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        Streams.chunkAlignedSink(spark, dir, "v")(b, id)
      }
      .start()
    try {
      in.addData((0L, 1.5), (5L, 2.5))
      q.processAllAvailable()
      in.addData((10L, 3.5))
      q.processAllAvailable()
      val got = spark.read.format("mdio").load(dir)
        .filter(!isnan(col("v"))).select("cell", "v")
        .as[(Long, Double)].collect().toSet
      assert(got == Set((0L, 1.5), (5L, 2.5), (10L, 3.5)))
    } finally q.stop()
    graft.sources.MdioWriter.delete(dir)
  }

  test("stream-stream interval join matches clicks to later purchases") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[Streams.Event]
    val purchases = MemoryStream[Streams.Event]
    val q = Streams.clickToPurchase(clicks.toDF(), purchases.toDF(),
        windowSeconds = 600, watermark = "1 hour")
      .writeStream.format("memory").queryName("c2p").outputMode("append").start()
    try {
      clicks.addData(ev(1, 0, 7, "click", 0.0), ev(2, 5, 7, "click", 0.0),
                     ev(3, 0, 9, "click", 0.0))
      purchases.addData(ev(10, 8, 7, "purchase", 49.0),  // joins clicks 1+2 (within 10 min)
                        ev(11, 30, 9, "purchase", 5.0))  // click 3 is 30 min old -> no match
      q.processAllAvailable()
      val rows = spark.table("c2p")
        .select("purchase_id", "click_id").as[(Long, Long)].collect().toSet
      assert(rows == Set((10L, 1L), (10L, 2L)))
    } finally q.stop()
  }

  test("left-outer stream-stream join emits unmatched purchases on watermark passage") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[Streams.Event]
    val purchases = MemoryStream[Streams.Event]
    val q = Streams.clickToPurchaseOuter(clicks.toDF(), purchases.toDF(),
        windowSeconds = 600, watermark = "1 hour")
      .writeStream.format("memory").queryName("c2p_outer").outputMode("append").start()
    try {
      clicks.addData(ev(1, 0, 7, "click", 0.0))
      purchases.addData(ev(10, 8, 7, "purchase", 49.0),  // joins click 1
                        ev(11, 30, 9, "purchase", 5.0))  // user 9 never clicked
      q.processAllAvailable()
      // matched row emits eagerly; the outer row CANNOT yet — only
      // watermark passage proves no matching click can still arrive
      val eager = spark.table("c2p_outer")
        .select("purchase_id").as[Long].collect().toSet
      assert(eager == Set(10L), s"before horizon: $eager")

      // horizon rows on BOTH sides (the join's watermark is the min of
      // the two inputs') push the watermark past purchase 11's window;
      // the no-data finalization batch then evicts and emits it null-padded
      clicks.addData(ev(98, 30 + 61 + 600 / 60, 7, "click", 0.0))
      purchases.addData(ev(99, 30 + 61 + 600 / 60, 7, "purchase", 0.0))
      q.processAllAvailable()
      val all = spark.table("c2p_outer")
        .select("purchase_id", "click_id")
        .as[(Long, Option[Long])].collect().toSet
      assert(all.contains((11L, None)),
        s"unmatched purchase 11 must emit null-padded after the horizon: $all")
      assert(!all.exists { case (p, c) => p == 11L && c.isDefined })
    } finally q.stop()
  }

  test("full-outer stream-stream join emits unmatched rows from BOTH sides on watermark passage") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[Streams.Event]
    val purchases = MemoryStream[Streams.Event]
    val q = Streams.clickToPurchaseFull(clicks.toDF(), purchases.toDF(),
        windowSeconds = 600, watermark = "1 hour")
      .writeStream.format("memory").queryName("c2p_full").outputMode("append").start()
    try {
      clicks.addData(ev(1, 0, 7, "click", 0.0),     // matches purchase 10
                     ev(2, 0, 5, "click", 0.0))     // user 5 never purchases
      purchases.addData(ev(10, 8, 7, "purchase", 49.0),
                        ev(11, 30, 9, "purchase", 5.0)) // user 9 never clicked
      q.processAllAvailable()
      // horizon on both sides pushes the watermark past every window
      clicks.addData(ev(98, 120, 7, "click", 0.0))
      purchases.addData(ev(99, 120, 7, "purchase", 0.0))
      q.processAllAvailable()
      val got = spark.table("c2p_full")
        .select("purchase_id", "click_id")
        .as[(Option[Long], Option[Long])].collect().toSet
      assert(got.contains((Some(10L), Some(1L))), s"matched pair: $got")
      assert(got.contains((Some(11L), None)), s"purchase-side eviction: $got")
      assert(got.contains((None, Some(2L))), s"click-side eviction: $got")
    } finally q.stop()
  }

  test("left-semi stream-stream join emits each attributed purchase once, eagerly") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[Streams.Event]
    val purchases = MemoryStream[Streams.Event]
    val q = Streams.clickToPurchaseSemi(clicks.toDF(), purchases.toDF(),
        windowSeconds = 600, watermark = "1 hour")
      .writeStream.format("memory").queryName("c2p_semi").outputMode("append").start()
    try {
      // TWO clicks in window: semi must still emit purchase 10 exactly once
      clicks.addData(ev(1, 0, 7, "click", 0.0), ev(2, 5, 7, "click", 0.0))
      purchases.addData(ev(10, 8, 7, "purchase", 49.0),
                        ev(11, 30, 9, "purchase", 5.0)) // user 9: no click yet
      q.processAllAvailable()
      val eager = spark.table("c2p_semi")
        .select("purchase_id").as[Long].collect().toList
      assert(eager == List(10L), s"eager semi emission must be exactly once: $eager")

      // user 9's click arrives in a LATER batch, still inside purchase 11's
      // window: the buffered purchase must emit on the match's arrival
      clicks.addData(ev(3, 29, 9, "click", 0.0))
      q.processAllAvailable()
      val all = spark.table("c2p_semi")
        .select("purchase_id").as[Long].collect().toList.sorted
      assert(all == List(10L, 11L), s"cross-batch match must release purchase 11: $all")
    } finally q.stop()
  }
}
