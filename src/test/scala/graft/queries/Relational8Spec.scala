package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the round-8 analytics semantics on constructed data (the
  * StatsTestsSpec discipline: straight-line recomputation, no oracle in
  * the loop): funnel steps are strictly sequential and windowed, Holt's
  * recurrence matches a naive fold, retention partitions are exact, and
  * the k-core cascade is monotone with consistent induced-edge counts. */
class Relational8Spec extends SparkSpec {

  test("funnel: steps must happen in order and inside the 48h window") {
    import spark.implicits._
    val base = java.sql.Timestamp.valueOf("2024-01-05 00:00:00").getTime
    def ts(hours: Long) = new java.sql.Timestamp(base + hours * 3600 * 1000)
    // u1 converts fully; u2's click precedes its view (breaks order);
    // u3's purchase lands outside the 48h window; u4's click is below
    // the value threshold
    val rows = Seq(
      (1L, "view", 99.0, ts(0)), (1L, "click", 50.0, ts(1)), (1L, "purchase", 70.0, ts(2)),
      (2L, "click", 50.0, ts(0)), (2L, "view", 99.0, ts(1)),
      (3L, "view", 99.0, ts(0)), (3L, "click", 50.0, ts(1)), (3L, "purchase", 70.0, ts(60)),
      (4L, "view", 99.0, ts(0)), (4L, "click", 10.0, ts(1)))
      .toDF("user_id", "event_type", "value", "ts")
    val dir = java.nio.file.Files.createTempDirectory("graft_funnel")
    rows.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = Relational8.qEventsFunnel(spark, dir.toString).collect().head
    assert(r.getAs[Long]("n_view") == 4)      // u2 has a view too (at ts 1)
    assert(r.getAs[Long]("n_click") == 2)     // u1; u3 (u2 click too early, u4 low value)
    assert(r.getAs[Long]("n_purchase") == 1)  // u1 only (u3 outside window)
    assert(r.getAs[Long]("conv1_ppm") == 500000L)
    assert(r.getAs[Long]("conv2_ppm") == 500000L)
  }

  test("holt: the engine fold equals a naive recomputation of the recurrence") {
    val daily = graft.Tables.events(spark, sf)
      .groupBy(expr("datediff(to_date(ts), date'2024-01-01')").as("day"))
      .agg(count(lit(1)).as("x"))
      .orderBy("day").collect().map(_.getLong(1))
    var l = 0L; var b = 0L
    for ((x, i) <- daily.zipWithIndex) {
      val xm = x * 1000000L
      if (i == 0) { l = xm; b = 0L }
      else {
        val prev = l
        l = Math.floorDiv(xm + 3L * (l + b), 4L)
        b = Math.floorDiv((l - prev) + 7L * b, 8L)
      }
    }
    val r = Relational8.qEventsHolt(spark, sf).collect().head
    assert(r.getAs[Long]("n_days") == daily.length)
    assert(r.getAs[Long]("level_micro") == l)
    assert(r.getAs[Long]("trend_micro") == b)
    assert(r.getAs[Long]("forecast1_micro") == l + b)
    assert(r.getAs[Long]("forecast7_micro") == l + 7 * b)
  }

  test("retention: offsets partition each user's active weeks exactly") {
    val rows = Relational8.qEventsRetention(spark, sf).collect()
    assert(rows.nonEmpty)
    // offset-0 row of every cohort covers the whole cohort (first-touch
    // week is by definition active), so retention_ppm == 1e6 there
    val zero = rows.filter(_.getAs[Long]("offset") == 0L)
    assert(zero.nonEmpty)
    zero.foreach { r =>
      assert(r.getAs[Long]("n_active") == r.getAs[Long]("cohort_size"))
      assert(r.getAs[Long]("retention_ppm") == 1000000L)
    }
    // per-(cohort,offset) active counts never exceed the cohort size
    rows.foreach(r => assert(r.getAs[Long]("n_active") <= r.getAs[Long]("cohort_size")))
  }

  test("kcore: the cascade is monotone non-increasing and ends consistent") {
    val rows = Relational8.qGraphKcore(spark, sf).collect()
    assert(rows.length == 8)
    val nodes = rows.map(_.getAs[Long]("n_nodes"))
    val edges = rows.map(_.getAs[Long]("n_edges"))
    for (i <- 1 until 8) {
      assert(nodes(i) <= nodes(i - 1), s"round $i grew nodes")
      assert(edges(i) <= edges(i - 1), s"round $i grew edges")
    }
    // no edges can survive without nodes
    for (i <- 0 until 8 if nodes(i) == 0L) assert(edges(i) == 0L)
  }
}
