package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IntervalsSpec extends SparkSpec {
  import spark.implicits._

  private def randomIntervals(seed: Int, n: Int, span: Long) = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { i =>
      val s = rnd.nextLong(span)
      (i.toLong, s, s + rnd.nextLong(200) + 1)
    }
  }

  test("overlapJoin equals the naive quadratic definition on random intervals") {
    val as = randomIntervals(5, 120, 5000)
    val bs = randomIntervals(6, 150, 5000)
    val a = as.toDF("a_id", "a_start", "a_end")
    val b = bs.toDF("b_id", "b_start", "b_end")
    val got = Intervals.overlapJoin(a, "a_id", "a_start", "a_end",
      b, "b_id", "b_start", "b_end", bucket = 128L)
      .as[(Long, Long)].collect().toSet
    val want = (for {
      (ai, asr, ae) <- as
      (bi, bsr, be) <- bs
      if asr <= be && bsr <= ae
    } yield (ai, bi)).toSet
    assert(got == want, s"got ${got.size} pairs, want ${want.size}")
    assert(want.nonEmpty, "test corpus must actually overlap")
  }

  test("bucket width does not change the result (only routing)") {
    val as = randomIntervals(7, 60, 2000)
    val bs = randomIntervals(8, 60, 2000)
    val a = as.toDF("a_id", "a_start", "a_end")
    val b = bs.toDF("b_id", "b_start", "b_end")
    val r1 = Intervals.overlapJoin(a, "a_id", "a_start", "a_end",
      b, "b_id", "b_start", "b_end", bucket = 64L).as[(Long, Long)].collect().toSet
    val r2 = Intervals.overlapJoin(a, "a_id", "a_start", "a_end",
      b, "b_id", "b_start", "b_end", bucket = 1024L).as[(Long, Long)].collect().toSet
    assert(r1 == r2)
  }

  test("shared column names across sides and self-joins both work") {
    // both tables use identical column names (the common caller shape) —
    // the internal __a_/__b_ renames must prevent ambiguous references
    val as = randomIntervals(11, 40, 1500)
    val bs = randomIntervals(12, 40, 1500)
    val a = as.toDF("id", "start", "end")
    val b = bs.toDF("id", "start", "end")
    val got = Intervals.overlapJoin(a, "id", "start", "end",
      b, "id", "start", "end", bucket = 128L)
    assert(got.columns.toSeq == Seq("id_a", "id_b"), "self-name outputs suffixed")
    val pairs = got.as[(Long, Long)].collect().toSet
    val want = (for {
      (ai, asr, ae) <- as
      (bi, bsr, be) <- bs
      if asr <= be && bsr <= ae
    } yield (ai, bi)).toSet
    assert(pairs == want)
    // literal self-join: overlaps of a table with itself
    val self = Intervals.overlapJoin(a, "id", "start", "end",
      a, "id", "start", "end", bucket = 128L).as[(Long, Long)].collect().toSet
    assert(as.forall { case (i, _, _) => self.contains((i, i)) },
      "every interval overlaps itself")
  }

  test("the plan equi-joins on buckets: no cartesian, no nested loop") {
    val a = randomIntervals(9, 50, 2000).toDF("a_id", "a_start", "a_end")
    val b = randomIntervals(10, 50, 2000).toDF("b_id", "b_start", "b_end")
    val p = Intervals.overlapJoin(a, "a_id", "a_start", "a_end",
      b, "b_id", "b_start", "b_end", bucket = 128L)
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(!p.contains("CartesianProduct"), p.take(500))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(500))
  }
}
