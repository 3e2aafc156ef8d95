package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval-overlap join WITHOUT an equi key.
  *
  * Two large interval tables joined on `a.start <= b.end AND b.start <=
  * a.end` have no equality predicate, so Spark's only built-in plan is a
  * broadcast-nested-loop / cartesian — quadratic and undistributable at
  * 100 TB. The standard fix is BUCKETIZATION: explode every interval into
  * the coarse time buckets it spans, equi-join on the bucket id (a hash
  * shuffle), then apply the exact overlap predicate and dedupe pairs that
  * met in several buckets. Join cost becomes Σ per-bucket |A_b|·|B_b| —
  * local densities, never |A|·|B| — and the bucket width is the knob:
  * ~the median interval length keeps the explode factor small AND the
  * buckets selective.
  */
object Intervals {

  /** Overlapping (aId, bId) pairs from interval tables `a` and `b`
    * (bounds in the same integer unit, inclusive ends). `bucket` is the
    * bucket width in those units. Exact: bucketization only routes
    * candidates; the overlap predicate decides. */
  def overlapJoin(a: DataFrame, aId: String, aStart: String, aEnd: String,
                  b: DataFrame, bId: String, bStart: String, bEnd: String,
                  bucket: Long): DataFrame = {
    // double division can lose ulps at epoch-micro magnitudes, but value →
    // double → /bucket → floor is MONOTONE, so an overlapping pair's bucket
    // ranges still intersect (both contain bk(max(starts))) — routing stays
    // complete; the exact predicate below decides membership.
    def explodeBuckets(df: DataFrame, s: String, e: String): DataFrame =
      df.withColumn("__bk",
        explode(sequence(floor(col(s).cast("double") / bucket).cast("long"),
                         floor(col(e).cast("double") / bucket).cast("long"),
                         lit(1L))))
    val ab = explodeBuckets(a.select(col(aId), col(aStart), col(aEnd)), aStart, aEnd)
    val bb = explodeBuckets(b.select(col(bId), col(bStart), col(bEnd)), bStart, bEnd)
    ab.join(bb, Seq("__bk"))
      .filter(col(aStart) <= col(bEnd) && col(bStart) <= col(aEnd))
      .select(col(aId), col(bId)).distinct()
  }
}
