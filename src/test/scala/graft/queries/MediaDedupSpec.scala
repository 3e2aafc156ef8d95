package graft.queries

import graft.SparkSpec

/** Pins the image near-dup banding and the cross-modal dedup accounting. */
class MediaDedupSpec extends SparkSpec {

  test("image_phash_near: near pairs are a subset of candidates with bounded distance") {
    val r = Media.qImagePhashNear(spark, sf).head()
    val (cand, near, sumHam) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(near <= cand, "near pairs must come from the candidate set")
    assert(sumHam <= 8 * near, "per-pair Hamming is capped at 8")
    // banding recall within the threshold: hamming <= 8 over 64 bits in
    // 4 bands of 16 — at most 8 flipped bits cannot touch all 4 bands
    // with >= 3 flips each, but CAN touch all 4 with 2 each; banding at
    // this threshold is a candidate filter, not a guarantee, which is
    // why the query reports candidate and verified counts separately.
  }

  test("multimodal dedup: accounting balances and is monotone") {
    val r = Media.qPipelineMultimodalDedup(spark, sf).head()
    val (n, keep, t, i, both) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    assert(keep + t + i + both == n, "modality accounting must partition the corpus")
    assert(keep >= 1, "the earliest doc can never be dropped")
  }

  test("banded candidate generation finds an identical-hash pair") {
    // two docs with the same phash must surface as a candidate via every
    // band; construct the relation directly on a two-row frame
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val ph = Seq((1L, 5L, 9L), (2L, 5L, 9L), (3L, 0xFFFF0000L, 0L))
      .toDF("doc_id", "hi", "lo")
    val bands = ph.selectExpr("doc_id", "hi", "lo", """explode(array(
        struct(0 AS b, hi & 65535 AS k),
        struct(1 AS b, shiftright(hi, 16) & 65535 AS k),
        struct(2 AS b, lo & 65535 AS k),
        struct(3 AS b, shiftright(lo, 16) & 65535 AS k))) AS bk""")
      .select(col("doc_id"), col("hi"), col("lo"),
              col("bk.b").as("b"), col("bk.k").as("k"))
    val l = bands.select(col("b"), col("k"), col("doc_id").as("ida"),
      col("hi").as("hia"), col("lo").as("loa"))
    val r2 = bands.select(col("b"), col("k"), col("doc_id").as("idb"),
      col("hi").as("hib"), col("lo").as("lob"))
    val near = l.join(r2, Seq("b", "k")).filter(col("ida") < col("idb"))
      .filter(expr("bit_count(hia ^ hib) + bit_count(loa ^ lob)") <= 8)
      .select("ida", "idb").distinct().as[(Long, Long)].collect().toSet
    assert(near.contains((1L, 2L)), s"identical hashes must pair: $near")
    assert(!near.exists(p => p._1 == 3L || p._2 == 3L),
      "the far hash (>8 bits away, no shared band) must not pair")
  }

  test("stream_expectations_exec matches its batch twin") {
    import org.apache.spark.sql.functions._
    val streamed = StreamingExec.qStreamExpectationsExec(spark, sf).collect()
    val batch = graft.Tables.events(spark, sf)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
           sum(when(col("value") > 400.0, 1L).otherwise(0L)).as("v_range"),
           sum(when(col("value") < 0.01, 1L).otherwise(0L)).as("v_subcent"),
           sum(when(col("props").isNull, 1L).otherwise(0L)).as("v_noprops"))
      .orderBy(col("event_type")).collect()
    assert(streamed.length == batch.length)
    streamed.zip(batch).foreach { case (sr, br) =>
      assert(sr.getString(0) == br.getString(0))
      assert(sr.getLong(1) == br.getLong(1), s"${sr.getString(0)} count drift")
      assert(sr.getLong(2) == br.getLong(2), s"${sr.getString(0)} range drift")
    }
  }
}
