package graft.queries

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.multimodal.{Mp4Codec, Multimodal}

/** MP4 container-index queries — the video arm of the multimodal family.
  *
  * What a 100 TB video-ingest pipeline actually runs distributed is
  * CONTAINER work: parse the sample tables, pick keyframes, compute byte
  * ranges to fetch. [[Mp4Codec]] does that for real (box walk +
  * stts/stsz/stss/stsc/stco reconstruction); the DuckDB oracle reproduces
  * the muxer's closed-form layout (`first media byte at 607 + 6n`) and
  * prefix-sum offsets, so a hash match certifies the parser recovered the
  * index bit-exactly — including that keyframe OFFSETS point at the true
  * media bytes (the frames query reads each keyframe's first payload byte
  * from the parsed offset and the oracle predicts its value).
  *
  * Scale shape: attach+parse is map-only over documents (one container
  * per row, decoded per-partition like every codec here); the keyframe
  * explode multiplies rows by n/4 before a partial-agg'd sum — no shuffle
  * except the final 1-row aggregate.
  */
object Media {

  /** Parsed container summary per document. */
  case class Mp4Info(doc_id: Long, n_samples: Int, duration: Long, n_key: Int,
                     media_bytes: Long, width: Int, height: Int)

  /** One sampled keyframe: container index fields + the first media byte
    * read from the parsed absolute offset (proof the offset is real). */
  case class Mp4Frame(doc_id: Long, idx: Long, offset: Long, pts: Long,
                      first_byte: Long)

  private def parsed(s: SparkSession, d: String): Dataset[(Long, Array[Byte], Mp4Codec.Track)] = {
    import s.implicits._
    Multimodal.attachMp4Payload(documents(s, d))
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => (id, bytes, Mp4Codec.parse(bytes)) })
  }

  /** Container metadata extraction: one real MP4 parse per document,
    * summed so the oracle certifies every recovered field. */
  val qMultimodalMp4: Q = (s, d) => {
    import s.implicits._
    parsed(s, d)
      .map { case (id, _, tr) =>
        Mp4Info(id, tr.nSamples, tr.duration, tr.keyframes.length,
          tr.sizes.map(_.toLong).sum, tr.width, tr.height)
      }
      .toDF()
      .agg(count(lit(1)).as("n_docs"),
           sum(col("n_samples").cast("long")).as("sum_samples"),
           sum(col("duration")).as("sum_duration"),
           sum(col("n_key").cast("long")).as("sum_keyframes"),
           sum(col("media_bytes")).as("sum_media_bytes"),
           sum(col("width").cast("long")).as("sum_w"),
           sum(col("height").cast("long")).as("sum_h"))
  }

  val qMultimodalMp4Sql: String = """
    WITH f AS (
      SELECT doc_id, octet_length(encode(text)) AS len,
             list_transform(range(0, octet_length(encode(text))),
               i -> CAST(('0x' || substr(hex(encode(text)), 2*i+1, 2)) AS BIGINT)) AS bytes,
             ((doc_id % 5) + 2) * 4 AS n
      FROM documents),
    g AS (
      SELECT doc_id, n, (doc_id % 8) * 16 + 64 AS w, (doc_id % 6) * 16 + 48 AS h,
             list_sum(list_transform(range(0, n),
               i -> (bytes[CAST(i % len AS INTEGER) + 1] & 63) + 8)) AS media_bytes
      FROM f)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n) AS BIGINT) AS sum_samples,
           CAST(SUM((n // 2) * 2100) AS BIGINT) AS sum_duration,
           CAST(SUM(n // 4) AS BIGINT) AS sum_keyframes,
           CAST(SUM(media_bytes) AS BIGINT) AS sum_media_bytes,
           CAST(SUM(w) AS BIGINT) AS sum_w,
           CAST(SUM(h) AS BIGINT) AS sum_h
    FROM g"""

  /** Keyframe sampling from the container index: explode each track's
    * stss entries, look up offset (stsc/stco walk + stsz prefix) and pts
    * (stts accumulation), and READ the first media byte at that offset —
    * the distributed "which byte ranges do I fetch" step of video ingest.
    * The oracle predicts offsets from the muxer's closed-form layout and
    * first bytes from the sample-content formula, so a match proves the
    * parsed index addresses the actual media. */
  val qMultimodalMp4Frames: Q = (s, d) => {
    import s.implicits._
    parsed(s, d)
      .flatMap { case (id, bytes, tr) =>
        tr.keyframes.iterator.map { k =>
          Mp4Frame(id, k.toLong, tr.offsets(k), tr.pts(k),
            (bytes(tr.offsets(k).toInt) & 0xff).toLong)
        }
      }
      .toDF()
      .agg(count(lit(1)).as("n_frames"),
           sum(col("idx")).as("sum_idx"),
           sum(col("offset")).as("sum_offset"),
           sum(col("pts")).as("sum_pts"),
           sum(col("first_byte")).as("sum_first_byte"))
  }

  val qMultimodalMp4FramesSql: String = """
    WITH f AS (
      SELECT doc_id, octet_length(encode(text)) AS len,
             list_transform(range(0, octet_length(encode(text))),
               i -> CAST(('0x' || substr(hex(encode(text)), 2*i+1, 2)) AS BIGINT)) AS bytes,
             ((doc_id % 5) + 2) * 4 AS n
      FROM documents),
    g AS (
      SELECT doc_id, len, bytes, n,
             list_transform(range(0, n),
               i -> (bytes[CAST(i % len AS INTEGER) + 1] & 63) + 8) AS sizes
      FROM f),
    k AS (
      SELECT doc_id, len, bytes, n, sizes, UNNEST(range(0, n, 4)) AS i
      FROM g),
    e AS (
      SELECT doc_id, i,
             607 + 6 * n + COALESCE(list_sum(list_slice(sizes, 1, CAST(i AS INTEGER))), 0) AS off,
             CASE WHEN i < n // 2 THEN i * 1000
                  ELSE (n // 2) * 1000 + (i - n // 2) * 1100 END AS pts,
             bytes[CAST((i * 7) % len AS INTEGER) + 1] AS first_byte
      FROM k)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_frames,
           CAST(SUM(i) AS BIGINT) AS sum_idx,
           CAST(SUM(off) AS BIGINT) AS sum_offset,
           CAST(SUM(pts) AS BIGINT) AS sum_pts,
           CAST(SUM(first_byte) AS BIGINT) AS sum_first_byte
    FROM e"""

  // ---- image near-dup via perceptual hash ---------------------------------

  /** Per-image 64-bit average hash, split into two 32-bit words (a
    * 64-bit unsigned hash would overflow BIGINT's sign on bit 63). */
  case class PHashRow(doc_id: Long, hi: Long, lo: Long)

  /** IMAGE NEAR-DUP via perceptual average-hash (aHash): decode each BMP
    * to real pixels, sample an 8×8 grid, threshold each sample against
    * the image's global mean → a 64-bit fingerprint; images agreeing on
    * every bit land in one hash bucket (the pixel-domain sibling of
    * dedup_simhash). Scale shape: decode + hash is map-only per
    * partition (one codec call per row, the multimodal discipline), then
    * ONE hash-groupBy — identical cost to exact dedup. The mean test is
    * pure integer arithmetic (p·n > Σpix), so the oracle can re-derive
    * every bit from the deterministic pixel generator with no float in
    * sight. */
  val qImagePhash: Q = (s, d) => {
    import s.implicits._
    Multimodal.attachBmpPayload(
        documents(s, d).filter(length(col("text")) > 0))
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val (w, h, gray) = graft.multimodal.BmpCodec.decodeGray(bytes)
        val n = w.toLong * h
        var pixSum = 0L
        var i = 0
        while (i < gray.length) { pixSum += gray(i) & 0xff; i += 1 }
        var hi = 0L; var lo = 0L
        var j = 0
        while (j < 64) {
          val y = (j / 8) * h / 8
          val x = (j % 8) * w / 8
          val p = gray(y * w + x) & 0xff
          if (p * n > pixSum) {
            if (j < 32) hi |= 1L << j else lo |= 1L << (j - 32)
          }
          j += 1
        }
        PHashRow(id, hi, lo)
      })
      .toDF()
      .groupBy(col("hi"), col("lo")).agg(count(lit(1)).as("csize"))
      .agg(sum(col("csize")).as("n_imgs"),
           count(lit(1)).as("n_clusters"),
           sum(col("csize") - 1).as("n_dups"),
           max(col("csize")).as("max_cluster"),
           sum(col("hi")).as("sum_hi"),
           sum(col("lo")).as("sum_lo"))
  }

  /** The oracle replays the BMP pixel generator (pixel i = text byte
    * i mod len — the multimodal_bmp closed form) and re-derives all 64
    * threshold bits per image in integer arithmetic. */
  val qImagePhashSql: String = """
    WITH f AS (
      SELECT doc_id, octet_length(encode(text)) AS len,
             list_transform(range(0, octet_length(encode(text))),
               i -> CAST(('0x' || substr(hex(encode(text)), 2*i+1, 2)) AS BIGINT)) AS bytes,
             (doc_id % 64 + 16) AS w, (doc_id % 48 + 16) AS h
      FROM documents WHERE octet_length(encode(text)) > 0),
    p AS (
      SELECT doc_id, w, h, len, bytes, w * h AS n,
             (w * h // len) * list_sum(bytes) +
               COALESCE(list_sum(list_slice(bytes, 1, (w * h) % len)), 0) AS pix_sum
      FROM f),
    b AS (
      SELECT doc_id,
             list_transform(range(0, 64), j ->
               CASE WHEN bytes[1 + ((((j // 8) * h // 8) * w +
                                     ((j % 8) * w // 8)) % len)] * n > pix_sum
                    THEN 1 ELSE 0 END) AS bits
      FROM p),
    hh AS (
      SELECT doc_id,
             list_sum(list_transform(range(0, 32),
               j -> bits[j + 1]  * (CAST(1 AS BIGINT) << j))) AS hi,
             list_sum(list_transform(range(0, 32),
               j -> bits[j + 33] * (CAST(1 AS BIGINT) << j))) AS lo
      FROM b),
    c AS (SELECT hi, lo, COUNT(*) AS csize FROM hh GROUP BY 1, 2)
    SELECT CAST(SUM(csize) AS BIGINT) AS n_imgs,
           CAST(COUNT(*) AS BIGINT) AS n_clusters,
           CAST(SUM(csize - 1) AS BIGINT) AS n_dups,
           CAST(MAX(csize) AS BIGINT) AS max_cluster,
           CAST(SUM(hi) AS BIGINT) AS sum_hi,
           CAST(SUM(lo) AS BIGINT) AS sum_lo
    FROM c"""

  // ---- registration -------------------------------------------------------

  val queries: Map[String, Q] = Map(
    "multimodal_mp4"        -> qMultimodalMp4,
    "multimodal_mp4_frames" -> qMultimodalMp4Frames,
    "image_phash"           -> qImagePhash,
  )

  val oracleSql: Map[String, String] = Map(
    "multimodal_mp4"        -> qMultimodalMp4Sql,
    "multimodal_mp4_frames" -> qMultimodalMp4FramesSql,
    "image_phash"           -> qImagePhashSql,
  )
}
