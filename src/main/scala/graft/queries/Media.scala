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

  // ---- registration -------------------------------------------------------

  val queries: Map[String, Q] = Map(
    "multimodal_mp4"        -> qMultimodalMp4,
    "multimodal_mp4_frames" -> qMultimodalMp4Frames,
  )

  val oracleSql: Map[String, String] = Map(
    "multimodal_mp4"        -> qMultimodalMp4Sql,
    "multimodal_mp4_frames" -> qMultimodalMp4FramesSql,
  )
}
