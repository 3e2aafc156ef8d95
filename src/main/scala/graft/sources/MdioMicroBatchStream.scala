package graft.sources

import graft.zarr.ZarrMeta
import org.apache.spark.sql.connector.read.InputPartition
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import scala.math.Ordering.Implicits._

/** Streaming offset: the MAXIMUM chunk key (lexicographic coordinate
  * tuple) delivered so far; empty = nothing delivered. Keyed — not a
  * count — so a chunk appearing BELOW the boundary (backfill, append on a
  * non-leading dimension) cannot shift indices and silently re-deliver or
  * skip chunks: below-boundary arrivals are ignored (the documented
  * append-only contract), above-boundary chunks deliver exactly once. */
final case class MdioStreamOffset(key: Vector[Long]) extends Offset {
  override def json(): String = s"""{"key": [${key.mkString(", ")}]}"""
}

/** Micro-batch STREAMING SOURCE over a growing MDIO store — the read twin
  * of the chunk-aligned streaming sink: an ingest job appends chunks
  * (trace-by-trace along the leading dimension, the reference's SEG-Y
  * ingest shape), and `spark.readStream.format("mdio")` tails them.
  *
  * Offsets carry the MAX DELIVERED CHUNK KEY of the anchor variable (see
  * [[MdioStreamOffset]]), so the append-only contract is: new chunks must
  * sort after already-present ones (appends along the leading dimension
  * do); keys arriving below the boundary are ignored, never index-shifted
  * into duplicates or skips. Each micro-batch plans exactly the newly
  * appeared chunks as ordinary
  * [[MdioInputPartition]]s — pushed dim-range filters still prune, and
  * rewritten chunks are NOT re-emitted (each chunk is delivered once).
  * Sharded arrays enumerate the inner chunks of newly appeared shard
  * objects. */
final class MdioMicroBatchStream(path: String, dims: Seq[String],
                                 metas: Map[String, ZarrMeta.ArrayMeta],
                                 requiredSchema: org.apache.spark.sql.types.StructType,
                                 ranges: Map[String, (Long, Long)])
    extends MicroBatchStream {

  private val neededVars = requiredSchema.fieldNames
    .map(_.stripSuffix("__value")).distinct.filter(metas.contains)
  private val anchorVar = neededVars.headOption.getOrElse(metas.keys.min)
  private val anchorMeta = metas(anchorVar)

  /** Present chunk coordinates of the anchor variable, sorted
    * lexicographically (= C-order). Shard objects expand to their inner
    * chunks, clamped to the chunk grid. */
  private def presentCoords(): IndexedSeq[Vector[Long]] = {
    val arrayDir = ZarrMeta.path(path).resolve(anchorVar)
    val rank = dims.size
    val fileCoords: Seq[Vector[Long]] =
      if (anchorMeta.version == 3) {
        val cDir = arrayDir.resolve("c")
        cDir.listFilesRecursive()
          .map(p => cDir.relativize(p).split("/").toVector)
          .collect { case parts if parts.length == rank && parts.forall(_.forall(_.isDigit)) =>
            parts.map(_.toLong)
          }
      } else {
        arrayDir.list()
          .filter(p => p.isFile && !p.name.startsWith("."))
          .map(_.name.split("\\.").toVector)
          .collect { case parts if parts.length == rank && parts.forall(_.forall(_.isDigit)) =>
            parts.map(_.toLong)
          }
      }
    val chunkCoords: Seq[Vector[Long]] = anchorMeta.shard match {
      case None => fileCoords
      case Some(_) =>
        val ips = anchorMeta.innerPerShard
        val grid = anchorMeta.chunkGrid
        fileCoords.flatMap { sc =>
          def expand(i: Int, acc: Vector[Long]): Seq[Vector[Long]] =
            if (i == rank) Seq(acc)
            else (0L until ips(i)).flatMap { k =>
              val c = sc(i) * ips(i) + k
              if (c < grid(i)) expand(i + 1, acc :+ c) else Nil
            }
          expand(0, Vector.empty)
        }
    }
    chunkCoords.sorted.toIndexedSeq
  }

  override def initialOffset(): Offset = MdioStreamOffset(Vector.empty)
  override def latestOffset(): Offset = {
    val coords = presentCoords()
    if (coords.isEmpty) MdioStreamOffset(Vector.empty)
    else MdioStreamOffset(coords.last) // sorted: last = lexicographic max
  }
  override def deserializeOffset(json: String): Offset = {
    implicit val fmts: org.json4s.Formats = org.json4s.DefaultFormats
    MdioStreamOffset((org.json4s.jackson.JsonMethods.parse(json) \ "key")
      .extract[Vector[Long]])
  }
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[MdioStreamOffset].key
    val e = end.asInstanceOf[MdioStreamOffset].key
    if (e.isEmpty) return Array.empty
    val shape = anchorMeta.shape
    val chunks = anchorMeta.chunks
    val bounds: Seq[(Long, Long)] = dims.zipWithIndex.map { case (d, i) =>
      val (lo, hi) = ranges.getOrElse(d, (0L, shape(i)))
      (math.max(lo, 0L), math.min(hi, shape(i)))
    }
    // exactly the keys in (start, end] — key-ranged, immune to index shift
    presentCoords()
      .filter(cc => (s.isEmpty || cc > s) && cc <= e)
      .flatMap { cc =>
        val cell = cc.zipWithIndex.map { case (c, i) =>
          val lo = math.max(bounds(i)._1, c * chunks(i))
          val hi = math.min(bounds(i)._2, (c + 1) * chunks(i))
          (lo, hi)
        }
        if (cell.exists { case (lo, hi) => lo >= hi }) None // pruned by pushdown
        else Some(MdioInputPartition(path, cc.toArray,
          cell.map(_._1).toArray, cell.map(_._2).toArray,
          neededVars, neededVars.map(v => metas(v)).toArray): InputPartition)
      }.toArray
  }

  override def createReaderFactory(): org.apache.spark.sql.connector.read.PartitionReaderFactory =
    MdioReaderFactory(dims.toArray, requiredSchema, graft.zarr.HConf.capture())
}
