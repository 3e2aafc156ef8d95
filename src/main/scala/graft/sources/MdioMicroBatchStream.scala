package graft.sources

import graft.zarr.ZarrMeta
import org.apache.spark.sql.connector.read.InputPartition
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import scala.math.Ordering.Implicits._

/** Streaming offset: how many chunk objects of the anchor variable have
  * been emitted (count over the lexicographically-sorted key list). */
final case class MdioStreamOffset(n: Long) extends Offset {
  override def json(): String = s"""{"chunks": $n}"""
}

/** Micro-batch STREAMING SOURCE over a growing MDIO store — the read twin
  * of the chunk-aligned streaming sink: an ingest job appends chunks
  * (trace-by-trace along the leading dimension, the reference's SEG-Y
  * ingest shape), and `spark.readStream.format("mdio")` tails them.
  *
  * Offsets count the anchor variable's chunk objects in lexicographic
  * key order, so the append-only contract is: new chunks must sort after
  * already-present ones (appends along the leading dimension do). Each
  * micro-batch plans exactly the newly appeared chunks as ordinary
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

  override def initialOffset(): Offset = MdioStreamOffset(0L)
  override def latestOffset(): Offset = MdioStreamOffset(presentCoords().size.toLong)
  override def deserializeOffset(json: String): Offset = {
    implicit val fmts: org.json4s.Formats = org.json4s.DefaultFormats
    MdioStreamOffset((org.json4s.jackson.JsonMethods.parse(json) \ "chunks")
      .extract[Long])
  }
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[MdioStreamOffset].n.toInt
    val e = end.asInstanceOf[MdioStreamOffset].n.toInt
    if (e <= s) return Array.empty
    val coords = presentCoords()
    val shape = anchorMeta.shape
    val chunks = anchorMeta.chunks
    val bounds: Seq[(Long, Long)] = dims.zipWithIndex.map { case (d, i) =>
      val (lo, hi) = ranges.getOrElse(d, (0L, shape(i)))
      (math.max(lo, 0L), math.min(hi, shape(i)))
    }
    coords.slice(s, math.min(e, coords.size)).flatMap { cc =>
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
