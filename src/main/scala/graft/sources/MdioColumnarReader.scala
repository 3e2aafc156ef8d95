package graft.sources

import graft.zarr.{ChunkCodec, ZarrMeta}
import org.apache.spark.sql.connector.read.PartitionReader
import org.apache.spark.sql.execution.vectorized.{OnHeapColumnVector, WritableColumnVector}
import org.apache.spark.sql.types._
import org.apache.spark.sql.vectorized.{ColumnarBatch, ColumnVector}

/** Vectorized chunk reader: decodes each variable's chunk once, then fills
  * OnHeapColumnVectors in batches of up to [[MdioColumnarReader.BatchRows]]
  * cells (C-order over the pushed cell ranges, same iteration as the row
  * reader). Covers the FULL dtype matrix — primitives, complex (struct
  * re/im), record ("void") structs, and u64 (Decimal(20,0)) — so every
  * scan feeds whole-stage codegen batches; struct children are filled
  * through the parent vector's child columns. */
final class MdioColumnarReader(p: MdioInputPartition, dims: Array[String], schema: StructType,
                               sharedCache: graft.zarr.ShardCache = null)
    extends PartitionReader[ColumnarBatch] {

  // shard handles reused across inner-chunk reads; owned here only when
  // not provided by an enclosing chunk-range reader
  private val shardCache = if (sharedCache != null) sharedCache else new graft.zarr.ShardCache
  private val ownsCache = sharedCache == null

  private val rank = dims.length
  private val meta0 = p.metas.headOption.getOrElse(
    ZarrMeta.ArrayMeta(Seq.fill(rank)(0L), Seq.fill(rank)(1L), "<f8", None, None))
  private val chunkShape: Array[Long] = meta0.chunks.toArray
  private val strides: Array[Long] = {
    val s = new Array[Long](rank)
    var acc = 1L
    var i = rank - 1
    while (i >= 0) { s(i) = acc; acc *= chunkShape(i); i -= 1 }
    s
  }

  private val buffers: Array[AnyRef] = p.vars.indices.map { vi =>
    val m = p.metas(vi)
    MdioColumnarReader.chunkReads.incrementAndGet()
    val file = m.chunkFile(ZarrMeta.path(p.path).resolve(p.vars(vi)), p.chunk.toSeq)
    // sharded v3 arrays: the file is the shard object; range-read the
    // inner chunk through the footer index
    val bytes =
      if (m.shard.isDefined) shardCache.readInnerChunk(file, m, p.chunk.toSeq)
      else file.readBytesOrNull()
    if (bytes == null) null
    else {
      val rawSize = (m.chunks.product * m.elemSize).toInt
      val raw = ChunkCodec.decompress(bytes, m.compressor, rawSize)
      m.fields match {
        case Some(fs) => ChunkCodec.decodeFields(raw, fs)
        case None =>
          if (MdioPartitionReader.isComplex(m.dtype)) ChunkCodec.decodeComplex(raw, m.dtype)
          else if (m.dtype.charAt(m.dtype.length - 2) == 'f') ChunkCodec.decodeDoubles(raw, m.dtype)
          else ChunkCodec.decodeLongs(raw, m.dtype)
      }
    }
  }.toArray

  private val varIsComplex: Array[Boolean] =
    p.metas.map(m => MdioPartitionReader.isComplex(m.dtype))

  private val fieldIsDim: Array[Int] = schema.fieldNames.map(f => dims.indexOf(f))
  private val fieldVarIdx: Array[Int] =
    schema.fieldNames.map(f => p.vars.indexOf(f.stripSuffix("__value")))

  private val cur: Array[Long] = new Array[Long](rank)
  private var exhausted = false
  locally {
    var i = 0
    while (i < rank) {
      cur(i) = p.cellLo(i)
      if (p.cellLo(i) >= p.cellHi(i)) exhausted = true
      i += 1
    }
  }

  // batch capacity: never larger than the cell range itself, so a task
  // iterating many SMALL chunks (the coalesced-range shape) does not
  // allocate 4096-row vector sets per 4-cell chunk
  private val capacity: Int = {
    var cells = 1L
    var i = 0
    while (i < rank && cells < MdioColumnarReader.BatchRows) {
      cells *= math.max(p.cellHi(i) - p.cellLo(i), 0L)
      i += 1
    }
    math.max(1, math.min(cells, MdioColumnarReader.BatchRows.toLong).toInt)
  }
  private val vectors: Array[OnHeapColumnVector] =
    schema.fields.map(f => new OnHeapColumnVector(capacity, f.dataType))
  private val batch = new ColumnarBatch(vectors.map(v => v: ColumnVector))

  /** Advance the odometer; false when the range is exhausted. */
  private def advance(): Boolean = {
    var i = rank - 1
    while (i >= 0) {
      cur(i) += 1
      if (cur(i) < p.cellHi(i)) return true
      cur(i) = p.cellLo(i)
      i -= 1
    }
    false
  }

  override def next(): Boolean = {
    if (exhausted) return false
    var n = 0
    vectors.foreach(_.reset())
    var more = true
    while (more && n < capacity) {
      var off = 0L
      var i = 0
      while (i < rank) {
        off += (cur(i) - p.chunk(i) * chunkShape(i)) * strides(i)
        i += 1
      }
      var f = 0
      while (f < schema.length) {
        val di = fieldIsDim(f)
        val vec = vectors(f)
        if (di >= 0) vec.putLong(n, cur(di))
        else {
          val vi = fieldVarIdx(f)
          val m = p.metas(vi)
          val dt = schema.fields(f).dataType
          if (m.fields.isDefined) {
            // record dtype: write each struct field into the child vector
            val sdt = dt.asInstanceOf[StructType]
            buffers(vi) match {
              case null => // reference struct fill = zero bytes -> zero per field
                var k = 0
                while (k < sdt.length) {
                  putLong(vec.getChild(k), n, 0L, sdt.fields(k).dataType)
                  k += 1
                }
              case arrs: Array[AnyRef] =>
                var k = 0
                while (k < sdt.length) {
                  arrs(k) match {
                    case d: Array[Double] => putDouble(vec.getChild(k), n, d(off.toInt), sdt.fields(k).dataType)
                    case l: Array[Long] => putLong(vec.getChild(k), n, l(off.toInt), sdt.fields(k).dataType)
                  }
                  k += 1
                }
            }
          } else if (varIsComplex(vi)) {
            val elemDt = dt.asInstanceOf[StructType].fields(0).dataType
            buffers(vi) match {
              case null =>
                val fill = m.fillValue.getOrElse(Double.NaN)
                putDouble(vec.getChild(0), n, fill, elemDt)
                putDouble(vec.getChild(1), n, fill, elemDt)
              case d: Array[Double] =>
                putDouble(vec.getChild(0), n, d(off.toInt * 2), elemDt)
                putDouble(vec.getChild(1), n, d(off.toInt * 2 + 1), elemDt)
            }
          } else buffers(vi) match {
            case null =>
              dt match {
                case _: DecimalType => // u64 fill = type max
                  vec.putDecimal(n, MdioColumnarReader.U64Max, 20)
                case _ =>
                  val fill = m.fillValue.getOrElse(Double.NaN)
                  putDouble(vec, n, fill, dt)
              }
            case d: Array[Double] => putDouble(vec, n, d(off.toInt), dt)
            case l: Array[Long] => putLong(vec, n, l(off.toInt), dt)
          }
        }
        f += 1
      }
      n += 1
      more = advance()
    }
    exhausted = !more
    batch.setNumRows(n)
    n > 0
  }

  private def putDouble(vec: WritableColumnVector, row: Int, v: Double, dt: DataType): Unit =
    dt match {
      case FloatType => vec.putFloat(row, v.toFloat)
      case DoubleType => vec.putDouble(row, v)
      case LongType => vec.putLong(row, v.toLong)
      case IntegerType => vec.putInt(row, v.toInt)
      case ShortType => vec.putShort(row, v.toShort)
      case ByteType => vec.putByte(row, v.toByte)
      case BooleanType => vec.putBoolean(row, v != 0.0)
      case _ => throw new IllegalStateException(s"columnar path does not cover $dt")
    }

  private def putLong(vec: WritableColumnVector, row: Int, v: Long, dt: DataType): Unit =
    dt match {
      case LongType => vec.putLong(row, v)
      case IntegerType => vec.putInt(row, v.toInt)
      case ShortType => vec.putShort(row, v.toShort)
      case ByteType => vec.putByte(row, v.toByte)
      case BooleanType => vec.putBoolean(row, v != 0L)
      case FloatType => vec.putFloat(row, v.toFloat)
      case DoubleType => vec.putDouble(row, v.toDouble)
      case _: DecimalType => // u64: unwrap two's complement to [0, 2^64)
        val dec =
          if (v >= 0) org.apache.spark.sql.types.Decimal(java.math.BigDecimal.valueOf(v), 20, 0)
          else org.apache.spark.sql.types.Decimal(
            BigDecimal(v) + BigDecimal("18446744073709551616"), 20, 0)
        vec.putDecimal(row, dec, 20)
      case _ => throw new IllegalStateException(s"columnar path does not cover $dt")
    }

  override def get(): ColumnarBatch = batch
  override def close(): Unit = {
    batch.close()
    if (ownsCache) shardCache.close()
  }
}

object MdioColumnarReader {
  val BatchRows: Int = 4096
  /** TEST HOOK: per-variable chunk-file opens since JVM start (local mode
    * shares the JVM) — exchange-reuse pins prove a plan that references a
    * scan subtree twice still READS each chunk once. */
  private[graft] val chunkReads = new java.util.concurrent.atomic.AtomicLong
  /** u64 fill value (type max) as a Decimal(20,0). */
  val U64Max: org.apache.spark.sql.types.Decimal =
    org.apache.spark.sql.types.Decimal(BigDecimal("18446744073709551615"), 20, 0)
}
