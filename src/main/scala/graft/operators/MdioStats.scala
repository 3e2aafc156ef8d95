package graft.operators

import org.apache.spark.sql.{Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** statsV1 model + one-pass computation + attribute-commit integration
  * (reference mdio/stats.h:229-649 SummaryStats/UserAttributes and the
  * UpdateAttributes→CommitMetadata protocol, mdio/dataset.h:1269-1416).
  *
  * The whole statistic — count/min/max/sum/sumSquares plus an
  * edge-defined histogram — accumulates in ONE pass over the data via a
  * typed [[Aggregator]] (SURVEY §2.9: "the statsV1+histogram one-pass
  * aggregate is the natural Aggregator candidate"): partial buffers merge
  * associatively, so Catalyst runs it as partial + final aggregation with
  * no extra shuffle beyond the single reduce.
  */
object MdioStats {

  /** Reference CenteredBinHistogram (mdio/stats.h:109-161): uniform bins
    * described by centers; values outside [lo, lo+n*width) are clipped
    * into the edge bins (matching numpy.histogram's outlier handling is
    * NOT attempted — the reference stores, not computes, histograms). */
  final case class Histogram(binCenters: Seq[Double], counts: Seq[Long])

  final case class StatsV1(count: Long, min: Double, max: Double,
                           sum: Double, sumSquares: Double,
                           histogram: Histogram)

  final case class Buf(count: Long, min: Double, max: Double,
                       sum: Double, sumSquares: Double, counts: Array[Long])

  /** One-pass stats+histogram over doubles; bins = [lo + i*width, …). */
  final class StatsV1Aggregator(lo: Double, width: Double, nBins: Int)
      extends Aggregator[Double, Buf, StatsV1] {

    override def zero: Buf =
      Buf(0L, Double.PositiveInfinity, Double.NegativeInfinity, 0.0, 0.0, new Array[Long](nBins))

    private def bin(v: Double): Int = {
      val b = math.floor((v - lo) / width).toInt
      if (b < 0) 0 else if (b >= nBins) nBins - 1 else b
    }

    override def reduce(b: Buf, v: Double): Buf = {
      b.counts(bin(v)) += 1
      Buf(b.count + 1, math.min(b.min, v), math.max(b.max, v),
        b.sum + v, b.sumSquares + v * v, b.counts)
    }

    override def merge(a: Buf, b: Buf): Buf = {
      val counts = a.counts.clone()
      var i = 0
      while (i < nBins) { counts(i) += b.counts(i); i += 1 }
      Buf(a.count + b.count, math.min(a.min, b.min), math.max(a.max, b.max),
        a.sum + b.sum, a.sumSquares + b.sumSquares, counts)
    }

    override def finish(b: Buf): StatsV1 = StatsV1(
      b.count, b.min, b.max, b.sum, b.sumSquares,
      Histogram((0 until nBins).map(i => lo + (i + 0.5) * width), b.counts.toSeq))

    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    override def outputEncoder: Encoder[StatsV1] = Encoders.product[StatsV1]
  }

  /** Compute statsV1 for one variable of a dataset in a single pass. */
  def compute(spark: SparkSession, ds: MdioDataset, variable: String,
              histLo: Double, histWidth: Double, histBins: Int): StatsV1 = {
    import spark.implicits._
    val agg = new StatsV1Aggregator(histLo, histWidth, histBins)
    ds.data.select(col(variable).cast("double")).as[Double]
      .select(agg.toColumn).head()
  }

  /** statsV1's summary moments (count/min/max/sum/sumSquares,
    * mdio/stats.h:229-335) computed purely from the [[graft.sources.MdioChunkStats]]
    * sidecar — zero chunk files opened, no Spark job: the "statsV1 of a
    * 100 TB store" answered in O(metadata) on the driver. Requires
    * generation-current stats with moments for EVERY chunk of the grid
    * (the same full-coverage contract as the connector's metadata
    * aggregate pushdown); fails loudly otherwise rather than silently
    * scanning — callers that want the fallback run [[compute]].
    *
    * Semantics mirror a real scan: count counts every cell (NaN is not
    * null), max is NaN when any cell is NaN (both engines' NaN-is-greatest
    * convention), min is the finite minimum, and sum/sumSquares are the
    * EXACT real-number moments of the finite cells rounded once to double
    * — NaN-poisoned (like any engine's double sum) when a NaN exists. */
  def summaryFromSidecar(spark: SparkSession, path: String, variable: String): org.apache.spark.sql.DataFrame = {
    import graft.sources.MdioChunkStats
    import graft.zarr.ZarrMeta
    val root = ZarrMeta.path(path)
    val m = ZarrMeta.readGroup(root)._2.getOrElse(variable,
      throw new IllegalArgumentException(s"no variable '$variable' in $path"))._1
    val cells = m.shape.map(BigInt(_)).product
    val nChunks = m.chunkGrid.product
    val entries = MdioChunkStats.current(root.resolve(variable)).getOrElse(
      throw new IllegalStateException(
        s"no generation-current stats sidecar for '$variable' — run a stats-aware write first"))
    val gridKeys = graft.sources.MdioAggScan.boxKeys(m.chunkGrid.map(g => (0L, g))).toSeq
    require(gridKeys.forall(entries.contains),
      s"stats sidecar covers ${entries.size} of $nChunks chunks")
    val all = gridKeys.map(entries(_))
    val bounds = all.flatten
    require(bounds.forall(_.moments.isDefined),
      s"stats sidecar for '$variable' predates moments — rewrite the variable to refresh")
    val anyNaN = all.exists(e => e.isEmpty || e.exists(_.hasNaN))
    val isFloat = m.dtype.charAt(m.dtype.length - 2) == 'f'
    val moments = bounds.flatMap(_.moments)
    require(moments.forall(_.sumSq.isDefined),
      s"stats sidecar for '$variable' lacks sum-of-squares moments (overflow at write)")
    val sum = MdioChunkStats.exactTotal(moments.map(_.sum))
    val sumSq = MdioChunkStats.exactTotal(moments.map(_.sumSq.get))
    val mn: Double =
      if (bounds.nonEmpty) bounds.map(_.min).min.toDouble
      else if (isFloat) Double.NaN else 0.0
    val mx: Double =
      if (isFloat && anyNaN) Double.NaN
      else if (bounds.nonEmpty) bounds.map(_.max).max.toDouble
      else 0.0
    val poison = isFloat && anyNaN
    import spark.implicits._
    Seq((cells.toLong,
      mn, mx,
      if (poison) Double.NaN else sum.toDouble,
      if (poison) Double.NaN else sumSq.toDouble))
      .toDF("count", "min", "max", "sum", "sumSquares")
  }

  /** A3/S10 — persist computed stats into the variable's attributes with
    * the reference's statsV1 JSON shape, via the merge-patch commit. */
  def attach(path: String, variable: String, s: StatsV1): Unit = {
    val hist = s"""{"binCenters": [${s.histogram.binCenters.mkString(", ")}], """ +
      s""""counts": [${s.histogram.counts.mkString(", ")}]}"""
    graft.sources.MdioWriter.updateAttributes(path, variable,
      s"""{"statsV1": {"count": ${s.count}, "min": ${s.min}, "max": ${s.max},
         | "sum": ${s.sum}, "sumSquares": ${s.sumSquares},
         | "histogram": $hist}}""".stripMargin)
  }
}
