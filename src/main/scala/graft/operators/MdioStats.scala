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
