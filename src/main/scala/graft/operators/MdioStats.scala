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

  private[graft] val log = org.slf4j.LoggerFactory.getLogger(MdioStats.getClass)

  /** TEST SEAM (r18): invoked after a rank path pins its generation-
    * current manifest and before it reads shard files — lets a spec
    * inject a concurrent stats REPUBLISH between the two (shard files
    * rewritten at the next generation read as torn against the pinned
    * manifest): the benign race the percentile pushdown's retry-once
    * absorbs. */
  private[graft] var manifestRaceHook: () => Unit = () => ()

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

  /** VALUE-based (sel) windows for the QC family (r19): resolve
    * coordinate-value windows — `median(v) WHERE depth_ms BETWEEN 800
    * AND 1200`, the way a seismic user actually states a window — to the
    * dim-INDEX ranges every QC operator's `ranges` parameter takes, by
    * composing P8's sel-range semantics (stop-INCLUSIVE on both ends,
    * reference `mdio/dataset.h:787-885`) with the windowed rank machinery
    * (`mdio/stats.h:229-335`). Each key names a 1-D coordinate variable
    * (a dimension coordinate or a listed coordinate over one dim); its
    * window `[lo, hi]` filters the coordinate EXACTLY ([[rangePred]] —
    * integral/decimal coordinates compare in their own type) and the
    * matching indices aggregate to `(min, max, count)` in ONE distributed
    * job over the (tiny) coordinate variable — nothing is collected, so a
    * petascale dim extent costs one columnar scan of one 1-D array. The
    * match must be CONTIGUOUS (`count == max − min + 1`, which a
    * monotonic coordinate guarantees): a shuffled / non-monotonic
    * coordinate whose matches are scattered DECLINES loudly — the window
    * is then a gather, not a slice, and the caller should compose
    * [[MdioDataset.selRange]]'s semi-join instead of silently ranking
    * wrong cells. An empty match is equally loud. The returned ranges
    * ride the existing pruned machinery untouched: chunk-aligned results
    * push down / prune, misaligned ones take each operator's exact
    * sliced-scan fallback. */
  def selWindow(spark: SparkSession, path: String,
                windows: Map[String, (Double, Double)]): Map[String, (Long, Long)] = {
    import graft.zarr.ZarrMeta
    val arrays = ZarrMeta.readGroup(ZarrMeta.path(path))._2
    val resolved = windows.toSeq.map { case (coordName, (lo, hi)) =>
      require(lo <= hi, s"empty sel window [$lo, $hi] on '$coordName'")
      val (meta, attrs) = arrays.getOrElse(coordName,
        throw new IllegalArgumentException(s"no coordinate '$coordName' in $path"))
      val cdims = meta.dimNames
        .orElse(attrs.flatMap(graft.sources.MdioTableUtil.arrayDimensions))
        .getOrElse(throw new IllegalArgumentException(
          s"coordinate '$coordName' carries no dimension names"))
      require(cdims.size == 1,
        s"sel window needs a 1-D coordinate; '$coordName' is ${cdims.size}-D " +
          "(reference mdio/dataset.h:676-723)")
      val dim = cdims.head
      val cdf = spark.read.format("mdio").option("variables", coordName).load(path)
      val vCol = if (coordName == dim) s"${coordName}__value" else coordName
      val hit = cdf
        .filter(rangePred(col(vCol), cdf.schema(vCol).dataType, lo, hi))
        .agg(min(col(dim)), max(col(dim)), count(lit(1L))).head
      require(!hit.isNullAt(0),
        s"sel window [$lo, $hi] matches no '$coordName' value")
      val (i0, i1, n) = (hit.getLong(0), hit.getLong(1), hit.getLong(2))
      require(n == i1 - i0 + 1,
        s"'$coordName' is not monotonic over [$lo, $hi]: $n matching indices " +
          s"scatter across [$i0, $i1] — a gather, not a slice; compose " +
          "MdioDataset.selRange instead")
      dim -> (i0, i1 + 1)
    }
    require(resolved.map(_._1).distinct.size == resolved.size,
      s"sel windows name one dim twice: ${windows.keys.mkString(", ")}")
    resolved.toMap
  }

  /** The clamped dim-index window every windowed QC operator shares
    * (r19, one definition so the clamp and filter semantics can never
    * drift between the eight call sites): `bounds` is `ranges` clamped
    * into the variable's shape — loud on an empty slice — and applying
    * the slice to a DataFrame adds one pushable dim predicate per
    * NARROWED dim only, so an unwindowed call filters nothing and the
    * filters reach the scan's chunk pruning. */
  private[operators] final case class DimSlice(dims: Seq[String],
                                               shape: Seq[Long],
                                               bounds: Seq[(Long, Long)]) {
    def apply(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
      dims.zip(bounds).zipWithIndex.foldLeft(df) { case (acc, ((d, (lo, hi)), i)) =>
        if (lo <= 0 && hi >= shape(i)) acc
        else acc.filter(col(d) >= lo && col(d) < hi)
      }
  }

  private def sliceOf(meta: graft.zarr.ZarrMeta.ArrayMeta, dims: Seq[String],
                      ranges: Map[String, (Long, Long)],
                      variable: String): DimSlice = {
    val bounds = dims.zipWithIndex.map { case (d, i) =>
      val (lo, hi) = ranges.getOrElse(d, (0L, meta.shape(i)))
      (math.max(lo, 0L), math.min(hi, meta.shape(i)))
    }
    require(bounds.forall { case (lo, hi) => lo < hi },
      s"empty dim slice $ranges over '$variable'")
    DimSlice(dims, meta.shape, bounds)
  }

  /** A UNION of dim windows for the QC family (r19) — SET1's slice-concat
    * algebra (reference `mdio/variable.h:1357-1396`) applied to the
    * windowed rank machinery: each window clamps like a single `ranges`
    * (loud on empty), the clamped windows must be pairwise DISJOINT
    * (cell-level — an overlap would double-count cells, so it declines
    * loudly, the `kMaxNumSlices` analog of rejecting a malformed slice
    * list rather than guessing dedup semantics), and applying the union
    * to a DataFrame adds a PUSHABLE per-dim hull conjunction (the scan
    * prunes to the bounding box) plus the exact OR-of-windows refinement
    * Spark evaluates on the surviving rows. */
  private final case class DimUnion(slices: Seq[DimSlice]) {
    require(slices.nonEmpty, "empty window union")
    def apply(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
      if (slices.size == 1) return slices.head(df)
      val dims = slices.head.dims
      val shape = slices.head.shape
      // pushable hull: per dim, [min lo, max hi) across windows
      val hulled = dims.indices.foldLeft(df) { case (acc, i) =>
        val lo = slices.map(_.bounds(i)._1).min
        val hi = slices.map(_.bounds(i)._2).max
        if (lo <= 0 && hi >= shape(i)) acc
        else acc.filter(col(dims(i)) >= lo && col(dims(i)) < hi)
      }
      // exact refinement: OR of each window's narrowed-dim conjunction
      val or = slices.map { s =>
        s.dims.zip(s.bounds).zipWithIndex.collect {
          case ((d, (lo, hi)), i) if lo > 0 || hi < shape(i) =>
            col(d) >= lo && col(d) < hi
        }.reduceOption(_ && _).getOrElse(lit(true))
      }.reduce(_ || _)
      hulled.filter(or)
    }
  }

  private def unionOf(meta: graft.zarr.ZarrMeta.ArrayMeta, dims: Seq[String],
                      windows: Seq[Map[String, (Long, Long)]],
                      variable: String): DimUnion = {
    val slices = windows.map(w => sliceOf(meta, dims, w, variable))
    for (i <- slices.indices; j <- (i + 1) until slices.size) {
      val overlap = dims.indices.forall { d =>
        math.max(slices(i).bounds(d)._1, slices(j).bounds(d)._1) <
          math.min(slices(i).bounds(d)._2, slices(j).bounds(d)._2)
      }
      require(!overlap,
        s"windows ${windows(i)} and ${windows(j)} over '$variable' overlap " +
          "— an OR-of-ranges union must be disjoint (cells would double-" +
          "count); merge them into one window instead")
    }
    DimUnion(slices)
  }

  /** Chunk-aligned boxes for every window of a union; None when ANY
    * window is misaligned (the caller's exact sliced-union scan answers). */
  private def alignedUnion(meta: graft.zarr.ZarrMeta.ArrayMeta, dims: Seq[String],
                           windows: Seq[Map[String, (Long, Long)]]): Option[Seq[Seq[(Long, Long)]]] = {
    val boxes = windows.map(w =>
      if (w.isEmpty) Some(meta.chunkGrid.map(g => (0L, g)))
      else graft.sources.MdioAggScan.alignedChunkBox(meta, dims, w))
    if (boxes.forall(_.isDefined)) Some(boxes.map(_.get)) else None
  }

  /** Feed every grid key in `[leadLo, leadHi)` of the leading dimension
    * to `perChunk` with its entry from `entries` (None = no entry). */
  private def feedKeys(grid: Seq[Long], leadLo: Long, leadHi: Long,
                       entries: Map[String, graft.sources.MdioChunkStats.Entry])
                      (perChunk: (Seq[Long], Option[graft.sources.MdioChunkStats.Entry]) => Unit): Unit =
    graft.sources.MdioAggScan.boxKeys((leadLo, leadHi) +: grid.drop(1).map(g => (0L, g)))
      .foreach { key =>
        perChunk(key.split("\\.").map(_.toLong).toSeq, entries.get(key))
      }

  /** Walk a generation-current sidecar SHARD BY SHARD over the chunk
    * grid: each shard whose manifest record proves FULL COVERAGE of its
    * lead range (`count` = leads × chunks-per-lead) is offered to
    * `summary(shardId, meta)` first — returning true answers the whole
    * shard from the manifest WITHOUT opening its file; otherwise (and for
    * incomplete or unlisted shards) the shard file loads and every grid
    * key in its lead range goes through `perChunk` with its entry (outer
    * None = no entry anywhere — the caller's unprunable/uncovered case).
    * Legacy monolithic sidecars feed every key with no summaries. This is
    * what keeps countInRange/kthSmallest at O(manifest) driver bytes on a
    * 100 TB store: interior shards — the overwhelming majority under a
    * selective range or a rank bracket — never open. `leadBoxes` restricts
    * the walk to shards intersecting a lead-chunk range (r18, boxed
    * ranks): disjoint shards are never read, and fed keys clamp to the
    * intersection, so a slice pays only its own shards. `leadBoxes` may
    * carry SEVERAL ranges (r19, OR-of-ranges windows — SET1's
    * slice-concat algebra applied to QC): segments are merged ascending,
    * the walk stays ONE pass over the manifest, each shard is triaged
    * (and its file read) AT MOST ONCE no matter how many segments cut
    * it, and an opened shard feeds each intersecting segment's clamped
    * key range — disjoint segments, so no key feeds twice. `entryBudget`
    * (r19) bounds the DRIVER-side parse the opened shards imply — the
    * pushdown path's `boxRankAnswerable` discipline applied to the direct
    * operators: before a shard opens, the keys it will feed count against
    * the budget, and exceeding it ABORTS the walk (returns false) so the
    * caller falls back to its exact distributed scan instead of parsing
    * every cut shard on the driver. A trailing-narrowed window defeats
    * every whole-shard summary (the shard's [lo,hi]×cells describes cells
    * the window cuts away), so without the budget a window over the full
    * lead extent parses O(all shard entries) driver-side. Legacy
    * monolithic sidecars never count: their whole entry map was already
    * parsed to read the manifest, so aborting would spend the cost twice.
    * Returns true iff the walk completed. */
  private def walkShards(varDir: graft.zarr.VPath,
                         man: graft.sources.MdioChunkStats.Manifest,
                         grid: Seq[Long],
                         leadBoxes: Seq[(Long, Long)] = Seq.empty,
                         entryBudget: Long = Long.MaxValue)
                        (summary: (Long, graft.sources.MdioChunkStats.ShardMeta) => Boolean)
                        (perChunk: (Seq[Long], Option[graft.sources.MdioChunkStats.Entry]) => Unit): Boolean = {
    // merge the lead segments ascending so each shard is visited once and
    // fed key ranges never overlap
    val segs = (if (leadBoxes.isEmpty) Seq((0L, grid.head)) else leadBoxes)
      .map { case (lo, hi) => (math.max(lo, 0L), math.min(hi, grid.head)) }
      .filter { case (lo, hi) => lo < hi }
      .sortBy(_._1)
      .foldLeft(List.empty[(Long, Long)]) {
        case ((alo, ahi) :: rest, (lo, hi)) if lo <= ahi =>
          (alo, math.max(ahi, hi)) :: rest
        case (acc, s) => s :: acc
      }.reverse
    man.legacy match {
      case Some(es) =>
        segs.foreach { case (lo, hi) => feedKeys(grid, lo, hi, es)(perChunk) }
        true
      case None =>
        val chunksPerLead = grid.drop(1).product
        val nShards = (grid.head + man.span - 1) / man.span
        // shard id -> this shard's clamped lead ranges, ascending (a shard
        // straddling two merged segments is still triaged and read ONCE)
        val bySid = scala.collection.mutable.SortedMap.empty[Long, List[(Long, Long)]]
        segs.foreach { case (bLo, bHi) =>
          var sid = bLo / man.span
          val sidEnd = math.min(nShards, (bHi + man.span - 1) / man.span)
          while (sid < sidEnd) {
            val leadLo = math.max(sid * man.span, bLo)
            val leadHi = math.min(math.min((sid + 1) * man.span, grid.head), bHi)
            bySid.update(sid, bySid.getOrElse(sid, Nil) :+ ((leadLo, leadHi)))
            sid += 1
          }
        }
        var fed = 0L
        val it = bySid.iterator
        while (it.hasNext) {
          val (sid, segRanges) = it.next()
          val smOpt = man.shards.get(sid)
          val complete = smOpt.exists(sm => sm.count >= 0 &&
            sm.count == (math.min((sid + 1) * man.span, grid.head) - sid * man.span) * chunksPerLead)
          if (!(complete && summary(sid, smOpt.get))) {
            fed += segRanges.map { case (lo, hi) => (hi - lo) * chunksPerLead }.sum
            if (fed > entryBudget) {
              log.warn(s"metadata walk of '$varDir' would triage $fed+ chunk " +
                s"entries driver-side (budget $entryBudget, " +
                "spark.graft.mdio.maxPushedGroups) — aborting to the exact scan")
              return false
            }
            val entries = smOpt
              .map(sm => graft.sources.MdioChunkStats.readShard(varDir, sid, sm.gen))
              .getOrElse(Map.empty[String, graft.sources.MdioChunkStats.Entry])
            segRanges.foreach { case (lo, hi) =>
              feedKeys(grid, lo, hi, entries)(perChunk)
            }
          }
        }
        true
    }
  }

  /** The shared opened-entry budget every DIRECT QC operator passes to
    * [[walkShards]] — the same figure that caps grouped pushdown driver
    * state (`spark.graft.mdio.maxPushedGroups`, default 2^16), so ONE
    * conf governs all driver-side metadata state. */
  private def qcEntryBudget: Long = graft.sources.MdioAggScan.maxPushedGroups.toLong

  /** [[countInRange]] result: `count` is exact; `metadataChunks` answered
    * from the sidecar (fully inside the range — their finite-cell `cnt`
    * counts whole, whether the proof came from the chunk's own entry or
    * from a whole-shard manifest summary), `outsideChunks` were proven
    * empty, `scannedChunks` straddle the boundary and were read;
    * `fallback` marks the ordinary pruned-scan path (stale/absent stats
    * or too many straddlers). */
  final case class CountInRange(count: Long, metadataChunks: Long,
                                outsideChunks: Long, scannedChunks: Long,
                                fallback: Boolean)

  /** Exact COUNT of cells with `lo ≤ v ≤ hi` (closed range; NaN never
    * counts — and never disturbs the metadata answer, since a chunk's
    * moment `cnt` counts only its FINITE in-domain cells) that reads ONLY
    * the chunks whose stats interval STRADDLES a range boundary: fully
    * inside ⇒ count = `cnt` from metadata, fully outside (or all-NaN) ⇒
    * zero, straddlers ⇒ ONE scan over exactly that chunk subset (the
    * `chunkKeys` allowlist — a single plan node, not a per-chunk union).
    * `ranges` (r18) restricts the count to a dim-index box — the
    * clip-count of a crop — with out-of-box chunks in no counter;
    * misaligned windows answer exactly through the sliced range scan.
    * `windows` (r19) counts over a UNION of disjoint boxes (two depth
    * slabs in one call — SET1's slice-concat algebra): one manifest
    * walk, one straddler scan over the union's chunks; overlapping
    * windows decline loudly (cells would double-count).
    * The triage itself is HIERARCHICAL: whole shards whose manifest
    * summary (bounds union + `cells`/`bounded`, [[graft.sources.MdioChunkStats.ShardMeta]])
    * already decides them — union inside the range, disjoint from it, or
    * all-NaN — are answered from the manifest without opening the shard
    * file, so the sidecar read is O(manifest) + O(boundary shards), not
    * O(chunk entries). The selectivity/QC count of a 100 TB store thus
    * pays chunk I/O proportional to the range BOUNDARY SURFACE, not the
    * range volume — a plain filtered scan must still read every chunk
    * that satisfies the predicate. Degrades gracefully per shard and per
    * chunk (a summary that cannot decide opens the shard; a missing
    * entry or missing moments makes that chunk a straddler); stale or
    * absent stats, or more than `maxScanChunks` straddlers, fall back to
    * one ordinary value-pruned scan (`fallback = true`), so the answer is
    * exact in every case. Reference analog: statsV1 QC summaries,
    * mdio/stats.h:229-335. */
  def countInRange(spark: SparkSession, path: String, variable: String,
                   lo: Double, hi: Double,
                   maxScanChunks: Int = 512,
                   ranges: Map[String, (Long, Long)] = Map.empty,
                   windows: Seq[Map[String, (Long, Long)]] = Nil): CountInRange = {
    import graft.sources.MdioChunkStats
    import graft.zarr.ZarrMeta
    require(lo <= hi, s"empty range [$lo, $hi]")
    require(ranges.isEmpty || windows.isEmpty,
      "pass ONE window via ranges or several via windows, not both")
    val root = ZarrMeta.path(path)
    val (meta, attrs) = ZarrMeta.readGroup(root)._2.getOrElse(variable,
      throw new IllegalArgumentException(s"no variable '$variable' in $path"))
    val dims = meta.dimNames
      .orElse(attrs.flatMap(graft.sources.MdioTableUtil.arrayDimensions))
      .getOrElse(throw new IllegalArgumentException(
        s"variable '$variable' carries no dimension names"))
    require(!dims.contains(variable),
      s"'$variable' is a dimension coordinate — count its index range instead")
    // optional dim-index window (r18) or union of disjoint windows (r19):
    // count in-range cells of the window cells only — out-of-window
    // chunks are outside the domain, not "outside the range", and appear
    // in no counter
    val sliced: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
      if (windows.nonEmpty) unionOf(meta, dims, windows, variable).apply
      else sliceOf(meta, dims, ranges, variable).apply
    // exact range membership in the column's own type — consistent with
    // the BigDecimal chunk triage (see rangePred)
    def filtered(df: org.apache.spark.sql.DataFrame) =
      df.filter(rangePred(col(variable), df.schema(variable).dataType, lo, hi))
    def fullScanCount(): Long =
      filtered(sliced(spark.read.format("mdio").load(path))).count()

    val (loB, hiB) = (exactBig(lo), exactBig(hi))
    MdioChunkStats.currentManifest(root.resolve(variable)) match {
      case None => CountInRange(fullScanCount(), 0L, 0L, 0L, fallback = true)
      case Some(man) =>
        val grid = meta.chunkGrid
        val boxesOpt =
          if (windows.nonEmpty) alignedUnion(meta, dims, windows)
          else if (ranges.isEmpty) Some(Seq(grid.map(g => (0L, g))))
          else graft.sources.MdioAggScan.alignedChunkBox(meta, dims, ranges).map(Seq(_))
        if (boxesOpt.isEmpty) { // misaligned window: exact sliced scan
          log.warn(s"countInRange($path, $variable): slice " +
            s"${if (windows.nonEmpty) windows else ranges} is not " +
            "chunk-aligned — falling back to the sliced range scan")
          return CountInRange(fullScanCount(), 0L, 0L, 0L, fallback = true)
        }
        val boxes = boxesOpt.get
        def inBox(cc: Seq[Long]): Boolean =
          boxes.exists(b => cc.indices.forall(i => cc(i) >= b(i)._1 && cc(i) < b(i)._2))
        val tf = boxes.map(b =>
          (1 until grid.size).forall(i => b(i)._1 <= 0 && b(i)._2 >= grid(i)))
        var metaCount = 0L
        var metaChunks = 0L
        var outside = 0L
        val straddlers = Seq.newBuilder[Seq[Long]]
        var nStraddle = 0
        // whole-shard answers from the manifest summary alone (the r15
        // cells/bounded fields): a complete shard whose bounds union lies
        // inside the range counts its `cells` finite cells whole (all-NaN
        // chunks there are outside — NaN matches no range), one disjoint
        // from the range proves every chunk empty, and an all-NaN shard
        // (no union, cells = 0 by construction) is proven zero. Anything
        // the summary cannot decide — including a shard the dim window
        // cuts — opens the shard for per-chunk triage.
        val within = walkShards(root.resolve(variable), man, grid,
          leadBoxes = boxes.map(_.head), entryBudget = qcEntryBudget) { (sid, sm) =>
          boxes.indices.exists { w =>
            tf(w) && sid * man.span >= boxes(w).head._1 &&
              math.min((sid + 1) * man.span, grid.head) <= boxes(w).head._2
          } &&
            ((sm.lo, sm.hi) match {
              case (Some(l), Some(h)) if h < loB || l > hiB =>
                outside += sm.count; true
              case (Some(l), Some(h)) if l >= loB && h <= hiB &&
                  sm.cells.isDefined && sm.bounded >= 0 =>
                metaCount += sm.cells.get
                metaChunks += sm.bounded
                outside += sm.count - sm.bounded
                true
              case (None, None) => outside += sm.count; true
              case _ => false
            })
        } { (cc, eOpt) =>
          if (inBox(cc)) eOpt match {
            case Some(None) => outside += 1 // all-NaN: no cell can match
            case Some(Some(b)) if b.max < loB || b.min > hiB => outside += 1
            case Some(Some(b)) if b.min >= loB && b.max <= hiB &&
                b.moments.isDefined =>
              metaCount += b.moments.get.cnt
              metaChunks += 1
            case _ => // straddler, no entry, or no moments: scan it
              straddlers += cc
              nStraddle += 1
          }
        }
        if (!within || nStraddle > maxScanChunks)
          return CountInRange(fullScanCount(), 0L, 0L, 0L, fallback = true)
        val scanned: Long =
          if (nStraddle == 0) 0L
          else
            // ONE scan planning exactly the straddler chunks via the
            // chunkKeys allowlist — a single plan node no matter how many
            // chunks the range boundary crosses (a per-chunk union carried
            // one dim-boxed leg each)
            filtered(spark.read.format("mdio")
              .option("chunkKeys",
                straddlers.result().map(_.mkString(".")).mkString(","))
              .load(path)).count()
        CountInRange(metaCount + scanned, metaChunks, outside,
          nStraddle.toLong, fallback = false)
    }
  }

  /** [[kthSmallest]] result: `value` is the exact k-th smallest finite
    * cell; `jobs` counts the Spark scan jobs issued (0–2: the below-rank
    * recount when the bracket's lower edge straddles chunks, and the
    * window selection), `scannedChunks` the chunks those jobs read (the
    * window job's count is the sidecar-pruned chunk set of its ONE scan
    * node); `fallback` marks the exact full-scan grouped-rank path. */
  final case class KthSmallest(value: Double, jobs: Int,
                               scannedChunks: Long, fallback: Boolean)

  private def asDouble(row: org.apache.spark.sql.Row): Double = anyToDouble(row.get(0))

  private def anyToDouble(x: Any): Double = x match {
    case d: Double => d
    case f: Float => f.toDouble
    case l: Long => l.toDouble
    case i: Int => i.toDouble
    case s: Short => s.toDouble
    case b: Byte => b.toDouble
    case bd: java.math.BigDecimal => bd.doubleValue() // u64 surface
    case other => throw new IllegalStateException(s"unrankable value $other")
  }

  /** Buckets per [[selectByRank]] pass: bounds the driver collect at one
    * Long per non-empty bucket and the final single-partition sort at one
    * bucket's distinct values. */
  private val RankBuckets = 1024

  /** The EXACT binary value of a double as BigDecimal — scala's
    * `BigDecimal(d)` routes through `valueOf` (shortest decimal string),
    * which at magnitudes past 2^53 names a DIFFERENT real number than the
    * double the scan compares against (2^63.toDouble stringifies as
    * ...776E18, exact value ...775808). Every triage edge must be the
    * same number the scan predicate uses. */
  private[graft] def exactBig(d: Double): BigDecimal =
    BigDecimal(new java.math.BigDecimal(d))

  /** Scan-side literal for a SIDECAR-DERIVED edge (a chunk bound — always
    * a value of the column's domain): DECIMAL columns compare against the
    * exact decimal — the u64 surface past 2^53 must not round through
    * double, since the metadata side of the same comparison is exact and
    * a half-ulp disagreement misranks; integral columns against the exact
    * long (bounds of integral data are whole, and long-vs-long comparison
    * never promotes to double); float/double columns against the
    * double/float, which IS the value. */
  private[graft] def edgeLit(x: BigDecimal,
                             dt: org.apache.spark.sql.types.DataType)
      : org.apache.spark.sql.Column = {
    import org.apache.spark.sql.types._
    dt match {
      case _: DecimalType => lit(x.underlying)
      case LongType | IntegerType | ShortType | ByteType => lit(x.toLongExact)
      case FloatType => lit(x.toFloat)
      case _ => lit(x.toDouble)
    }
  }

  /** The Spark type sidecar edges take beside column type `dt` (what
    * [[edgeLit]] produces): decimals stay themselves, integrals widen to
    * long, floats/doubles stay. */
  private[graft] def edgeType(dt: org.apache.spark.sql.types.DataType)
      : org.apache.spark.sql.types.DataType = {
    import org.apache.spark.sql.types._
    dt match {
      case d: DecimalType => d
      case LongType | IntegerType | ShortType | ByteType => LongType
      case FloatType => FloatType
      case _ => DoubleType
    }
  }

  /** A sidecar edge as a PLAIN VALUE of [[edgeType]] (for broadcast-frame
    * rows, where [[edgeLit]]'s literal form can't be used). */
  private[graft] def edgeValue(x: BigDecimal,
                               dt: org.apache.spark.sql.types.DataType): Any = {
    import org.apache.spark.sql.types._
    dt match {
      case _: DecimalType => x.underlying
      case LongType | IntegerType | ShortType | ByteType => Long.box(x.toLongExact)
      case FloatType => Float.box(x.toFloat)
      case _ => Double.box(x.toDouble)
    }
  }

  /** Closed-range predicate `lo ≤ v ≤ hi` with USER-SUPPLIED double edges,
    * evaluated consistently with the exact metadata triage: integral
    * columns (incl. the u64 decimal surface) snap the edges INWARD to the
    * nearest integers — for integral v, `v ≥ lo ⇔ v ≥ ⌈lo⌉` — so the
    * comparison runs in the column's own type and a value within half an
    * ulp of an edge can never be double-misclassified against the
    * BigDecimal arithmetic the chunk triage used. Float/double columns
    * compare in double, which is exact (the edges ARE doubles). Integral
    * edges beyond the Long range collapse to constant true/false. */
  private[graft] def rangePred(vcol: org.apache.spark.sql.Column,
                               dt: org.apache.spark.sql.types.DataType,
                               lo: Double, hi: Double): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.types._
    def snap(x: Double, up: Boolean): BigDecimal =
      exactBig(x).setScale(0,
        if (up) BigDecimal.RoundingMode.CEILING else BigDecimal.RoundingMode.FLOOR)
    dt match {
      case d: DecimalType =>
        // exact edges snapped INWARD at the column's own scale (for values
        // representable at scale s, v ≥ lo ⇔ v ≥ ⌈lo⌉_s) — the scale-0
        // u64 surface and any future scaled-decimal dtype both compare
        // against the same numbers the BigDecimal chunk triage used;
        // edges beyond the type's precision collapse to constants
        val l = exactBig(lo).setScale(d.scale, BigDecimal.RoundingMode.CEILING)
        val h = exactBig(hi).setScale(d.scale, BigDecimal.RoundingMode.FLOOR)
        val bound = BigDecimal(10).pow(d.precision - d.scale)
        val loP = if (l >= bound) lit(false)
          else if (l <= -bound) lit(true)
          else vcol >= lit(l.underlying)
        val hiP = if (h <= -bound) lit(false)
          else if (h >= bound) lit(true)
          else vcol <= lit(h.underlying)
        loP && hiP
      case LongType | IntegerType | ShortType | ByteType =>
        val l = snap(lo, up = true)
        val h = snap(hi, up = false)
        val loP = if (l > BigDecimal(Long.MaxValue)) lit(false)
          else if (l < BigDecimal(Long.MinValue)) lit(true)
          else vcol >= lit(l.toLongExact)
        val hiP = if (h < BigDecimal(Long.MinValue)) lit(false)
          else if (h > BigDecimal(Long.MaxValue)) lit(true)
          else vcol <= lit(h.toLongExact)
        loP && hiP
      case _ => vcol >= lit(lo) && vcol <= lit(hi)
    }
  }

  /** Locate the bucket holding the `rank`-th cell given per-bucket cell
    * counts (any order): (bucketId, cellsBeforeThatBucket). Pure Long
    * arithmetic — ranks past 2³¹ (a median at the 100 TB envelope is
    * k ≈ 10¹²) never truncate. Throws when the rank exceeds the total. */
  private[graft] def bucketForRank(perBucket: Seq[(Long, Long)],
                                   rank: Long): (Long, Long) = {
    require(rank >= 1, s"rank $rank out of range")
    var before = 0L
    val it = perBucket.sortBy(_._1).iterator
    while (it.hasNext) {
      val (b, c) = it.next()
      if (before + c >= rank) return (b, before)
      before += c
    }
    throw new IllegalArgumentException(s"rank $rank exceeds $before cells")
  }

  /** Exact rank selection over DISTINCT-VALUE counts (`v`: any numeric,
    * `c`: Long) with Long ranks end-to-end — the replacement for
    * `ORDER BY v OFFSET rank-1 LIMIT 1`, whose Int-typed offset silently
    * wraps past 2³¹ and whose global sort funnels every row through one
    * partition. Two bounded jobs over `byV` (persist it when it derives
    * from a scan): a ≤[[RankBuckets]]-row per-bucket histogram collected
    * to the driver locates the bucket holding the rank, then an ordered
    * cumulative count INSIDE that one bucket selects the value — the
    * final sort sees one bucket's distinct values, not the window's.
    * Buckets are a deterministic pure function of the value (no
    * sampling), so re-evaluation cannot move rows across buckets; `lo`/
    * `hi` need only be approximate covers (values outside clamp into the
    * edge buckets). */
  private[graft] def selectByRank(byV: org.apache.spark.sql.DataFrame,
                                  rank: Long, lo: Double, hi: Double): Double = {
    val width = (hi - lo) / RankBuckets
    val bucket =
      if (!(width > 0)) lit(0L) // single value / zero span: one bucket
      else least(greatest(floor((col("v").cast("double") - lit(lo)) / lit(width)),
        lit(0.0)), lit((RankBuckets - 1).toDouble)).cast("long")
    val per = byV.groupBy(bucket.as("b")).agg(sum(col("c")).as("bc"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val (b, before) = bucketForRank(per, rank)
    val cum = org.apache.spark.sql.expressions.Window.orderBy(col("v"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    asDouble(byV.filter(bucket === b)
      .withColumn("cum", sum(col("c")).over(cum))
      .filter(col("cum") >= rank - before)
      .orderBy(col("v")).limit(1).select(col("v")).head)
  }

  /** One rank request for [[selectByRankMulti]]: select the `residual`-th
    * smallest value among `byV` rows with `x0 < v ≤ x1` (x0 None ⇒ no
    * lower edge). The edges are COLUMNS (built with [[edgeLit]]) so the
    * window membership compares in the value's native type — a u64 edge
    * past 2^53 must not round through double. `lo`/`hi` are approximate
    * double covers for the bucket span, exactly as in [[selectByRank]]
    * (buckets only need determinism, not exactness). */
  private[graft] final case class RankReq(x0: Option[org.apache.spark.sql.Column],
                                          x1: org.apache.spark.sql.Column,
                                          lo: Double, hi: Double,
                                          residual: Long)

  /** [[selectByRank]] for MANY ranks (each with its own window) in TWO
    * jobs total instead of two per rank: the requests ride the plan as an
    * exploded literal array — no join, no per-rank action — so job one
    * collects every rank's ≤[[RankBuckets]]-row bucket histogram at once
    * and job two picks every rank's value from its located bucket with a
    * cumulative-count window PARTITIONED BY RANK (each partition sorts
    * one bucket's distinct values, the same bound as the single-rank
    * form). Driver round-trips stop scaling with the rank count — the
    * p01/p50/p99 readout pays the same two cached-frame jobs as one
    * median. */
  private[graft] def selectByRankMulti(byV: org.apache.spark.sql.DataFrame,
                                       reqs: Seq[RankReq],
                                       et: org.apache.spark.sql.types.DataType)
      : Seq[Double] = {
    import org.apache.spark.sql.expressions.Window
    if (reqs.isEmpty) return Seq.empty
    def reqArr(extra: Seq[(Int, Long, Long)] = Nil) = explode(array(
      reqs.zipWithIndex.map { case (r, i) =>
        val width = (r.hi - r.lo) / RankBuckets
        val more = extra.find(_._1 == i).map { case (_, b, need) =>
          Seq(lit(b).as("cb"), lit(need).as("need")) }.getOrElse(Nil)
        struct(Seq(lit(i).as("id"),
          r.x0.getOrElse(lit(null)).cast(et).as("x0"),
          r.x1.cast(et).as("x1"), lit(r.lo).as("blo"),
          lit(width).as("bw")) ++ more: _*)
      }: _*))
    def windowed(extra: Seq[(Int, Long, Long)]) = {
      val df = byV.withColumn("r", reqArr(extra)).select(col("v"), col("c"), col("r.*"))
        .filter((col("x0").isNull || col("v") > col("x0")) && col("v") <= col("x1"))
      val bucket = when(col("bw") <= 0, lit(0L)).otherwise(
        least(greatest(floor((col("v").cast("double") - col("blo")) / col("bw")),
          lit(0.0)), lit((RankBuckets - 1).toDouble)).cast("long"))
      (df, bucket)
    }
    // job 1: every rank's bucket histogram at once
    val (hist, bucket1) = windowed(Nil)
    val per = hist.groupBy(col("id"), bucket1.as("b")).agg(sum(col("c")).as("bc"))
      .collect()
      .groupBy(_.getInt(0))
      .map { case (id, rows) => id -> rows.map(r => (r.getLong(1), r.getLong(2))).toSeq }
    val located = reqs.indices.map { i =>
      val (b, before) = bucketForRank(per.getOrElse(i, Seq.empty), reqs(i).residual)
      (i, b, reqs(i).residual - before)
    }
    // job 2: every rank picks from its located bucket; the cum window
    // partitions by rank, so each partition holds ONE bucket's values
    val (pick, bucket2) = windowed(located)
    val cum = Window.partitionBy(col("id")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val out = pick.filter(bucket2 === col("cb"))
      .withColumn("cum", sum(col("c")).over(cum))
      .filter(col("cum") >= col("need") && col("cum") - col("c") < col("need"))
      .select(col("id"), col("v"))
      .collect().map(r => r.getInt(0) -> anyToDouble(r.get(1))).toMap
    reqs.indices.map(i => out.getOrElse(i,
      throw new IllegalStateException(s"rank request $i selected no value")))
  }

  /** DISTRIBUTED bucketed rank pick over grouped distinct-value counts —
    * the per-group twin of [[selectByRankMulti]], with NOTHING collected:
    * `byKV` carries one row per (key-group, value) with columns `keys`*,
    * `v` (any numeric), `c` (Long count), `residual` (the 1-based rank to
    * select within the group, constant per group), and `blo`/`bw`
    * (doubles: the group's bucket origin and per-bucket width — only
    * determinism matters, values outside clamp into the edge buckets).
    * Stage 1 aggregates per-(group, bucket) counts (≤[[RankBuckets]] rows
    * per group) and locates each group's rank-holding bucket with a
    * cumulative window ORDERED BY BUCKET — ≤1024 rows per window
    * partition, never the group's value set. Stage 2 joins the chosen
    * (bucket, in-bucket rank) back — BROADCAST, one row per group, the
    * documented O(groups) envelope — filters to that ONE bucket, and
    * picks with a cumulative window ordered by value whose partitions now
    * hold ~1/1024 of a group's distinct values. The degenerate all-overlap
    * store (every chunk interval spans the window — zero-centered
    * amplitudes) thus never sorts a whole group in one partition: the
    * r16 plan did, which at 100× meant a single-partition sort of ~10⁹
    * distinct values per depth slab. `byKV` is referenced by BOTH stages;
    * its aggregation exchange is identical on each side, so Spark's
    * exchange reuse executes the underlying scan once (pinned in
    * MdioValueStatsSpec via the chunk-read counter). Returns `byKV`'s
    * rows (all columns) filtered to each group's selected value. */
  private[graft] def pickByRankBucketed(byKV: org.apache.spark.sql.DataFrame,
                                        keys: Seq[String])
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // coalesce makes _bkt provably NON-NULL: otherwise the join on _bkt
    // below lets the optimizer infer an isnotnull(_bkt) constraint into
    // ONE of the two byKV occurrences, the subtrees stop canonicalizing
    // equal, and exchange reuse (the mechanism that executes the shared
    // scan once) silently dies
    val bkt = coalesce(when(col("bw") <= 0, lit(0L)).otherwise(
      least(greatest(floor((col("v").cast("double") - col("blo")) / col("bw")),
        lit(0.0)), lit((RankBuckets - 1).toDouble)).cast("long")), lit(0L))
    val withB = byKV.withColumn("_bkt", bkt)
    val perB = withB
      .groupBy((keys :+ "residual").map(col) :+ col("_bkt"): _*)
      .agg(sum(col("c")).as("_bc"))
    val wB = Window.partitionBy(keys.map(col): _*).orderBy(col("_bkt"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val chosen = perB.withColumn("_cumb", sum(col("_bc")).over(wB))
      .filter(col("_cumb") >= col("residual") &&
        col("_cumb") - col("_bc") < col("residual"))
      .select(keys.map(col) :+ col("_bkt").as("_cb") :+
        (col("residual") - col("_cumb") + col("_bc")).as("_need"): _*)
    val wV = Window.partitionBy(keys.map(col): _*).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    withB.join(broadcast(chosen), keys)
      .filter(col("_bkt") === col("_cb"))
      .withColumn("_cum", sum(col("c")).over(wV))
      .filter(col("_cum") >= col("_need") && col("_cum") - col("c") < col("_need"))
  }

  /** The hierarchical rank-item state [[kthSmallest]] and [[quantilesOf]]
    * share: FINE items (opened per-chunk bounds, moments required) and
    * COARSE items (unopened whole-shard manifest summaries, one
    * [lo, hi]×cells interval each), built by one walk of the manifest.
    * `usable` drops on any cell unaccounted for with moments (missing
    * entry, missing moments, torn shard) — callers fall back to their
    * exact full scan. [[openCoarse]] refines: shards whose bounds satisfy
    * the caller's window predicate open into fine items (ONE round
    * suffices — finer detail only SHRINKS brackets, so a shard touching
    * the shrunk window touched the coarse one and is already open;
    * interior shards NEVER open — that is ShardMeta's O(manifest)
    * promise). */
  private final class RankItems(varDir: graft.zarr.VPath,
                                man: graft.sources.MdioChunkStats.Manifest,
                                grid: Seq[Long],
                                boxes: Seq[Seq[(Long, Long)]] = Nil,
                                entryBudget: Long = Long.MaxValue) {
    import graft.sources.MdioChunkStats
    // chunk-index boxes [lo, hi) per dim (r18, sliced ranks; r19, a UNION
    // of disjoint boxes — SET1's slice-concat algebra): items outside
    // every box never rank — a chunk without an entry OUT of the union
    // cannot trip `usable`, and a shard only summarizes coarse when its
    // WHOLE chunk range maps inside ONE box (lead range within that box's
    // lead range, that box's trailing dims uncut); anything partial opens
    // into fine items. Nil = the whole grid.
    private val bs = if (boxes.isEmpty) Seq(grid.map(g => (0L, g))) else boxes
    private val tf = bs.map(b =>
      (1 until grid.size).forall(i => b(i)._1 <= 0 && b(i)._2 >= grid(i)))
    private def inBox(cc: Seq[Long]): Boolean =
      bs.exists(b => cc.indices.forall(i => cc(i) >= b(i)._1 && cc(i) < b(i)._2))
    val fine = scala.collection.mutable.ArrayBuffer.empty[(Seq[Long], MdioChunkStats.Bounds)]
    var coarse = Map.empty[Long, (BigDecimal, BigDecimal, Long)] // sid -> (lo, hi, cells)
    var usable = true
    private def intake(cc: Seq[Long], eOpt: Option[MdioChunkStats.Entry]): Unit =
      if (inBox(cc)) eOpt match {
        case Some(Some(bb)) if bb.moments.isDefined => fine += ((cc, bb))
        case Some(None) => () // all-NaN chunk: never ranks
        case _ => usable = false
      }
    // a budget-aborted walk (trailing-narrowed window cutting every
    // shard's summary) reads as unusable: callers take their exact
    // sliced-scan fallback, never a driver-side parse of every cut shard
    if (!walkShards(varDir, man, grid, leadBoxes = bs.map(_.head),
      entryBudget = entryBudget) { (sid, sm) =>
      sm.cells.isDefined && bs.indices.exists { w =>
        tf(w) && sid * man.span >= bs(w).head._1 &&
          math.min((sid + 1) * man.span, grid.head) <= bs(w).head._2
      } && {
        (sm.lo, sm.hi) match {
          case (Some(l), Some(h)) => coarse = coarse.updated(sid, (l, h, sm.cells.get))
          case _ => () // all-NaN shard: proven cells = 0, contributes nothing
        }
        true
      }
    }(intake)) usable = false
    /** Total finite cells across both granularities. */
    def n: Long = coarse.valuesIterator.map(_._3).sum +
      fine.iterator.map(_._2.moments.get.cnt).sum
    /** Rank intervals over MIXED granularity — whole-shard summaries and
      * opened chunks are both just [lo, hi] intervals carrying a
      * finite-cell count, exactly what [[bracketItems]] consumes. */
    def items: IndexedSeq[(BigDecimal, BigDecimal, Long)] =
      (coarse.valuesIterator ++
        fine.iterator.map { case (_, b) => (b.min, b.max, b.moments.get.cnt) })
        .toIndexedSeq
    /** Open every coarse shard whose [lo, hi] satisfies `touches` into
      * fine items; true when any opened OR the entry budget tripped (the
      * caller re-brackets — and its unconditional `usable` check catches
      * the trip). The refinement shares the walk's budget discipline: a
      * partially-opened shard set would leave bracket-intersecting coarse
      * intervals OUT of the probe/window scans, so exceeding the budget
      * drops `usable` (→ the exact scan fallback) instead of answering
      * from incomplete items. */
    def openCoarse(touches: (BigDecimal, BigDecimal) => Boolean): Boolean = {
      val toOpen = coarse.collect { case (sid, (l, h, _)) if touches(l, h) => sid }
      val chunksPerLead = grid.drop(1).product
      var openedKeys = 0L
      var any = false
      toOpen.foreach { sid =>
        if (usable) {
          val leadHi = math.min((sid + 1) * man.span, grid.head)
          openedKeys += (leadHi - sid * man.span) * chunksPerLead
          if (openedKeys > entryBudget) {
            MdioStats.log.warn(s"rank refinement of '$varDir' would parse " +
              s"$openedKeys+ chunk entries driver-side (budget $entryBudget) " +
              "— falling back to the exact scan")
            usable = false
          } else {
            coarse -= sid
            feedKeys(grid, sid * man.span, leadHi,
              MdioChunkStats.readShard(varDir, sid, man.shards(sid).gen))(intake)
            any = true
          }
        }
      }
      any || !usable
    }
  }

  /** Metadata-only rank bracket over interval items (lo, hi, cnt) — each
    * a chunk's or a whole shard's [min, max]×finite-cells record. The
    * per-item counts give CERTAIN rank bounds without touching data:
    * `L(x) = Σ cnt(hi ≤ x)` cells certainly ≤ x, `U(x) = Σ cnt(lo ≤ x)`
    * cells possibly ≤ x. Binary searches over the sorted boundary values
    * return the tightest certain window (x0, x1] containing the k-th
    * smallest: `x1` = min boundary with L(x1) ≥ k (v* ≤ x1 certainly),
    * `x0` = max boundary with U(x0) < k (v* > x0 certainly; None when no
    * boundary's U is below k). Pure Long/BigDecimal arithmetic — ranks
    * past 2³¹ never truncate. */
  private[graft] def bracketItems(its: IndexedSeq[(BigDecimal, BigDecimal, Long)],
                                  k: Long): (Option[BigDecimal], BigDecimal) = {
    def rankL(x: BigDecimal): Long = its.iterator.collect {
      case (_, h, c) if h <= x => c }.sum
    def rankU(x: BigDecimal): Long = its.iterator.collect {
      case (l, _, c) if l <= x => c }.sum
    val boundaries = its.flatMap { case (l, h, _) => Seq(l, h) }
      .distinct.sorted
    var (lo1, hi1) = (0, boundaries.size - 1) // L(last) = n ≥ k always
    while (lo1 < hi1) {
      val mid = (lo1 + hi1) / 2
      if (rankL(boundaries(mid)) >= k) hi1 = mid else lo1 = mid + 1
    }
    val x1 = boundaries(lo1)
    val x0: Option[BigDecimal] = {
      var (a, b) = (-1, boundaries.size - 1)
      while (a < b) { // find the LAST boundary with U < k (-1 = none)
        val mid = (a + b + 1) / 2
        if (rankU(boundaries(mid)) < k) a = mid else b = mid - 1
      }
      if (a < 0) None else Some(boundaries(a))
    }
    (x0, x1)
  }

  /** EXACT k-th smallest finite cell value (1-indexed; the p-quantile is
    * `k = ceil(p·n)` — NaN cells never rank) by QUANTILE-BY-PRUNING:
    * the sidecar's per-chunk [min, max, cnt] gives CERTAIN rank bounds
    * without touching data — `L(x) = Σ cnt(max ≤ x)` cells certainly
    * ≤ x and `U(x) = Σ cnt(min ≤ x)` cells possibly ≤ x — so a
    * metadata-only search over the chunk boundary values brackets the
    * answer in a window (x0, x1] with `U(x0) < k ≤ L(x1)`, and at most
    * TWO scan jobs finish it: an exact `count(v ≤ x0)` over the chunks
    * straddling x0 (often none), and the residual-rank selection over
    * the chunks intersecting the window. The rank bounds are
    * HIERARCHICAL: whole shards ride the arithmetic as one manifest
    * summary interval ([lo, hi]×cells, [[graft.sources.MdioChunkStats.ShardMeta]]),
    * and only the shards intersecting the bracket window are opened for
    * chunk-level refinement. `ranges` (r18) restricts the rank to a
    * dim-index box (`dim -> [lo, hi)`): chunk-aligned windows ride the
    * same machinery over their own chunks only, misaligned ones answer
    * exactly through the sliced fallback scan. The median of a 100 TB store thus reads
    * O(manifest) sidecar bytes plus only the chunks overlapping one
    * boundary window — a global sort must shuffle the full corpus. Requires
    * generation-current stats with full coverage and moments; anything
    * less falls back to the exact full-scan grouped-rank form
    * (`fallback = true`).
    * Ties are handled exactly: the result equals
    * `ORDER BY v LIMIT 1 OFFSET k-1` in any engine — but the selection
    * itself is [[selectByRank]]'s Long-rank grouped count, never an
    * Int-typed OFFSET. More than `maxProbeChunks` chunks straddling the
    * bracket's lower edge falls back loudly too (the probe is the one
    * remaining per-chunk union; the window selection is always ONE scan). */
  def kthSmallest(spark: SparkSession, path: String, variable: String,
                  k: Long, maxProbeChunks: Int = 512,
                  ranges: Map[String, (Long, Long)] = Map.empty,
                  windows: Seq[Map[String, (Long, Long)]] = Nil): KthSmallest = {
    import graft.sources.MdioChunkStats
    import graft.zarr.ZarrMeta
    require(k >= 1, s"rank $k out of range")
    if (windows.nonEmpty) { // OR-of-ranges union (r19): the batched rank
      require(ranges.isEmpty,
        "pass ONE window via ranges or several via windows, not both")
      val q = rankVector(spark, path, variable, { n =>
        require(k <= n, s"rank $k exceeds $n finite cells"); Seq(k)
      }, maxProbeChunks, Map.empty, windows)
      return KthSmallest(q.values.head, q.jobs, q.scannedChunks, q.fallback)
    }
    val root = ZarrMeta.path(path)
    val (meta, attrs) = ZarrMeta.readGroup(root)._2.getOrElse(variable,
      throw new IllegalArgumentException(s"no variable '$variable' in $path"))
    val dims = meta.dimNames
      .orElse(attrs.flatMap(graft.sources.MdioTableUtil.arrayDimensions))
      .getOrElse(throw new IllegalArgumentException(
        s"variable '$variable' carries no dimension names"))
    require(!dims.contains(variable),
      s"'$variable' is a dimension coordinate — rank its index range instead")
    val isFloat = meta.dtype.charAt(meta.dtype.length - 2) == 'f'
    def dropNaN(df: org.apache.spark.sql.DataFrame) =
      if (isFloat) df.filter(!isnan(col(variable))) else df
    def base = spark.read.format("mdio").load(path)
    val vt = base.schema(variable).dataType
    // optional dim-index window (r18): the rank is over the BOX's finite
    // cells only — the depth-window k-th amplitude
    val sliced = sliceOf(meta, dims, ranges, variable)
    // exact full-scan fallback (stale/absent stats, or an uncapped probe):
    // grouped distinct-value counts + Long-rank selection — no global
    // sort, no Int offset, one scan
    def scanFallback(): KthSmallest = {
      val byV = dropNaN(sliced(base).select(col(variable).as("v")))
        .groupBy(col("v")).agg(count(lit(1L)).as("c")).persist()
      try {
        val mm = byV.agg(min(col("v").cast("double")), max(col("v").cast("double")),
          sum(col("c"))).head
        val total = if (mm.isNullAt(2)) 0L else mm.getLong(2)
        require(k <= total, s"rank $k exceeds $total finite cells")
        KthSmallest(selectByRank(byV, k, mm.getDouble(0), mm.getDouble(1)),
          0, 0L, fallback = true)
      } finally byV.unpersist()
    }

    val varDir = root.resolve(variable)
    val manOpt = MdioChunkStats.currentManifest(varDir)
    if (manOpt.isEmpty) return scanFallback()
    val man = manOpt.get
    val grid = meta.chunkGrid
    val boxOpt =
      if (ranges.isEmpty) Some(grid.map(g => (0L, g)))
      else graft.sources.MdioAggScan.alignedChunkBox(meta, dims, ranges)
    if (boxOpt.isEmpty) { // misaligned window: exact through the sliced scan
      log.warn(s"kthSmallest($path, $variable): slice $ranges is not " +
        "chunk-aligned — falling back to the exact sliced-scan selection")
      return scanFallback()
    }

    // shard-resolved rank items, mixed granularity (see RankItems),
    // restricted to the box's own chunks
    val ri = new RankItems(varDir, man, grid, boxOpt.toSeq, entryBudget = qcEntryBudget)
    if (!ri.usable) return scanFallback()
    val n = ri.n
    require(k <= n, s"rank $k exceeds $n finite cells")

    var scanned = 0L
    var jobs = 0
    def items = ri.items
    var (x0, x1) = bracketItems(items, k)
    // open exactly the coarse shards intersecting (x0, x1] — only their
    // chunk-level detail can tighten the bracket or be scanned — then
    // re-bracket over the refined items (one round, see RankItems)
    if (ri.openCoarse((l, h) => x0.forall(h > _) && l <= x1)) {
      if (!ri.usable) return scanFallback() // torn shard mid-refinement
      val t = bracketItems(items, k)
      x0 = t._1
      x1 = t._2
    }

    // exact rank below the window's lower edge: certain-below intervals
    // (unopened coarse shards included) from metadata, chunks straddling
    // x0 through one allowlist-scan job (often 0; capped — when the
    // store's intervals all overlap, every chunk straddles the edge and
    // even one scan's partition count would go O(chunks)). A remaining
    // coarse shard can never straddle x0: a union crossing it would
    // intersect the window, so the shard was opened above.
    val below: Long = x0 match {
      case None => 0L
      case Some(b0) =>
        val straddle = ri.fine.collect {
          case (cc, b) if b.min <= b0 && b.max > b0 => cc
        }
        if (straddle.size > maxProbeChunks) {
          log.warn(s"kthSmallest($path, $variable, k=$k): ${straddle.size} " +
            s"chunks straddle the bracket edge $b0 (cap $maxProbeChunks) — " +
            "falling back to the exact full-scan grouped-rank selection")
          return scanFallback()
        }
        val exact =
          if (straddle.isEmpty) 0L
          else {
            scanned += straddle.size
            jobs += 1
            // ONE scan over exactly the straddler chunks (chunkKeys
            // allowlist), counting their cells at-or-under the edge
            spark.read.format("mdio")
              .option("chunkKeys", straddle.map(_.mkString(".")).mkString(","))
              .load(path)
              .filter(col(variable) <= edgeLit(b0, vt)).count()
          }
        items.iterator.collect { case (_, h, c) if h <= b0 => c }.sum + exact
    }
    // residual selection inside (x0, x1]: ONE scan whose pushed value
    // predicate rides the sidecar chunk pruning (the zarr_value_pruning
    // path plans exactly the chunks with max > x0 and min ≤ x1) — the
    // plan stays a single scan node even when every chunk interval
    // overlaps the window (zero-centered amplitude data), where a
    // per-chunk union would carry one leg per chunk in the store
    val window = ri.fine.collect {
      case (cc, b) if x0.forall(b.max > _) && b.min <= x1 => cc
    }
    scanned += window.size
    jobs += 1
    val x1d = x1.toDouble
    val winScan = x0 match {
      case Some(b0) =>
        sliced(base).filter(col(variable) > edgeLit(b0, vt) &&
          col(variable) <= edgeLit(x1, vt))
      case None => dropNaN(sliced(base).filter(col(variable) <= edgeLit(x1, vt)))
    }
    val residual = k - below
    require(residual >= 1, s"rank window inconsistency: residual $residual")
    val byV = winScan.groupBy(col(variable).as("v"))
      .agg(count(lit(1L)).as("c")).persist()
    val value =
      try selectByRank(byV, residual,
        x0.getOrElse(items.iterator.map(_._1).min).toDouble, x1d)
      finally byV.unpersist()
    KthSmallest(value, jobs, scanned, fallback = false)
  }

  /** [[quantilesOf]] result: `values(i)` is the exact `ks(i)`-th smallest
    * finite cell (the `ps(i)`-quantile, `ks(i) = ⌈ps(i)·n⌉` over the `n`
    * finite cells); `jobs`/`scannedChunks` count the CHUNK-scan jobs
    * issued (0–2 on the pruning path — the per-rank selections run over
    * one cached grouped-count frame, not the store) and the chunks they
    * read; `fallback` marks the exact one-scan grouped-rank path. */
  final case class Quantiles(values: Seq[Double], ks: Seq[Long], n: Long,
                             jobs: Int, scannedChunks: Long,
                             fallback: Boolean)

  /** EXACT quantile VECTOR in one boundary-window pass — the amplitude
    * clip-level readout (p01/p50/p99 of a survey for display gain/clip
    * QC; reference statsV1 QC anchor, mdio/stats.h:229-335) computed the
    * way [[kthSmallest]] computes one rank, but sharing every stage
    * across ALL requested quantiles: ONE metadata bracket per rank over
    * the same hierarchical items (whole-shard manifest summaries +
    * per-chunk [min,max,cnt]; shards open only when they intersect SOME
    * rank's window), ONE `chunkKeys` probe scan recounting every
    * bracket's lower edge together (one conditional-count column per
    * distinct edge), and ONE window scan over the UNION of the rank
    * windows whose cached grouped counts answer every rank via
    * [[selectByRank]] (Long ranks; the per-rank selections re-read the
    * cached frame, not the store). Chunk I/O for the whole vector is the
    * union of the boundary windows — reading the store once per quantile,
    * or sorting it, would cost p×more or shuffle the corpus. `ks(i) =
    * ⌈ps(i)·n⌉` evaluates in BigDecimal (a median at the 100 TB envelope
    * is k ≈ 10¹² — past double-exact integer territory is still years
    * off, but the ceil must not wobble on the boundary). Stale/absent
    * stats or more than `maxProbeChunks` total straddlers fall back
    * loudly to the exact full-scan grouped-rank form over one scan.
    * `ranges` (r18) restricts the vector to a dim-index box, exactly as
    * [[valuesAtRanks]]. */
  def quantilesOf(spark: SparkSession, path: String, variable: String,
                  ps: Seq[Double], maxProbeChunks: Int = 512,
                  ranges: Map[String, (Long, Long)] = Map.empty,
                  windows: Seq[Map[String, (Long, Long)]] = Nil): Quantiles = {
    require(ps.nonEmpty && ps.forall(p => p > 0.0 && p <= 1.0),
      s"quantiles $ps must lie in (0, 1]")
    rankVector(spark, path, variable, n => ps.map(p =>
      (BigDecimal(p) * n).setScale(0, BigDecimal.RoundingMode.CEILING).toLong),
      maxProbeChunks, ranges, windows)
  }

  /** EXACT values at EXPLICIT 1-based ranks, sharing [[quantilesOf]]'s
    * one-bracket / one-probe / one-window pass — the batched entry the
    * percentile aggregate pushdown routes through: a pushed `median` +
    * `percentile_disc` pair needs 2–3 ranks of one variable, and per-rank
    * [[kthSmallest]] calls would pay the bracket walk and the bounded
    * scan jobs once per rank instead of once per vector. `ranges`
    * restricts the ranking to a dim-index BOX (`dim -> [lo, hi)`; r18 —
    * the depth-window median): a chunk-aligned box rides the same bracket
    * machinery over its own chunks only (disjoint shards never read), a
    * misaligned one answers exactly through the sliced full-scan
    * fallback. */
  def valuesAtRanks(spark: SparkSession, path: String, variable: String,
                    ks: Seq[Long], maxProbeChunks: Int = 512,
                    ranges: Map[String, (Long, Long)] = Map.empty,
                    windows: Seq[Map[String, (Long, Long)]] = Nil): Quantiles = {
    require(ks.nonEmpty && ks.forall(_ >= 1), s"ranks $ks must be ≥ 1")
    rankVector(spark, path, variable, { n =>
      require(ks.forall(_ <= n), s"ranks $ks exceed $n finite cells")
      ks
    }, maxProbeChunks, ranges, windows)
  }

  private def rankVector(spark: SparkSession, path: String, variable: String,
                         mkKs: Long => Seq[Long], maxProbeChunks: Int,
                         ranges: Map[String, (Long, Long)],
                         windows: Seq[Map[String, (Long, Long)]] = Nil): Quantiles = {
    import graft.sources.MdioChunkStats
    import graft.zarr.ZarrMeta
    require(ranges.isEmpty || windows.isEmpty,
      "pass ONE window via ranges or several via windows, not both")
    val root = ZarrMeta.path(path)
    val (meta, attrs) = ZarrMeta.readGroup(root)._2.getOrElse(variable,
      throw new IllegalArgumentException(s"no variable '$variable' in $path"))
    val dims = meta.dimNames
      .orElse(attrs.flatMap(graft.sources.MdioTableUtil.arrayDimensions))
      .getOrElse(throw new IllegalArgumentException(
        s"variable '$variable' carries no dimension names"))
    require(!dims.contains(variable),
      s"'$variable' is a dimension coordinate — rank its index range instead")
    val isFloat = meta.dtype.charAt(meta.dtype.length - 2) == 'f'
    def dropNaN(df: org.apache.spark.sql.DataFrame) =
      if (isFloat) df.filter(!isnan(col(variable))) else df
    def base = spark.read.format("mdio").load(path)
    val vt = base.schema(variable).dataType
    // optional dim-index slice (r18) or UNION of disjoint slices (r19):
    // ranks are computed over the window cells only. The single-window
    // dim filters push into the scan; a union pushes its hull and refines
    // with the exact OR Spark-side, so the fallback too prunes.
    val sliced: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
      if (windows.nonEmpty) unionOf(meta, dims, windows, variable).apply
      else sliceOf(meta, dims, ranges, variable).apply
    def ksOf(n: Long): Seq[Long] = mkKs(n)
    def scanFallback(): Quantiles = {
      val byV = dropNaN(sliced(base).select(col(variable).as("v")))
        .groupBy(col("v")).agg(count(lit(1L)).as("c")).persist()
      try {
        val mm = byV.agg(min(col("v").cast("double")), max(col("v").cast("double")),
          sum(col("c")), max(col("v"))).head
        val total = if (mm.isNullAt(2)) 0L else mm.getLong(2)
        require(total >= 1, s"no finite cells to rank in '$variable'")
        val ks = ksOf(total)
        require(ks.forall(_ <= total), s"ranks $ks exceed $total finite cells")
        val reqs = ks.map(k =>
          RankReq(None, lit(mm.get(3)), mm.getDouble(0), mm.getDouble(1), k))
        Quantiles(selectByRankMulti(byV, reqs, edgeType(vt)),
          ks, total, 0, 0L, fallback = true)
      } finally byV.unpersist()
    }

    val varDir = root.resolve(variable)
    val manOpt = MdioChunkStats.currentManifest(varDir)
    if (manOpt.isEmpty) return scanFallback()
    val man = manOpt.get
    manifestRaceHook()
    val grid = meta.chunkGrid
    // a sliced rank needs CHUNK-ALIGNED boxes (whole chunks in or out —
    // a straddling chunk's stats interval mixes in- and out-of-box cells
    // and the rank arithmetic would lie); misaligned slices answer
    // exactly through the sliced fallback scan. A union ranks over the
    // union's chunks in the SAME one-bracket/one-probe/one-window pass.
    val boxesOpt =
      if (windows.nonEmpty) alignedUnion(meta, dims, windows)
      else if (ranges.isEmpty) Some(Seq(grid.map(g => (0L, g))))
      else graft.sources.MdioAggScan.alignedChunkBox(meta, dims, ranges).map(Seq(_))
    if (boxesOpt.isEmpty) {
      log.warn(s"rank vector($path, $variable): slice " +
        s"${if (windows.nonEmpty) windows else ranges} is not " +
        "chunk-aligned — falling back to the exact sliced-scan selection")
      return scanFallback()
    }

    // shared hierarchical rank items, exactly as kthSmallest — restricted
    // to the union's own chunks (disjoint shards are never even read)
    val ri = new RankItems(varDir, man, grid, boxesOpt.get, entryBudget = qcEntryBudget)
    if (!ri.usable) return scanFallback()
    val n = ri.n
    require(n >= 1, s"no finite cells to rank in '$variable'")
    val ks = ksOf(n)
    require(ks.forall(_ <= n), s"ranks $ks exceed $n finite cells")

    def items = ri.items
    var brackets = ks.map(bracketItems(items, _))
    // refinement: open every coarse shard intersecting ANY rank's window,
    // then re-bracket each rank over the refined items (one round, see
    // RankItems); interior shards never open
    if (ri.openCoarse((l, h) => brackets.exists { case (x0, x1) =>
        x0.forall(h > _) && l <= x1 })) {
      if (!ri.usable) return scanFallback() // torn shard mid-refinement
      brackets = ks.map(bracketItems(items, _))
    }

    var scanned = 0L
    var jobs = 0
    // ONE probe scan recounts EVERY bracket's lower edge: the chunkKeys
    // allowlist is the union of all edges' straddlers, and one aggregate
    // row carries a conditional count per distinct edge
    val edges = brackets.flatMap(_._1).distinct.sorted
    val straddlersOf: Map[BigDecimal, Seq[Seq[Long]]] = edges.map { e =>
      e -> ri.fine.collect { case (cc, b) if b.min <= e && b.max > e => cc }.toSeq
    }.toMap
    val probeChunks = straddlersOf.valuesIterator.flatten.toSeq.distinct
    if (probeChunks.size > maxProbeChunks) {
      log.warn(s"rank vector($path, $variable): ${probeChunks.size} " +
        s"chunks straddle bracket edges (cap $maxProbeChunks) — falling " +
        "back to the exact full-scan grouped-rank selection")
      return scanFallback()
    }
    val exactAtEdge: Map[BigDecimal, Long] =
      if (edges.isEmpty || probeChunks.isEmpty) Map.empty
      else {
        scanned += probeChunks.size
        jobs += 1
        val aggs = edges.map(e => count(when(col(variable) <= edgeLit(e, vt), 1L))
          .as(s"e${edges.indexOf(e)}"))
        val row = spark.read.format("mdio")
          .option("chunkKeys", probeChunks.map(_.mkString(".")).mkString(","))
          .load(path)
          .agg(aggs.head, aggs.tail: _*).head
        // row(i) = cells ≤ edge(i) over ALL probed chunks (a probed chunk
        // fully below/above a FOREIGN edge counts whole/zero there, which
        // is exact); belowAt pairs this with metadata counts over the
        // UNPROBED items only, so nothing double-counts
        edges.zipWithIndex.map { case (e, i) => e -> row.getLong(i) }.toMap
      }

    // exact rank below each edge: metadata certain-below over UNPROBED
    // items + the probe's conditional count over probed chunks. A probed
    // chunk (straddler of some edge) may be fully below/above ANOTHER
    // edge — its cells are in the probe count for that edge too, so the
    // metadata side must exclude every probed chunk to avoid double count.
    val probedSet = probeChunks.toSet
    def belowAt(e: BigDecimal): Long = {
      val metaBelow = ri.coarse.valuesIterator.collect {
        case (_, h, c) if h <= e => c }.sum +
        ri.fine.iterator.collect {
          case (cc, b) if !probedSet.contains(cc) && b.max <= e =>
            b.moments.get.cnt }.sum
      metaBelow + exactAtEdge.getOrElse(e, 0L)
    }

    // ONE window scan over the UNION of the rank windows; the cached
    // grouped counts answer every rank (selectByRank re-reads the cache)
    val windowChunks = ri.fine.collect {
      case (cc, b) if brackets.exists { case (x0, x1) =>
        x0.forall(b.max > _) && b.min <= x1 } => cc
    }.toSeq.distinct
    scanned += windowChunks.size
    jobs += 1
    val unionPred = brackets.map { case (x0, x1) =>
      x0 match {
        case Some(b0) => col(variable) > edgeLit(b0, vt) &&
          col(variable) <= edgeLit(x1, vt)
        case None => col(variable) <= edgeLit(x1, vt)
      }
    }.reduce(_ || _)
    val byV = spark.read.format("mdio")
      .option("chunkKeys", windowChunks.map(_.mkString(".")).mkString(","))
      .load(path)
      .filter(unionPred)
      .groupBy(col(variable).as("v")).agg(count(lit(1L)).as("c")).persist()
    val reqs = ks.zip(brackets).map { case (k, (x0, x1)) =>
      val below = x0.map(belowAt).getOrElse(0L)
      val residual = k - below
      require(residual >= 1, s"rank window inconsistency: residual $residual")
      RankReq(x0.map(edgeLit(_, vt)), edgeLit(x1, vt),
        x0.getOrElse(items.iterator.map(_._1).min).toDouble, x1.toDouble,
        residual)
    }
    val values =
      try selectByRankMulti(byV, reqs, edgeType(vt))
      finally byV.unpersist()
    Quantiles(values, ks, n, jobs, scanned, fallback = false)
  }

  /** [[extremaLocation]] result: `result` is one row — `v_min`, the
    * per-dim `min_<dim>` coordinates of its FIRST occurrence (smallest
    * dim tuple, so ties are deterministic), `v_max` and `max_<dim>`
    * likewise — or zero rows when the variable has no finite cell.
    * `scannedChunks` counts the candidate chunks the one location scan
    * read; `fallback` marks the full-scan path (stale/absent stats). */
  final case class ExtremaLocation(result: org.apache.spark.sql.DataFrame,
                                   scannedChunks: Long, fallback: Boolean)

  /** WHERE the global extrema live — the peak/trough amplitude locator
    * (the volume-statistics argmax/argmin readout, reference
    * examples/seismic_reader/stats.hh:31-67 + main.cc:71-142, which
    * full-scans; here the scan prunes to the chunks that can WIN): the
    * sidecar bounds give the global finite MIN and MAX without touching
    * data, so the only chunks worth reading are those whose recorded
    * bounds EQUAL an extremum — everything else provably cannot contain
    * it. One `chunkKeys` scan over that candidate set locates both
    * extrema (first occurrence in dim order, so ties are deterministic
    * and the answer equals `ORDER BY dims LIMIT 1` over the matching
    * cells); coarse shards join the search as manifest intervals and
    * open only when their bounds union touches an extremum. The peak of
    * a 100 TB store is thus O(manifest) driver bytes + usually ONE chunk
    * read. NaN cells never win (bounds cover finite cells only) and an
    * all-NaN/empty variable returns zero rows, proven from metadata.
    * `ranges` (r18) restricts the hunt to a dim-index window — WHERE is
    * the peak of this crop — with candidacy decided by the box's own
    * chunk bounds (misaligned windows locate through the sliced scan);
    * `windows` (r19) hunts over a UNION of disjoint windows (the peak of
    * two depth slabs in one call), same walk, same candidate discipline.
    * Extremum equality compares in the column's NATIVE type (u64 stays
    * decimal-exact past 2^53); `v_min`/`v_max` surface as double.
    * Stale/absent stats fall back to one full scan (`fallback = true`,
    * same first-occurrence semantics). */
  def extremaLocation(spark: SparkSession, path: String,
                      variable: String,
                      ranges: Map[String, (Long, Long)] = Map.empty,
                      windows: Seq[Map[String, (Long, Long)]] = Nil): ExtremaLocation = {
    import graft.sources.MdioChunkStats
    import graft.zarr.ZarrMeta
    import org.apache.spark.sql.{Column, Row}
    import org.apache.spark.sql.types._
    require(ranges.isEmpty || windows.isEmpty,
      "pass ONE window via ranges or several via windows, not both")
    val root = ZarrMeta.path(path)
    val (meta, attrs) = ZarrMeta.readGroup(root)._2.getOrElse(variable,
      throw new IllegalArgumentException(s"no variable '$variable' in $path"))
    val dims = meta.dimNames
      .orElse(attrs.flatMap(graft.sources.MdioTableUtil.arrayDimensions))
      .getOrElse(throw new IllegalArgumentException(
        s"variable '$variable' carries no dimension names"))
    require(!dims.contains(variable),
      s"'$variable' is a dimension coordinate — its extrema are its ends")
    val isFloat = meta.dtype.charAt(meta.dtype.length - 2) == 'f'
    def base = spark.read.format("mdio").load(path)
    // optional dim-index window (r18) or union of disjoint windows (r19):
    // WHERE does the peak of this crop (or crop union) live
    val sliced: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
      if (windows.nonEmpty) unionOf(meta, dims, windows, variable).apply
      else sliceOf(meta, dims, ranges, variable).apply
    val outSchema = StructType(
      Seq(StructField("v_min", DoubleType, nullable = false)) ++
        dims.map(d => StructField(s"min_$d", LongType, nullable = false)) ++
        Seq(StructField("v_max", DoubleType, nullable = false)) ++
        dims.map(d => StructField(s"max_$d", LongType, nullable = false)))
    def empty = ExtremaLocation(
      spark.createDataFrame(java.util.Collections.emptyList[Row](), outSchema),
      0L, fallback = false)
    // native-typed literal so the equality never rounds (u64 decimal
    // bounds past 2^53 must not route through double)
    def exactLit(x: BigDecimal): Column = {
      val dt = base.schema(variable).dataType
      dt match {
        case _: DecimalType => lit(x.underlying)
        case LongType => lit(x.toLongExact)
        case IntegerType => lit(x.toIntExact)
        case ShortType => lit(x.toShortExact)
        case ByteType => lit(x.toByteExact)
        case FloatType => lit(x.toFloat)
        case _ => lit(x.toDouble)
      }
    }
    // ONE job locates both extrema over any source: first occurrence =
    // smallest dim-struct among the matching cells (struct ordering is
    // lexicographic over the dims in order)
    def locate(src: org.apache.spark.sql.DataFrame,
               vmin: BigDecimal, vmax: BigDecimal): org.apache.spark.sql.DataFrame = {
      val dimStruct = struct(dims.map(col): _*)
      val r = src.agg(
        min(when(col(variable) === exactLit(vmin), dimStruct)).as("lmin"),
        min(when(col(variable) === exactLit(vmax), dimStruct)).as("lmax")).head
      val (lmin, lmax) = (r.getStruct(0), r.getStruct(1))
      require(lmin != null && lmax != null,
        s"extrema location scan found no matching cell — stale stats for '$variable'?")
      spark.createDataFrame(
        java.util.Collections.singletonList(Row.fromSeq(
          Seq(vmin.toDouble) ++ dims.indices.map(lmin.getLong) ++
            Seq(vmax.toDouble) ++ dims.indices.map(lmax.getLong))),
        outSchema)
    }
    def scanFallback(): ExtremaLocation = {
      val box = sliced(base)
      val src = if (isFloat) box.filter(!isnan(col(variable))) else box
      val mm = src.agg(min(col(variable)).as("mn"), max(col(variable)).as("mx")).head
      if (mm.isNullAt(0)) return empty.copy(fallback = true)
      def bd(i: Int): BigDecimal = mm.get(i) match {
        case d: Double => BigDecimal(d)
        case f: Float => BigDecimal(f.toDouble)
        case l: Long => BigDecimal(l)
        case i2: Int => BigDecimal(i2)
        case s: Short => BigDecimal(s.toInt)
        case b: Byte => BigDecimal(b.toInt)
        case x: java.math.BigDecimal => BigDecimal(x)
        case other => throw new IllegalStateException(s"unorderable value $other")
      }
      ExtremaLocation(locate(src, bd(0), bd(1)), 0L, fallback = true)
    }

    val varDir = root.resolve(variable)
    val manOpt = MdioChunkStats.currentManifest(varDir)
    if (manOpt.isEmpty) return scanFallback()
    val man = manOpt.get
    val grid = meta.chunkGrid
    // the window must be chunk-aligned for metadata candidacy (a
    // straddling chunk's bounds mix in- and out-of-box cells); misaligned
    // windows answer exactly through the sliced fallback scan
    val boxesOpt =
      if (windows.nonEmpty) alignedUnion(meta, dims, windows)
      else if (ranges.isEmpty) Some(Seq(grid.map(g => (0L, g))))
      else graft.sources.MdioAggScan.alignedChunkBox(meta, dims, ranges).map(Seq(_))
    if (boxesOpt.isEmpty) {
      log.warn(s"extremaLocation($path, $variable): slice " +
        s"${if (windows.nonEmpty) windows else ranges} is not " +
        "chunk-aligned — falling back to the sliced locate scan")
      return scanFallback()
    }
    val boxes = boxesOpt.get
    def inBox(cc: Seq[Long]): Boolean =
      boxes.exists(b => cc.indices.forall(i => cc(i) >= b(i)._1 && cc(i) < b(i)._2))
    val tf = boxes.map(b =>
      (1 until grid.size).forall(i => b(i)._1 <= 0 && b(i)._2 >= grid(i)))

    val fine = scala.collection.mutable.ArrayBuffer.empty[(Seq[Long], MdioChunkStats.Bounds)]
    var coarse = Map.empty[Long, (BigDecimal, BigDecimal)]
    var usable = true
    def intake(cc: Seq[Long], eOpt: Option[MdioChunkStats.Entry]): Unit =
      if (inBox(cc)) eOpt match {
        case Some(Some(b)) => fine += ((cc, b)) // moments not needed here
        case Some(None) => () // all-NaN chunk: no finite cell can win
        case _ => usable = false
      }
    val within = walkShards(varDir, man, grid, leadBoxes = boxes.map(_.head),
      entryBudget = qcEntryBudget) { (sid, sm) =>
      boxes.indices.exists { w =>
        tf(w) && sid * man.span >= boxes(w).head._1 &&
          math.min((sid + 1) * man.span, grid.head) <= boxes(w).head._2
      } &&
        ((sm.lo, sm.hi) match {
          case (Some(l), Some(h)) => coarse = coarse.updated(sid, (l, h)); true
          case _ => sm.count >= 0 && sm.cells.contains(0L) // proven all-NaN
        })
    }(intake)
    if (!within || !usable) return scanFallback()
    if (coarse.isEmpty && fine.isEmpty) return empty // every chunk all-NaN
    val gmin = (coarse.valuesIterator.map(_._1) ++ fine.iterator.map(_._2.min)).min
    val gmax = (coarse.valuesIterator.map(_._2) ++ fine.iterator.map(_._2.max)).max
    // open only the shards whose bounds union TOUCHES an extremum — the
    // candidates must be chunk-grained for the allowlist scan
    val chunksPerLead = grid.drop(1).product
    var openedKeys = 0L
    coarse.collect {
      case (sid, (l, h)) if l == gmin || h == gmax => sid
    }.foreach { sid =>
      if (usable) { // refinement shares the walk's entry-budget discipline
        val leadHi = math.min((sid + 1) * man.span, grid.head)
        openedKeys += (leadHi - sid * man.span) * chunksPerLead
        if (openedKeys > qcEntryBudget) {
          log.warn(s"extremaLocation($path, $variable): candidate " +
            s"refinement would parse $openedKeys+ entries driver-side " +
            s"(budget $qcEntryBudget) — falling back to the sliced locate scan")
          usable = false
        } else {
          coarse -= sid
          feedKeys(grid, sid * man.span, leadHi,
            MdioChunkStats.readShard(varDir, sid, man.shards(sid).gen))(intake)
        }
      }
    }
    if (!usable) return scanFallback()
    val candidates = fine.collect {
      case (cc, b) if b.min == gmin || b.max == gmax => cc
    }.toSeq.distinct
    val src = spark.read.format("mdio")
      .option("chunkKeys", candidates.map(_.mkString(".")).mkString(","))
      .load(path)
    ExtremaLocation(locate(src, gmin, gmax), candidates.size.toLong,
      fallback = false)
  }

  /** [[extremaByBox]] result: one row per group with ≥1 finite cell —
    * per-dim group ordinals (`g_<dim>`), `v_min` with its
    * FIRST-occurrence `min_<dim>` coordinates, `v_max` with `max_<dim>`,
    * and `n` finite cells. `scannedChunks` counts the candidate chunks
    * the one location scan read; `fallback` marks the distributed
    * two-pass scan form. */
  final case class GroupedExtrema(result: org.apache.spark.sql.DataFrame,
                                  scannedChunks: Long, fallback: Boolean)

  /** WHERE each box's extrema live — the per-slab / per-tile peak-and-
    * trough locator heat map (the grouped twin of [[extremaLocation]],
    * on the [[medianByBox]] group geometry; reference volume-statistics
    * argmax, examples/seismic_reader/stats.hh:31-67, which full-scans one
    * global answer): each group's MIN/MAX come EXACTLY from its chunks'
    * sidecar bounds — whole shards by manifest summary when they map
    * into one un-sliced group — and the only chunks READ are those whose
    * bounds equal their own group's extremum; one `chunkKeys` scan with
    * the per-group extrema riding a broadcast join answers every group's
    * first-occurrence locations together (ties resolve to the smallest
    * dim tuple, per group). `ranges` (r18) windows the heat map: group
    * ids stay ABSOLUTE and a slice-clipped box locates within its
    * surviving cells. Misaligned groups or windows, stale/absent stats,
    * more than `maxGroups` boxes (per-group extrema and the location
    * rows live on the driver) or more than `maxScanChunks` candidates
    * fall back LOUDLY to a fully distributed two-pass form — per-group
    * extrema by aggregation, locations by a grouped join — exact in
    * every case, nothing driver-held. */
  def extremaByBox(spark: SparkSession, path: String, variable: String,
                   groupSizes: Seq[Long],
                   maxScanChunks: Int = 512,
                   maxGroups: Int = 1 << 16,
                   ranges: Map[String, (Long, Long)] = Map.empty): GroupedExtrema = {
    import graft.sources.MdioChunkStats
    import graft.zarr.ZarrMeta
    import org.apache.spark.sql.{Column, Row}
    import org.apache.spark.sql.types._
    require(groupSizes.forall(_ >= 1), s"group sizes $groupSizes must be positive")
    val root = ZarrMeta.path(path)
    val (meta, attrs) = ZarrMeta.readGroup(root)._2.getOrElse(variable,
      throw new IllegalArgumentException(s"no variable '$variable' in $path"))
    val dims = meta.dimNames
      .orElse(attrs.flatMap(graft.sources.MdioTableUtil.arrayDimensions))
      .getOrElse(throw new IllegalArgumentException(
        s"variable '$variable' carries no dimension names"))
    require(!dims.contains(variable),
      s"'$variable' is a dimension coordinate — its extrema are its ends")
    require(groupSizes.size == dims.size,
      s"${groupSizes.size} group sizes for ${dims.size} dims")
    val isFloat = meta.dtype.charAt(meta.dtype.length - 2) == 'f'
    val gNames = dims.indices.map(i => s"_g$i")
    val gCols: Seq[Column] = dims.zip(groupSizes).zip(gNames).map {
      case ((dn, gs), gn) => floor(col(dn) / gs).cast("long").as(gn)
    }
    def base = spark.read.format("mdio").load(path)
    val vt = base.schema(variable).dataType
    val sliced = sliceOf(meta, dims, ranges, variable)
    val dimStruct = struct(dims.map(col): _*)
    val outCols =
      gNames.zip(dims).map { case (gn, d) => col(gn).as(s"g_$d") } ++
        Seq(col("vmn").cast("double").as("v_min")) ++
        dims.map(d => col(s"lmin.$d").as(s"min_$d")) ++
        Seq(col("vmx").cast("double").as("v_max")) ++
        dims.map(d => col(s"lmax.$d").as(s"max_$d")) :+ col("n")
    def scanFallback(): GroupedExtrema = {
      val box0 = sliced(base)
      val src = (if (isFloat) box0.filter(!isnan(col(variable))) else box0)
        .select(gCols ++ Seq(dimStruct.as("_loc"), col(variable).as("v")): _*)
      val stats = src.groupBy(gNames.map(col): _*)
        .agg(min(col("v")).as("vmn"), max(col("v")).as("vmx"),
          count(lit(1L)).as("n"))
      val loc = src.join(stats, gNames)
        .groupBy(gNames.map(col): _*)
        .agg(min(when(col("v") === col("vmn"), col("_loc"))).as("lmin"),
          min(when(col("v") === col("vmx"), col("_loc"))).as("lmax"),
          min(col("vmn")).as("vmn"), min(col("vmx")).as("vmx"),
          min(col("n")).as("n"))
      GroupedExtrema(loc.select(outCols: _*), 0L, fallback = true)
    }

    val varDir = root.resolve(variable)
    val manOpt = MdioChunkStats.currentManifest(varDir)
    if (manOpt.isEmpty) return scanFallback()
    val misaligned = dims.indices.exists { d =>
      groupSizes(d) % meta.chunks(d) != 0 && groupSizes(d) < meta.shape(d)
    }
    if (misaligned) {
      log.warn(s"extremaByBox($path, $variable): group sizes $groupSizes " +
        s"do not align to the chunk shape ${meta.chunks} — falling back " +
        "to the distributed two-pass scan form")
      return scanFallback()
    }
    val man = manOpt.get
    val grid = meta.chunkGrid
    val boxOpt =
      if (ranges.isEmpty) Some(grid.map(g => (0L, g)))
      else graft.sources.MdioAggScan.alignedChunkBox(meta, dims, ranges)
    if (boxOpt.isEmpty) {
      log.warn(s"extremaByBox($path, $variable): slice $ranges is not " +
        "chunk-aligned — falling back to the distributed two-pass scan form")
      return scanFallback()
    }
    val box = boxOpt.get
    def inBox(cc: Seq[Long]): Boolean =
      cc.indices.forall(i => cc(i) >= box(i)._1 && cc(i) < box(i)._2)
    val cpg = dims.indices.map { d =>
      if (groupSizes(d) >= meta.shape(d)) grid(d)
      else groupSizes(d) / meta.chunks(d)
    }
    // O(groups) driver contract: extrema maps + one result row per group
    val nGroups = dims.indices.map(d =>
      BigInt((box(d)._2 - 1) / cpg(d) - box(d)._1 / cpg(d) + 1)).product
    if (nGroups > maxGroups) {
      log.warn(s"extremaByBox($path, $variable): $nGroups groups exceed " +
        s"the driver-state cap $maxGroups — using the distributed " +
        "two-pass scan form")
      return scanFallback()
    }
    val trailingSingle = (1 until dims.size).forall(d =>
      cpg(d) >= grid(d) && box(d)._1 == 0 && box(d)._2 == grid(d))
    def groupOf(cc: Seq[Long]): Seq[Long] =
      cc.zip(cpg).map { case (c, n) => c / n }

    val fine = scala.collection.mutable.Map
      .empty[Seq[Long], scala.collection.mutable.ArrayBuffer[(Seq[Long], MdioChunkStats.Bounds)]]
    val coarse = scala.collection.mutable.Map
      .empty[Seq[Long], scala.collection.mutable.Map[Long, (BigDecimal, BigDecimal, Long)]]
    var usable = true
    def intake(cc: Seq[Long], eOpt: Option[MdioChunkStats.Entry]): Unit =
      if (inBox(cc)) eOpt match {
        case Some(Some(b)) if b.moments.isDefined =>
          fine.getOrElseUpdate(groupOf(cc),
            scala.collection.mutable.ArrayBuffer.empty) += ((cc, b))
        case Some(None) => () // all-NaN chunk: no finite cell can win
        case _ => usable = false
      }
    val within = walkShards(varDir, man, grid, leadBoxes = Seq(box.head),
      entryBudget = qcEntryBudget) { (sid, sm) =>
      sm.cells.isDefined && trailingSingle && {
        val leadLo = sid * man.span
        val leadHi = math.min((sid + 1) * man.span, grid.head)
        leadLo >= box.head._1 && leadHi <= box.head._2 &&
        (leadLo / cpg.head) == ((leadHi - 1) / cpg.head) && {
          (sm.lo, sm.hi) match {
            case (Some(l), Some(h)) =>
              coarse.getOrElseUpdate(
                (leadLo / cpg.head) +: Seq.fill(dims.size - 1)(0L),
                scala.collection.mutable.Map.empty)
                .update(sid, (l, h, sm.cells.get))
            case _ => () // all-NaN shard: proven cells = 0
          }
          true
        }
      }
    }(intake)
    if (!within || !usable) return scanFallback()

    // per-group extrema + finite counts, exactly from metadata
    val groups = (fine.keySet ++ coarse.keySet).toSeq
      .sorted(Ordering.Implicits.seqOrdering[Seq, Long])
    final case class GExt(n: Long, mn: BigDecimal, mx: BigDecimal)
    def extOf(g: Seq[Long]): Option[GExt] = {
      val items = coarse.get(g).iterator.flatMap(_.valuesIterator).toSeq ++
        fine.get(g).iterator.flatMap(_.iterator.map { case (_, b) =>
          (b.min, b.max, b.moments.get.cnt) }).toSeq
      val n = items.iterator.map(_._3).sum
      if (n == 0) None
      else Some(GExt(n, items.iterator.map(_._1).min, items.iterator.map(_._2).max))
    }
    val exts: Map[Seq[Long], GExt] =
      groups.flatMap(g => extOf(g).map(g -> _)).toMap
    // open the coarse shards whose bounds union TOUCHES their own group's
    // extremum — only their chunk detail can be a candidate; the
    // refinement shares the walk's entry-budget discipline
    val chunksPerLead = grid.drop(1).product
    var openedKeys = 0L
    exts.foreach { case (g, e) =>
      val gc = coarse.getOrElse(g, scala.collection.mutable.Map.empty)
      val toOpen = gc.collect {
        case (sid, (l, h, _)) if l == e.mn || h == e.mx => sid }
      toOpen.foreach { sid =>
        if (usable) {
          val leadHi = math.min((sid + 1) * man.span, grid.head)
          openedKeys += (leadHi - sid * man.span) * chunksPerLead
          if (openedKeys > qcEntryBudget) {
            log.warn(s"extremaByBox($path, $variable): candidate " +
              s"refinement would parse $openedKeys+ entries driver-side " +
              s"(budget $qcEntryBudget) — using the distributed two-pass form")
            usable = false
          } else {
            gc -= sid
            feedKeys(grid, sid * man.span, leadHi,
              MdioChunkStats.readShard(varDir, sid, man.shards(sid).gen))(intake)
          }
        }
      }
    }
    if (!usable) return scanFallback() // torn shard or budget mid-refinement

    val outSchema = StructType(
      dims.map(d => StructField(s"g_$d", LongType, nullable = false)) ++
        Seq(StructField("v_min", DoubleType, nullable = false)) ++
        dims.map(d => StructField(s"min_$d", LongType, nullable = false)) ++
        Seq(StructField("v_max", DoubleType, nullable = false)) ++
        dims.map(d => StructField(s"max_$d", LongType, nullable = false)) :+
        StructField("n", LongType, nullable = false))
    if (exts.isEmpty) // every box all-NaN: proven-empty result
      return GroupedExtrema(spark.createDataFrame(
        java.util.Collections.emptyList[Row](), outSchema), 0L, fallback = false)

    val emptyFine = scala.collection.mutable.ArrayBuffer.empty[(Seq[Long], MdioChunkStats.Bounds)]
    val candidates = exts.toSeq.flatMap { case (g, e) =>
      fine.getOrElse(g, emptyFine).collect {
        case (cc, b) if b.min == e.mn || b.max == e.mx => cc }
    }.distinct
    if (candidates.size > maxScanChunks) {
      log.warn(s"extremaByBox($path, $variable): ${candidates.size} " +
        s"candidate chunks (cap $maxScanChunks) — using the distributed " +
        "two-pass scan form")
      return scanFallback()
    }
    // ONE location scan over every group's candidates: the per-group
    // extrema ride a broadcast join (native-typed, so u64/decimal
    // equality never rounds) and first occurrence = min dim-struct
    val boundsRows = exts.toSeq.map { case (g, e) =>
      Row.fromSeq(g ++ Seq(edgeValue(e.mn, vt), edgeValue(e.mx, vt)))
    }
    val bounds = spark.createDataFrame(
      java.util.Arrays.asList(boundsRows: _*),
      StructType(gNames.map(StructField(_, LongType, nullable = false)) ++
        Seq(StructField("vmn", edgeType(vt), nullable = false),
          StructField("vmx", edgeType(vt), nullable = false))))
    val located = spark.read.format("mdio")
      .option("chunkKeys", candidates.map(_.mkString(".")).mkString(","))
      .load(path)
      .select(gCols ++ Seq(dimStruct.as("_loc"), col(variable).as("v")): _*)
      .join(broadcast(bounds), gNames)
      .groupBy(gNames.map(col): _*)
      .agg(min(when(col("v") === col("vmn"), col("_loc"))).as("lmin"),
        min(when(col("v") === col("vmx"), col("_loc"))).as("lmax"))
      .collect()
      .map(r => (gNames.indices.map(r.getLong(_)): Seq[Long]) ->
        ((r.getStruct(gNames.size), r.getStruct(gNames.size + 1)))).toMap
    val rows = exts.toSeq.sortBy(_._1)(Ordering.Implicits.seqOrdering[Seq, Long])
      .map { case (g, e) =>
        val (lmin, lmax) = located.getOrElse(g.toIndexedSeq: Seq[Long],
          throw new IllegalStateException(
            s"extremaByBox location scan found no cell for group $g — " +
              s"stale stats for '$variable'?"))
        require(lmin != null && lmax != null,
          s"extremaByBox located no matching cell in group $g — stale stats?")
        Row.fromSeq(g ++ Seq(e.mn.toDouble) ++ dims.indices.map(lmin.getLong) ++
          Seq(e.mx.toDouble) ++ dims.indices.map(lmax.getLong) :+ e.n)
      }
    GroupedExtrema(
      spark.createDataFrame(java.util.Arrays.asList(rows: _*), outSchema),
      candidates.size.toLong, fallback = false)
  }

  /** [[histogramMeta]] result: `result` is one row per NON-EMPTY bin —
    * (`bin` 0-based, `center` = lo + (bin+0.5)·width, `cnt`), ordered by
    * bin; NaN cells never count. `metadataChunks` binned whole from the
    * sidecar (their stats interval fits one bin — proven by chunk entry
    * or whole-shard summary), `scannedChunks` straddle a bin edge and
    * were read; `fallback` marks the ordinary one-scan path. */
  final case class HistogramMeta(result: org.apache.spark.sql.DataFrame,
                                 metadataChunks: Long, scannedChunks: Long,
                                 fallback: Boolean)

  /** EXACT uniform-bin histogram (the reference CenteredBinHistogram
    * shape, mdio/stats.h:109-161, same outlier clipping as
    * [[StatsV1Aggregator]]: values outside [lo, lo+nBins·width) land in
    * the edge bins) that reads ONLY the chunks whose stats interval
    * CROSSES a bin edge: a chunk whose [min, max] falls inside one bin
    * contributes its finite-cell `cnt` to that bin from metadata — and
    * whole SHARDS do the same from their manifest summary without being
    * opened — so the amplitude histogram of a 100 TB store pays chunk
    * I/O proportional to the BIN-EDGE SURFACE, not the volume (zero for
    * a store whose chunks align with the bins, e.g. depth-banded data;
    * everything for white noise — exactly the chunks a scan could never
    * skip). Straddlers resolve in ONE `chunkKeys` scan grouped by the
    * bin expression; binning computes in double on BOTH sides (the
    * driver triage and the scan) so the claim and the scan can never
    * disagree on a boundary value. Stale/absent stats or more than
    * `maxScanChunks` straddlers fall back to one full scan
    * (`fallback = true`) — exact in every case. `ranges` (r18) restricts
    * the histogram to a dim-index window (the crop's own amplitude
    * distribution); misaligned windows answer through the sliced scan;
    * `windows` (r19) bins a UNION of disjoint windows in one walk. */
  def histogramMeta(spark: SparkSession, path: String, variable: String,
                    lo: Double, width: Double, nBins: Int,
                    maxScanChunks: Int = 512,
                    ranges: Map[String, (Long, Long)] = Map.empty,
                    windows: Seq[Map[String, (Long, Long)]] = Nil): HistogramMeta = {
    import graft.sources.MdioChunkStats
    import graft.zarr.ZarrMeta
    require(width > 0 && nBins >= 1, s"bad bins: lo=$lo width=$width n=$nBins")
    require(ranges.isEmpty || windows.isEmpty,
      "pass ONE window via ranges or several via windows, not both")
    val root = ZarrMeta.path(path)
    val (meta, attrs) = ZarrMeta.readGroup(root)._2.getOrElse(variable,
      throw new IllegalArgumentException(s"no variable '$variable' in $path"))
    val dims = meta.dimNames
      .orElse(attrs.flatMap(graft.sources.MdioTableUtil.arrayDimensions))
      .getOrElse(throw new IllegalArgumentException(
        s"variable '$variable' carries no dimension names"))
    require(!dims.contains(variable),
      s"'$variable' is a dimension coordinate — bin its index range instead")
    val isFloat = meta.dtype.charAt(meta.dtype.length - 2) == 'f'
    // optional dim-index window (r18) or union of disjoint windows (r19)
    val sliced: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
      if (windows.nonEmpty) unionOf(meta, dims, windows, variable).apply
      else sliceOf(meta, dims, ranges, variable).apply
    def binD(v: Double): Int = { // the StatsV1Aggregator clip rule
      val b = math.floor((v - lo) / width).toInt
      if (b < 0) 0 else if (b >= nBins) nBins - 1 else b
    }
    val binCol = least(greatest(
      floor((col(variable).cast("double") - lit(lo)) / lit(width)), lit(0.0)),
      lit((nBins - 1).toDouble)).cast("long").as("bin")
    def base = spark.read.format("mdio").load(path)
    def toResult(counts: Map[Long, Long]): org.apache.spark.sql.DataFrame = {
      import spark.implicits._
      counts.toSeq.filter(_._2 > 0).sortBy(_._1)
        .map { case (b, c) => (b, lo + (b + 0.5) * width, c) }
        .toDF("bin", "center", "cnt")
    }
    def grouped(df: org.apache.spark.sql.DataFrame): Map[Long, Long] = {
      val src = if (isFloat) df.filter(!isnan(col(variable))) else df
      src.groupBy(binCol).agg(count(lit(1L)).as("c"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    def scanFallback(): HistogramMeta =
      HistogramMeta(toResult(grouped(sliced(base))), 0L, 0L, fallback = true)

    val varDir = root.resolve(variable)
    val manOpt = MdioChunkStats.currentManifest(varDir)
    if (manOpt.isEmpty) return scanFallback()
    val man = manOpt.get
    val grid = meta.chunkGrid
    val boxesOpt =
      if (windows.nonEmpty) alignedUnion(meta, dims, windows)
      else if (ranges.isEmpty) Some(Seq(grid.map(g => (0L, g))))
      else graft.sources.MdioAggScan.alignedChunkBox(meta, dims, ranges).map(Seq(_))
    if (boxesOpt.isEmpty) { // misaligned window: exact sliced scan
      log.warn(s"histogramMeta($path, $variable): slice " +
        s"${if (windows.nonEmpty) windows else ranges} is not " +
        "chunk-aligned — falling back to the sliced histogram scan")
      return scanFallback()
    }
    val boxes = boxesOpt.get
    def inBox(cc: Seq[Long]): Boolean =
      boxes.exists(b => cc.indices.forall(i => cc(i) >= b(i)._1 && cc(i) < b(i)._2))
    val tf = boxes.map(b =>
      (1 until grid.size).forall(i => b(i)._1 <= 0 && b(i)._2 >= grid(i)))

    val metaCounts = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    var metaChunks = 0L
    val straddlers = Seq.newBuilder[Seq[Long]]
    var nStraddle = 0
    var usable = true
    val within = walkShards(varDir, man, grid, leadBoxes = boxes.map(_.head),
      entryBudget = qcEntryBudget) { (sid, sm) =>
      boxes.indices.exists { w =>
        tf(w) && sid * man.span >= boxes(w).head._1 &&
          math.min((sid + 1) * man.span, grid.head) <= boxes(w).head._2
      } &&
        ((sm.lo, sm.hi) match {
          case (Some(l), Some(h)) if sm.cells.isDefined &&
              binD(l.toDouble) == binD(h.toDouble) =>
            metaCounts(binD(l.toDouble).toLong) += sm.cells.get
            metaChunks += sm.bounded.max(0L)
            true
          case (None, None) => true // all-NaN shard: nothing to bin
          case _ => false // crosses a bin edge (or no summary): open it
        })
    } { (cc, eOpt) =>
      if (inBox(cc)) eOpt match {
        case Some(None) => () // all-NaN chunk
        case Some(Some(b)) if b.moments.isDefined &&
            binD(b.min.toDouble) == binD(b.max.toDouble) =>
          metaCounts(binD(b.min.toDouble).toLong) += b.moments.get.cnt
          metaChunks += 1
        case Some(Some(_)) => straddlers += cc; nStraddle += 1
        case None => usable = false // uncovered chunk: stats incomplete
      }
    }
    if (!within || !usable || nStraddle > maxScanChunks) {
      if (within && usable) log.warn(s"histogramMeta($path, $variable): " +
        s"$nStraddle chunks cross bin edges (cap $maxScanChunks) — full scan")
      return scanFallback()
    }
    val scanCounts: Map[Long, Long] =
      if (nStraddle == 0) Map.empty
      else grouped(spark.read.format("mdio")
        .option("chunkKeys",
          straddlers.result().map(_.mkString(".")).mkString(","))
        .load(path))
    val merged = (metaCounts.keySet ++ scanCounts.keySet).map { b =>
      b -> (metaCounts(b) + scanCounts.getOrElse(b, 0L))
    }.toMap
    HistogramMeta(toResult(merged), metaChunks, nStraddle.toLong,
      fallback = false)
  }

  /** [[countInRangeByBox]] result: `result` has one row per group with at
    * least one finite cell — per-dim group ordinals (`g_<dim>`), `cnt` =
    * cells with `lo ≤ v ≤ hi` in the group (0 rows never drop: a box
    * whose count is zero still reports, since the heat-map's zeros ARE
    * the signal), `n` = the group's finite cells. `metadataChunks`/
    * `outsideChunks`/`scannedChunks` as in [[CountInRange]]; `fallback`
    * marks the one-scan path. */
  final case class GroupedCount(result: org.apache.spark.sql.DataFrame,
                                metadataChunks: Long, outsideChunks: Long,
                                scannedChunks: Long, fallback: Boolean)

  /** Per-box exact COUNT of cells in `[lo, hi]` — the threshold-occupancy
    * heat map (net-pay / anomaly-fraction per slab or tile; the grouped
    * twin of [[countInRange]], on the [[medianByBox]] group geometry):
    * chunks fully inside the range add their finite-cell `cnt` to their
    * group from metadata, fully-outside (or all-NaN) chunks add zero, and
    * whole SHARDS do either from the manifest summary without opening —
    * all boxes resolve their straddlers together in ONE `chunkKeys` scan
    * grouped by the box ordinals, so chunk I/O is the range's boundary
    * surface regardless of how many boxes tile the store. `n` per box
    * (for the fraction readout) comes entirely from metadata. Group
    * sizes follow [[medianByBox]]'s rule (positive; per dim a chunk-size
    * multiple or ≥ the extent). Misalignment, stale/absent stats, or
    * more than `maxScanChunks` straddlers fall back loudly to ONE full
    * scan (`fallback = true`), exact in every case. `ranges` (r18)
    * restricts the heat map to a dim-index window: group ids stay
    * absolute, a slice-clipped box counts its surviving cells, and a
    * misaligned window answers through the sliced grouped scan. */
  def countInRangeByBox(spark: SparkSession, path: String, variable: String,
                        lo: Double, hi: Double, groupSizes: Seq[Long],
                        maxScanChunks: Int = 512,
                        maxGroups: Int = 1 << 16,
                        ranges: Map[String, (Long, Long)] = Map.empty): GroupedCount = {
    import graft.sources.MdioChunkStats
    import graft.zarr.ZarrMeta
    import org.apache.spark.sql.{Column, Row}
    import org.apache.spark.sql.types._
    require(lo <= hi, s"empty range [$lo, $hi]")
    require(groupSizes.forall(_ >= 1), s"group sizes $groupSizes must be positive")
    val root = ZarrMeta.path(path)
    val (meta, attrs) = ZarrMeta.readGroup(root)._2.getOrElse(variable,
      throw new IllegalArgumentException(s"no variable '$variable' in $path"))
    val dims = meta.dimNames
      .orElse(attrs.flatMap(graft.sources.MdioTableUtil.arrayDimensions))
      .getOrElse(throw new IllegalArgumentException(
        s"variable '$variable' carries no dimension names"))
    require(!dims.contains(variable),
      s"'$variable' is a dimension coordinate — count its index range instead")
    require(groupSizes.size == dims.size,
      s"${groupSizes.size} group sizes for ${dims.size} dims")
    val isFloat = meta.dtype.charAt(meta.dtype.length - 2) == 'f'
    val gNames = dims.indices.map(i => s"_g$i")
    val gCols: Seq[Column] = dims.zip(groupSizes).zip(gNames).map {
      case ((dn, gs), gn) => floor(col(dn) / gs).cast("long").as(gn)
    }
    def base = spark.read.format("mdio").load(path)
    // optional dim-index window (r18): the crop's own occupancy heat map
    val sliced = sliceOf(meta, dims, ranges, variable)
    // exact range membership in the column's own type — consistent with
    // the BigDecimal chunk triage (see rangePred)
    val inRange = rangePred(col(variable), base.schema(variable).dataType, lo, hi)
    val outSchema = StructType(
      dims.map(d => StructField(s"g_$d", LongType, nullable = false)) ++
        Seq(StructField("cnt", LongType, nullable = false),
          StructField("n", LongType, nullable = false)))
    def scanFallback(): GroupedCount = {
      val box0 = sliced(base)
      val src = if (isFloat) box0.filter(!isnan(col(variable))) else box0
      val sel = src.select(gCols :+ col(variable).as(variable): _*)
        .groupBy(gNames.map(col): _*)
        .agg(count(when(inRange, 1L)).as("cnt"), count(lit(1L)).as("n"))
        .select(gNames.zip(dims).map { case (gn, d) => col(gn).as(s"g_$d") } ++
          Seq(col("cnt"), col("n")): _*)
      GroupedCount(sel, 0L, 0L, 0L, fallback = true)
    }

    val varDir = root.resolve(variable)
    val manOpt = MdioChunkStats.currentManifest(varDir)
    if (manOpt.isEmpty) return scanFallback()
    val misaligned = dims.indices.exists { d =>
      groupSizes(d) % meta.chunks(d) != 0 && groupSizes(d) < meta.shape(d)
    }
    if (misaligned) {
      log.warn(s"countInRangeByBox($path, $variable): group sizes " +
        s"$groupSizes do not align to the chunk shape ${meta.chunks} — " +
        "falling back to the exact full-scan form")
      return scanFallback()
    }
    val man = manOpt.get
    val grid = meta.chunkGrid
    val boxOpt =
      if (ranges.isEmpty) Some(grid.map(g => (0L, g)))
      else graft.sources.MdioAggScan.alignedChunkBox(meta, dims, ranges)
    if (boxOpt.isEmpty) { // misaligned window: exact sliced scan
      log.warn(s"countInRangeByBox($path, $variable): slice $ranges is " +
        "not chunk-aligned — falling back to the sliced grouped scan")
      return scanFallback()
    }
    val box = boxOpt.get
    def inBox(cc: Seq[Long]): Boolean =
      cc.indices.forall(i => cc(i) >= box(i)._1 && cc(i) < box(i)._2)
    val cpg = dims.indices.map { d =>
      if (groupSizes(d) >= meta.shape(d)) grid(d)
      else groupSizes(d) / meta.chunks(d)
    }
    // the explicit O(groups) driver contract: the in/total maps and the
    // result rows live on the driver — past the cap, the distributed
    // one-scan form is the right plan, not a degraded one. Group count
    // is over the BOX: only groups the slice touches exist.
    val nGroups = dims.indices.map(d =>
      BigInt((box(d)._2 - 1) / cpg(d) - box(d)._1 / cpg(d) + 1)).product
    if (nGroups > maxGroups) {
      log.warn(s"countInRangeByBox($path, $variable): $nGroups groups " +
        s"exceed the driver-state cap $maxGroups — using the distributed " +
        "full-scan form")
      return scanFallback()
    }
    // coarse whole-shard summaries need every trailing dim single-group
    // AND un-sliced
    val trailingSingle = (1 until dims.size).forall(d =>
      cpg(d) >= grid(d) && box(d)._1 == 0 && box(d)._2 == grid(d))
    def groupOf(cc: Seq[Long]): Seq[Long] =
      cc.zip(cpg).map { case (c, n) => c / n }

    val (loB, hiB) = (exactBig(lo), exactBig(hi))
    val inCnt = scala.collection.mutable.Map.empty[Seq[Long], Long].withDefaultValue(0L)
    val total = scala.collection.mutable.Map.empty[Seq[Long], Long].withDefaultValue(0L)
    var metaChunks = 0L
    var outside = 0L
    val straddlers = Seq.newBuilder[Seq[Long]]
    var nStraddle = 0
    var usable = true
    val within = walkShards(varDir, man, grid, leadBoxes = Seq(box.head),
      entryBudget = qcEntryBudget) { (sid, sm) =>
      // a whole shard decides from the manifest only when it maps into
      // ONE group (the medianByBox fit rule), sits wholly inside the
      // window, and its bounds union settles the range question for
      // every chunk inside it
      sm.cells.isDefined && trailingSingle && {
        val leadLo = sid * man.span
        val leadHi = math.min((sid + 1) * man.span, grid.head)
        leadLo >= box.head._1 && leadHi <= box.head._2 &&
        (leadLo / cpg.head) == ((leadHi - 1) / cpg.head) && {
          val g = (leadLo / cpg.head) +: Seq.fill(dims.size - 1)(0L)
          (sm.lo, sm.hi) match {
            case (Some(l), Some(h)) if h < loB || l > hiB =>
              total(g) += sm.cells.get; outside += sm.count; true
            case (Some(l), Some(h)) if l >= loB && h <= hiB && sm.bounded >= 0 =>
              inCnt(g) += sm.cells.get; total(g) += sm.cells.get
              metaChunks += sm.bounded; outside += sm.count - sm.bounded; true
            case (None, None) => outside += sm.count; true // all-NaN: n = 0 too
            case _ => false // straddles the range: open for chunk triage
          }
        }
      }
    } { (cc, eOpt) =>
      if (inBox(cc)) {
        val g = groupOf(cc)
        eOpt match {
          case Some(None) => outside += 1 // all-NaN chunk
          case Some(Some(b)) if b.moments.isDefined =>
            total(g) += b.moments.get.cnt
            if (b.max < loB || b.min > hiB) outside += 1
            else if (b.min >= loB && b.max <= hiB) {
              inCnt(g) += b.moments.get.cnt; metaChunks += 1
            } else { straddlers += cc; nStraddle += 1 }
          case _ => usable = false // no entry or no moments: n unknowable
        }
      }
    }
    if (!within || !usable || nStraddle > maxScanChunks) {
      if (within && usable) log.warn(s"countInRangeByBox($path, $variable): " +
        s"$nStraddle straddlers (cap $maxScanChunks) — full scan")
      return scanFallback()
    }
    if (nStraddle > 0) {
      spark.read.format("mdio")
        .option("chunkKeys",
          straddlers.result().map(_.mkString(".")).mkString(","))
        .load(path)
        .select(gCols :+ col(variable).as(variable): _*)
        .filter(inRange)
        .groupBy(gNames.map(col): _*).agg(count(lit(1L)).as("c"))
        .collect().foreach { r =>
          inCnt(gNames.indices.map(r.getLong(_)).toSeq) += r.getLong(gNames.size)
        }
    }
    val rows = total.keySet.toSeq
      .sorted(Ordering.Implicits.seqOrdering[Seq, Long])
      .map(g => Row.fromSeq(g ++ Seq(inCnt(g), total(g))))
    GroupedCount(
      spark.createDataFrame(java.util.Arrays.asList(rows: _*), outSchema),
      metaChunks, outside, nStraddle.toLong, fallback = false)
  }

  /** [[medianByBox]]/[[medianByLead]] result: `result` has one row per
    * group — the per-dim group ordinals (`g_<dim>` columns from
    * [[medianByBox]]; a single `slab` column from [[medianByLead]]),
    * `med` = the group's exact lower median, `n` = the group's
    * finite-cell count; groups with zero finite cells (all-NaN boxes)
    * emit no row. `jobs`/`scannedChunks` count the scan jobs issued (0–2
    * on the pruning path) and the chunks they read; `fallback` marks the
    * exact one-scan grouped-rank path. */
  final case class GroupedMedian(result: org.apache.spark.sql.DataFrame,
                                 jobs: Int, scannedChunks: Long,
                                 fallback: Boolean)

  /** [[quantilesByBox]] result: `result` has one row per (group, p) —
    * per-dim group ordinals (`g_<dim>`), `p` the requested quantile, `q`
    * the group's exact `⌈p·n⌉`-th smallest finite cell, `n` the group's
    * finite-cell count; all-NaN groups emit no rows. `jobs`/
    * `scannedChunks` count the scan jobs issued (0–2 on the pruning path)
    * and the chunks they read; `fallback` marks the exact one-scan
    * grouped-rank path. */
  final case class GroupedQuantiles(result: org.apache.spark.sql.DataFrame,
                                    jobs: Int, scannedChunks: Long,
                                    fallback: Boolean)

  /** EXACT quantile VECTOR per chunk-aligned dim box — the per-slab/tile
    * clip-level heat map (p01/p50/p99 per survey slab for display-gain
    * QC; the grouped form of [[quantilesOf]] on [[medianByBox]]'s group
    * geometry; reference statsV1 QC anchor, mdio/stats.h:229-335). Group
    * `d`'s ordinal is `⌊index_d / groupSizes(d)⌋` over ABSOLUTE dim
    * indices; each group's rank `⌈p·n_g⌉` is selected exactly for every
    * requested `p`, sharing every stage across ALL groups AND all
    * quantiles: the brackets run DRIVER-SIDE from the stats sidecar
    * (hierarchical items — whole-shard manifest summaries ride as one
    * [lo,hi]×cells interval while their lead range sits inside one group,
    * opening only when they intersect one of their group's rank windows;
    * [[bracketItems]], Long ranks throughout), then at most TWO scan jobs
    * finish everything: ONE `chunkKeys` allowlist scan recounting every
    * (group, rank) bracket's lower edge (per-(group, p) edges applied
    * through a broadcast join), and ONE allowlist scan over the union of
    * all rank windows whose per-(group, p, value) counts select every
    * residual rank through [[pickByRankBucketed]] — the two-stage bucketed
    * pick, so no window partition ever sorts more than ~1/[[RankBuckets]]
    * of a group's distinct values even when every chunk interval overlaps
    * (zero-centered amplitudes, the degenerate case). Chunk I/O is
    * Σ(per-group boundary windows) — each box pays its boundary surface,
    * never its volume, and the plan carries no per-chunk or per-group
    * node. Requirements: every `groupSizes(d)` positive and a multiple of
    * dim `d`'s chunk size or ≥ the extent; distinct `ps` in (0, 1];
    * generation-current full-coverage stats with moments. Anything less —
    * or straddlers past `maxProbeChunks`, or more than `maxGroups` boxes
    * (the driver holds per-group bracket state and broadcasts one bounds
    * row per (group, p): slab/tile heat maps are small, but a
    * per-chunk-tile geometry at the 100 TB envelope is ~1.6 M groups) —
    * falls back LOUDLY to one exact full-scan grouped-rank selection
    * (`fallback = true`): fully distributed, nothing driver-held, the
    * same bucketed two-stage pick, residuals `⌈p·n⌉` computed in decimal
    * so ranks past 2^53 never wobble. `ranges` (r18) restricts the
    * ranking to a dim-index box (`dim -> [lo, hi)`): group ids stay
    * ABSOLUTE and each surviving slab ranks its in-box cells only — the
    * per-slab clip heat-map of a cropped survey; the box must be
    * chunk-aligned or the sliced fallback answers, and the group cap
    * counts only the slabs the slice touches. */
  def quantilesByBox(spark: SparkSession, path: String, variable: String,
                     ps: Seq[Double], groupSizes: Seq[Long],
                     maxProbeChunks: Int = 512,
                     maxGroups: Int = 1 << 16,
                     ranges: Map[String, (Long, Long)] = Map.empty): GroupedQuantiles = {
    require(ps.nonEmpty && ps.forall(p => p > 0.0 && p <= 1.0),
      s"quantiles $ps must lie in (0, 1]")
    require(ps.distinct == ps, s"duplicate quantiles in $ps")
    boxRankVector(spark, path, variable, ps, n => ps.map(p =>
      (BigDecimal(p) * n).setScale(0, BigDecimal.RoundingMode.CEILING).toLong),
      groupSizes, maxProbeChunks, maxGroups, fallbackOk = true, ranges)
  }

  /** Per-box values at EXPLICIT per-group ranks — `mkKs(n_g)` names each
    * group's rank list (constant arity; `labels` are the output `p`
    * column, one per rank slot) — the grouped twin of [[valuesAtRanks]],
    * the seam the GROUPED percentile aggregate pushdown batches through.
    * Pruned path ONLY: the caller proved answerability (alignment,
    * current sidecar, NaN-free) at plan time, so any fallback condition
    * here is a plan/execution race and throws loudly instead of running
    * the label-agnostic quantile fallback with the wrong ranks. */
  private[graft] def boxRanks(spark: SparkSession, path: String, variable: String,
                              labels: Seq[Double], mkKs: Long => Seq[Long],
                              groupSizes: Seq[Long],
                              maxProbeChunks: Int = 512,
                              maxGroups: Int = Int.MaxValue,
                              ranges: Map[String, (Long, Long)] = Map.empty): GroupedQuantiles = {
    require(labels.nonEmpty && labels.distinct == labels, s"bad rank labels $labels")
    boxRankVector(spark, path, variable, labels, mkKs, groupSizes,
      maxProbeChunks, maxGroups, fallbackOk = false, ranges)
  }

  private def boxRankVector(spark: SparkSession, path: String, variable: String,
                            ps: Seq[Double], mkKs: Long => Seq[Long],
                            groupSizes: Seq[Long], maxProbeChunks: Int,
                            maxGroups: Int, fallbackOk: Boolean,
                            ranges: Map[String, (Long, Long)]): GroupedQuantiles = {
    import graft.sources.MdioChunkStats
    import graft.zarr.ZarrMeta
    import org.apache.spark.sql.{Column, Row}
    import org.apache.spark.sql.types._
    require(groupSizes.forall(_ >= 1), s"group sizes $groupSizes must be positive")
    val root = ZarrMeta.path(path)
    val (meta, attrs) = ZarrMeta.readGroup(root)._2.getOrElse(variable,
      throw new IllegalArgumentException(s"no variable '$variable' in $path"))
    val dims = meta.dimNames
      .orElse(attrs.flatMap(graft.sources.MdioTableUtil.arrayDimensions))
      .getOrElse(throw new IllegalArgumentException(
        s"variable '$variable' carries no dimension names"))
    require(!dims.contains(variable),
      s"'$variable' is a dimension coordinate — slice its index range instead")
    require(groupSizes.size == dims.size,
      s"${groupSizes.size} group sizes for ${dims.size} dims")
    val isFloat = meta.dtype.charAt(meta.dtype.length - 2) == 'f'
    val gNames = dims.indices.map(i => s"_g$i")
    val gCols: Seq[Column] = dims.zip(groupSizes).zip(gNames).map {
      case ((dn, gs), gn) => floor(col(dn) / gs).cast("long").as(gn)
    }
    val outG = gNames.zip(dims).map { case (gn, d) => col(gn).as(s"g_$d") }
    val pKeys = gNames :+ "p"
    def base = spark.read.format("mdio").load(path)
    val vt = base.schema(variable).dataType
    // optional dim-index slice (r18): per-group ranks are computed over
    // the BOX's cells only — group ids stay ABSOLUTE (FLOOR(dim/L)), so a
    // slab clipped by the slice ranks exactly its surviving cells
    val sliced = sliceOf(meta, dims, ranges, variable)
    // the shared tail: bucketed two-stage pick over per-(group, p, value)
    // counts, then the output shape
    def finish(byKV: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
      pickByRankBucketed(byKV, pKeys)
        .select(outG ++ Seq(col("p"), col("v").cast("double").as("q"), col("n")): _*)
    // exact one-scan fallback, fully DISTRIBUTED (nothing driver-held —
    // this is also the >maxGroups escape hatch): per-(group, value)
    // counts, per-group totals/extents by aggregation (never a whole-group
    // window), the quantile requests riding the plan as an exploded
    // literal array, residual = ⌈p·n⌉ in decimal (shortest-decimal p,
    // the same number the pruned path's ksOf uses — exact past 2^53),
    // then the same bucketed pick
    // `race = true` marks the manifest-side triggers (pinned manifest
    // vanished, shards read as torn) — the ONLY failures a fresh manifest
    // can heal, so under fallbackOk=false only they wear the retryable
    // StatsRaceException; geometry re-asserts (alignment, group cap)
    // throw plain and stay loud on first throw (r19, ADVICE)
    def scanFallback(race: Boolean = false): GroupedQuantiles = {
      if (!fallbackOk) { // boxRanks: answerability was PROVEN at plan time
        val msg = s"rank-by-box for '$variable' lost " +
          "its pruned-path preconditions between planning and execution"
        if (race) throw new graft.sources.MdioAggScan.StatsRaceException(msg)
        else throw new IllegalStateException(msg)
      }
      // runtimeFiltering=false: the group-ordinal joins below cannot prune
      // this scan (every group survives the build side) but their
      // dynamic-pruning subqueries WOULD desync the shared aggregation
      // subtree and kill the exchange reuse that executes it once
      val full = sliced(spark.read.format("mdio")
        .option("runtimeFiltering", "false").load(path))
      val src = if (isFloat) full.filter(!isnan(col(variable))) else full
      val byGV = src.select(gCols :+ col(variable).as("v"): _*)
        .groupBy(gNames.map(col) :+ col("v"): _*).agg(count(lit(1L)).as("c"))
      val stats = byGV.groupBy(gNames.map(col): _*)
        .agg(sum(col("c")).as("n"),
          min(col("v").cast("double")).as("blo"),
          max(col("v").cast("double")).as("_vhi"))
      val req = explode(array(ps.map(p => struct(lit(p).as("p"),
        lit(BigDecimal(p).underlying).as("pd"))): _*))
      val withR = byGV.join(stats, gNames)
        .withColumn("_r", req)
        .withColumn("p", col("_r.p"))
        .withColumn("residual", ceil(col("_r.pd") * col("n")).cast("long"))
        .withColumn("bw", (col("_vhi") - col("blo")) / lit(RankBuckets.toDouble))
        .drop("_r", "_vhi")
      GroupedQuantiles(finish(withR), 0, 0L, fallback = true)
    }

    val varDir = root.resolve(variable)
    val manOpt = MdioChunkStats.currentManifest(varDir)
    if (manOpt.isEmpty) return scanFallback(race = true)
    // a group must contain WHOLE chunks: per dim, a multiple of the chunk
    // size or the whole extent (a ragged last chunk still fits — its cells
    // end inside the dim, so a whole-extent group covers it)
    val misaligned = dims.indices.exists { d =>
      groupSizes(d) % meta.chunks(d) != 0 && groupSizes(d) < meta.shape(d)
    }
    if (misaligned) {
      log.warn(s"quantilesByBox($path, $variable): group sizes $groupSizes " +
        s"do not align to the chunk shape ${meta.chunks} — chunks would " +
        "straddle groups; falling back to the exact full-scan selection")
      return scanFallback()
    }
    val man = manOpt.get
    manifestRaceHook()
    val grid = meta.chunkGrid
    // a sliced grouped rank needs a CHUNK-ALIGNED box, like the ungrouped
    // form — a straddling chunk's stats interval mixes in- and out-of-box
    // cells; misaligned slices answer exactly through the sliced fallback
    val boxOpt =
      if (ranges.isEmpty) Some(grid.map(g => (0L, g)))
      else graft.sources.MdioAggScan.alignedChunkBox(meta, dims, ranges)
    if (boxOpt.isEmpty) {
      log.warn(s"quantilesByBox($path, $variable): slice $ranges is not " +
        "chunk-aligned — falling back to the exact sliced-scan selection")
      return scanFallback()
    }
    val box = boxOpt.get
    def inBox(cc: Seq[Long]): Boolean =
      cc.indices.forall(i => cc(i) >= box(i)._1 && cc(i) < box(i)._2)
    // chunk ordinals per group along each dim (whole-extent ⇒ one group)
    val cpg = dims.indices.map { d =>
      if (groupSizes(d) >= meta.shape(d)) grid(d)
      else groupSizes(d) / meta.chunks(d)
    }
    // the explicit O(groups) driver contract: bracket state and the
    // broadcast bounds are one row per (group, p) — past the cap, the
    // distributed fallback is the RIGHT plan, not a degraded one.
    // Group count is over the BOX: only slabs the slice touches exist.
    val nGroups = dims.indices.map(d =>
      BigInt((box(d)._2 - 1) / cpg(d) - box(d)._1 / cpg(d) + 1)).product
    if (nGroups > maxGroups) {
      log.warn(s"quantilesByBox($path, $variable): $nGroups groups exceed " +
        s"the driver-state cap $maxGroups — using the distributed " +
        "full-scan grouped-rank selection")
      return scanFallback()
    }
    // coarse whole-shard summaries need every trailing dim single-group
    // AND un-sliced (a trailing cut invalidates the shard's [lo,hi]×cells)
    val trailingSingle = (1 until dims.size).forall(d =>
      cpg(d) >= grid(d) && box(d)._1 == 0 && box(d)._2 == grid(d))
    def groupOf(cc: Seq[Long]): Seq[Long] =
      cc.zip(cpg).map { case (c, n) => c / n }

    // per-group rank items, mixed granularity exactly as kthSmallest:
    // fine = opened chunk entries, coarse = unopened whole-shard manifest
    // summaries (a shard rides coarse only when its WHOLE chunk box maps
    // to one group: lead range inside one group, trailing dims
    // single-group — anything else opens immediately)
    val fine = scala.collection.mutable.Map
      .empty[Seq[Long], scala.collection.mutable.ArrayBuffer[(Seq[Long], MdioChunkStats.Bounds)]]
    val coarse = scala.collection.mutable.Map
      .empty[Seq[Long], scala.collection.mutable.Map[Long, (BigDecimal, BigDecimal, Long)]]
    var usable = true
    def intake(cc: Seq[Long], eOpt: Option[MdioChunkStats.Entry]): Unit =
      if (inBox(cc)) eOpt match {
        case Some(Some(b)) if b.moments.isDefined =>
          fine.getOrElseUpdate(groupOf(cc),
            scala.collection.mutable.ArrayBuffer.empty) += ((cc, b))
        case Some(None) => () // all-NaN chunk: never ranks
        case _ => usable = false
      }
    // the direct API budgets its driver-side triage like every QC
    // operator; the pushdown execution (fallbackOk = false) does NOT — its
    // budget ran at PLAN time (boxRankAnswerable's entry budget), and an
    // accepted plan must answer, not start declining mid-execution
    val within = walkShards(varDir, man, grid, leadBoxes = Seq(box.head),
      entryBudget = if (fallbackOk) qcEntryBudget else Long.MaxValue) { (sid, sm) =>
      sm.cells.isDefined && trailingSingle && {
        val leadLo = sid * man.span
        val leadHi = math.min((sid + 1) * man.span, grid.head)
        leadLo >= box.head._1 && leadHi <= box.head._2 &&
        (leadLo / cpg.head) == ((leadHi - 1) / cpg.head) && {
          (sm.lo, sm.hi) match {
            case (Some(l), Some(h)) =>
              coarse.getOrElseUpdate(
                (leadLo / cpg.head) +: Seq.fill(dims.size - 1)(0L),
                scala.collection.mutable.Map.empty)
                .update(sid, (l, h, sm.cells.get))
            case _ => () // all-NaN shard: proven cells = 0
          }
          true
        }
      }
    }(intake)
    if (!within) return scanFallback()
    if (!usable) return scanFallback(race = true)

    def itemsOf(g: Seq[Long]): IndexedSeq[(BigDecimal, BigDecimal, Long)] =
      (coarse.get(g).iterator.flatMap(_.valuesIterator) ++
        fine.get(g).iterator.flatMap(_.iterator.map { case (_, b) =>
          (b.min, b.max, b.moments.get.cnt) })).toIndexedSeq

    // per-group rank list (quantilesByBox: ⌈ps(i)·n⌉ in BigDecimal —
    // exact boundary ceil at any n, the lower median is p = 0.5;
    // boxRanks: the caller's explicit ranks)
    def ksOf(n: Long): Seq[Long] = mkKs(n)
    final case class GState(g: Seq[Long], n: Long, ks: Seq[Long],
                            var brs: Seq[(Option[BigDecimal], BigDecimal)])
    val gOrd = Ordering.Implicits.seqOrdering[Seq, Long]
    val states = (fine.keySet ++ coarse.keySet).toSeq.sorted(gOrd).flatMap { g =>
      val its = itemsOf(g)
      val n = its.iterator.map(_._3).sum
      if (n == 0) None // all-NaN box: no rows
      else {
        val ks = ksOf(n)
        Some(GState(g, n, ks, ks.map(bracketItems(its, _))))
      }
    }
    val outSchema = StructType(
      dims.map(d => StructField(s"g_$d", LongType, nullable = false)) ++
        Seq(StructField("p", DoubleType, nullable = false),
          StructField("q", DoubleType, nullable = false),
          StructField("n", LongType, nullable = false)))
    if (states.isEmpty) // every box all-NaN: proven-empty result
      return GroupedQuantiles(
        spark.createDataFrame(java.util.Collections.emptyList[Row](), outSchema),
        0, 0L, fallback = false)
    // refinement: open each group's coarse shards intersecting ANY of its
    // rank windows, then re-bracket that group's ranks — one round
    // suffices (finer detail only shrinks windows; see kthSmallest).
    // Interior shards never open. The DIRECT API shares the walk's
    // entry-budget discipline here too; the pushdown execution
    // (fallbackOk = false) stays unbudgeted — its budget ran at plan time.
    val refineBudget = if (fallbackOk) qcEntryBudget else Long.MaxValue
    val chunksPerLead = grid.drop(1).product
    var openedKeys = 0L
    var budgetTripped = false
    states.foreach { st =>
      val gc = coarse.getOrElse(st.g, scala.collection.mutable.Map.empty)
      val toOpen = gc.collect {
        case (sid, (l, h, _)) if st.brs.exists { case (x0, x1) =>
          x0.forall(h > _) && l <= x1 } => sid
      }
      if (toOpen.nonEmpty && usable && !budgetTripped) {
        toOpen.foreach { sid =>
          if (usable && !budgetTripped) {
            val leadHi = math.min((sid + 1) * man.span, grid.head)
            openedKeys += (leadHi - sid * man.span) * chunksPerLead
            if (openedKeys > refineBudget) {
              log.warn(s"quantilesByBox($path, $variable): rank refinement " +
                s"would parse $openedKeys+ entries driver-side (budget " +
                s"$refineBudget) — using the distributed grouped-rank scan")
              budgetTripped = true
            } else {
              gc -= sid
              feedKeys(grid, sid * man.span, leadHi,
                MdioChunkStats.readShard(varDir, sid, man.shards(sid).gen))(intake)
            }
          }
        }
        if (usable && !budgetTripped)
          st.brs = st.ks.map(bracketItems(itemsOf(st.g), _))
      }
    }
    if (budgetTripped) return scanFallback() // only reachable when fallbackOk
    if (!usable) return scanFallback(race = true) // torn shard mid-refinement

    var scanned = 0L
    var jobs = 0
    // exact below-edge counts for ALL (group, p) edges in ONE allowlist
    // scan: each group's straddler set is the union over its ranks' lower
    // edges (a remaining coarse shard can never straddle one — it would
    // intersect that rank's window and be open). Every probed row of a
    // group joins to EVERY edge row of that group, so the count per
    // (group, p) covers the whole probed set — and the metadata side
    // below excludes probed chunks entirely, so nothing double-counts
    // (a chunk probed for one edge may sit fully below another).
    val emptyFine = scala.collection.mutable.ArrayBuffer.empty[(Seq[Long], MdioChunkStats.Bounds)]
    val straddlersOf: Map[Seq[Long], Seq[Seq[Long]]] = states.iterator.map { st =>
      st.g -> st.brs.flatMap(_._1).distinct.flatMap { b0 =>
        fine.getOrElse(st.g, emptyFine)
          .collect { case (cc, b) if b.min <= b0 && b.max > b0 => cc }
      }.distinct
    }.toMap
    val probeChunks = straddlersOf.valuesIterator.flatten.toSeq.distinct
    if (probeChunks.size > maxProbeChunks) {
      log.warn(s"quantilesByBox($path, $variable): ${probeChunks.size} " +
        s"chunks straddle group bracket edges (cap $maxProbeChunks) — " +
        "falling back to the exact full-scan grouped-rank selection")
      return scanFallback()
    }
    def groupedDF(rows: Seq[Row], tail: Seq[StructField]) =
      spark.createDataFrame(
        java.util.Arrays.asList(rows: _*),
        StructType(gNames.map(StructField(_, LongType, nullable = false)) ++ tail))
    val exactBelow: Map[(Seq[Long], Double), Long] =
      if (probeChunks.isEmpty) Map.empty
      else {
        scanned += probeChunks.size
        jobs += 1
        val edges = groupedDF(
          states.filter(st => straddlersOf(st.g).nonEmpty).flatMap { st =>
            ps.zip(st.brs).collect { case (p, (Some(b0), _)) =>
              Row.fromSeq(st.g ++ Seq(p, edgeValue(b0, vt)))
            }
          },
          Seq(StructField("p", DoubleType, nullable = false),
            StructField("x0", edgeType(vt), nullable = false)))
        spark.read.format("mdio")
          .option("chunkKeys", probeChunks.map(_.mkString(".")).mkString(","))
          .load(path)
          .select(gCols :+ col(variable).as("v"): _*)
          .join(broadcast(edges), gNames)
          .filter(col("v") <= col("x0"))
          .groupBy(pKeys.map(col): _*).agg(count(lit(1L)).as("c"))
          .collect()
          .map(r => (gNames.indices.map(r.getLong(_)).toSeq,
            r.getDouble(gNames.size)) -> r.getLong(gNames.size + 1)).toMap
      }

    // residual ranks + window bounds + bucket params, broadcast once (one
    // row per (group, p)); ONE allowlist scan over the union of every
    // rank's window chunks answers everything together through the
    // two-stage bucketed pick
    val boundsRows = states.flatMap { st =>
      val probed = straddlersOf.getOrElse(st.g, Seq.empty).toSet
      val its = itemsOf(st.g)
      ps.lazyZip(st.ks).lazyZip(st.brs).map { case (p, k, (x0, x1)) =>
        val below = x0.map { b0 =>
          val metaBelow = coarse.get(st.g).iterator
            .flatMap(_.valuesIterator).collect {
              case (_, h, c) if h <= b0 => c }.sum +
            fine.getOrElse(st.g, emptyFine).iterator.collect {
              case (cc, b) if !probed.contains(cc) && b.max <= b0 =>
                b.moments.get.cnt }.sum
          metaBelow + exactBelow.getOrElse((st.g, p), 0L)
        }.getOrElse(0L)
        val residual = k - below
        require(residual >= 1,
          s"rank window inconsistency in group ${st.g}: residual $residual")
        val blo = x0.getOrElse(its.iterator.map(_._1).min).toDouble
        val bw = (x1.toDouble - blo) / RankBuckets
        Row.fromSeq(st.g ++ Seq(p, x0.map(edgeValue(_, vt)).orNull,
          edgeValue(x1, vt), residual, st.n, blo, bw))
      }
    }
    val bounds = groupedDF(boundsRows,
      Seq(StructField("p", DoubleType, nullable = false),
        StructField("x0", edgeType(vt), nullable = true),
        StructField("x1", edgeType(vt), nullable = false),
        StructField("residual", LongType, nullable = false),
        StructField("n", LongType, nullable = false),
        StructField("blo", DoubleType, nullable = false),
        StructField("bw", DoubleType, nullable = false)))
    val windowChunks = states.flatMap { st =>
      val f = fine.getOrElse(st.g, emptyFine)
      st.brs.flatMap { case (x0, x1) =>
        f.collect { case (cc, b) if x0.forall(b.max > _) && b.min <= x1 => cc }
      }
    }.distinct
    scanned += windowChunks.size
    jobs += 1
    val byKV = spark.read.format("mdio")
      .option("chunkKeys", windowChunks.map(_.mkString(".")).mkString(","))
      .load(path)
      .select(gCols :+ col(variable).as("v"): _*)
      .join(broadcast(bounds), gNames)
      .filter((col("x0").isNull || col("v") > col("x0")) && col("v") <= col("x1"))
      .groupBy(pKeys.map(col) ++
        Seq(col("v"), col("residual"), col("n"), col("blo"), col("bw")): _*)
      .agg(count(lit(1L)).as("c"))
    GroupedQuantiles(finish(byKV), jobs, scanned, fallback = false)
  }

  /** EXACT per-box lower median (`k = ⌈n/2⌉` per group, equal to
    * `ORDER BY v LIMIT 1 OFFSET (n+1)/2 - 1` within each group) over
    * chunk-aligned dim boxes — `groupSizes` of (leadSpan, wholeDim…)
    * gives depth slabs and (chunkLead, chunkTrail) the per-tile heat-map.
    * This IS [[quantilesByBox]] at `ps = [0.5]` (⌈n/2⌉ = (n+1)/2 for
    * every n) — one metadata bracket per group, at most two scan jobs for
    * all groups, the bucketed two-stage pick, and the same loud fallbacks
    * — reshaped to the median readout (`med` instead of (p, q) rows). */
  def medianByBox(spark: SparkSession, path: String, variable: String,
                  groupSizes: Seq[Long],
                  maxProbeChunks: Int = 512,
                  maxGroups: Int = 1 << 16,
                  ranges: Map[String, (Long, Long)] = Map.empty): GroupedMedian = {
    val r = quantilesByBox(spark, path, variable, Seq(0.5), groupSizes,
      maxProbeChunks, maxGroups, ranges)
    GroupedMedian(r.result.drop("p").withColumnRenamed("q", "med"),
      r.jobs, r.scannedChunks, r.fallback)
  }

  /** EXACT per-slab lower median over lead-dimension slabs of
    * `leadPerGroup` ABSOLUTE indices — [[medianByBox]] with whole-extent
    * trailing groups (the depth-slab QC readout; result columns
    * `slab`/`med`/`n`). `leadPerGroup` must be a positive multiple of the
    * lead chunk size or the misaligned-group fallback fires. */
  def medianByLead(spark: SparkSession, path: String, variable: String,
                   leadPerGroup: Long,
                   maxProbeChunks: Int = 512,
                   ranges: Map[String, (Long, Long)] = Map.empty): GroupedMedian = {
    import graft.zarr.ZarrMeta
    val (meta, attrs) = ZarrMeta.readGroup(ZarrMeta.path(path))._2.getOrElse(variable,
      throw new IllegalArgumentException(s"no variable '$variable' in $path"))
    val dims = meta.dimNames
      .orElse(attrs.flatMap(graft.sources.MdioTableUtil.arrayDimensions))
      .getOrElse(throw new IllegalArgumentException(
        s"variable '$variable' carries no dimension names"))
    val r = medianByBox(spark, path, variable,
      leadPerGroup +: meta.shape.tail, maxProbeChunks, ranges = ranges)
    r.copy(result = r.result.select(
      col(s"g_${dims.head}").as("slab"), col("med"), col("n")))
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
