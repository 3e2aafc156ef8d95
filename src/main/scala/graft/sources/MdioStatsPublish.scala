package graft.sources

import graft.zarr.{HConf, VPath, ZarrMeta}
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession

/** EXECUTOR-SIDE publication of the [[MdioChunkStats]] sidecar — the
  * distributed form of [[MdioChunkStats.refresh]] used by every
  * stats-aware write path (the chunk-shuffle writer, the sharded writer,
  * the DSv2 sink's fragment commit).
  *
  * Why it exists: a stats-aware write produces exactly one
  * [[MdioWriter.ChunkStatRow]] per touched chunk. Collecting those to the
  * driver and serializing every touched `.mdio_stats.s<N>.json` there —
  * the pre-r13 shape — is an O(chunks) driver stage: a full-store write
  * at the 100 TB envelope (~1.6 M chunks/variable) would union ~100+ MB
  * of rows on the driver heap and single-thread the JSON encode. Here the
  * stat rows stay distributed: they shuffle BY STATS-SHARD ID (the same
  * `leadIdx / span` key the sidecar files it under), each reduce task
  * writes the shard files it owns at the NEW generation (merging the
  * prior shard's entries for an incremental refresh), and the driver
  * receives only one [[MdioChunkStats.ShardMeta]] summary per TOUCHED
  * SHARD (~400 records at the envelope) to write the manifest — the
  * commit point, unchanged from the driver-side protocol: `.mdio_wgen`
  * bumps first, shard files land next, the manifest write commits last,
  * so every crash window reads as stale, never wrongly current.
  *
  * The chunk-data writes themselves ride in the SAME Spark action: the
  * stat rows are the map-stage output of the write job, so the whole
  * write+publish is one job — chunk files stream out of the map tasks,
  * shard files out of the reduce tasks, and nothing O(chunks) ever
  * materializes on the driver. Reference analog: statsV1 publication,
  * mdio/stats.h:229-335 + mdio/dataset.h:1269-1416 (attached attributes
  * committed after the write completes).
  */
object MdioStatsPublish {

  /** Decode a stat row's flat C-order chunk id into its sidecar key and
    * entry; None when the chunk is unprunable (±Inf bounds). */
  private def entryOf(sr: MdioWriter.ChunkStatRow, grid: Array[Long])
      : Option[(String, MdioChunkStats.Entry)] = {
    val rank = grid.length
    val cc = new Array[Long](rank)
    var rem = sr.cid
    var i = rank - 1
    while (i >= 0) { cc(i) = rem % grid(i); rem /= grid(i); i -= 1 }
    MdioWriter.statEntry(sr).map(ZarrMeta.chunkKey(cc.toSeq) -> _)
  }

  /** The span a FRESH full publish derives without materializing entries:
    * full coverage has exactly `grid.tail.product` entries per leading
    * index. A partial fresh publish gets a coarser-than-ideal span (fewer,
    * larger shards), which the drift check corrects on a later refresh. */
  def gridSpan(grid: Array[Long]): Long =
    MdioChunkStats.deriveSpanOf(grid.product, grid.head - 1)

  /** Publish the sidecar for the stat rows of one write job (see object
    * doc). This is the terminal ACTION of the write: `rows`' lineage
    * includes the chunk-writing map stage, which executes here. */
  def publishRows(spark: SparkSession, varDirStr: String, hconf: HConf,
                  grid: Array[Long], rows: RDD[MdioWriter.ChunkStatRow]): Unit =
    publishEntries(spark, varDirStr, hconf,
      rows.flatMap(entryOf(_, grid)), gridSpan(grid))

  /** Publish `entries` (fresh per-chunk sidecar entries, keyed by chunk
    * key) against whatever prior state `varDir` holds, entirely from
    * executors except the generation bump and the manifest commit.
    * `freshSpan` is the span a from-scratch publish uses. */
  def publishEntries(spark: SparkSession, varDirStr: String, hconf: HConf,
                     entries: RDD[(String, MdioChunkStats.Entry)],
                     freshSpan: Long): Unit = {
    val varDir = VPath(varDirStr)
    val gen = MdioChunkStats.generation(varDir)
    val mOpt = MdioChunkStats.readManifest(varDir)
    mOpt match {
      case Some(m) if m.gen == gen && m.legacy.nonEmpty =>
        // legacy monolith migration: the monolith was driver-written in the
        // pre-shard era, so a one-time driver-side merge is no worse than
        // the file that already exists; refresh() migrates it to shards.
        // The collect RUNS the chunk-writing lineage — if it dies midway
        // the store is already part-mutated, so the stats must not keep
        // reading current over pre-write bounds (the other branches bump
        // BEFORE their action for exactly this reason).
        val collected =
          try entries.collect().toMap
          catch { case t: Throwable => MdioChunkStats.bump(varDir); throw t }
        MdioChunkStats.refresh(varDir, collected)
      case Some(m) if m.gen == gen =>
        // incremental against a current sharded prior: only touched shards
        // rewrite, each reduce task merging its prior shard's entries
        val next = MdioChunkStats.bump(varDir)
        val written = writeShards(entries, varDirStr, hconf, m.span, next, m.shards)
        val merged = m.shards ++ written
        MdioChunkStats.writeManifest(varDir, next, m.span, merged)
        // span drift (store grew far past its first-publish span): re-derive
        // with a distributed full republish — still never O(store) driver
        if (written.valuesIterator.exists(
            _.count > MdioChunkStats.SpanDriftFactor * MdioChunkStats.ShardTargetEntries))
          respan(spark, varDirStr, hconf, m.span, merged)
      case prior =>
        // stale or absent prior: nothing carries over; GC whatever shard
        // files a dead manifest still listed
        val next = MdioChunkStats.bump(varDir)
        val written = writeShards(entries, varDirStr, hconf, freshSpan, next, Map.empty)
        MdioChunkStats.writeManifest(varDir, next, freshSpan, written)
        MdioChunkStats.gcShards(varDir,
          prior.map(_.shards.keySet).getOrElse(Set.empty), written.keySet)
    }
  }

  /** The reduce stage: shuffle fresh entries by stats-shard id, write each
    * owned shard file at generation `gen` (merging the prior shard's
    * entries when the prior manifest listed it), and return one summary
    * per touched shard. `prior` is driver-small (one record per shard,
    * ~400 at the 100 TB envelope) and rides in the task closure. */
  private def writeShards(entries: RDD[(String, MdioChunkStats.Entry)],
                          varDirStr: String, hconf: HConf, span: Long, gen: Long,
                          prior: Map[Long, MdioChunkStats.ShardMeta])
      : Map[Long, MdioChunkStats.ShardMeta] = {
    val parts = math.max(1, entries.sparkContext.defaultParallelism)
    entries
      .map { case (k, e) => MdioChunkStats.shardOf(k, span) -> (k, e) }
      .groupByKey(parts) // one owner task per shard id: no write races
      .map { case (sid, kvs) =>
        VPath.install(hconf.value) // executor JVMs have no SparkSession
        val varDir = VPath(varDirStr)
        val carried = prior.get(sid)
          .map(sm => MdioChunkStats.readShard(varDir, sid, sm.gen))
          .getOrElse(Map.empty[String, MdioChunkStats.Entry])
        sid -> MdioChunkStats.writeShardFile(varDir, sid, gen, carried ++ kvs.toMap)
      }
      .collect().toMap
  }

  /** S11 stat retention for a TRAILING-dim trim: the boundary cuts inside
    * every shard (shards are keyed by the LEADING chunk index), so each
    * must be filtered where it lives — one executor task per shard reads
    * it, drops entries whose dim-`di` chunk index reaches `chunkKeep`,
    * rewrites at the new generation ONLY when something dropped (an
    * untouched shard carries into the new manifest by reference), and the
    * driver receives one [[MdioChunkStats.ShardMeta]] per surviving shard
    * — O(shards) driver records, never O(entries). Returns false when the
    * prior state is not a current sharded sidecar (legacy monolith, stale,
    * absent) — the caller falls back to the driver-side filter. */
  def trimFilterShards(spark: SparkSession, varDirStr: String,
                       di: Int, chunkKeep: Long): Boolean = {
    val varDir = VPath(varDirStr)
    val g = MdioChunkStats.generation(varDir)
    MdioChunkStats.readManifest(varDir) match {
      case Some(m) if m.gen == g && m.legacy.isEmpty =>
        val hconf = HConf.capture()
        val next = MdioChunkStats.bump(varDir)
        val metas = spark.sparkContext
          .parallelize(m.shards.toSeq,
            math.max(1, math.min(m.shards.size, spark.sparkContext.defaultParallelism)))
          .flatMap { case (sid, sm) =>
            VPath.install(hconf.value)
            val vd = VPath(varDirStr)
            val prior = MdioChunkStats.readShard(vd, sid, sm.gen)
            val kept = prior.filter { case (k, _) =>
              k.split("\\.")(di).toLong < chunkKeep }
            if (kept.isEmpty) None
            else if (kept.size == prior.size) Some(sid -> sm) // untouched: by reference
            else Some(sid -> MdioChunkStats.writeShardFile(vd, sid, next, kept))
          }.collect().toMap
        MdioChunkStats.writeManifest(varDir, next, m.span, metas)
        MdioChunkStats.gcShards(varDir, m.shards.keySet, metas.keySet)
        true
      case _ => false
    }
  }

  // ---- stat-row FRAGMENT files: the DSv2 sink's task-commit spill. A sink
  // task owning many chunks would otherwise ship O(chunks) stat rows inside
  // its WriterCommitMessage (a driver union at scale); past
  // [[MdioBatchWrite.InlineStatRows]] it writes them to a hidden
  // `.mdio_statfrag.<uuid>` file in the variable directory instead, and the
  // message carries only the file name. The driver-side commit then feeds
  // fragment contents through [[publishRows]] from executors and deletes
  // the fragments after the manifest commit (a crash in between leaves only
  // hidden dead bytes no reader opens). One row per line, tab-separated,
  // doubles as raw bits — exactness survives the text round-trip.

  private[sources] def encodeRow(sr: MdioWriter.ChunkStatRow): String =
    Seq(sr.cid, if (sr.isFloat) 1 else 0,
      java.lang.Double.doubleToRawLongBits(sr.minD),
      java.lang.Double.doubleToRawLongBits(sr.maxD),
      sr.minL, sr.maxL, if (sr.empty) 1 else 0, if (sr.nan) 1 else 0,
      sr.cnt, sr.sumS, sr.sumSqS, if (sr.u64) 1 else 0).mkString("\t")

  private[sources] def decodeRow(line: String): MdioWriter.ChunkStatRow = {
    val f = line.split("\t", -1)
    require(f.length == 12, s"bad stat-fragment line: $line")
    MdioWriter.ChunkStatRow(f(0).toLong, f(1) == "1",
      java.lang.Double.longBitsToDouble(f(2).toLong),
      java.lang.Double.longBitsToDouble(f(3).toLong),
      f(4).toLong, f(5).toLong, f(6) == "1", f(7) == "1",
      f(8).toLong, f(9), f(10), f(11) == "1")
  }

  private[sources] def writeFragment(file: VPath,
                                     rows: Iterable[MdioWriter.ChunkStatRow]): Unit =
    file.writeString(rows.iterator.map(encodeRow).mkString("\n"))

  private[sources] def readFragment(file: VPath): Seq[MdioWriter.ChunkStatRow] = {
    val bytes = file.readBytesOrNull()
    if (bytes == null) Seq.empty
    else new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
      .split("\n").iterator.filter(_.nonEmpty).map(decodeRow).toSeq
  }

  /** Distributed span re-derivation: read every live shard from executors,
    * re-derive the span from (entry count, max lead), and fully republish
    * at a new generation when the span actually changes. Shard files the
    * new manifest no longer lists are GC'd. */
  private def respan(spark: SparkSession, varDirStr: String, hconf: HConf,
                     curSpan: Long,
                     shards: Map[Long, MdioChunkStats.ShardMeta]): Unit = {
    val varDir = VPath(varDirStr)
    val all: RDD[(String, MdioChunkStats.Entry)] = spark.sparkContext
      .parallelize(shards.toSeq, math.max(1, math.min(shards.size, spark.sparkContext.defaultParallelism)))
      .flatMap { case (sid, sm) =>
        VPath.install(hconf.value)
        MdioChunkStats.readShard(VPath(varDirStr), sid, sm.gen)
      }
    val (count, maxLead) = all
      .map { case (k, _) => (1L, MdioChunkStats.leadIdx(k)) }
      .fold((0L, 0L)) { case ((c1, m1), (c2, m2)) => (c1 + c2, math.max(m1, m2)) }
    val span2 = MdioChunkStats.deriveSpanOf(count, maxLead)
    if (span2 == curSpan || count == 0L) return
    val next = MdioChunkStats.bump(varDir)
    val written = writeShards(all, varDirStr, hconf, span2, next, Map.empty)
    MdioChunkStats.writeManifest(varDir, next, span2, written)
    MdioChunkStats.gcShards(varDir, shards.keySet, written.keySet)
  }
}
