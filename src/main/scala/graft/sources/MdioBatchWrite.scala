package graft.sources

import graft.zarr.{ChunkCodec, ZarrMeta}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.distributions.{Distribution, Distributions}
import org.apache.spark.sql.connector.expressions.SortOrder
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types._

/** DSv2 write path: `df.write.format("mdio").mode("append").save(path)`.
  *
  * Chunk alignment contract: the ideal declaration — clustering on
  * `dim - (dim % chunkSize)` — is not expressible to Spark 4.1's write
  * planner (`V2ExpressionUtils.toCatalyst` translates references/
  * transforms only, not GeneralScalarExpression arithmetic). So the
  * contract inverts the reference's: where the reference makes misaligned
  * writes UNDEFINED BEHAVIOR (USER_GUIDE.md "Efficient Assignment"), here
  * the DEFAULT write is safe-but-serial (`requiredNumPartitions = 1`; one
  * task owns every chunk), and the parallel path is explicit:
  *
  * {{{
  *   MdioWriter.repartitionByChunk(df, path)
  *     .write.format("mdio").option("aligned", "true").save(path)
  * }}}
  *
  * With `aligned=true` the writer trusts the caller's partitioning; lying
  * reproduces the reference's UB (a chunk written by two tasks —
  * last-writer-wins). [[MdioWriter.writeVariable]] remains the internally
  * aligned one-call path.
  *
  * Cell-level merge semantics match the reference's accessor writes:
  * partial-chunk writes READ-MODIFY-WRITE — an existing chunk's
  * untouched cells are preserved (seeded from the decoded chunk), and
  * only absent chunks are fill-initialized.
  *
  * NULL values mean "leave this cell untouched". Spark's DSv2 append
  * resolution expands the input to the full table schema with nulls for
  * columns the DataFrame doesn't carry, so partial-VARIABLE writes are
  * the normal case — the null-skip is what keeps the unmentioned
  * variables' data intact.
  */
final case class MdioWriteBuilder(path: String, dims: Seq[String],
                                  metas: Map[String, ZarrMeta.ArrayMeta],
                                  schema: StructType,
                                  aligned: Boolean,
                                  chunkTransform: Boolean = false) extends WriteBuilder
    with SupportsTruncate {

  override def truncate(): WriteBuilder = this // whole-chunk rewrite either way

  override def build(): Write = new Write with RequiresDistributionAndOrdering {
    if (!aligned && !chunkTransform) MdioWriteBuilder.log.warn(
      s"mdio sink at $path: writing SERIALLY (one task owns every chunk). " +
        "For a parallel write use MdioWriter.insertAligned(df, path), " +
        "MdioWriter.repartitionByChunk(df, path) with .option(\"aligned\", \"true\"), " +
        "or write through the mdio catalog (spark.sql.catalog.<name>) for " +
        "parallel-aligned-by-default.")
    // aligned=true trusts the CALLER's partitioning, and for a
    // `sharding_indexed` target the required granularity is the SHARD, not
    // the chunk: a chunk-granular feed (e.g. a keyed scan's per-chunk
    // partitions) can have two tasks assemble the same shard object from
    // stale carryover — last-writer-wins, silently dropping inner chunks.
    // MdioWriter.repartitionByChunk clusters at shard granularity for
    // sharded targets; anything else must do the same.
    if (aligned && metas.values.exists(_.shard.isDefined)) MdioWriteBuilder.log.warn(
      s"mdio sink at $path: aligned=true targets a store with sharding_indexed " +
        "variables — the caller's partitioning MUST be SHARD-granular (one task " +
        "owns every whole shard object, as MdioWriter.repartitionByChunk " +
        "produces); a chunk-granular feed loses inner chunks (last-writer-wins). " +
        "A multi-task shard assembly is detected at commit and FAILS the job.")
    override def requiredDistribution(): Distribution =
      if (chunkTransform) {
        // loaded via MdioCatalog: its FunctionCatalog resolves the `chunk`
        // transform, so declare true ownership — Spark's shuffle IS the
        // alignment (each cluster's rows meet in exactly one task). All
        // selected variables share one chunkShape (enforced at load);
        // `sharding_indexed` variables need SHARD-granular ownership (a
        // shard object is written whole), so the cluster size per dim is
        // the LCM of every variable's shard-or-chunk size — whole shards
        // of each sharded variable AND whole chunks of each unsharded one.
        val ownSizes = MdioWriteBuilder.ownershipSizes(metas.values.toSeq)
        import org.apache.spark.sql.connector.expressions.Expressions
        // NB: Spark materializes a required write distribution as an
        // unconditional REPARTITION_BY_COL exchange — it is never elided
        // even when the input already satisfies it, so a co-gridded
        // read→write pipeline that wants to skip the shuffle goes through
        // `.option("aligned", "true")` fed by a keyed scan instead
        // (pinned in MdioCopartitionSpec).
        Distributions.clustered(dims.zip(ownSizes).map { case (d, cs) =>
          Expressions.apply("chunk", Expressions.column(d), Expressions.literal(cs))
            : org.apache.spark.sql.connector.expressions.Expression
        }.toArray)
      }
      else if (aligned) Distributions.unspecified()
      // constant clustering key + 1 partition = every chunk owned by the
      // single writer (numPartitions cannot pair with `unspecified`)
      else Distributions.clustered(Array(
        org.apache.spark.sql.connector.expressions.Expressions.literal(1)))
    override def requiredNumPartitions(): Int = if (aligned || chunkTransform) 0 else 1
    override def requiredOrdering(): Array[SortOrder] = Array.empty
    override def toBatch: BatchWrite = MdioBatchWrite(path, dims, metas, schema)
  }
}

object MdioWriteBuilder {
  private[sources] val log = org.slf4j.LoggerFactory.getLogger(classOf[MdioWriteBuilder])

  /** Per-dim task-ownership sizes for a parallel write: the LCM over the
    * written variables of their shard size (sharded) or chunk size
    * (unsharded) along each dim — a cluster then covers whole shard
    * objects and whole chunk files of every variable. Shard shapes are
    * chunk multiples by construction, so this stays the shared chunk
    * shape on unsharded stores. */
  private[sources] def ownershipSizes(ms: Seq[ZarrMeta.ArrayMeta]): Seq[Long] = {
    def gcd(a: Long, b: Long): Long = if (b == 0) a else gcd(b, a % b)
    def lcm(a: Long, b: Long): Long = a / gcd(a, b) * b
    val rank = ms.head.rank
    (0 until rank).map { i =>
      ms.foldLeft(1L)((acc, m) => lcm(acc, m.shard.map(_(i)).getOrElse(m.chunks(i))))
    }
  }
}

object MdioBatchWrite {
  /** Per-variable stat rows a sink task keeps INLINE in its commit message;
    * past this it spills a `.mdio_statfrag.<job>.<uuid>` file to the
    * variable directory and the message carries only the name — each commit
    * message stays small however many chunks the task owned. The COMMIT
    * side additionally routes through the distributed publisher whenever
    * the inline union across tasks exceeds this cap (many small tasks sum
    * to O(chunks) even when none spills individually). Overridable per
    * session via `spark.graft.sink.inlineStatRows` (captured ONCE at write
    * planning on the driver — the same captured value governs both the
    * writer-side spill threshold and the commit-side routing); `0` forces
    * always-spill — the strictest driver envelope for full-store ETL
    * writes. */
  val InlineStatRows = 4096

  /** Default age (ms) past which an unreferenced `.mdio_statfrag.*` file
    * is swept as a crash orphan (24 h). Overridable via
    * `spark.graft.sink.fragGraceMs`.
    *
    * CONTRACT for concurrent writers: the sweep distinguishes a crash
    * orphan from a live job's in-flight fragment ONLY by mtime age, so a
    * concurrent write job must reach its own commit within `fragGraceMs`
    * of spilling its FIRST fragment — a straggler/retry-ridden job that
    * spills at hour 0 and commits at hour 25 can lose that fragment to
    * another job's commit-time sweep (its publish then fails loudly or
    * under-counts stats). Deployments running multi-day concurrent ETL
    * writes against one store must raise `spark.graft.sink.fragGraceMs`
    * above their worst-case spill-to-commit span; the alternative
    * (heartbeat/lease stamping of fragments) is deliberately not paid —
    * fragments are already job-token-namespaced and the same-store
    * concurrent-write regime is RMW on disjoint chunk sets, rare enough
    * that a documented tunable beats a per-fragment lease protocol. */
  val FragGraceMs = 24L * 3600 * 1000
}

final case class MdioBatchWrite(path: String, dims: Seq[String],
                                metas: Map[String, ZarrMeta.ArrayMeta],
                                schema: StructType) extends BatchWrite {
  // session knobs, captured ONCE at write planning on the driver (this
  // object is constructed there) so the writer factory and the driver-side
  // commit can never disagree about the configured values
  private val sessionConf = org.apache.spark.sql.SparkSession.getActiveSession
    .orElse(org.apache.spark.sql.SparkSession.getDefaultSession).map(_.conf)
  private val inlineStatRows: Int = sessionConf
    .map(_.get("spark.graft.sink.inlineStatRows",
      MdioBatchWrite.InlineStatRows.toString).toInt)
    .getOrElse(MdioBatchWrite.InlineStatRows)
  private val fragGraceMs: Long = sessionConf
    .map(_.get("spark.graft.sink.fragGraceMs",
      MdioBatchWrite.FragGraceMs.toString).toLong)
    .getOrElse(MdioBatchWrite.FragGraceMs)
  /** This write job's fragment namespace: every fragment a task of THIS
    * job spills is named `.mdio_statfrag.<jobToken>.<uuid>`, so the
    * orphan sweep can tell its own in-flight fragments from a crashed
    * predecessor's leftovers without any coordination. */
  private val jobToken: String = java.util.UUID.randomUUID().toString

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    MdioDataWriterFactory(path, dims.toArray, schema,
      schema.fieldNames.filter(metas.contains).map(v => v -> metas(v)),
      graft.zarr.HConf.capture(), inlineStatRows, jobToken)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    // all tasks succeeded; (v2) refresh consolidated metadata on the driver
    // — the WaitAllFuture-then-publish shape. Each task's commit message
    // carries the exact post-RMW bounds of the chunks it owned (one task
    // per chunk under the clustering contract) — inline when few, as a
    // spilled fragment file past InlineStatRows — so the stats sidecar
    // refreshes here without an O(chunks) driver stage: fragment-bearing
    // commits route through MdioStatsPublish (executor-side shard writes,
    // driver writes only the manifest). Variables the sink cannot bound
    // (complex/record) bump-invalidate instead, and variables no task
    // touched (null-expanded columns) are left alone — their data did not
    // change, so their stats stay current.
    val root = ZarrMeta.path(path)
    val stats = messages.collect { case m: MdioStatsCommit => m }
    // sharding_indexed ownership check (upgrades the plan-time warning to a
    // hard failure): a shard OBJECT is assembled whole by exactly one task —
    // two tasks reporting inner chunks of the same shard means the feed was
    // chunk-granular under aligned=true, and whichever task wrote last
    // silently dropped the other's inner chunks. The per-task shard-id sets
    // are shard-granular (the FILE unit), so this stays O(shard files) on
    // the driver — and failing here, after the data writes, is the honest
    // outcome: the store HAS lost chunks and those shards need a rewrite
    // from a shard-granular feed (MdioWriter.repartitionByChunk).
    val shardOwners = scala.collection.mutable.Map[(String, Long), Int]()
    stats.foreach(_.shards.foreach { case (v, sids) =>
      sids.foreach { sid =>
        shardOwners.updateWith((v, sid))(c => Some(c.getOrElse(0) + 1))
      }
    })
    val collided = shardOwners.collect { case ((v, sid), n) if n > 1 => s"$v/shard$sid" }
    if (collided.nonEmpty) throw new IllegalStateException(
      s"mdio sink at $path: shard objects assembled by MULTIPLE tasks " +
        s"(last-writer-wins dropped inner chunks): ${collided.take(8).mkString(", ")}" +
        (if (collided.size > 8) s" … (${collided.size} total)" else "") +
        ". The aligned=true feed must be SHARD-granular for sharding_indexed " +
        "variables — use MdioWriter.repartitionByChunk(df, path) and rewrite " +
        "the listed shards.")
    val touched: Set[String] = stats.iterator.flatMap(_.touched).toSet
    touched.foreach { v =>
      val m = metas(v)
      val varDir = root.resolve(v)
      val capable = m.fields.isEmpty && !MdioPartitionReader.isComplex(m.dtype)
      if (!capable) MdioChunkStats.bump(varDir)
      else {
        val grid = m.chunkGrid.toArray
        val inline: Seq[MdioWriter.ChunkStatRow] = stats.toSeq
          .flatMap(_.stats.getOrElse(v, Array.empty[MdioWriter.ChunkStatRow]).toSeq)
        val frags: Seq[String] = stats.toSeq.flatMap(_.frags.getOrElse(v, Nil))
        val session = org.apache.spark.sql.SparkSession.getActiveSession
          .orElse(org.apache.spark.sql.SparkSession.getDefaultSession)
        // distributed publish when ANY task spilled OR the inline union
        // itself is past the cap (many small tasks each under the per-task
        // cap still sum to O(chunks) — the rows already arrived in the
        // commit messages, but their merge, JSON encode, and shard writes
        // must not run single-threaded on the driver). The per-task spill
        // bounds message SIZE; `spark.graft.sink.inlineStatRows=0` forces
        // always-spill for the strictest driver envelope.
        if (session.isDefined &&
            (frags.nonEmpty || inline.size > inlineStatRows)) {
          val sc = session.get.sparkContext
          val hc = graft.zarr.HConf.capture()
          val varDirStr = varDir.toString
          val fragRdd = sc
            .parallelize(frags, math.max(1, math.min(math.max(frags.size, 1), sc.defaultParallelism)))
            .flatMap { f =>
              graft.zarr.VPath.install(hc.value)
              MdioStatsPublish.readFragment(graft.zarr.VPath(varDirStr).resolve(f))
            }
          val rows = if (inline.isEmpty) fragRdd
                     else fragRdd.union(sc.parallelize(inline,
                       math.max(1, math.min(
                         inline.size / MdioBatchWrite.InlineStatRows + 1,
                         sc.defaultParallelism))))
          MdioStatsPublish.publishRows(session.get, varDirStr, hc, grid, rows)
        } else {
          // small write (or no session to run a job): driver-side refresh
          val rows = inline ++ frags.flatMap(f =>
            MdioStatsPublish.readFragment(varDir.resolve(f)))
          val entries = rows.iterator.flatMap { sr =>
            val cc = new Array[Long](grid.length)
            var rem = sr.cid
            var i = grid.length - 1
            while (i >= 0) { cc(i) = rem % grid(i); rem /= grid(i); i -= 1 }
            MdioWriter.statEntry(sr).map(ZarrMeta.chunkKey(cc.toSeq) -> _)
          }.toMap
          MdioChunkStats.refresh(varDir, entries)
        }
        frags.foreach(f => varDir.resolve(f).delete()) // after the manifest commit
        // ORPHAN SWEEP (r13 verdict #2): a driver crash between a task's
        // commit and the job's commit/abort leaves `.mdio_statfrag.*` files
        // no code path would ever delete — hidden dead bytes object stores
        // bill for. Any fragment here that is NOT this job's (the jobToken
        // in its name) and is older than the grace window is such a
        // leftover; the grace window keeps a genuinely concurrent job's
        // in-flight fragments safe. Scoped to fragment-bearing commits so
        // the always-inline regime never pays the directory LIST.
        if (frags.nonEmpty) sweepOrphanFragments(varDir)
      }
    }
    if (ZarrMeta.detectVersion(root) == 2) ZarrMeta.consolidate(root)
  }

  private def sweepOrphanFragments(varDir: graft.zarr.VPath): Unit = {
    val cutoff = System.currentTimeMillis() - fragGraceMs
    val own = s".mdio_statfrag.$jobToken."
    varDir.list().foreach { p =>
      if (p.isFile && p.name.startsWith(".mdio_statfrag.") && !p.name.startsWith(own))
        try { if (p.mtime <= cutoff) p.delete() }
        catch { case scala.util.control.NonFatal(_) => () } // best-effort
    }
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val root = ZarrMeta.path(path)
    val delivered = messages.collect { case m: MdioStatsCommit => m }
    // A failed job has ALREADY mutated chunk files: task commits write the
    // store in place (the RMW contract), so any variable a delivered
    // message touched now holds post-write bytes while the stats sidecar
    // still reads generation-CURRENT with pre-write bounds — a later
    // value-pruned scan would answer from stale bounds. Bump the data
    // generation for every touched variable so those stats read stale
    // (pruning silently disables; the next stats-aware write republishes).
    // Spark calls abort() whenever commit() is not reached or throws —
    // including the sharding collision rejection above.
    delivered.iterator.flatMap(_.touched).toSet.foreach { (v: String) =>
      try MdioChunkStats.bump(root.resolve(v))
      catch { case scala.util.control.NonFatal(_) => () } // best-effort
    }
    // tasks may have spilled stat fragments before the job died — GC them
    delivered.foreach { m =>
      m.frags.foreach { case (v, fs) =>
        fs.foreach { f =>
          try root.resolve(v).resolve(f).delete()
          catch { case scala.util.control.NonFatal(_) => () }
        }
      }
    }
  }
}

final case class MdioDataWriterFactory(path: String, dims: Array[String],
                                       schema: StructType,
                                       vars: Array[(String, ZarrMeta.ArrayMeta)],
                                       hconf: graft.zarr.HConf,
                                       inlineStatRows: Int = MdioBatchWrite.InlineStatRows,
                                       jobToken: String = "")
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] = {
    graft.zarr.VPath.install(hconf.value) // executor JVMs have no SparkSession
    new MdioDataWriter(path, dims, schema, vars, inlineStatRows, jobToken)
  }
}

/** Per-task commit payload: the variables this task wrote at least one
  * cell of, and — for boundable dtypes — the exact bounds of each FINAL
  * chunk buffer it owned (clustering guarantees single ownership, so the
  * union is conflict-free): inline rows when few, spilled
  * `.mdio_statfrag.*` file names per variable when the task owned more
  * than [[MdioBatchWrite.InlineStatRows]] chunks. `shards` lists, per
  * sharding_indexed variable, the shard OBJECTS this task assembled —
  * shard-granular (the file unit), so it stays small however many inner
  * chunks the task owned; the driver commit cross-checks single ownership
  * and fails loudly on a collision. */
private final case class MdioStatsCommit(
    touched: Set[String],
    stats: Map[String, Array[MdioWriter.ChunkStatRow]],
    frags: Map[String, Seq[String]] = Map.empty,
    shards: Map[String, Array[Long]] = Map.empty) extends WriterCommitMessage

/** Buffers every owned chunk per variable; flushes chunk files on commit.
  * Thanks to the declared clustering, a chunk is owned by exactly one
  * task — no cross-task merge is ever needed. */
final class MdioDataWriter(path: String, dims: Array[String], schema: StructType,
                           vars: Array[(String, ZarrMeta.ArrayMeta)],
                           inlineStatRows: Int = MdioBatchWrite.InlineStatRows,
                           jobToken: String = "")
    extends DataWriter[InternalRow] {

  // fragment files THIS attempt spilled — deleted on task abort so a failed
  // or speculation-raced attempt never leaks hidden bytes (job-level abort
  // only sees fragments named in DELIVERED commit messages)
  private val spilledFrags = scala.collection.mutable.ArrayBuffer[graft.zarr.VPath]()

  private val rank = dims.length
  private val dimIdx: Array[Int] = dims.map(schema.fieldIndex)
  private val varIdx: Array[Int] = vars.map { case (v, _) =>
    val fieldName = if (dims.contains(v)) s"${v}__value" else v
    schema.fieldIndex(fieldName)
  }
  private val anchor = vars.head._2
  private val chunks: Array[Long] = anchor.chunks.toArray
  private val shape: Array[Long] = anchor.shape.toArray
  private val grid: Array[Long] = anchor.chunkGrid.toArray
  private val chunkLen = chunks.product.toInt

  // per variable: chunkId -> buffer (doubles cover f/c; longs cover i/u/b;
  // packed little-endian bytes cover record dtypes, zero-filled like the
  // reference's struct fill)
  private val bufD = Array.fill(vars.length)(scala.collection.mutable.Map[Long, Array[Double]]())
  private val bufL = Array.fill(vars.length)(scala.collection.mutable.Map[Long, Array[Long]]())
  private val bufB = Array.fill(vars.length)(scala.collection.mutable.Map[Long, Array[Byte]]())

  private def kindOf(m: ZarrMeta.ArrayMeta): Char =
    if (m.fields.isDefined) 'V'
    else if (MdioPartitionReader.isComplex(m.dtype)) 'c'
    else m.dtype.charAt(m.dtype.length - 2)

  private def chunkPath(name: String, m: ZarrMeta.ArrayMeta, cid: Long) = {
    val cc = new Array[Long](rank)
    var rem = cid
    var i = rank - 1
    while (i >= 0) { cc(i) = rem % grid(i); rem /= grid(i); i -= 1 }
    m.chunkFile(ZarrMeta.path(path).resolve(name), cc.toSeq)
  }

  // ---- sharding_indexed geometry per variable: a sharded variable's
  // chunk FILES are shard objects holding `innerCount` inner chunks behind
  // a footer index; the task owns whole shards (ownershipSizes), buffers
  // inner chunks exactly like plain chunks, and assembles shard objects
  // at commit with untouched inner chunks carried over byte-for-byte.
  private def decompose(cid: Long): Array[Long] = {
    val cc = new Array[Long](rank)
    var rem = cid
    var i = rank - 1
    while (i >= 0) { cc(i) = rem % grid(i); rem /= grid(i); i -= 1 }
    cc
  }
  private def shardIdOf(m: ZarrMeta.ArrayMeta, cc: Array[Long]): Long = {
    val ips = m.innerPerShard
    val sGrid = m.shardGrid
    var sid = 0L
    var i = 0
    while (i < rank) { sid = sid * sGrid(i) + cc(i) / ips(i); i += 1 }
    sid
  }
  private def shardVPath(name: String, m: ZarrMeta.ArrayMeta, sid: Long) = {
    val sGrid = m.shardGrid
    val sc = new Array[Long](rank)
    var rem = sid
    var i = rank - 1
    while (i >= 0) { sc(i) = rem % sGrid(i); rem /= sGrid(i); i -= 1 }
    m.chunkFile(ZarrMeta.path(path).resolve(name),
      sc.toSeq.zip(m.innerPerShard).map { case (c, ips) => c * ips })
  }
  // raw shard object bytes, cached per (variable, shard); empty = absent
  private val shardBytes = scala.collection.mutable.Map[(Int, Long), Array[Byte]]()
  private def shardRaw(v: Int, sid: Long): Array[Byte] =
    shardBytes.getOrElseUpdate((v, sid), {
      val b = shardVPath(vars(v)._1, vars(v)._2, sid).readBytesOrNull()
      if (b == null) Array.emptyByteArray else b
    })
  /** One inner chunk's compressed bytes out of an existing shard object
    * (footer index: innerCount × (offset, nbytes) LE longs + crc32), or
    * null when the shard or the inner chunk is absent. */
  private def existingInner(v: Int, sid: Long, idx: Int): Array[Byte] = {
    val bytes = shardRaw(v, sid)
    if (bytes.isEmpty) return null
    val innerCount = vars(v)._2.innerPerShard.product.toInt
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val idxBase = bytes.length - (16 * innerCount + 4)
    val off = bb.getLong(idxBase + idx * 16)
    val nb = bb.getLong(idxBase + idx * 16 + 8)
    if (off == -1L && nb == -1L) null
    else java.util.Arrays.copyOfRange(bytes, off.toInt, (off + nb).toInt)
  }
  private def innerIdxOf(m: ZarrMeta.ArrayMeta, cc: Array[Long]): Int = {
    val ips = m.innerPerShard
    var idx = 0L
    var i = 0
    while (i < rank) { idx = idx * ips(i) + cc(i) % ips(i); i += 1 }
    idx.toInt
  }

  // read-modify-write seeds: a partial write through the sink preserves
  // the untouched cells of an existing chunk (fill only where no chunk
  // file exists), matching MdioWriter.writeVariable and the reference's
  // merging accessor writes. For a sharded variable the seed is the inner
  // chunk carved out of its shard object's footer index.
  private def existingRaw(v: Int, cid: Long, rawSize: Int): Array[Byte] = {
    val (name, m) = vars(v)
    val bytes =
      if (m.shard.isEmpty) chunkPath(name, m, cid).readBytesOrNull()
      else {
        val cc = decompose(cid)
        existingInner(v, shardIdOf(m, cc), innerIdxOf(m, cc))
      }
    if (bytes == null) null else ChunkCodec.decompress(bytes, m.compressor, rawSize)
  }

  private def seedD(v: Int, cid: Long, fill: Double, width: Int): Array[Double] = {
    val m = vars(v)._2
    val raw = existingRaw(v, cid, chunkLen * m.elemSize)
    if (raw == null) Array.fill(chunkLen * width)(fill)
    else if (width == 2) ChunkCodec.decodeComplex(raw, m.dtype)
    else ChunkCodec.decodeDoubles(raw, m.dtype)
  }

  private def seedL(v: Int, cid: Long, longFill: Long): Array[Long] = {
    val m = vars(v)._2
    val raw = existingRaw(v, cid, chunkLen * m.elemSize)
    if (raw == null) Array.fill(chunkLen)(longFill)
    else ChunkCodec.decodeLongs(raw, m.dtype)
  }

  private def seedB(v: Int, cid: Long, recSize: Int): Array[Byte] = {
    val raw = existingRaw(v, cid, chunkLen * recSize)
    if (raw == null) new Array[Byte](chunkLen * recSize) else raw
  }

  // record-dtype layout per variable (null when not a record dtype)
  private val recFields: Array[Seq[(String, String)]] = vars.map(_._2.fields.orNull)
  private val recSizes: Array[Int] = vars.map { case (_, m) =>
    m.fields.map(_.map(f => ChunkCodec.elemSize(f._2)).sum).getOrElse(0)
  }

  override def write(row: InternalRow): Unit = {
    var off = 0L
    var cid = 0L
    var stride = 1L
    var i = rank - 1
    while (i >= 0) {
      val coord = row.getLong(dimIdx(i))
      require(coord >= 0 && coord < shape(i),
        s"coordinate $coord out of domain [0, ${shape(i)}) on dim ${dims(i)}")
      off += (coord % chunks(i)) * stride
      stride *= chunks(i)
      i -= 1
    }
    i = rank - 1
    var gstride = 1L
    while (i >= 0) {
      cid += (row.getLong(dimIdx(i)) / chunks(i)) * gstride
      gstride *= grid(i)
      i -= 1
    }
    var v = 0
    while (v < vars.length) {
      // NULL means "leave this cell untouched": Spark's append resolution
      // null-expands table columns the input DataFrame doesn't carry, so a
      // partial-VARIABLE write arrives with the other variables all-null —
      // skipping nulls is what keeps those variables' data intact.
      if (row.isNullAt(varIdx(v))) { v += 1 }
      else {
      val m = vars(v)._2
      // sharded (sharding_indexed) variables: float/integral dtypes only,
      // mirroring MdioWriter.writeShardedVariable (complex/record shard
      // assembly is not wired). Checked here, on the first actual value,
      // so a sharded variable merely PRESENT in the table (null-expanded)
      // never blocks its unsharded peers.
      require(m.shard.isEmpty || (m.fields.isEmpty && !MdioPartitionReader.isComplex(m.dtype)),
        s"sharded write supports float/integral dtypes, not '${m.dtype}' " +
          s"(variable '${vars(v)._1}')")
      val fill = m.fillValue.getOrElse(Double.NaN)
      kindOf(m) match {
        case 'f' =>
          val buf = bufD(v).getOrElseUpdate(cid, seedD(v, cid, fill, 1))
          buf(off.toInt) = schema.fields(varIdx(v)).dataType match {
            case FloatType => row.getFloat(varIdx(v)).toDouble
            case _ => row.getDouble(varIdx(v))
          }
        case 'c' =>
          val buf = bufD(v).getOrElseUpdate(cid, seedD(v, cid, fill, 2))
          val s = row.getStruct(varIdx(v), 2)
          val isF4 = !m.dtype.endsWith("16")
          buf(off.toInt * 2) = if (isF4) s.getFloat(0).toDouble else s.getDouble(0)
          buf(off.toInt * 2 + 1) = if (isF4) s.getFloat(1).toDouble else s.getDouble(1)
        case 'V' => // record dtype: pack struct fields little-endian
          val fs = recFields(v)
          val recSize = recSizes(v)
          val buf = bufB(v).getOrElseUpdate(cid, seedB(v, cid, recSize))
          val bb = java.nio.ByteBuffer.wrap(buf).order(java.nio.ByteOrder.LITTLE_ENDIAN)
          val s = row.getStruct(varIdx(v), fs.size)
          val sdt = schema.fields(varIdx(v)).dataType.asInstanceOf[StructType]
          var base = off.toInt * recSize
          var k = 0
          while (k < fs.size) {
            val ft = fs(k)._2
            val es = ChunkCodec.elemSize(ft)
            if (ft.charAt(ft.length - 2) == 'f') {
              val d = sdt.fields(k).dataType match {
                case FloatType => s.getFloat(k).toDouble
                case _ => s.getDouble(k)
              }
              es match {
                case 2 => bb.putShort(base, ChunkCodec.floatToHalf(d.toFloat))
                case 4 => bb.putFloat(base, d.toFloat)
                case _ => bb.putDouble(base, d)
              }
            } else {
              val l = sdt.fields(k).dataType match {
                case LongType => s.getLong(k)
                case IntegerType => s.getInt(k).toLong
                case ShortType => s.getShort(k).toLong
                case ByteType => s.getByte(k).toLong
                case BooleanType => if (s.getBoolean(k)) 1L else 0L
                case _ => s.getLong(k)
              }
              es match {
                case 1 => bb.put(base, l.toByte)
                case 2 => bb.putShort(base, l.toShort)
                case 4 => bb.putInt(base, l.toInt)
                case _ => bb.putLong(base, l)
              }
            }
            base += es
            k += 1
          }
        case _ =>
          val isU64 = m.dtype.charAt(m.dtype.length - 2) == 'u' && m.dtype.endsWith("8")
          val longFill = if (isU64 && fill > 9.2e18) -1L
                         else if (fill.isNaN) 0L else fill.toLong
          val buf = bufL(v).getOrElseUpdate(cid, seedL(v, cid, longFill))
          buf(off.toInt) = schema.fields(varIdx(v)).dataType match {
            case LongType => row.getLong(varIdx(v))
            case IntegerType => row.getInt(varIdx(v)).toLong
            case ShortType => row.getShort(varIdx(v)).toLong
            case ByteType => row.getByte(varIdx(v)).toLong
            case BooleanType => if (row.getBoolean(varIdx(v))) 1L else 0L
            case dt: DecimalType => // u64 two's-complement wrap
              row.getDecimal(varIdx(v), dt.precision, dt.scale)
                .toJavaBigDecimal.toBigInteger.longValue()
            case _ => row.getLong(varIdx(v))
          }
      }
      v += 1
      }
    }
  }

  override def commit(): WriterCommitMessage = {
    val touched = Set.newBuilder[String]
    val stats = Map.newBuilder[String, Array[MdioWriter.ChunkStatRow]]
    val frags = Map.newBuilder[String, Seq[String]]
    val shardIds = Map.newBuilder[String, Array[Long]]
    // inline small row sets; spill big ones to a fragment file in the
    // variable directory (the commit-message stream must stay O(tasks))
    def emit(name: String, rows: Array[MdioWriter.ChunkStatRow]): Unit =
      if (rows.length <= inlineStatRows) stats += name -> rows
      else {
        // the job token namespaces the fragment so the driver commit's
        // orphan sweep can tell in-flight fragments from crash leftovers
        val tok = if (jobToken.isEmpty) "" else s"$jobToken."
        val frag = s".mdio_statfrag.$tok${java.util.UUID.randomUUID()}"
        val fp = ZarrMeta.path(path).resolve(name).resolve(frag)
        MdioStatsPublish.writeFragment(fp, rows)
        spilledFrags += fp
        frags += name -> Seq(frag)
      }
    var v = 0
    while (v < vars.length) {
      val (name, m) = vars(v)
      val kind = kindOf(m)
      val isC = kind == 'c'
      val isU64 = kind == 'u' && m.dtype.endsWith("8")
      def encoded(cid: Long): Array[Byte] = {
        val raw = bufD(v).get(cid)
          .map(b => if (isC) ChunkCodec.encodeComplex(b, m.dtype)
                    else ChunkCodec.encodeDoubles(b, m.dtype))
          .orElse(bufL(v).get(cid).map(ChunkCodec.encodeLongs(_, m.dtype)))
          .orElse(bufB(v).get(cid))
          .get
        ChunkCodec.compress(raw, m.compressor, m.elemSize, m.blosc)
      }
      val cids = (bufD(v).keysIterator ++ bufL(v).keysIterator ++ bufB(v).keysIterator).toSet
      if (m.shard.isEmpty) {
        cids.foreach(cid => chunkPath(name, m, cid).write(encoded(cid)))
      } else {
        // sharded: assemble each owned shard object whole — touched inner
        // chunks from the buffers, untouched ones carried over
        // byte-for-byte from the existing shard (exactly
        // MdioWriter.writeShardedVariable's merge)
        val innerCount = m.innerPerShard.product.toInt
        val bySid = cids.groupBy(cid => shardIdOf(m, decompose(cid)))
        bySid.foreach { case (sid, owned) =>
          val byIdx = owned.iterator.map(cid => innerIdxOf(m, decompose(cid)) -> cid).toMap
          val parts = Array.tabulate(innerCount) { idx =>
            byIdx.get(idx).map(encoded).getOrElse(existingInner(v, sid, idx))
          }
          shardVPath(name, m, sid).write(ZarrMeta.buildShard(parts))
        }
        if (bySid.nonEmpty) shardIds += name -> bySid.keysIterator.toArray
      }
      if (cids.nonEmpty) touched += name
      def validOf(cid: Long): Array[Int] =
        MdioWriter.validExtents(decompose(cid), chunks, shape)
      if (kind == 'f')
        emit(name, bufD(v).iterator.map { case (cid, buf) =>
          MdioWriter.floatStat(cid, buf, chunks, validOf(cid)) }.toArray)
      else if (kind != 'c' && kind != 'V')
        emit(name, bufL(v).iterator.map { case (cid, buf) =>
          if (isU64) MdioWriter.u64Stat(cid, buf, chunks, validOf(cid))
          else MdioWriter.longStat(cid, buf, chunks, validOf(cid)) }.toArray)
      v += 1
    }
    MdioStatsCommit(touched.result(), stats.result(), frags.result(), shardIds.result())
  }

  override def abort(): Unit =
    // a failed (or speculation-raced) attempt deletes its own spilled
    // fragments — the job-level abort only sees DELIVERED commit messages
    spilledFrags.foreach { p =>
      try p.delete() catch { case scala.util.control.NonFatal(_) => () }
    }
  override def close(): Unit = ()
}
