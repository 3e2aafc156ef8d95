package graft.sources

import graft.SparkSpec
import graft.spec.MdioSpec
import graft.zarr.ZarrMeta
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThanOrEqual, LessThanOrEqual}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import java.nio.file.Files

/** Value-statistics chunk pruning (SURVEY §2.2 P10's "chunk-level min/max
  * stats give the same pruning effect"; reference statsV1
  * mdio/stats.h:229-335 + coordinate value-run pruning
  * mdio/coordinate_selector.h:302-407): a range predicate on a DATA VALUE
  * column must plan strictly fewer partitions when the `.mdio_stats.json`
  * sidecar is generation-current, fall back silently when any writer has
  * moved the data generation past the stats (the RMW-invalidation
  * contract), and never change answers either way. */
class MdioValueStatsSpec extends SparkSpec {
  import spark.implicits._

  /** 1-D store: dim x (size 64, chunks of 8 → 8 chunks), float64 v = f(x). */
  private def createFloat(values: Long => Double): String = {
    val dir = Files.createTempDirectory("mdio_vstats").resolve("s.mdio").toString
    MdioWriter.create(MdioSpec.fromJson(
      """{
        |  "metadata": {"name": "s", "apiVersion": "v1.0", "createdOn": "2026-01-01T00:00:00Z"},
        |  "variables": [
        |    {"name": "x", "dataType": "int64",
        |     "dimensions": [{"name": "x", "size": 64}]},
        |    {"name": "v", "dataType": "float64",
        |     "dimensions": [{"name": "x", "size": 64}],
        |     "metadata": {"chunkGrid": {"name": "regular", "configuration": {"chunkShape": [8]}}}}
        |  ]
        |}""".stripMargin), dir)
    val fn = udf(values.apply _)
    MdioWriter.writeVariable(spark,
      spark.range(64).select($"id".as("x"), fn($"id").as("v")), dir, "v")
    dir
  }

  private def partitions(dir: String, filters: Array[Filter]) = {
    val sb = MdioTable(dir, None).newScanBuilder(CaseInsensitiveStringMap.empty())
    sb.asInstanceOf[MdioScanBuilder].pushFilters(filters)
    sb.build().toBatch.planInputPartitions()
  }

  private def planned(dir: String, filters: Array[Filter]): Int =
    partitions(dir, filters).length

  /** Bounds with the statsV1 moments stripped — the bounds-focused tests
    * pin min/max/hasNaN; the moments get their own exact-value tests. */
  private def stripped(e: MdioChunkStats.Entry): MdioChunkStats.Entry =
    e.map(_.copy(moments = None))

  /** Number of chunks the planned partitions actually cover (coalescing can
    * keep the PARTITION count while dropping chunks from a run). */
  private def coveredChunks(dir: String, filters: Array[Filter]): Long =
    partitions(dir, filters).map {
      case r: MdioChunkRangePartition => r.endIdx - r.startIdx
      case _: MdioInputPartition => 1L
      case other => fail(s"unexpected partition $other")
    }.sum

  test("writeVariable publishes generation-current per-chunk bounds") {
    val dir = createFloat(_.toDouble)
    val varDir = ZarrMeta.path(dir).resolve("v")
    assert(MdioChunkStats.generation(varDir) == 1L)
    val cur = MdioChunkStats.current(varDir)
    assert(cur.isDefined && cur.get.size == 8)
    assert(stripped(cur.get("0")) == Some(MdioChunkStats.Bounds(BigDecimal(0), BigDecimal(7))))
    assert(stripped(cur.get("7")) == Some(MdioChunkStats.Bounds(BigDecimal(56), BigDecimal(63))))
    MdioWriter.delete(dir)
  }

  test("value-range predicate plans strictly fewer partitions, same answers") {
    val dir = createFloat(_.toDouble)
    val full = planned(dir, Array.empty)
    val pruned = planned(dir, Array(GreaterThanOrEqual("v", 48.0)))
    assert(pruned < full, s"expected pruning: $pruned vs full $full")
    assert(pruned == 1) // chunks 6,7 coalesce into one surviving run (cpt=2)
    // point predicate: exactly the one chunk holding the value
    assert(planned(dir, Array(EqualTo("v", 10.0))) == 1)
    // disjoint predicate: zero partitions
    assert(planned(dir, Array(GreaterThanOrEqual("v", 1000.0))) == 0)
    // answers through the real read path are unchanged, and the scan
    // advertises the pruning source in its description
    val df = spark.read.format("mdio").load(dir).filter($"v" >= 48.0)
    assert(df.count() == 16L)
    assert(df.agg(sum($"v".cast("long"))).head.getLong(0) == (48L to 63L).sum)
    val p = df.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(p.contains("valueStats=v"), p.take(800))
    MdioWriter.delete(dir)
  }

  test("all-NaN chunks prune under any range predicate (NaN satisfies none)") {
    val dir = createFloat(x => if (x >= 24 && x < 32) Double.NaN else x.toDouble)
    val varDir = ZarrMeta.path(dir).resolve("v")
    val cur = MdioChunkStats.current(varDir).get
    assert(cur.contains("3") && cur("3").isEmpty, "all-NaN chunk must write a null entry")
    // v <= 1e9 covers every finite chunk; the all-NaN chunk still prunes
    assert(coveredChunks(dir, Array(LessThanOrEqual("v", 1e9))) == 7L)
    assert(coveredChunks(dir, Array.empty) == 8L)
    assert(spark.read.format("mdio").load(dir).filter($"v" <= 1e9).count() == 56L)
    MdioWriter.delete(dir)
  }

  test("RMW through writeVariable refreshes stats: new bounds prune correctly") {
    val dir = createFloat(_.toDouble)
    // rewrite ONLY chunk 0's cells to 100..107 (partial write, RMW pass)
    MdioWriter.writeVariable(spark,
      spark.range(8).select($"id".as("x"), ($"id" + 100.0).as("v")), dir, "v")
    val varDir = ZarrMeta.path(dir).resolve("v")
    assert(MdioChunkStats.generation(varDir) == 2L)
    val cur = MdioChunkStats.current(varDir).get
    assert(stripped(cur("0")) == Some(MdioChunkStats.Bounds(BigDecimal(100), BigDecimal(107)))) // refreshed
    assert(stripped(cur("5")) == Some(MdioChunkStats.Bounds(BigDecimal(40), BigDecimal(47))))   // carried over
    assert(planned(dir, Array(GreaterThanOrEqual("v", 100.0))) == 1)
    assert(spark.read.format("mdio").load(dir).filter($"v" >= 100.0).count() == 8L)
    MdioWriter.delete(dir)
  }

  test("the DSv2 sink refreshes stats through its commit messages") {
    val dir = createFloat(_.toDouble)
    // one-cell RMW through the sink: x=63 becomes -5; the task's commit
    // message carries chunk 7's exact post-RMW bounds to the driver commit
    spark.range(1).select(lit(63L).as("x"), lit(-5.0).as("v"))
      .write.format("mdio").mode("append").save(dir)
    val varDir = ZarrMeta.path(dir).resolve("v")
    assert(MdioChunkStats.generation(varDir) == 2L)
    val cur = MdioChunkStats.current(varDir).get
    assert(stripped(cur("7")) == Some(MdioChunkStats.Bounds(BigDecimal(-5), BigDecimal(62))))
    assert(stripped(cur("0")) == Some(MdioChunkStats.Bounds(BigDecimal(0), BigDecimal(7)))) // carried
    // pruning reflects the NEW bounds: only chunk 7 can hold negatives
    assert(planned(dir, Array(LessThanOrEqual("v", -1.0))) == 1)
    assert(spark.read.format("mdio").load(dir).filter($"v" >= 48.0).count() == 15L)
    MdioWriter.delete(dir)
  }

  test("trim retains surviving chunks' stats; external mutations invalidate") {
    val dir = createFloat(_.toDouble)
    val varDir = ZarrMeta.path(dir).resolve("v")
    // trim to 44 (mid-chunk): chunks 0..4 survive whole and KEEP their
    // exact entries; the ragged boundary chunk 5 and beyond drop (their
    // stored bounds cover now-out-of-domain cells)
    MdioWriter.trim(dir, "x", 44)
    val cur = MdioChunkStats.current(varDir)
    assert(cur.isDefined, "trim must retain stats for untouched whole chunks")
    assert(cur.get.keySet == (0 to 4).map(_.toString).toSet, cur.get.keySet)
    assert(stripped(cur.get("4")) == Some(MdioChunkStats.Bounds(BigDecimal(32), BigDecimal(39))))
    // pruning still fires on the surviving volume, answers exact
    assert(planned(dir, Array(GreaterThanOrEqual("v", 32.0))) <
      planned(dir, Array.empty))
    assert(spark.read.format("mdio").load(dir).filter($"v" >= 32.0).count() == 12L)
    // the boundary chunk (entry dropped) stays planned — never wrongly pruned
    assert(spark.read.format("mdio").load(dir).filter($"v" >= 40.0).count() == 4L)
    // an external writer that only bumps the generation invalidates everything
    MdioChunkStats.bump(varDir)
    assert(MdioChunkStats.current(varDir).isEmpty)
    assert(planned(dir, Array(GreaterThanOrEqual("v", 32.0))) ==
      planned(dir, Array.empty))
    MdioWriter.delete(dir)
  }

  test("sharded (v3) writes publish per-inner-chunk stats and prune") {
    val dir = Files.createTempDirectory("mdio_vstats").resolve("sh.mdio").toString
    MdioWriter.create(MdioSpec.fromJson(
      """{
        |  "metadata": {"name": "sh", "apiVersion": "v1.0", "createdOn": "2026-01-01T00:00:00Z"},
        |  "variables": [
        |    {"name": "x", "dataType": "int64",
        |     "dimensions": [{"name": "x", "size": 64}]},
        |    {"name": "v", "dataType": "float64",
        |     "dimensions": [{"name": "x", "size": 64}],
        |     "metadata": {"chunkGrid": {"name": "regular", "configuration":
        |       {"chunkShape": [8], "shardShape": [16]}}}}
        |  ]
        |}""".stripMargin), dir, version = 3)
    MdioWriter.writeVariable(spark,
      spark.range(64).select($"id".as("x"), $"id".cast("double").as("v")), dir, "v")
    val cur = MdioChunkStats.current(ZarrMeta.path(dir).resolve("v")).get
    assert(cur.size == 8, s"expected 8 inner-chunk entries, got ${cur.keySet}")
    assert(stripped(cur("6")) == Some(MdioChunkStats.Bounds(BigDecimal(48), BigDecimal(55))))
    assert(coveredChunks(dir, Array(GreaterThanOrEqual("v", 48.0))) == 2L)
    assert(spark.read.format("mdio").load(dir).filter($"v" >= 48.0).count() == 16L)
    // partial RMW through the shard path: inner chunk 0 refreshed, rest carried
    MdioWriter.writeVariable(spark,
      spark.range(8).select($"id".as("x"), ($"id" + 100.0).as("v")), dir, "v")
    val cur2 = MdioChunkStats.current(ZarrMeta.path(dir).resolve("v")).get
    assert(stripped(cur2("0")) == Some(MdioChunkStats.Bounds(BigDecimal(100), BigDecimal(107))))
    assert(stripped(cur2("5")) == Some(MdioChunkStats.Bounds(BigDecimal(40), BigDecimal(47))))
    assert(spark.read.format("mdio").load(dir).filter($"v" >= 100.0).count() == 8L)
    MdioWriter.delete(dir)
  }

  test("VAR/STDDEV over a value column answer from the exact moments") {
    // the statsV1 moments carry exact Σx AND Σx², so the variance family
    // pushes down as a metadata-only plan. v = x over 0..63: population
    // variance of 0..n-1 is (n²−1)/12 = 341.25, sample = n(n+1)/12 = 346.ĥ
    val dir = createFloat(_.toDouble)
    val df = spark.read.format("mdio").load(dir)
      .agg(var_pop($"v").as("vp"), var_samp($"v").as("vs"),
        stddev_pop($"v").as("sp"), stddev_samp($"v").as("ss"))
    val p = df.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(p.contains("MdioAggScan"), p.take(700))
    val r = df.head
    assert(r.getDouble(0) == (64.0 * 64.0 - 1) / 12.0, r.getDouble(0))
    assert(r.getDouble(1) == 64.0 * 65.0 / 12.0, r.getDouble(1))
    assert(r.getDouble(2) == math.sqrt((64.0 * 64.0 - 1) / 12.0))
    assert(r.getDouble(3) == math.sqrt(64.0 * 65.0 / 12.0))
    // per-slab grouped form: variance per 16-cell slab from metadata
    val g = spark.read.format("mdio").load(dir)
      .groupBy(floor($"x" / 16).as("slab"))
      .agg(var_pop($"v").as("vp"), stddev_pop($"v").as("sp"))
      .orderBy($"slab")
    val pg = g.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(pg.contains("MdioAggScan"), pg.take(700))
    val slabs = g.collect()
    assert(slabs.length == 4)
    // each 16-value slab is a shifted 0..15: same variance (16²−1)/12
    slabs.foreach(row => assert(row.getDouble(1) == (16.0 * 16.0 - 1) / 12.0, row))
    // the metadata answer equals the real scan's answer bit-for-bit here
    // (exact integers): force the scan by staling the sidecar
    MdioChunkStats.bump(ZarrMeta.path(dir).resolve("v"))
    val df2 = spark.read.format("mdio").load(dir)
      .agg(var_pop($"v"), var_samp($"v"), stddev_pop($"v"), stddev_samp($"v"))
    val p2 = df2.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(!p2.contains("MdioAggScan"), p2.take(700))
    val r2 = df2.head
    assert(r2.getDouble(0) == r.getDouble(0) && r2.getDouble(2) == r.getDouble(2))
    // NaN cells poison the variance exactly as in a real scan
    val dirN = createFloat(x => if (x == 10) Double.NaN else x.toDouble)
    val rN = spark.read.format("mdio").load(dirN).agg(var_pop($"v")).head
    assert(rN.getDouble(0).isNaN)
    MdioWriter.delete(dir); MdioWriter.delete(dirN)
  }

  test("sample variance at n==1 pushes down to the same NULL Spark computes") {
    // Spark's VarianceSamp/StddevSamp under the DEFAULT
    // spark.sql.legacy.statisticalAggregate=false answer NULL for a
    // single row (nullOnDivideByZero = !legacy); the metadata pushdown
    // must match the unpushed plan bit-for-bit, so this pins BOTH paths
    // on a 1-cell store. If a Spark upgrade flips the default to NaN,
    // this test fails on the plain-DataFrame leg first.
    assert(spark.conf.get("spark.sql.legacy.statisticalAggregate") == "false")
    val plain = Seq(3.0).toDF("v").agg(var_samp($"v"), stddev_samp($"v")).head
    assert(plain.isNullAt(0) && plain.isNullAt(1), plain.toString)
    val dir = Files.createTempDirectory("mdio_vstats").resolve("one.mdio").toString
    MdioWriter.create(MdioSpec.fromJson(
      """{
        |  "metadata": {"name": "one", "apiVersion": "v1.0", "createdOn": "2026-01-01T00:00:00Z"},
        |  "variables": [
        |    {"name": "x", "dataType": "int64",
        |     "dimensions": [{"name": "x", "size": 1}]},
        |    {"name": "v", "dataType": "float64",
        |     "dimensions": [{"name": "x", "size": 1}]}
        |  ]
        |}""".stripMargin), dir)
    MdioWriter.writeVariable(spark,
      Seq((0L, 3.0)).toDF("x", "v"), dir, "v")
    val df = spark.read.format("mdio").load(dir)
      .agg(var_samp($"v").as("vs"), stddev_samp($"v").as("ss"),
        var_pop($"v").as("vp"))
    val p = df.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(p.contains("MdioAggScan"), p.take(700)) // the pushdown DID fire
    val r = df.head
    assert(r.isNullAt(0) && r.isNullAt(1), r.toString) // matches Spark's NULL
    assert(r.getDouble(2) == 0.0) // population variance of one cell is 0
    MdioWriter.delete(dir)
  }

  test("countInRange reads only boundary chunks; metadata counts the interior") {
    import graft.operators.MdioStats
    // v = x over 64 cells / 8 chunks: [0,20] ⇒ chunks 0,1 fully inside
    // (32 cells from metadata), chunk 2 straddles (16..20 → 5 scanned),
    // chunks 3..7 proven outside
    val dir = createFloat(_.toDouble)
    val before = MdioScan.scanBuilds.get()
    val r = MdioStats.countInRange(spark, dir, "v", 0.0, 20.0)
    assert(r == MdioStats.CountInRange(21L, 2L, 5L, 1L, fallback = false), r)
    // the straddler count is ONE scan node (chunkKeys allowlist), not a
    // per-chunk union of dim-boxed subplans
    val built = MdioScan.scanBuilds.get() - before
    assert(built == 1L, s"straddler count planned $built scan nodes, want 1")
    // whole-domain range: zero chunks scanned, pure metadata
    val rAll = MdioStats.countInRange(spark, dir, "v", 0.0, 63.0)
    assert(rAll == MdioStats.CountInRange(64L, 8L, 0L, 0L, fallback = false), rAll)
    // a NaN cell is never counted AND never disturbs the metadata answer
    // (cnt counts finite cells): chunk 1 holds 7 finite cells
    val dirN = createFloat(x => if (x == 10) Double.NaN else x.toDouble)
    val rN = MdioStats.countInRange(spark, dirN, "v", 0.0, 20.0)
    assert(rN == MdioStats.CountInRange(20L, 2L, 5L, 1L, fallback = false), rN)
    // stale stats: exact answer via the fallback scan
    MdioChunkStats.bump(ZarrMeta.path(dir).resolve("v"))
    val rStale = MdioStats.countInRange(spark, dir, "v", 0.0, 20.0)
    assert(rStale.count == 21L && rStale.fallback, rStale)
    // straddler cap: cap 0 forces the fallback, same exact answer
    val rCap = MdioStats.countInRange(spark, dirN, "v", 0.0, 20.0, maxScanChunks = 0)
    assert(rCap.count == 20L && rCap.fallback, rCap)
    MdioWriter.delete(dir); MdioWriter.delete(dirN)
  }

  test("kthSmallest selects by boundary probing, never a global sort") {
    import graft.operators.MdioStats
    val dir = createFloat(_.toDouble) // v = x: k-th smallest is k-1
    val r = MdioStats.kthSmallest(spark, dir, "v", 21L)
    assert(r.value == 20.0 && !r.fallback, r)
    // the bracket is METADATA-ONLY on clean chunk boundaries: no x0
    // recount job, one window job reading exactly one chunk of the 8
    assert(r.jobs == 1 && r.scannedChunks == 1, r)
    assert(MdioStats.kthSmallest(spark, dir, "v", 1L).value == 0.0)
    assert(MdioStats.kthSmallest(spark, dir, "v", 32L).value == 31.0)
    assert(MdioStats.kthSmallest(spark, dir, "v", 64L).value == 63.0)
    // NaN cells never rank: dropping cell 10 shifts rank 21 to value 21
    val dirN = createFloat(x => if (x == 10) Double.NaN else x.toDouble)
    val rN = MdioStats.kthSmallest(spark, dirN, "v", 21L)
    assert(rN.value == 21.0 && !rN.fallback, rN)
    // stale stats: exact answer via the full-scan grouped-rank fallback
    MdioChunkStats.bump(ZarrMeta.path(dir).resolve("v"))
    val rStale = MdioStats.kthSmallest(spark, dir, "v", 21L)
    assert(rStale.value == 20.0 && rStale.fallback, rStale)
    MdioWriter.delete(dir); MdioWriter.delete(dirN)
  }

  test("kthSmallest plans ONE scan when every chunk interval overlaps") {
    import graft.operators.MdioStats
    // transposed layout: chunk i holds {8j+i, j=0..7} → interval
    // [i, 56+i]; all 8 intervals overlap — the zero-centered-amplitude
    // shape where a per-chunk union would carry one leg per chunk
    val dir = createFloat(x => ((x % 8) * 8 + x / 8).toDouble)
    val before = MdioScan.scanBuilds.get()
    val r = MdioStats.kthSmallest(spark, dir, "v", 5L)
    assert(r.value == 4.0 && !r.fallback && r.jobs == 1 && r.scannedChunks == 8, r)
    val built = MdioScan.scanBuilds.get() - before
    assert(built == 1L, s"window selection planned $built scan nodes, want 1")
    // a bracket whose lower edge straddles chunks adds only the capped
    // probe; the window selection stays one scan
    val r21 = MdioStats.kthSmallest(spark, dir, "v", 21L)
    assert(r21.value == 20.0 && !r21.fallback && r21.jobs == 2, r21)
    // over-cap probe: loud fallback, same exact answer
    val rCap = MdioStats.kthSmallest(spark, dir, "v", 21L, maxProbeChunks = 1)
    assert(rCap.value == 20.0 && rCap.fallback, rCap)
    MdioWriter.delete(dir)
  }

  test("countInRange answers whole shards from the manifest alone") {
    import graft.operators.MdioStats
    val dir = createFloat(_.toDouble) // v = x: 8 chunks of 8 cells
    val varDir = ZarrMeta.path(dir).resolve("v")
    val entries = MdioChunkStats.current(varDir).get
    // reshard to one chunk per shard: every shard's manifest summary is
    // exactly one chunk's triage — interior/outside shards must now be
    // decided WITHOUT opening their files
    MdioChunkStats.write(varDir, MdioChunkStats.generation(varDir), entries, span = 1)
    val before = MdioChunkStats.shardReadCount.get()
    val r = MdioStats.countInRange(spark, dir, "v", 0.0, 20.0)
    assert(r == MdioStats.CountInRange(21L, 2L, 5L, 1L, fallback = false), r)
    val opened = MdioChunkStats.shardReadCount.get() - before
    // shards 0-1 (unions inside [0,20]) count their manifest cells whole,
    // 3-7 (disjoint) prove zero — only boundary shard 2 opens: once for
    // the driver triage and once in the straddler scan's own pruning (the
    // chunkKeys lead clamp bounds the scan's sidecar read to the probe)
    assert(opened == 2, s"opened $opened shard files, want 2 (boundary shard only)")
    // whole-domain count: every shard answers from the manifest, zero opens
    val before2 = MdioChunkStats.shardReadCount.get()
    val rAll = MdioStats.countInRange(spark, dir, "v", 0.0, 63.0)
    assert(rAll == MdioStats.CountInRange(64L, 8L, 0L, 0L, fallback = false), rAll)
    assert(MdioChunkStats.shardReadCount.get() - before2 == 0,
      "whole-domain count must be manifest-only")
    MdioWriter.delete(dir)
  }

  test("kthSmallest ranks interior shards from the manifest, opens only the window") {
    import graft.operators.MdioStats
    val dir = createFloat(_.toDouble) // v = x: 8 chunks of 8 cells
    val varDir = ZarrMeta.path(dir).resolve("v")
    val entries = MdioChunkStats.current(varDir).get
    MdioChunkStats.write(varDir, MdioChunkStats.generation(varDir), entries, span = 1)
    val before = MdioChunkStats.shardReadCount.get()
    val r = MdioStats.kthSmallest(spark, dir, "v", 21L)
    assert(r.value == 20.0 && !r.fallback && r.jobs == 1 && r.scannedChunks == 1, r)
    val opened = MdioChunkStats.shardReadCount.get() - before
    // the coarse bracket over shard summaries alone lands on window
    // (15, 23]: shards 0-1 (below) and 3-7 (above) rank through their
    // manifest `cells` and never open; shard 2 opens once for chunk-level
    // refinement and once in the window scan's pruning
    assert(opened == 2, s"opened $opened shard files, want 2 (window shard only)")
    MdioWriter.delete(dir)
  }

  test("medianByLead: every slab's median from boundary-only scans") {
    import graft.operators.MdioStats
    val dir = createFloat(_.toDouble) // v = x: 8 chunks of 8 cells
    // slabs of 16 indices (2 chunks each, disjoint intervals): slab g's
    // lower median (k = 8 of 16) is 16g+7 — the FIRST chunk's last cell,
    // so only 4 of 8 chunks are window chunks and no probe fires
    val r = MdioStats.medianByLead(spark, dir, "v", 16L)
    assert(!r.fallback && r.jobs == 1 && r.scannedChunks == 4, r)
    // ALL slabs answered by ONE window scan's worth of I/O — never a
    // per-slab or per-chunk plan leg, and although the bucketed two-stage
    // pick references the scan subtree twice (bucket histogram + in-bucket
    // pick), exchange reuse must execute it ONCE: each of the 4 window
    // chunks opens exactly once
    val beforeReads = MdioColumnarReader.chunkReads.get()
    val rows = r.result.orderBy("slab").collect()
    assert(rows.map(x => (x.getLong(0), x.getDouble(1), x.getLong(2))).toSeq ==
      (0L to 3L).map(g => (g, 16.0 * g + 7, 16L)))
    assert(MdioColumnarReader.chunkReads.get() - beforeReads == 4L,
      "grouped median must read each window chunk once (reused exchange)")
    // the bounds join must stay BROADCAST: a sort-merge regression would
    // shuffle the window rows once for the join and again for the
    // cumulative window — at 100 TB that doubles the selection's exchange
    val plan = r.result.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && !plan.contains("SortMergeJoin"),
      s"bounds join regressed from broadcast:\n${plan.take(900)}")
    // NaN cells never rank: dropping cell 0 shifts slab 0's median to 8
    val dirN = createFloat(x => if (x == 0) Double.NaN else x.toDouble)
    val rN = MdioStats.medianByLead(spark, dirN, "v", 16L)
    val rowN = rN.result.orderBy("slab").collect().head
    assert((rowN.getLong(0), rowN.getDouble(1), rowN.getLong(2)) == (0L, 8.0, 15L))
    MdioWriter.delete(dir); MdioWriter.delete(dirN)
  }

  test("medianByLead: probe recounts straddlers, interior shards stay closed") {
    import graft.operators.MdioStats
    // slabs of 32 (4 chunks); within a slab: chunk 0 = i/2 ([0, 3.5] —
    // straddles the bracket edge x0 = 0), chunk 1 = 2+i ([2, 9]),
    // chunks 2-3 = 8+i ([8, 15]): k = 16 of 32 brackets (0, 9], so the
    // x0 recount must scan chunk 0 and the window takes all 4
    val dir = createFloat { x =>
      val i = x % 8
      (x / 8) % 4 match {
        case 0 => i * 0.5
        case 1 => 2.0 + i
        case _ => 8.0 + i
      }
    }
    val r = MdioStats.medianByLead(spark, dir, "v", 32L)
    assert(!r.fallback && r.jobs == 2 && r.scannedChunks == 10, r)
    assert(r.result.orderBy("slab").collect()
      .map(x => (x.getLong(0), x.getDouble(1), x.getLong(2))).toSeq ==
      Seq((0L, 8.0, 32L), (1L, 8.0, 32L)))
    // a probe past the cap falls back loudly — and stays exact
    val rCap = MdioStats.medianByLead(spark, dir, "v", 32L, maxProbeChunks = 1)
    assert(rCap.fallback, rCap)
    assert(rCap.result.orderBy("slab").collect()
      .map(x => (x.getLong(0), x.getDouble(1), x.getLong(2))).toSeq ==
      Seq((0L, 8.0, 32L), (1L, 8.0, 32L)))
    MdioWriter.delete(dir)
  }

  test("medianByLead: interior shards rank from the manifest, never open") {
    import graft.operators.MdioStats
    val dir = createFloat(_.toDouble) // v = x, disjoint chunk intervals
    val varDir = ZarrMeta.path(dir).resolve("v")
    val entries = MdioChunkStats.current(varDir).get
    MdioChunkStats.write(varDir, MdioChunkStats.generation(varDir), entries, span = 1)
    val before = MdioChunkStats.shardReadCount.get()
    val r = MdioStats.medianByLead(spark, dir, "v", 16L)
    // driver triage: each slab's bracket lands on its FIRST chunk's shard
    // (window (−∞, 16g+7]) — only those 4 shards open for refinement; the
    // second shard of every slab ranks through its manifest cells
    val opened = MdioChunkStats.shardReadCount.get() - before
    assert(opened == 4, s"opened $opened shard files at triage, want 4")
    assert(!r.fallback && r.jobs == 1 && r.scannedChunks == 4, r)
    assert(r.result.orderBy("slab").collect()
      .map(x => (x.getLong(0), x.getDouble(1), x.getLong(2))).toSeq ==
      (0L to 3L).map(g => (g, 16.0 * g + 7, 16L)))
    MdioWriter.delete(dir)
  }

  test("quantilesOf: one probe + one union-window scan answers the vector") {
    import graft.operators.MdioStats
    val dir = createFloat(_.toDouble) // v = x: k-th smallest is k-1
    // disjoint chunk intervals: every bracket edge lands ON a chunk
    // boundary (no straddlers — zero probe jobs) and each rank's window
    // is one chunk: three exact quantiles from ONE 3-chunk scan
    val r = MdioStats.quantilesOf(spark, dir, "v", Seq(0.25, 0.5, 1.0))
    assert(r == MdioStats.Quantiles(Seq(15.0, 31.0, 63.0), Seq(16L, 32L, 64L),
      64L, 1, 3L, fallback = false), r)
    // transposed layout (chunk i holds {8j+i}): every interval overlaps,
    // edges {2, 6} straddle 7 distinct chunks — ONE probe scan recounts
    // both edges, ONE window scan answers all three ranks (2 scan builds
    // total; the multi-rank selection adds two cached-frame jobs, never
    // per-rank actions)
    val dirT = createFloat(x => ((x % 8) * 8 + x / 8).toDouble)
    val before = MdioScan.scanBuilds.get()
    val rT = MdioStats.quantilesOf(spark, dirT, "v", Seq(0.1, 0.5, 0.9))
    assert(rT == MdioStats.Quantiles(Seq(6.0, 31.0, 57.0), Seq(7L, 32L, 58L),
      64L, 2, 15L, fallback = false), rT)
    assert(MdioScan.scanBuilds.get() - before == 2L,
      "quantile vector must plan one probe + one window scan")
    // over-cap probe and stale stats: loud fallback, same exact answers
    val rCap = MdioStats.quantilesOf(spark, dirT, "v", Seq(0.1, 0.5, 0.9),
      maxProbeChunks = 3)
    assert(rCap.fallback && rCap.values == Seq(6.0, 31.0, 57.0), rCap)
    MdioChunkStats.bump(ZarrMeta.path(dir).resolve("v"))
    val rStale = MdioStats.quantilesOf(spark, dir, "v", Seq(0.25, 0.5, 1.0))
    assert(rStale.fallback && rStale.values == Seq(15.0, 31.0, 63.0), rStale)
    MdioWriter.delete(dir); MdioWriter.delete(dirT)
  }

  test("extremaLocation: only chunks that can WIN are scanned") {
    import graft.operators.MdioStats
    val dir = createFloat(_.toDouble) // min 0 in chunk 0, max 63 in chunk 7
    val r = MdioStats.extremaLocation(spark, dir, "v")
    assert(!r.fallback && r.scannedChunks == 2, r)
    assert(r.result.collect().head.toSeq == Seq(0.0, 0L, 63.0, 63L))
    // ties: every chunk is a candidate, the FIRST dim tuple wins both
    val dirC = createFloat(_ => 42.0)
    val rC = MdioStats.extremaLocation(spark, dirC, "v")
    assert(!rC.fallback && rC.scannedChunks == 8, rC)
    assert(rC.result.collect().head.toSeq == Seq(42.0, 0L, 42.0, 0L))
    // NaN never wins: dropping cell 63 moves the peak to 62, same chunk
    val dirN = createFloat(x => if (x == 63) Double.NaN else x.toDouble)
    val rN = MdioStats.extremaLocation(spark, dirN, "v")
    assert(!rN.fallback && rN.scannedChunks == 2, rN)
    assert(rN.result.collect().head.toSeq == Seq(0.0, 0L, 62.0, 62L))
    // an all-NaN variable has no finite extremum: zero rows, zero chunks,
    // proven from metadata
    val dirA = createFloat(_ => Double.NaN)
    val rA = MdioStats.extremaLocation(spark, dirA, "v")
    assert(!rA.fallback && rA.scannedChunks == 0 && rA.result.count() == 0, rA)
    assert(rA.result.columns.toSeq ==
      Seq("v_min", "min_x", "v_max", "max_x"))
    // stale stats: full-scan fallback, same deterministic answer
    MdioChunkStats.bump(ZarrMeta.path(dir).resolve("v"))
    val rS = MdioStats.extremaLocation(spark, dir, "v")
    assert(rS.fallback, rS)
    assert(rS.result.collect().head.toSeq == Seq(0.0, 0L, 63.0, 63L))
    Seq(dir, dirC, dirN, dirA).foreach(MdioWriter.delete)
  }

  test("histogramMeta: bin-aligned chunks never scan; straddlers scan once") {
    import graft.operators.MdioStats
    val dir = createFloat(_.toDouble) // v = x: chunk c holds [8c, 8c+7]
    // bins == chunks: EVERY bin answers from metadata, zero chunks read
    val r = MdioStats.histogramMeta(spark, dir, "v", 0.0, 8.0, 8)
    assert(!r.fallback && r.metadataChunks == 8 && r.scannedChunks == 0, r)
    assert(r.result.collect().map(x => (x.getLong(0), x.getDouble(1), x.getLong(2))).toSeq ==
      (0L to 7L).map(b => (b, 8.0 * b + 4.0, 8L)))
    // shifted bins: chunk 0 clips whole into bin 0, chunks 1-7 straddle
    val rS = MdioStats.histogramMeta(spark, dir, "v", 4.0, 8.0, 8)
    assert(!rS.fallback && rS.metadataChunks == 1 && rS.scannedChunks == 7, rS)
    assert(rS.result.collect().map(x => (x.getLong(0), x.getLong(2))).toSeq ==
      ((0L, 12L) +: (1L to 6L).map((_, 8L))) :+ (7L, 4L))
    // straddler cap and stale stats: loud full-scan fallback, same counts
    val rCap = MdioStats.histogramMeta(spark, dir, "v", 4.0, 8.0, 8, maxScanChunks = 3)
    assert(rCap.fallback, rCap)
    assert(rCap.result.collect().map(x => (x.getLong(0), x.getLong(2))).toSeq ==
      ((0L, 12L) +: (1L to 6L).map((_, 8L))) :+ (7L, 4L))
    // NaN cells never count (and never spoil the metadata answer for the
    // chunk's finite cells)
    val dirN = createFloat(x => if (x == 3) Double.NaN else x.toDouble)
    val rN = MdioStats.histogramMeta(spark, dirN, "v", 0.0, 8.0, 8)
    assert(!rN.fallback && rN.scannedChunks == 0, rN)
    assert(rN.result.collect().map(x => (x.getLong(0), x.getLong(2))).toSeq ==
      ((0L, 7L) +: (1L to 7L).map((_, 8L))))
    // whole shards bin from the manifest alone
    val varDir = ZarrMeta.path(dir).resolve("v")
    MdioChunkStats.write(varDir, MdioChunkStats.generation(varDir),
      MdioChunkStats.current(varDir).get, span = 1)
    val before = MdioChunkStats.shardReadCount.get()
    val rM = MdioStats.histogramMeta(spark, dir, "v", 0.0, 8.0, 8)
    assert(!rM.fallback && rM.scannedChunks == 0, rM)
    assert(MdioChunkStats.shardReadCount.get() - before == 0,
      "bin-aligned shards must bin from the manifest without opening")
    MdioChunkStats.bump(varDir)
    val rStale = MdioStats.histogramMeta(spark, dir, "v", 0.0, 8.0, 8)
    assert(rStale.fallback, rStale)
    assert(rStale.result.collect().map(x => (x.getLong(0), x.getLong(2))).toSeq ==
      (0L to 7L).map((_, 8L)))
    MdioWriter.delete(dir); MdioWriter.delete(dirN)
  }

  test("extremaLocation: u64 equality stays decimal-exact past 2^63") {
    import graft.operators.MdioStats
    val dir = Files.createTempDirectory("mdio_vstats").resolve("ux.mdio").toString
    MdioWriter.create(MdioSpec.fromJson(
      """{
        |  "metadata": {"name": "ux", "apiVersion": "v1.0", "createdOn": "2026-01-01T00:00:00Z"},
        |  "variables": [
        |    {"name": "x", "dataType": "int64",
        |     "dimensions": [{"name": "x", "size": 64}]},
        |    {"name": "u", "dataType": "uint64",
        |     "dimensions": [{"name": "x", "size": 64}],
        |     "metadata": {"chunkGrid": {"name": "regular", "configuration": {"chunkShape": [8]}}}}
        |  ]
        |}""".stripMargin), dir)
    val twoTo63 = BigDecimal("9223372036854775808")
    MdioWriter.writeVariable(spark,
      spark.range(64).select($"id".as("x"),
        ($"id".cast("decimal(21,0)") + lit(twoTo63)).cast("decimal(20,0)").as("u")),
      dir, "u")
    val r = MdioStats.extremaLocation(spark, dir, "u")
    // every cell rounds to the SAME double, so a double-routed equality
    // would match the whole store and report max at x=0; the native
    // decimal literal must land both locations exactly
    val row = r.result.collect().head
    assert(!r.fallback && r.scannedChunks == 2, r)
    assert((row.getLong(1), row.getLong(3)) == (0L, 63L), row)
    MdioWriter.delete(dir)
  }

  test("countInRangeByBox: per-slab occupancy from boundary-only scans") {
    import graft.operators.MdioStats
    val dir = createFloat(_.toDouble) // v = x, chunk c = [8c, 8c+7]
    def rows(r: MdioStats.GroupedCount) = r.result.orderBy("g_x").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSeq
    // slabs of 16 (2 chunks), range [4, 19]: chunks 0 and 2 straddle the
    // edges (one scan), chunk 1 counts whole from metadata, chunks 3-7
    // prove zero — and the zero slabs still report with their n
    val r = MdioStats.countInRangeByBox(spark, dir, "v", 4.0, 19.0, Seq(16L))
    assert(!r.fallback && r.metadataChunks == 1 && r.outsideChunks == 5 &&
      r.scannedChunks == 2, r)
    assert(rows(r) == Seq((0L, 12L, 16L), (1L, 4L, 16L), (2L, 0L, 16L), (3L, 0L, 16L)))
    // whole shards decide from the manifest: only the two straddling
    // shards open at triage
    val varDir = ZarrMeta.path(dir).resolve("v")
    MdioChunkStats.write(varDir, MdioChunkStats.generation(varDir),
      MdioChunkStats.current(varDir).get, span = 1)
    val before = MdioChunkStats.shardReadCount.get()
    val r2 = MdioStats.countInRangeByBox(spark, dir, "v", 4.0, 19.0, Seq(16L))
    assert(rows(r2) == rows(r) && r2.scannedChunks == 2, r2)
    // 2 triage opens (straddling shards 0 and 2) + the straddler scan's
    // own clamped sidecar read over its lead range [0, 2] (3 shards)
    assert(MdioChunkStats.shardReadCount.get() - before <= 5,
      "interior shards must decide from the manifest")
    // misaligned groups and stale stats: loud fallback, same rows
    val rMis = MdioStats.countInRangeByBox(spark, dir, "v", 4.0, 19.0, Seq(12L))
    assert(rMis.fallback, rMis)
    assert(rMis.result.orderBy("g_x").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSeq ==
      Seq((0L, 8L, 12L), (1L, 8L, 12L), (2L, 0L, 12L), (3L, 0L, 12L), (4L, 0L, 12L), (5L, 0L, 4L)))
    MdioChunkStats.bump(varDir)
    val rStale = MdioStats.countInRangeByBox(spark, dir, "v", 4.0, 19.0, Seq(16L))
    assert(rStale.fallback && rows(rStale) == rows(r), rStale)
    MdioWriter.delete(dir)
  }

  test("rank-QC edges compare exactly past 2^53 (int64 never rounds through double)") {
    import graft.operators.MdioStats
    // odd int64 values past 2^53: every value is UNrepresentable as a
    // double (rounds to the even neighbor), so any double-promoted edge
    // comparison misclassifies values within half an ulp of an edge
    val dir = Files.createTempDirectory("mdio_vstats").resolve("i.mdio").toString
    MdioWriter.create(MdioSpec.fromJson(
      """{
        |  "metadata": {"name": "i", "apiVersion": "v1.0", "createdOn": "2026-01-01T00:00:00Z"},
        |  "variables": [
        |    {"name": "x", "dataType": "int64",
        |     "dimensions": [{"name": "x", "size": 64}]},
        |    {"name": "v", "dataType": "int64",
        |     "dimensions": [{"name": "x", "size": 64}],
        |     "metadata": {"chunkGrid": {"name": "regular", "configuration": {"chunkShape": [8]}}}}
        |  ]
        |}""".stripMargin), dir)
    val two53 = 9007199254740992L // 2^53
    MdioWriter.writeVariable(spark,
      spark.range(64).select($"id".as("x"),
        (lit(two53) + $"id" * 2 + 1).as("v")), dir, "v")
    // [2^53, 2^53+40]: chunk 2 ([+33, +47]) straddles hi and must count
    // EXACTLY {+33,+35,+37,+39} = 4 — the double route counts +41 too
    // (it rounds to +40) and answers 21
    val r = MdioStats.countInRange(spark, dir, "v",
      two53.toDouble, (two53 + 40).toDouble)
    assert(r == MdioStats.CountInRange(20L, 2L, 5L, 1L, fallback = false), r)
    // the rank bracket's window edges take the same exact path
    val k = MdioStats.kthSmallest(spark, dir, "v", 20L)
    assert(!k.fallback && k.value == (two53 + 39).toDouble, k)
    MdioWriter.delete(dir)
  }

  test("quantilesOf on a variable with no finite cells fails loudly, both paths") {
    import graft.operators.MdioStats
    val dir = createFloat(_ => Double.NaN)
    val e1 = intercept[IllegalArgumentException] {
      MdioStats.quantilesOf(spark, dir, "v", Seq(0.5))
    }
    assert(e1.getMessage.contains("no finite cells"), e1.getMessage)
    MdioChunkStats.bump(ZarrMeta.path(dir).resolve("v"))
    val e2 = intercept[IllegalArgumentException] {
      MdioStats.quantilesOf(spark, dir, "v", Seq(0.5))
    }
    assert(e2.getMessage.contains("no finite cells"), e2.getMessage)
    MdioWriter.delete(dir)
  }

  test("medianByBox: per-tile medians over 2-D chunk-aligned boxes") {
    import graft.operators.MdioStats
    // 16x8 store, 4x4 chunks (4x2 grid); v = inline. Tiles of 8x4 = 2x1
    // chunks: tile (ti, tj) holds inlines 8ti..8ti+7 x 4 crosslines — its
    // lower median (k = 16 of 32) is 8ti+3, the FIRST chunk's last inline,
    // so only the 4 first-chunks are window chunks and no probe fires
    val dir = Files.createTempDirectory("mdio_vstats").resolve("t.mdio").toString
    MdioWriter.create(MdioSpec.fromJson(
      """{
        |  "metadata": {"name": "t", "apiVersion": "v1.0", "createdOn": "2026-01-01T00:00:00Z"},
        |  "variables": [
        |    {"name": "inline", "dataType": "int64",
        |     "dimensions": [{"name": "inline", "size": 16}]},
        |    {"name": "crossline", "dataType": "int64",
        |     "dimensions": [{"name": "crossline", "size": 8}]},
        |    {"name": "v", "dataType": "float64",
        |     "dimensions": [{"name": "inline", "size": 16}, {"name": "crossline", "size": 8}],
        |     "metadata": {"chunkGrid": {"name": "regular", "configuration": {"chunkShape": [4, 4]}}}}
        |  ]
        |}""".stripMargin), dir)
    MdioWriter.writeVariable(spark,
      spark.range(16).select($"id".as("inline"))
        .crossJoin(spark.range(8).select($"id".as("crossline")))
        .select($"inline", $"crossline", $"inline".cast("double").as("v")),
      dir, "v")
    val r = MdioStats.medianByBox(spark, dir, "v", Seq(8L, 4L))
    assert(!r.fallback && r.jobs == 1 && r.scannedChunks == 4, r)
    assert(r.result.orderBy("g_inline", "g_crossline").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getDouble(2), x.getLong(3))).toSeq ==
      (for (ti <- 0L to 1L; tj <- 0L to 1L) yield (ti, tj, 8.0 * ti + 3, 32L)))
    // single-chunk tiles (the stddev_by_tile geometry): the window IS the
    // tile — every chunk scans, still one scan job, exact per-tile medians
    val rT = MdioStats.medianByBox(spark, dir, "v", Seq(4L, 4L))
    assert(!rT.fallback && rT.jobs == 1 && rT.scannedChunks == 8, rT)
    assert(rT.result.orderBy("g_inline", "g_crossline").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getDouble(2), x.getLong(3))).toSeq ==
      (for (ti <- 0L to 3L; tj <- 0L to 1L) yield (ti, tj, 4.0 * ti + 1, 16L)))
    MdioWriter.delete(dir)
  }

  test("grouped pick is bucket-bounded on an all-overlap store (no whole-group sort)") {
    import graft.operators.MdioStats
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    // chunk c holds {-28 + 8j + c}: every chunk interval overlaps every
    // other — the degenerate zero-centered-amplitude case where the
    // bracket window cannot prune. The r16 plan sorted each slab's ENTIRE
    // distinct-value set (16 values here; ~10⁹ per depth slab at the
    // 100 TB envelope) in ONE window partition; the bucketed two-stage
    // pick must feed the final order-by-value window only the chosen
    // buckets' rows.
    val dir = createFloat(x => (-28 + (x % 8) * 8 + x / 8).toDouble)
    val r = MdioStats.medianByLead(spark, dir, "v", 16L)
    assert(!r.fallback && r.jobs == 1, r)
    val df = r.result
    val beforeReads = MdioColumnarReader.chunkReads.get()
    val rows = df.collect()
    // every slab's window is ALL its chunks here; each still reads ONCE —
    // the two plan paths over the shared scan aggregation must reuse its
    // exchange, not re-scan
    assert(MdioColumnarReader.chunkReads.get() - beforeReads == 8L,
      "all-overlap store: each window chunk must be read exactly once")
    val vals = (0 until 64).map(x => (-28 + (x % 8) * 8 + x / 8).toDouble)
    val want = (0 until 4).map { g =>
      val cells = vals.slice(16 * g, 16 * (g + 1)).sorted
      (g.toLong, cells((cells.size + 1) / 2 - 1), cells.size.toLong)
    }
    assert(rows.map(x => (x.getLong(0), x.getDouble(1), x.getLong(2)))
      .toSeq.sortBy(_._1) == want)
    // partition-input pin: the join feeding the final pick window passes
    // only the chosen-bucket rows — ~one value per slab at this bucket
    // width, never the slab's 16-value distinct set (64 rows unbucketed)
    def expand(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => expand(a.executedPlan)
      case q: QueryStageExec => p +: expand(q.plan)
      case _ => p +: p.children.flatMap(expand)
    }
    val nodes = expand(df.queryExecution.executedPlan)
    val pickJoin = nodes.collectFirst {
      case j: BroadcastHashJoinExec if j.leftKeys.exists(_.toString.contains("_bkt")) => j
    }.getOrElse(fail("no bucket-pick join in the executed plan"))
    val fed = pickJoin.metrics("numOutputRows").value
    assert(fed >= 4 && fed <= 8,
      s"pick window fed $fed rows — bucket bounding regressed")
    MdioWriter.delete(dir)
  }

  test("medianByLead: misaligned groups and stale stats fall back, stay exact") {
    import graft.operators.MdioStats
    val dir = createFloat(_.toDouble)
    def expect(lead: Long) = (0L until (64L + lead - 1) / lead).map { g =>
      val cells = (g * lead until math.min((g + 1) * lead, 64L)).map(_.toDouble)
      (g, cells.sorted.apply(((cells.size + 1) / 2 - 1).toInt), cells.size.toLong)
    }
    // 12 does not divide into 8-cell chunks: loud fallback, exact answers
    // (including the ragged 4-cell tail slab)
    val rMis = MdioStats.medianByLead(spark, dir, "v", 12L)
    assert(rMis.fallback, rMis)
    assert(rMis.result.orderBy("slab").collect()
      .map(x => (x.getLong(0), x.getDouble(1), x.getLong(2))).toSeq == expect(12L))
    // stale sidecar: same fallback contract as kthSmallest
    MdioChunkStats.bump(ZarrMeta.path(dir).resolve("v"))
    val rStale = MdioStats.medianByLead(spark, dir, "v", 16L)
    assert(rStale.fallback, rStale)
    assert(rStale.result.orderBy("slab").collect()
      .map(x => (x.getLong(0), x.getDouble(1), x.getLong(2))).toSeq == expect(16L))
    MdioWriter.delete(dir)
  }

  test("chunkKeys allowlist: exact chunk subset, one scan, no grid-agg answers") {
    val dir = createFloat(_.toDouble)
    val df = spark.read.format("mdio").option("chunkKeys", "2,5").load(dir)
    // exactly chunks 2 and 5 (cells 16..23 and 40..47)
    assert(df.count() == 16L)
    assert(df.agg(sum($"v".cast("long"))).head.getLong(0) ==
      ((16L to 23L) ++ (40L to 47L)).sum)
    // grid-metadata aggregates cover the whole clamped box, so the
    // allowlist must refuse the pushdown — the count above came from rows
    val p = df.groupBy().count().queryExecution
      .explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(!p.contains("MdioAggScan"), p.take(700))
    assert(p.contains("chunkKeys=2"), p.take(700))
    // dim predicates still clamp conjunctively; out-of-grid keys skip
    assert(df.filter($"x" >= 20).count() == 12L)
    assert(spark.read.format("mdio").option("chunkKeys", "5,99").load(dir)
      .count() == 8L)
    MdioWriter.delete(dir)
  }

  test("rank selection is Long end-to-end: ranks past 2^31 never truncate") {
    import graft.operators.MdioStats
    // pure bucket arithmetic at k ≈ 4e9 (a median at the 100 TB envelope
    // is k ≈ 10^12 — far past Int)
    assert(MdioStats.bucketForRank(
      Seq((0L, 3000000000L), (1L, 2000000000L)), 4000000000L) ==
      (1L, 3000000000L))
    assert(MdioStats.bucketForRank(Seq((7L, 5L)), 5L) == (7L, 0L))
    intercept[IllegalArgumentException] {
      MdioStats.bucketForRank(Seq((0L, 10L)), 11L)
    }
    // the full selection plan at a >2^31 rank over grouped counts: value
    // 2.0 holds ranks (3e9, 5e9] — offset((rank-1).toInt) would wrap
    val byV = Seq((1.0, 3000000000L), (2.0, 2000000000L)).toDF("v", "c")
    assert(MdioStats.selectByRank(byV, 4000000000L, 1.0, 2.0) == 2.0)
    assert(MdioStats.selectByRank(byV, 3000000000L, 1.0, 2.0) == 1.0)
    assert(MdioStats.selectByRank(byV, 1L, 1.0, 2.0) == 1.0)
  }

  test("MIN/MAX over a value column answers from metadata with full coverage") {
    val dir = createFloat(_.toDouble)
    val df = spark.read.format("mdio").load(dir)
      .agg(min($"v").as("mn"), max($"v").as("mx"), count(lit(1)).as("n"))
    val p = df.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(p.contains("MdioAggScan"), p.take(700))
    val r = df.head
    assert(r.getDouble(0) == 0.0 && r.getDouble(1) == 63.0 && r.getLong(2) == 64L)
    // NaN semantics: any NaN cell makes MAX NaN, MIN stays the finite min
    val dirN = createFloat(x => if (x == 10) Double.NaN else x.toDouble)
    val rN = spark.read.format("mdio").load(dirN)
      .agg(min($"v"), max($"v")).head
    assert(rN.getDouble(0) == 0.0 && rN.getDouble(1).isNaN)
    // stale stats → no metadata answer, real scan still correct
    MdioChunkStats.bump(ZarrMeta.path(dir).resolve("v"))
    val df2 = spark.read.format("mdio").load(dir).agg(min($"v"), max($"v"))
    val p2 = df2.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(!p2.contains("MdioAggScan"), p2.take(700))
    val r2 = df2.head
    assert(r2.getDouble(0) == 0.0 && r2.getDouble(1) == 63.0)
    // CHUNK-ALIGNED dim slices answer from metadata too (the subvolume
    // amplitude-range path): x >= 16 covers chunks 2..7 exactly — and
    // excludes the NaN chunk, so MAX is the finite 63
    val df3 = spark.read.format("mdio").load(dirN).filter($"x" >= 16)
      .agg(min($"v"), max($"v"))
    val p3 = df3.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(p3.contains("MdioAggScan"), p3.take(700))
    val r3 = df3.head
    assert(r3.getDouble(0) == 16.0 && r3.getDouble(1) == 63.0)
    // a MISALIGNED slice falls back (an entry bounds its whole chunk)
    val df3b = spark.read.format("mdio").load(dirN).filter($"x" >= 5).agg(max($"v"))
    val p3b = df3b.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(!p3b.contains("MdioAggScan"), p3b.take(700))
    // partial coverage (an entry dropped at the current generation) falls back
    val varDir = ZarrMeta.path(dirN).resolve("v")
    val g = MdioChunkStats.generation(varDir)
    val entries = MdioChunkStats.current(varDir).get
    MdioChunkStats.write(varDir, g, entries - "3")
    val df4 = spark.read.format("mdio").load(dirN).agg(max($"v"))
    val p4 = df4.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(!p4.contains("MdioAggScan"), p4.take(700))
    assert(df4.head.getDouble(0).isNaN)
    MdioWriter.delete(dir); MdioWriter.delete(dirN)
  }

  test("integral stats stay exact past 2^53") {
    val dir = Files.createTempDirectory("mdio_vstats").resolve("i.mdio").toString
    MdioWriter.create(MdioSpec.fromJson(
      """{
        |  "metadata": {"name": "i", "apiVersion": "v1.0", "createdOn": "2026-01-01T00:00:00Z"},
        |  "variables": [
        |    {"name": "x", "dataType": "int64",
        |     "dimensions": [{"name": "x", "size": 64}]},
        |    {"name": "w", "dataType": "int64",
        |     "dimensions": [{"name": "x", "size": 64}],
        |     "metadata": {"chunkGrid": {"name": "regular", "configuration": {"chunkShape": [8]}}}}
        |  ]
        |}""".stripMargin), dir)
    val base = 1L << 60
    MdioWriter.writeVariable(spark,
      spark.range(64).select($"id".as("x"), ($"id" + base).as("w")), dir, "w")
    val cur = MdioChunkStats.current(ZarrMeta.path(dir).resolve("w")).get
    assert(stripped(cur("0")) == Some(MdioChunkStats.Bounds(BigDecimal(base), BigDecimal(base + 7))))
    assert(coveredChunks(dir, Array(GreaterThanOrEqual("w", base + 32L))) == 4L)
    assert(planned(dir, Array(GreaterThanOrEqual("w", base + 48L))) == 1)
    assert(spark.read.format("mdio").load(dir).filter($"w" >= base + 48L).count() == 16L)
    MdioWriter.delete(dir)
  }

  test("ORDER BY value LIMIT k plans only chunks that can reach the k-th extremum") {
    val dir = createFloat(_.toDouble)
    def scanPartitions(d: org.apache.spark.sql.DataFrame): Int =
      d.queryExecution.executedPlan.collectLeaves().collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
          b.inputPartitions.size
      }.sum
    val df = spark.read.format("mdio").load(dir)
    // DESC top-4: chunk 7 guarantees 8 cells >= 56, so M=56 and only
    // chunk 7 (max 63 >= 56) survives
    val desc = df.orderBy($"v".desc).limit(4)
    assert(scanPartitions(desc) == 1, s"desc planned ${scanPartitions(desc)}")
    assert(desc.select($"x").as[Long].collect().sorted.toSeq == Seq(60L, 61L, 62L, 63L))
    // ASC top-12: chunks 0,1 guarantee 16 cells <= 15; M = the 12th
    // smallest guaranteed upper = 15, chunks with min <= 15 survive (0,1)
    val asc = df.orderBy($"v", $"x".desc).limit(12) // trailing key: Spark's re-sort
    assert(scanPartitions(asc) == 1, s"asc planned ${scanPartitions(asc)}") // run [0,2) coalesces
    assert(asc.select($"x").as[Long].collect().sorted.toSeq == (0L to 11L))
    // stale stats: no pruning, same answers
    MdioChunkStats.bump(ZarrMeta.path(dir).resolve("v"))
    val desc2 = df.orderBy($"v".desc).limit(4)
    assert(scanPartitions(desc2) == 4, s"stale planned ${scanPartitions(desc2)}")
    assert(desc2.select($"x").as[Long].collect().sorted.toSeq == Seq(60L, 61L, 62L, 63L))
    MdioWriter.delete(dir)
    // NaN ranks FIRST under DESC: the all-NaN chunk must stay planned
    val dirN = createFloat(x => if (x >= 24 && x < 32) Double.NaN else x.toDouble)
    val dfN = spark.read.format("mdio").load(dirN)
    val descN = dfN.orderBy($"v".desc).limit(4)
    val topVals = descN.select($"v").as[Double].collect()
    assert(topVals.count(_.isNaN) == 4, s"NaN must rank first desc, got ${topVals.toSeq}")
    MdioWriter.delete(dirN)
  }

  test("ExactSum is the exact real-number sum regardless of order") {
    // pathological cancellation: a plain double loop gets these wrong
    val vals = Array(1e300, 1.0, -1e300, 1e-300, 0.1, -0.1, 1e16, 1.0, -1e16)
    def truth(vs: Seq[Double]): BigDecimal =
      MdioChunkStats.exactTotal(vs.map(MdioChunkStats.exactBD))
    val rnd = new scala.util.Random(7)
    (0 until 5).foreach { _ =>
      val shuffled = rnd.shuffle(vals.toSeq)
      val es = new MdioChunkStats.ExactSum
      shuffled.foreach(es.add)
      assert(es.toBigDecimal == truth(vals.toSeq))
    }
    // exact squares via FMA two-product: v*v alone would round
    val sq = new MdioChunkStats.ExactSum
    val xs = Seq(0.1, 1e8 + 0.5, 3.0, 1e-100)
    xs.foreach(sq.addSquare)
    // NB: scala BigDecimal's own *, + and pow round to MathContext — the
    // ground truth must stay in java.math.BigDecimal (exact) arithmetic
    val sqTruth = MdioChunkStats.exactTotal(xs.map { v =>
      val e = MdioChunkStats.exactBD(v).underlying
      BigDecimal(e.multiply(e))
    })
    assert(sq.toBigDecimal == sqTruth)
  }

  test("writeVariable publishes exact statsV1 moments per chunk") {
    val dir = createFloat(_.toDouble)
    val cur = MdioChunkStats.current(ZarrMeta.path(dir).resolve("v")).get
    val m0 = cur("0").get.moments.get
    assert(m0 == MdioChunkStats.Moments(8L, BigDecimal(28), Some(BigDecimal(140))))
    val m7 = cur("7").get.moments.get
    assert(m7.cnt == 8L && m7.sum == BigDecimal((56 to 63).sum) &&
      m7.sumSq == Some(BigDecimal((56 to 63).map(k => k * k).sum)))
    MdioWriter.delete(dir)
    // moments cover FINITE cells only; NaN presence stays flagged
    val dirN = createFloat(x => if (x == 1) Double.NaN else x.toDouble)
    val curN = MdioChunkStats.current(ZarrMeta.path(dirN).resolve("v")).get
    val mN = curN("0").get
    assert(mN.hasNaN && mN.moments.get == MdioChunkStats.Moments(7L,
      BigDecimal(Seq(0, 2, 3, 4, 5, 6, 7).sum), Some(BigDecimal(Seq(0, 2, 3, 4, 5, 6, 7).map(k => k * k).sum))))
    MdioWriter.delete(dirN)
    // a ±Inf cell drops the whole entry (bounds AND moments)
    val dirI = createFloat(x => if (x == 2) Double.PositiveInfinity else x.toDouble)
    val curI = MdioChunkStats.current(ZarrMeta.path(dirI).resolve("v")).get
    assert(!curI.contains("0") && curI.contains("1"))
    MdioWriter.delete(dirI)
  }

  test("SUM over a value column answers from metadata with full coverage") {
    val dir = createFloat(_.toDouble)
    def fmt(d: org.apache.spark.sql.DataFrame): String =
      d.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    val df = spark.read.format("mdio").load(dir)
      .agg(sum($"v").as("total"), count($"v").as("n"), sum($"x").as("sx"))
    assert(fmt(df).contains("vsum(v)") && fmt(df).contains("dsum(x)"), fmt(df).take(800))
    val r = df.head
    assert(r.getDouble(0) == (0 to 63).sum.toDouble)
    assert(r.getLong(1) == 64L && r.getLong(2) == (0L to 63L).sum)
    // chunk-aligned slice: the metadata answer covers exactly the slice
    val dfs = spark.read.format("mdio").load(dir).filter($"x" >= 16).agg(sum($"v"))
    assert(fmt(dfs).contains("MdioAggScan"), fmt(dfs).take(800))
    assert(dfs.head.getDouble(0) == (16 to 63).sum.toDouble)
    // misaligned slice falls back to a real scan, same answer
    val dfm = spark.read.format("mdio").load(dir).filter($"x" >= 5).agg(sum($"v"))
    assert(!fmt(dfm).contains("MdioAggScan"), fmt(dfm).take(800))
    assert(dfm.head.getDouble(0) == (5 to 63).sum.toDouble)
    // AVG rides the same moments: exact sum / dense cell count, one
    // double division — including on chunk-aligned slices
    val dfa = spark.read.format("mdio").load(dir)
      .agg(avg($"v").as("am"), avg($"x").as("ax"))
    assert(!fmt(dfa).contains("vavg"), "AVG over a dim column must not claim the stats path")
    val dfa2 = spark.read.format("mdio").load(dir).filter($"x" >= 16).agg(avg($"v"))
    assert(fmt(dfa2).contains("vavg(v)"), fmt(dfa2).take(800))
    assert(dfa2.head.getDouble(0) == (16 to 63).sum.toDouble / 48.0)
    // NaN cells poison the metadata sum exactly like a scan's
    val dirN = createFloat(x => if (x == 10) Double.NaN else x.toDouble)
    val dfn = spark.read.format("mdio").load(dirN).agg(sum($"v"), avg($"v"))
    assert(fmt(dfn).contains("vsum(v)") && fmt(dfn).contains("vavg(v)"), fmt(dfn).take(800))
    assert(dfn.head.getDouble(0).isNaN && dfn.head.getDouble(1).isNaN)
    MdioWriter.delete(dirN)
    // a bounds-only sidecar (pre-moments format) falls back, same answer
    val varDir = ZarrMeta.path(dir).resolve("v")
    val g = MdioChunkStats.generation(varDir)
    MdioChunkStats.write(varDir, g, MdioChunkStats.current(varDir).get.map {
      case (k, e) => k -> stripped(e) })
    val dfb = spark.read.format("mdio").load(dir).agg(sum($"v"), min($"v"))
    assert(!fmt(dfb).contains("vsum"), fmt(dfb).take(800))
    assert(dfb.head.getDouble(0) == (0 to 63).sum.toDouble)
    MdioWriter.delete(dir)
  }

  test("integral SUM: per-chunk or total overflow falls back to the scan") {
    def intStore(values: Long => Long): String = {
      val dir = Files.createTempDirectory("mdio_vstats").resolve("ov.mdio").toString
      MdioWriter.create(MdioSpec.fromJson(
        """{
          |  "metadata": {"name": "ov", "apiVersion": "v1.0", "createdOn": "2026-01-01T00:00:00Z"},
          |  "variables": [
          |    {"name": "x", "dataType": "int64",
          |     "dimensions": [{"name": "x", "size": 64}]},
          |    {"name": "w", "dataType": "int64",
          |     "dimensions": [{"name": "x", "size": 64}],
          |     "metadata": {"chunkGrid": {"name": "regular", "configuration": {"chunkShape": [8]}}}}
          |  ]
          |}""".stripMargin), dir)
      val fn = udf(values.apply _)
      MdioWriter.writeVariable(spark,
        spark.range(64).select($"id".as("x"), fn($"id").as("w")), dir, "w")
      dir
    }
    def fmt(d: org.apache.spark.sql.DataFrame): String =
      d.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    // small values: metadata-answered, exact Long
    val ok = intStore(x => x * 1000L)
    val dfo = spark.read.format("mdio").load(ok).agg(sum($"w"))
    assert(fmt(dfo).contains("vsum(w)"), fmt(dfo).take(800))
    assert(dfo.head.getLong(0) == (0L to 63L).map(_ * 1000L).sum)
    MdioWriter.delete(ok)
    // per-chunk overflow (8 × 2^60 > Long.Max): moments absent, scan wraps
    val big = intStore(_ => 1L << 60)
    val curB = MdioChunkStats.current(ZarrMeta.path(big).resolve("w")).get
    assert(curB("0").get.moments.isEmpty, "per-chunk overflow must omit moments")
    val dfb = spark.read.format("mdio").load(big).agg(sum($"w"))
    assert(!fmt(dfb).contains("vsum"), fmt(dfb).take(800))
    // the fallback scan reproduces Spark's own ANSI overflow error — the
    // metadata path never invents a wrapped or saturated number
    intercept[ArithmeticException] { dfb.head }
    MdioWriter.delete(big)
    // per-chunk sums fit (8 × 2^59 = 2^62) but the total (2^65) cannot be a
    // Long: planning rejects, the scan's own wrap semantics stand. The
    // per-cell SQUARES overflow (2^118), so sumSq — and only sumSq — is
    // dropped while the sum moment survives
    val mid = intStore(_ => 1L << 59)
    val curM = MdioChunkStats.current(ZarrMeta.path(mid).resolve("w")).get
    assert(curM("0").get.moments.isDefined)
    assert(curM("0").get.moments.get.sumSq.isEmpty, "squares overflow must drop only sumSq")
    val dfm = spark.read.format("mdio").load(mid).agg(sum($"w"))
    assert(!fmt(dfm).contains("vsum"), fmt(dfm).take(800))
    intercept[ArithmeticException] { dfm.head }
    MdioWriter.delete(mid)
  }

  test("summaryFromSidecar reconstructs statsV1 without a scan") {
    val dir = createFloat(_.toDouble)
    val r = graft.operators.MdioStats.summaryFromSidecar(spark, dir, "v").head
    assert(r.getLong(0) == 64L && r.getDouble(1) == 0.0 && r.getDouble(2) == 63.0)
    assert(r.getDouble(3) == (0 to 63).sum.toDouble)
    assert(r.getDouble(4) == (0 to 63).map(k => k * k).sum.toDouble)
    // NaN store: count still counts cells; max and the sums are poisoned
    val dirN = createFloat(x => if (x == 10) Double.NaN else x.toDouble)
    val rN = graft.operators.MdioStats.summaryFromSidecar(spark, dirN, "v").head
    assert(rN.getLong(0) == 64L && rN.getDouble(1) == 0.0)
    assert(rN.getDouble(2).isNaN && rN.getDouble(3).isNaN && rN.getDouble(4).isNaN)
    MdioWriter.delete(dirN)
    // stale sidecar: loud failure, not a silent scan
    MdioChunkStats.bump(ZarrMeta.path(dir).resolve("v"))
    intercept[IllegalStateException] {
      graft.operators.MdioStats.summaryFromSidecar(spark, dir, "v")
    }
    MdioWriter.delete(dir)
  }

  test("GROUP BY floor(dim/L): per-slab stats answer from metadata, decline when unsound") {
    val dir = createFloat(_.toDouble) // 64 cells, chunks of 8, v = x
    def fmt(df: org.apache.spark.sql.DataFrame): String =
      df.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    def slabs(l: Int, extra: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame = identity) =
      extra(spark.read.format("mdio").load(dir))
        .groupBy(floor($"x" / l).as("slab"))
        .agg(min($"v").as("mn"), max($"v").as("mx"),
          sum($"v").as("total"), avg($"v").as("am"), count(lit(1)).as("n"))
        .orderBy($"slab")
    // L=16 (two chunks per slab): complete pushdown, one metadata row per slab
    val df = slabs(16)
    val p = fmt(df)
    assert(p.contains("group by x/16"), p.take(900))
    assert(!p.contains("HashAggregate"), "grouped pushdown must be COMPLETE — no re-aggregation")
    val rows = df.collect()
    assert(rows.length == 4)
    rows.zipWithIndex.foreach { case (r, g) =>
      val (lo, hi) = (g * 16, g * 16 + 15)
      assert(r.getLong(0) == g && r.getDouble(1) == lo.toDouble &&
        r.getDouble(2) == hi.toDouble && r.getDouble(3) == (lo to hi).sum.toDouble &&
        r.getDouble(4) == (lo to hi).sum.toDouble / 16.0 &&
        r.getLong(5) == 16L, r.toString)
    }
    // ZERO chunk files opened: the scan plans metadata row partitions only
    // (pinned on the unordered form — the orderBy exchange wraps the
    // ordered plan in AQE, hiding the leaves)
    val unordered = spark.read.format("mdio").load(dir)
      .groupBy(floor($"x" / 16).as("slab")).agg(count(lit(1)).as("n"))
    val parts = unordered.queryExecution.executedPlan.collectLeaves().collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b.inputPartitions
    }.flatten
    assert(parts.nonEmpty && parts.forall(_.isInstanceOf[MdioAggRowsPartition]), parts.toString)
    // a chunk-aligned dim slice composes: x∈[16,48) → slabs 1,2 only
    val sliced = slabs(16, _.filter($"x" >= 16 && $"x" < 48))
    assert(fmt(sliced).contains("group by x/16"), fmt(sliced).take(900))
    assert(sliced.select($"slab").as[Long].collect().toSeq == Seq(1L, 2L))
    // decline: L=4 is not a chunk multiple (a slab would split a chunk)
    assert(!fmt(slabs(4)).contains("MdioAggScan"), fmt(slabs(4)).take(900))
    assert(slabs(4).select($"n").as[Long].collect().forall(_ == 4L))
    // decline: a misaligned dim slice (entry bounds cover whole chunks)
    val mis = slabs(16, _.filter($"x" >= 5))
    assert(!fmt(mis).contains("MdioAggScan"), fmt(mis).take(900))
    assert(mis.select($"n").as[Long].collect().toSeq == Seq(11L, 16L, 16L, 16L))
    // MULTI-DIM slab grids: a second grouped dim composes (1-D store has
    // one dim, so pin the duplicate-dim decline here; the 2-D tile form
    // is oracle-certified by zarr_stats_by_tile)
    val dup = spark.read.format("mdio").load(dir)
      .groupBy(floor($"x" / 16).as("a"), floor($"x" / 8).as("b"))
      .agg(count(lit(1)).as("n"))
    assert(!fmt(dup).contains("MdioAggScan"), fmt(dup).take(900))
    assert(dup.count() == 8) // 8 (a,b) pairs, answered by a real scan
    // decline: stale stats — same answers through a real scan
    MdioChunkStats.bump(ZarrMeta.path(dir).resolve("v"))
    val stale = slabs(16)
    assert(!fmt(stale).contains("MdioAggScan"), fmt(stale).take(900))
    assert(stale.select($"mx").as[Double].collect().toSeq ==
      Seq(15.0, 31.0, 47.0, 63.0))
    MdioWriter.delete(dir)
  }

  test("sharded sidecar: range-keyed shard files, currentFor reads only intersecting shards") {
    val dir = createFloat(_.toDouble)
    val varDir = ZarrMeta.path(dir).resolve("v")
    val g = MdioChunkStats.generation(varDir)
    val entries = MdioChunkStats.current(varDir).get
    // republish at span 2 → leads {0,1}→s0, {2,3}→s1, {4,5}→s2, {6,7}→s3
    MdioChunkStats.write(varDir, g, entries, span = 2)
    (0L to 3L).foreach { s =>
      assert(varDir.resolve(MdioChunkStats.shardFile(s)).exists, s"shard $s missing") }
    // full read unions every shard
    assert(MdioChunkStats.current(varDir).get.keySet == entries.keySet)
    // partial read: leading chunk range [2,5] touches shards 1,2 only
    val part = MdioChunkStats.currentFor(varDir, 2, 5).get
    assert(part.keySet == Set("2", "3", "4", "5"), part.keySet)
    // the sharded layout keeps exact bounds AND moments intact
    assert(part("2").get.moments.get.sum == BigDecimal((16 to 23).sum))
    // pruning through the sharded sidecar: dim slice x∈[16,48) + value
    // range v>=40 plans only the chunks whose shard-carried bounds allow
    val df = spark.read.format("mdio").load(dir)
      .filter($"x" >= 16 && $"x" < 48 && $"v" >= 40.0)
    assert(df.select($"x").as[Long].collect().sorted.toSeq == (40L to 47L))
    MdioWriter.delete(dir)
  }

  test("refresh rewrites only the touched shard — O(range) write amplification") {
    val dir = createFloat(_.toDouble)
    val varDir = ZarrMeta.path(dir).resolve("v")
    val entries = MdioChunkStats.current(varDir).get
    MdioChunkStats.write(varDir, MdioChunkStats.generation(varDir), entries, span = 2)
    def shardBytes(s: Long): String = varDir.resolve(MdioChunkStats.shardFile(s)).readString()
    val before = (0L to 3L).map(s => s -> shardBytes(s)).toMap
    // refresh chunk "4" only (lead 4 → shard 2)
    MdioChunkStats.refresh(varDir,
      Map("4" -> Some(MdioChunkStats.Bounds(BigDecimal(-9), BigDecimal(9)))))
    assert(MdioChunkStats.generation(varDir) == 2L)
    // untouched shard FILES are byte-identical (carried by reference)
    Seq(0L, 1L, 3L).foreach { s =>
      assert(shardBytes(s) == before(s), s"untouched shard $s was rewritten") }
    assert(shardBytes(2L) != before(2L))
    // and the whole sidecar is generation-current: fresh entry overlaid,
    // same-shard neighbor "5" and cross-shard entries carried over
    val cur = MdioChunkStats.current(varDir).get
    assert(stripped(cur("4")) == Some(MdioChunkStats.Bounds(BigDecimal(-9), BigDecimal(9))))
    assert(stripped(cur("5")) == Some(MdioChunkStats.Bounds(BigDecimal(40), BigDecimal(47))))
    assert(stripped(cur("0")) == Some(MdioChunkStats.Bounds(BigDecimal(0), BigDecimal(7))))
    assert(cur.size == 8)
    MdioWriter.delete(dir)
  }

  test("a torn shard drops only its own chunks; a bump invalidates every shard") {
    val dir = createFloat(_.toDouble)
    val varDir = ZarrMeta.path(dir).resolve("v")
    val entries = MdioChunkStats.current(varDir).get
    MdioChunkStats.write(varDir, MdioChunkStats.generation(varDir), entries, span = 2)
    // tear shard 1 (an interrupted rewrite: file generation ≠ manifest's)
    val s1 = varDir.resolve(MdioChunkStats.shardFile(1))
    s1.writeString(s1.readString().replaceFirst(""""generation": \d+""", "\"generation\": 99"))
    val cur = MdioChunkStats.current(varDir).get
    assert(cur.keySet == Set("0", "1", "4", "5", "6", "7"), cur.keySet)
    // the torn range loses pruning, never answers: full-coverage MIN/MAX
    // must fall back to a real scan — and still be right
    val df = spark.read.format("mdio").load(dir).agg(min($"v"), max($"v"))
    val p = df.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(!p.contains("MdioAggScan"), p.take(700))
    val r = df.head
    assert(r.getDouble(0) == 0.0 && r.getDouble(1) == 63.0)
    // a generation bump stales the manifest — every shard goes dark at once
    MdioChunkStats.bump(varDir)
    assert(MdioChunkStats.current(varDir).isEmpty)
    assert(MdioChunkStats.currentFor(varDir, 0, 7).isEmpty)
    assert(!MdioChunkStats.hasCurrent(varDir))
    MdioWriter.delete(dir)
  }

  test("legacy monolithic sidecar reads; refresh migrates it to shards") {
    val dir = createFloat(_.toDouble)
    val varDir = ZarrMeta.path(dir).resolve("v")
    // rewrite the sidecar in the pre-shard monolithic wire format
    val g = MdioChunkStats.generation(varDir)
    varDir.resolve(MdioChunkStats.StatsFile).writeString(
      s"""{"generation": $g, "chunks": {"0": [0, 7], "1": [8, 15], "2": [16, 23],
         | "3": [24, 31], "4": [32, 39], "5": [40, 47], "6": [48, 55],
         | "7": [56, 63]}}""".stripMargin.replace("\n", ""))
    val cur = MdioChunkStats.current(varDir).get
    assert(cur.size == 8 && stripped(cur("3")) ==
      Some(MdioChunkStats.Bounds(BigDecimal(24), BigDecimal(31))))
    // currentFor on a monolith returns the full map (no shards to scope)
    assert(MdioChunkStats.currentFor(varDir, 2, 3).get.size == 8)
    // value pruning works off the legacy format
    assert(planned(dir, Array(GreaterThanOrEqual("v", 56.0))) == 1)
    // a refresh migrates: entries carried over, layout now sharded
    MdioChunkStats.refresh(varDir,
      Map("0" -> Some(MdioChunkStats.Bounds(BigDecimal(-1), BigDecimal(7)))))
    val cur2 = MdioChunkStats.current(varDir).get
    assert(stripped(cur2("0")) == Some(MdioChunkStats.Bounds(BigDecimal(-1), BigDecimal(7))))
    assert(stripped(cur2("7")) == Some(MdioChunkStats.Bounds(BigDecimal(56), BigDecimal(63))))
    assert(varDir.resolve(MdioChunkStats.StatsFile).readString().contains("\"shards\""))
    MdioWriter.delete(dir)
  }

  test("COUNT(DISTINCT dim) answers from the chunk grid (dense-grid closed form)") {
    val dir = createFloat(_.toDouble)
    def fmt(df: org.apache.spark.sql.DataFrame): String =
      df.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    val df = spark.read.format("mdio").load(dir).filter($"x" >= 5 && $"x" < 41)
      .agg(countDistinct($"x").as("nx"), count(lit(1)).as("n"))
    assert(fmt(df).contains("dcnt(x)"), fmt(df).take(800))
    val r = df.head
    assert(r.getLong(0) == 36L && r.getLong(1) == 36L)
    // COUNT(DISTINCT value-column) is NOT closed-form — falls back
    val dfv = spark.read.format("mdio").load(dir).agg(countDistinct($"v"))
    assert(!fmt(dfv).contains("MdioAggScan"), fmt(dfv).take(800))
    assert(dfv.head.getLong(0) == 64L)
    MdioWriter.delete(dir)
  }

  test("sidecar sharding at scale: 50k chunks derive a target-sized span, O(range) rewrites") {
    import graft.zarr.VPath
    val varDir = VPath(Files.createTempDirectory("mdio_scale").resolve("v").toString)
    varDir.mkdirs()
    val n = 50000
    val entries: Map[String, MdioChunkStats.Entry] = (0 until n).map { i =>
      i.toString -> (Some(MdioChunkStats.Bounds(BigDecimal(i), BigDecimal(i + 1)))
        : MdioChunkStats.Entry)
    }.toMap
    MdioChunkStats.bump(varDir)
    MdioChunkStats.write(varDir, 1L, entries) // span derived: ~4096 entries/shard
    val shardFiles = varDir.list().map(_.name).filter(_.startsWith(".mdio_stats.s"))
    assert(shardFiles.size >= 10 && shardFiles.size <= 16,
      s"50k 1-D chunks should derive ~13 target-sized shards, got ${shardFiles.size}")
    // the manifest stays KB-scale however many entries the variable has
    assert(varDir.resolve(MdioChunkStats.StatsFile).readAllBytes().length < 2048)
    // a range-scoped read loads only the intersecting shards' entries
    val part = MdioChunkStats.currentFor(varDir, 10000, 10100).get
    assert((10000 to 10100).forall(i => part.contains(i.toString)))
    assert(part.size <= 2 * 4096 + 256, s"read ${part.size} entries for a 101-chunk range")
    // a single-chunk refresh rewrites ONE shard file plus the manifest
    val before = shardFiles.map(f => f -> varDir.resolve(f).readString()).toMap
    MdioChunkStats.refresh(varDir,
      Map("25000" -> Some(MdioChunkStats.Bounds(BigDecimal(-1), BigDecimal(1)))))
    val changed = shardFiles.filter(f => varDir.resolve(f).readString() != before(f))
    assert(changed.size == 1, s"one-chunk refresh rewrote shards: $changed")
    assert(MdioChunkStats.current(varDir).get.size == n) // nothing lost
    varDir.deleteRecursive()
  }

  // ---- r13: executor-side stats publication, manifest summaries, GC,
  // span drift, exact u64 bounds

  /** Poll until `cond` holds (listener events post asynchronously). */
  private def eventually(cond: => Boolean): Unit = {
    var i = 0
    while (!cond && i < 200) { Thread.sleep(25); i += 1 }
    assert(cond, "condition not met within 5s")
  }

  test("write job ships no per-chunk stat rows to the driver") {
    // 4096-chunk store: the pre-r13 path collected 4096 serialized
    // ChunkStatRows (~100+ KB per task at local[4]); the r13 path shuffles
    // them into an executor-side shard-write stage, and the driver receives
    // only per-shard summaries. Pin (a) the job SHAPE — the write runs a
    // shuffle (a completed stage with a parent) — and (b) the driver-result
    // volume: every task's resultSize stays far below one task's worth of
    // serialized stat rows.
    val dir = Files.createTempDirectory("mdio_vstats").resolve("big.mdio").toString
    MdioWriter.create(MdioSpec.fromJson(
      """{
        |  "metadata": {"name": "big", "apiVersion": "v1.0", "createdOn": "2026-01-01T00:00:00Z"},
        |  "variables": [
        |    {"name": "x", "dataType": "int64",
        |     "dimensions": [{"name": "x", "size": 16384}]},
        |    {"name": "v", "dataType": "float64",
        |     "dimensions": [{"name": "x", "size": 16384}],
        |     "metadata": {"chunkGrid": {"name": "regular", "configuration": {"chunkShape": [4]}}}}
        |  ]
        |}""".stripMargin), dir)
    val maxResult = new java.util.concurrent.atomic.AtomicLong
    val shuffledStages = new java.util.concurrent.atomic.AtomicInteger
    val tasksSeen = new java.util.concurrent.atomic.AtomicInteger
    // stage ids SUBMITTED after registration: the listener bus delivers
    // asynchronously and in order, so events still draining from earlier
    // queries (whose stages were submitted before we registered) are
    // excluded — only this write's own tasks are measured
    val ownStages = java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onStageSubmitted(
          s: org.apache.spark.scheduler.SparkListenerStageSubmitted): Unit =
        ownStages.add(s.stageInfo.stageId)
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (ownStages.contains(t.stageId)) {
          if (t.taskMetrics != null)
            maxResult.getAndAccumulate(t.taskMetrics.resultSize, math.max)
          tasksSeen.incrementAndGet()
        }
      override def onStageCompleted(
          s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        if (ownStages.contains(s.stageInfo.stageId) &&
            s.stageInfo.parentIds.nonEmpty) shuffledStages.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      MdioWriter.writeVariable(spark,
        spark.range(16384).select($"id".as("x"), $"id".cast("double").as("v")), dir, "v")
      eventually(shuffledStages.get() >= 1 && tasksSeen.get() >= 2)
      assert(maxResult.get() < 32 * 1024,
        s"a write task shipped ${maxResult.get()} B to the driver — " +
          "stat rows are collecting again instead of shuffling to shard writers")
    } finally spark.sparkContext.removeSparkListener(listener)
    // and the sidecar is complete + multi-shard (span from the chunk grid)
    val varDir = ZarrMeta.path(dir).resolve("v")
    val cur = MdioChunkStats.current(varDir)
    assert(cur.isDefined && cur.get.size == 4096)
    val m = MdioChunkStats.readManifest(varDir).get
    assert(m.span == 4096 && m.shards.keySet == Set(0L), m.shards.keySet)
    assert(stripped(cur.get("4095")) ==
      Some(MdioChunkStats.Bounds(BigDecimal(16380), BigDecimal(16383))))
    // pruning works through the distributed-published sidecar
    assert(planned(dir, Array(GreaterThanOrEqual("v", 16380.0))) == 1)
    MdioWriter.delete(dir)
  }

  test("a span-changing republish GCs shard files the dead manifest listed") {
    val dir = createFloat(_.toDouble)
    val varDir = ZarrMeta.path(dir).resolve("v")
    val entries = MdioChunkStats.current(varDir).get
    MdioChunkStats.write(varDir, MdioChunkStats.generation(varDir), entries, span = 1)
    (0L to 7L).foreach(s =>
      assert(varDir.resolve(MdioChunkStats.shardFile(s)).exists, s"shard $s missing"))
    // span-changing refresh → full republish at span 4 → shards {0, 1}
    MdioChunkStats.refresh(varDir,
      Map("0" -> Some(MdioChunkStats.Bounds(BigDecimal(-1), BigDecimal(7)))), span = 4)
    val onDisk = varDir.list().map(_.name).filter(_.startsWith(".mdio_stats.s")).toSet
    assert(onDisk == Set(MdioChunkStats.shardFile(0), MdioChunkStats.shardFile(1)),
      s"dead shard files survived GC: $onDisk")
    val cur = MdioChunkStats.current(varDir).get
    assert(cur.size == 8) // nothing lost
    assert(stripped(cur("0")) == Some(MdioChunkStats.Bounds(BigDecimal(-1), BigDecimal(7))))
    MdioWriter.delete(dir)
  }

  test("span drift re-derives: a store grown past its first-publish span republishes") {
    import graft.zarr.VPath
    val varDir = VPath(Files.createTempDirectory("mdio_drift").resolve("v").toString)
    varDir.mkdirs()
    // the small-store trap: first publish pinned a huge span (1 shard)
    varDir.resolve(MdioChunkStats.GenFile).writeString("1")
    def b(i: Long) = Some(MdioChunkStats.Bounds(BigDecimal(i), BigDecimal(i)))
    MdioChunkStats.write(varDir, 1L,
      (0L until 8L).map(i => i.toString -> b(i)).toMap, span = 1000000)
    assert(MdioChunkStats.readManifest(varDir).get.shards.keySet == Set(0L))
    // the store grows: 20 000 fresh leads merge into that one shard —
    // past SpanDriftFactor × ShardTargetEntries, the span must re-derive
    MdioChunkStats.refresh(varDir,
      (8L until 20000L).map(i => i.toString -> b(i)).toMap)
    val m = MdioChunkStats.readManifest(varDir).get
    assert(m.span == MdioChunkStats.ShardTargetEntries,
      s"span should re-derive to the target, got ${m.span}")
    assert(m.shards.size == 5, s"expected 5 rebalanced shards, got ${m.shards.keySet}")
    assert(MdioChunkStats.current(varDir).get.size == 20000)
    varDir.parent.deleteRecursive()
  }

  test("distributed publish: fresh, incremental merge, drift respan, stale GC") {
    import graft.zarr.{HConf, VPath}
    val varDir = VPath(Files.createTempDirectory("mdio_dpub").resolve("v").toString)
    varDir.mkdirs()
    val hc = HConf.capture()
    def b(i: Long) = Some(MdioChunkStats.Bounds(BigDecimal(i), BigDecimal(i)))
    def publish(entries: Seq[(String, MdioChunkStats.Entry)], freshSpan: Long): Unit =
      MdioStatsPublish.publishEntries(spark, varDir.toString, hc,
        spark.sparkContext.parallelize(entries, 4), freshSpan)
    // fresh full publish (no prior): executor tasks write the shards
    publish((0L until 100L).map(i => i.toString -> b(i)), freshSpan = 10)
    assert(MdioChunkStats.generation(varDir) == 1L)
    val m1 = MdioChunkStats.readManifest(varDir).get
    assert(m1.span == 10 && m1.shards.size == 10)
    assert(MdioChunkStats.current(varDir).get.size == 100)
    // incremental: one fresh entry rewrites ONLY its shard
    def shardBytes(s: Long) = varDir.resolve(MdioChunkStats.shardFile(s)).readString()
    val before = (0L until 10L).map(s => s -> shardBytes(s)).toMap
    publish(Seq("55" -> Some(MdioChunkStats.Bounds(BigDecimal(-5), BigDecimal(5)))), 10)
    (0L until 10L).filter(_ != 5L).foreach(s =>
      assert(shardBytes(s) == before(s), s"untouched shard $s rewritten"))
    assert(shardBytes(5L) != before(5L))
    val cur = MdioChunkStats.current(varDir).get
    assert(cur.size == 100 &&
      stripped(cur("55")) == Some(MdioChunkStats.Bounds(BigDecimal(-5), BigDecimal(5))))
    // stale prior: an external bump invalidates; the next fresh publish GCs
    // every shard file the dead manifest listed but the new one does not
    MdioChunkStats.bump(varDir)
    publish(Seq("0" -> b(0)), freshSpan = 1)
    val onDisk = varDir.list().map(_.name).filter(_.startsWith(".mdio_stats.s")).toSet
    assert(onDisk == Set(MdioChunkStats.shardFile(0)), s"stale shards survived: $onDisk")
    assert(MdioChunkStats.current(varDir).get.keySet == Set("0"))
    varDir.parent.deleteRecursive()
  }

  test("distributed drift respan rebalances a pinned-span store from executors") {
    import graft.zarr.{HConf, VPath}
    val varDir = VPath(Files.createTempDirectory("mdio_dresp").resolve("v").toString)
    varDir.mkdirs()
    val hc = HConf.capture()
    def b(i: Long) = Some(MdioChunkStats.Bounds(BigDecimal(i), BigDecimal(i)))
    // prior: one giant-span shard holding 17 000 entries, published current
    varDir.resolve(MdioChunkStats.GenFile).writeString("1")
    MdioChunkStats.write(varDir, 1L,
      (0L until 17000L).map(i => i.toString -> b(i)).toMap, span = 1000000)
    // a 1-entry incremental merge crosses the drift threshold → respan job
    MdioStatsPublish.publishEntries(spark, varDir.toString, hc,
      spark.sparkContext.parallelize(
        Seq("3" -> Some(MdioChunkStats.Bounds(BigDecimal(-3), BigDecimal(3)))), 1),
      freshSpan = 1000000)
    val m = MdioChunkStats.readManifest(varDir).get
    assert(m.span == MdioChunkStats.ShardTargetEntries,
      s"distributed respan should re-derive the span, got ${m.span}")
    assert(m.shards.size == 5, m.shards.keySet)
    val cur = MdioChunkStats.current(varDir).get
    assert(cur.size == 17000 &&
      stripped(cur("3")) == Some(MdioChunkStats.Bounds(BigDecimal(-3), BigDecimal(3))))
    varDir.parent.deleteRecursive()
  }

  test("manifest summaries prune whole shards without opening them") {
    val dir = createFloat(_.toDouble)
    val varDir = ZarrMeta.path(dir).resolve("v")
    val entries = MdioChunkStats.current(varDir).get
    // 4 shards of 2 chunks each, manifest carrying per-shard bounds unions
    MdioChunkStats.write(varDir, MdioChunkStats.generation(varDir), entries, span = 2)
    val before = MdioChunkStats.shardReadCount.get()
    assert(coveredChunks(dir, Array(GreaterThanOrEqual("v", 48.0))) == 2L)
    val opened = MdioChunkStats.shardReadCount.get() - before
    assert(opened == 1,
      s"v >= 48 intersects only shard 3's union [48, 63]; opened $opened shard files")
    assert(spark.read.format("mdio").load(dir).filter($"v" >= 48.0).count() == 16L)
    // soundness: a shard MISSING an entry (e.g. a ±Inf chunk) is not
    // coverage-complete — it must open, and its entry-less chunk stays
    // planned however disjoint the union looks
    MdioChunkStats.write(varDir, MdioChunkStats.generation(varDir), entries - "0", span = 2)
    val before2 = MdioChunkStats.shardReadCount.get()
    assert(coveredChunks(dir, Array(GreaterThanOrEqual("v", 48.0))) == 3L) // chunk 0 kept
    val opened2 = MdioChunkStats.shardReadCount.get() - before2
    assert(opened2 == 2, s"incomplete shard 0 must open: opened $opened2")
    MdioWriter.delete(dir)
  }

  test("manifest summaries carry cell counts: rank/range answers need no shard open") {
    // r15: ShardMeta.cells = Σ moments.cnt over bounded entries (present
    // only when every bounded entry has moments) and ShardMeta.bounded =
    // bounded-entry count — the fields that let countInRange/kthSmallest
    // answer whole shards from the manifest alone.
    val dir = createFloat(x => if (x == 60) Double.NaN else x.toDouble)
    val varDir = ZarrMeta.path(dir).resolve("v")
    val entries = MdioChunkStats.current(varDir).get
    MdioChunkStats.write(varDir, MdioChunkStats.generation(varDir), entries, span = 2)
    val m = MdioChunkStats.readManifest(varDir).get
    assert(m.shards.keySet == Set(0L, 1L, 2L, 3L))
    // shards 0-2: 16 finite cells each; shard 3 lost cell 60 to NaN
    assert(m.shards(0L) == m.shards(0L).copy(cells = Some(16L), bounded = 2L))
    assert(m.shards(3L).cells == Some(15L) && m.shards(3L).bounded == 2L)
    // a bounded entry WITHOUT moments forfeits the shard's cell summary
    // (bounds survive — only the count-bearing fast path degrades)
    val noMom = entries.updatedWith("0")(_.map(_.map(_.copy(moments = None))))
    MdioChunkStats.write(varDir, MdioChunkStats.generation(varDir), noMom, span = 2)
    val m2 = MdioChunkStats.readManifest(varDir).get
    assert(m2.shards(0L).cells.isEmpty && m2.shards(0L).bounded == 2L)
    assert(m2.shards(1L).cells == Some(16L))
    // pre-r15 manifest (no "c"/"b" keys) parses with absent summaries
    varDir.resolve(MdioChunkStats.StatsFile).writeString(
      """{"generation": 99, "span": 2, "shards": {"0": {"g": 99, "n": 2, "lo": 0, "hi": 15}}}""")
    val legacy = MdioChunkStats.readManifest(varDir).get
    assert(legacy.shards(0L).cells.isEmpty && legacy.shards(0L).bounded == -1L)
    MdioWriter.delete(dir)

    // an ALL-NaN shard is PROVEN-ZERO finite cells, not a coverage
    // anomaly: cells = Some(0), bounded = 0, no bounds union — and the
    // range-count consumer treats it exactly that way from the manifest
    val dirA = createFloat(x => if (x < 16) Double.NaN else x.toDouble)
    val varDirA = ZarrMeta.path(dirA).resolve("v")
    val entriesA = MdioChunkStats.current(varDirA).get
    MdioChunkStats.write(varDirA, MdioChunkStats.generation(varDirA), entriesA, span = 2)
    val mA = MdioChunkStats.readManifest(varDirA).get
    assert(mA.shards(0L).cells == Some(0L) && mA.shards(0L).bounded == 0L &&
      mA.shards(0L).lo.isEmpty && mA.shards(0L).hi.isEmpty, mA.shards(0L))
    val beforeA = MdioChunkStats.shardReadCount.get()
    val rA = graft.operators.MdioStats.countInRange(spark, dirA, "v", 0.0, 63.0)
    assert(rA == graft.operators.MdioStats.CountInRange(48L, 6L, 2L, 0L,
      fallback = false), rA)
    assert(MdioChunkStats.shardReadCount.get() - beforeA == 0,
      "the all-NaN shard must prove zero from the manifest alone")
    MdioWriter.delete(dirA)
  }

  test("u64 sidecar bounds are exact past 2^63: pruning and metadata MIN/MAX") {
    val dir = Files.createTempDirectory("mdio_vstats").resolve("u.mdio").toString
    MdioWriter.create(MdioSpec.fromJson(
      """{
        |  "metadata": {"name": "u", "apiVersion": "v1.0", "createdOn": "2026-01-01T00:00:00Z"},
        |  "variables": [
        |    {"name": "x", "dataType": "int64",
        |     "dimensions": [{"name": "x", "size": 64}]},
        |    {"name": "u", "dataType": "uint64",
        |     "dimensions": [{"name": "x", "size": 64}],
        |     "metadata": {"chunkGrid": {"name": "regular", "configuration": {"chunkShape": [8]}}}}
        |  ]
        |}""".stripMargin), dir)
    val twoTo63 = BigDecimal("9223372036854775808")
    MdioWriter.writeVariable(spark,
      spark.range(64).select($"id".as("x"),
        ($"id".cast("decimal(21,0)") + lit(twoTo63)).cast("decimal(20,0)").as("u")),
      dir, "u")
    val varDir = ZarrMeta.path(dir).resolve("u")
    val cur = MdioChunkStats.current(varDir)
    assert(cur.isDefined, "u64 writes must publish stats, not bump-invalidate")
    assert(stripped(cur.get("7")) == Some(MdioChunkStats.Bounds(twoTo63 + 56, twoTo63 + 63)),
      "u64 bounds must unwrap exactly past 2^63")
    // pruning: only chunk 7 can satisfy u >= 2^63 + 56
    assert(planned(dir,
      Array(GreaterThanOrEqual("u", (twoTo63 + 56).underlying))) == 1)
    val df = spark.read.format("mdio").load(dir).filter($"u" >= lit(twoTo63 + 56))
    assert(df.count() == 8L)
    // metadata MIN/MAX over the u64 column (statsV1 attached-attributes)
    val agg = spark.read.format("mdio").load(dir)
      .agg(min($"u").as("mn"), max($"u").as("mx"))
    val p = agg.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(p.contains("MdioAggScan"), p.take(700))
    val r = agg.head
    assert(BigDecimal(r.getDecimal(0)) == twoTo63 && BigDecimal(r.getDecimal(1)) == twoTo63 + 63)
    // exact range membership on the decimal surface: [2^63, 2^63] holds
    // exactly ONE cell — a double-promoted comparison would admit every
    // cell of the straddler chunk (they all round to 2^63)
    val rr = graft.operators.MdioStats.countInRange(spark, dir, "u",
      twoTo63.toDouble, twoTo63.toDouble)
    assert(rr.count == 1L && !rr.fallback && rr.scannedChunks == 1L, rr)
    MdioWriter.delete(dir)
  }

  test("sink spills stat rows past the inline cap; commit publishes distributed") {
    val dir = createFloat(_.toDouble)
    val varDir = ZarrMeta.path(dir).resolve("v")
    spark.conf.set("spark.graft.sink.inlineStatRows", "2")
    try {
      // serial sink write: one task owns all 8 chunks > cap 2 → fragment
      spark.range(64).select($"id".as("x"), ($"id" + 1000.0).as("v"))
        .write.format("mdio").mode("append").save(dir)
    } finally spark.conf.unset("spark.graft.sink.inlineStatRows")
    assert(MdioChunkStats.generation(varDir) == 2L)
    val cur = MdioChunkStats.current(varDir)
    assert(cur.isDefined && cur.get.size == 8)
    assert(stripped(cur.get("0")) ==
      Some(MdioChunkStats.Bounds(BigDecimal(1000), BigDecimal(1007))))
    // fragments are GC'd after the manifest commit
    val leftovers = varDir.list().map(_.name).filter(_.startsWith(".mdio_statfrag"))
    assert(leftovers.isEmpty, s"fragment files survived commit: $leftovers")
    assert(planned(dir, Array(GreaterThanOrEqual("v", 1056.0))) == 1)
    MdioWriter.delete(dir)
  }

  test("orphan stat fragments sweep on the next fragment-bearing commit") {
    // a driver crash between task commit and job commit/abort leaves
    // `.mdio_statfrag.*` files nothing references — the next fragment-
    // bearing sink commit must sweep them (grace-aged, foreign job token),
    // while a genuinely concurrent job's FRESH fragments survive.
    val dir = createFloat(_.toDouble)
    val varDir = ZarrMeta.path(dir).resolve("v")
    val orphan = varDir.resolve(".mdio_statfrag.deadjob.leftover")
    orphan.writeString("")
    spark.conf.set("spark.graft.sink.inlineStatRows", "2") // force fragments
    spark.conf.set("spark.graft.sink.fragGraceMs", "0")    // everything is "old"
    try spark.range(64).select($"id".as("x"), ($"id" + 1.0).as("v"))
      .write.format("mdio").mode("append").save(dir)
    finally {
      spark.conf.unset("spark.graft.sink.inlineStatRows")
      spark.conf.unset("spark.graft.sink.fragGraceMs")
    }
    assert(!orphan.exists, "an aged unreferenced fragment must be swept")
    // under the DEFAULT grace window a fresh foreign fragment is presumed
    // in-flight (another job's task already committed it) and survives
    val live = varDir.resolve(".mdio_statfrag.livejob.inflight")
    live.writeString("")
    spark.conf.set("spark.graft.sink.inlineStatRows", "2")
    try spark.range(64).select($"id".as("x"), ($"id" + 2.0).as("v"))
      .write.format("mdio").mode("append").save(dir)
    finally spark.conf.unset("spark.graft.sink.inlineStatRows")
    assert(live.exists, "a fresh (in-grace) foreign fragment must survive the sweep")
    // and this job's OWN fragments are still GC'd after its manifest commit
    val leftovers = varDir.list().map(_.name)
      .filter(n => n.startsWith(".mdio_statfrag") && n != live.name)
    assert(leftovers.isEmpty, s"own fragments survived commit: $leftovers")
    MdioWriter.delete(dir)
  }

  test("a task attempt that spilled a fragment deletes it on abort") {
    // ADVICE r13: DataWriter.abort() was a no-op, so an attempt that
    // spilled during commit() but then failed (or lost a speculation race)
    // leaked the fragment forever — job-level abort only sees fragments
    // named in DELIVERED commit messages.
    val dir = createFloat(_.toDouble)
    val varDir = ZarrMeta.path(dir).resolve("v")
    val (_, arrays) = ZarrMeta.readGroup(ZarrMeta.path(dir))
    val meta = arrays("v")._1
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("x", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.DoubleType)))
    val w = new MdioDataWriter(dir, Array("x"), schema, Array("v" -> meta),
      inlineStatRows = 0, jobToken = "attempt1")
    w.write(new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](3L, 42.0)))
    w.commit() // spills (cap 0): the fragment exists, message undelivered
    val frags = varDir.list().map(_.name)
      .filter(_.startsWith(".mdio_statfrag.attempt1."))
    assert(frags.size == 1, s"expected one spilled fragment, got $frags")
    w.abort()
    assert(!varDir.resolve(frags.head).exists,
      "task abort must delete the attempt's own spilled fragments")
    MdioWriter.delete(dir)
  }

  test("two tasks assembling one shard object fail the commit loudly") {
    // sharding_indexed + aligned=true with a CHUNK-granular feed: both
    // tasks assemble shard 0 from stale carryover — last-writer-wins loses
    // inner chunks. The driver commit cross-checks per-task shard ids and
    // fails instead of silently corrupting (ADVICE r13, upgraded from a
    // plan-time warning).
    val dir = Files.createTempDirectory("mdio_vstats").resolve("col.mdio").toString
    MdioWriter.create(MdioSpec.fromJson(
      """{
        |  "metadata": {"name": "col", "apiVersion": "v1.0", "createdOn": "2026-01-01T00:00:00Z"},
        |  "variables": [
        |    {"name": "x", "dataType": "int64",
        |     "dimensions": [{"name": "x", "size": 16}]},
        |    {"name": "v", "dataType": "float64",
        |     "dimensions": [{"name": "x", "size": 16}],
        |     "metadata": {"chunkGrid": {"name": "regular", "configuration":
        |       {"chunkShape": [4], "shardShape": [16]}}}}
        |  ]
        |}""".stripMargin), dir, version = 3)
    // two writer tasks, each owning DIFFERENT inner chunks of shard 0 —
    // exactly what a chunk-granular aligned feed produces (driven directly:
    // AQE coalesces a 16-row shuffle into one task, masking the race at
    // test scale; at real scale the tasks are genuinely distinct)
    val (_, arrays) = ZarrMeta.readGroup(ZarrMeta.path(dir))
    val meta = arrays("v")._1
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("x", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.DoubleType)))
    def taskOwning(range: Range)
        : org.apache.spark.sql.connector.write.WriterCommitMessage = {
      val w = new MdioDataWriter(dir, Array("x"), schema, Array("v" -> meta))
      range.foreach(i => w.write(
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](i.toLong, i.toDouble))))
      w.commit()
    }
    // a SHARD-granular feed (one task owning the whole shard) commits fine
    // and publishes current stats
    val ok = Array(taskOwning(0 until 16))
    MdioBatchWrite(dir, Seq("x"), Map("v" -> meta), schema).commit(ok)
    assert(spark.read.format("mdio").load(dir).agg(sum($"v")).first().getDouble(0) == 120.0)
    val varDir = ZarrMeta.path(dir).resolve("v")
    assert(MdioChunkStats.current(varDir).isDefined)
    // the chunk-granular two-task feed collides and the commit REJECTS it
    val messages = Array(taskOwning(0 until 8), taskOwning(8 until 16))
    val bw = MdioBatchWrite(dir, Seq("x"), Map("v" -> meta), schema)
    val ex = intercept[IllegalStateException] { bw.commit(messages) }
    assert(ex.getMessage.contains("MULTIPLE tasks"), ex.getMessage)
    // the failed job already mutated shard objects in place — the abort
    // Spark issues after a commit failure must invalidate the stats, or a
    // value-pruned scan would keep answering from pre-failure bounds
    bw.abort(messages.map(_.asInstanceOf[org.apache.spark.sql.connector.write.WriterCommitMessage]))
    assert(MdioChunkStats.current(varDir).isEmpty,
      "aborted write left stats generation-current over mutated data")
    MdioWriter.delete(dir)
  }

  test("ragged edge chunks: stats cover only in-domain cells") {
    // size 60 / chunk 8 → chunk 7 holds cells 56..59 plus 4 OUT-OF-DOMAIN
    // padding cells at the NaN fill. Whole-buffer stats would absorb the
    // padding: hasNaN=true on the edge entry, and the metadata MAX of a
    // store with no NaN cell would answer NaN.
    val dir = Files.createTempDirectory("mdio_vstats").resolve("rag.mdio").toString
    MdioWriter.create(MdioSpec.fromJson(
      """{
        |  "metadata": {"name": "rag", "apiVersion": "v1.0", "createdOn": "2026-01-01T00:00:00Z"},
        |  "variables": [
        |    {"name": "x", "dataType": "int64",
        |     "dimensions": [{"name": "x", "size": 60}]},
        |    {"name": "v", "dataType": "float64",
        |     "dimensions": [{"name": "x", "size": 60}],
        |     "metadata": {"chunkGrid": {"name": "regular", "configuration": {"chunkShape": [8]}}}},
        |    {"name": "w", "dataType": "int64",
        |     "dimensions": [{"name": "x", "size": 60}],
        |     "metadata": {"chunkGrid": {"name": "regular", "configuration": {"chunkShape": [8]}}}}
        |  ]
        |}""".stripMargin), dir)
    MdioWriter.writeVariable(spark,
      spark.range(60).select($"id".as("x"), $"id".cast("double").as("v")), dir, "v")
    // the edge entry is exact over cells 56..59 only — no NaN leak, exact
    // moments (cnt 4, sum 230)
    val curV = MdioChunkStats.current(ZarrMeta.path(dir).resolve("v")).get
    assert(curV("7") == Some(MdioChunkStats.Bounds(BigDecimal(56), BigDecimal(59), false,
      Some(MdioChunkStats.Moments(4L, BigDecimal(230), Some(BigDecimal((56 to 59).map(i => i * i).sum)))))))
    // metadata MIN/MAX/SUM/AVG answer over the ragged store — and answer right
    val agg = spark.read.format("mdio").load(dir).select($"x", $"v")
      .agg(min($"v").as("mn"), max($"v").as("mx"), sum($"v").as("s"), avg($"v").as("a"))
    val p = agg.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(p.contains("MdioAggScan"), p.take(700))
    val r = agg.head
    assert(r.getDouble(0) == 0.0 && r.getDouble(1) == 59.0)
    assert(r.getDouble(2) == (0 until 60).sum.toDouble)
    assert(r.getDouble(3) == (0 until 60).sum.toDouble / 60.0)
    // integral variable with finite fill (0): padding must not poison MIN
    MdioWriter.writeVariable(spark,
      spark.range(60).select($"id".as("x"), ($"id" + 5).as("w")), dir, "w")
    val curW = MdioChunkStats.current(ZarrMeta.path(dir).resolve("w")).get
    assert(stripped(curW("7")) == Some(MdioChunkStats.Bounds(BigDecimal(61), BigDecimal(64))))
    val aggW = spark.read.format("mdio").load(dir).select($"x", $"w")
      .agg(min($"w").as("mn"), sum($"w").as("s"))
    val rW = aggW.head
    assert(rW.getLong(0) == 5L, "padding fill leaked into the integral MIN")
    assert(rW.getLong(1) == (5L to 64L).sum)
    // pruning on the ragged store stays exact: only the edge chunk holds
    // w >= 61, and the real read path agrees
    assert(planned(dir, Array(GreaterThanOrEqual("w", 61L))) == 1)
    assert(spark.read.format("mdio").load(dir).filter($"w" >= 61L).count() == 4L)
    // grouped slab stats over the ragged store: the LAST slab is short
    // (cells 56..59) and still answers from metadata, exactly
    val slabs = spark.read.format("mdio").load(dir).select($"x", $"w")
      .groupBy(floor($"x" / 8).as("slab"))
      .agg(min($"w").as("mn"), max($"w").as("mx"), count(lit(1)).as("n"))
      .orderBy($"slab")
    val ps = slabs.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(ps.contains("MdioAggScan"), ps.take(700))
    val last = slabs.collect().last
    assert(last.getLong(0) == 7L && last.getLong(1) == 61L &&
      last.getLong(2) == 64L && last.getLong(3) == 4L)
    // the sink's RMW on the edge chunk keeps region-exact stats too
    spark.range(1).select(lit(59L).as("x"), lit(-2.0).as("v"))
      .write.format("mdio").mode("append").save(dir)
    val curV2 = MdioChunkStats.current(ZarrMeta.path(dir).resolve("v")).get
    assert(stripped(curV2("7")) == Some(MdioChunkStats.Bounds(BigDecimal(-2), BigDecimal(58))))
    MdioWriter.delete(dir)
  }

  test("2-D ragged corner chunk: the region odometer clips BOTH dims") {
    // 10×6 grid, 4×4 chunks: the corner chunk (2,1) is clipped to 2×2 —
    // its buffer holds 12 padding cells the odometer must skip
    val dir = Files.createTempDirectory("mdio_vstats").resolve("rag2.mdio").toString
    MdioWriter.create(MdioSpec.fromJson(
      """{
        |  "metadata": {"name": "rag2", "apiVersion": "v1.0", "createdOn": "2026-01-01T00:00:00Z"},
        |  "variables": [
        |    {"name": "i", "dataType": "int64",
        |     "dimensions": [{"name": "i", "size": 10}]},
        |    {"name": "j", "dataType": "int64",
        |     "dimensions": [{"name": "j", "size": 6}]},
        |    {"name": "w", "dataType": "int64",
        |     "dimensions": [{"name": "i", "size": 10}, {"name": "j", "size": 6}],
        |     "metadata": {"chunkGrid": {"name": "regular", "configuration": {"chunkShape": [4, 4]}}}}
        |  ]
        |}""".stripMargin), dir)
    val cells = for { i <- 0L until 10L; j <- 0L until 6L } yield (i, j, 100 + i * 6 + j)
    MdioWriter.writeVariable(spark, cells.toDF("i", "j", "w"), dir, "w")
    val cur = MdioChunkStats.current(ZarrMeta.path(dir).resolve("w")).get
    // corner chunk "2.1": in-domain cells (8..9)×(4..5) → values
    // 100+i*6+j for i∈{8,9}, j∈{4,5} → [152, 159]; moments over 4 cells
    assert(cur("2.1") == Some(MdioChunkStats.Bounds(BigDecimal(152), BigDecimal(159), false,
      Some(MdioChunkStats.Moments(4L, BigDecimal(152 + 153 + 158 + 159),
        Some(BigDecimal(152L*152 + 153L*153 + 158L*158 + 159L*159)))))), cur("2.1"))
    // edge chunk "2.0" clips only dim i: cells (8..9)×(0..3) → [148, 157]
    assert(stripped(cur("2.0")) == Some(MdioChunkStats.Bounds(BigDecimal(148), BigDecimal(157))))
    // interior chunk "0.0" full: [100, 121]
    assert(stripped(cur("0.0")) == Some(MdioChunkStats.Bounds(BigDecimal(100), BigDecimal(121))))
    // metadata aggregates over the 2-D ragged store answer exactly
    val agg = spark.read.format("mdio").load(dir)
      .agg(min($"w").as("mn"), max($"w").as("mx"), sum($"w").as("s"))
    assert(agg.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
      .contains("MdioAggScan"))
    val r = agg.head
    assert(r.getLong(0) == 100L && r.getLong(1) == 159L)
    assert(r.getLong(2) == cells.map(_._3).sum)
    MdioWriter.delete(dir)
  }

  test("pre-summary manifests (bare shard gens) parse and never manifest-prune") {
    val dir = createFloat(_.toDouble)
    val varDir = ZarrMeta.path(dir).resolve("v")
    val entries = MdioChunkStats.current(varDir).get
    MdioChunkStats.write(varDir, MdioChunkStats.generation(varDir), entries, span = 2)
    // rewrite the manifest in the r12 wire format: bare generation numbers
    val m = MdioChunkStats.readManifest(varDir).get
    val body = m.shards.toSeq.sortBy(_._1)
      .map { case (s, sm) => s""""$s": ${sm.gen}""" }.mkString(", ")
    varDir.resolve(MdioChunkStats.StatsFile).writeString(
      s"""{"generation": ${m.gen}, "span": ${m.span}, "shards": {$body}}""")
    // no summary → no manifest-level pruning: every intersecting shard
    // opens, per-chunk pruning still works, answers unchanged
    val before = MdioChunkStats.shardReadCount.get()
    assert(coveredChunks(dir, Array(GreaterThanOrEqual("v", 48.0))) == 2L)
    assert(MdioChunkStats.shardReadCount.get() - before == 4L,
      "pre-summary shards must all open (coverage is unprovable)")
    assert(spark.read.format("mdio").load(dir).filter($"v" >= 48.0).count() == 16L)
    MdioWriter.delete(dir)
  }

  test("stat-row fragments round-trip exactly (bits, strings, flags)") {
    val rows = Seq(
      MdioWriter.ChunkStatRow(7L, isFloat = true, -0.0, 1.5e308, 0L, 0L,
        empty = false, nan = true, cnt = 3L, sumS = "1.25", sumSqS = "0.015625"),
      MdioWriter.ChunkStatRow(8L, isFloat = false, 0.0, 0.0, -1L, Long.MinValue,
        empty = false, u64 = true),
      MdioWriter.ChunkStatRow(9L, isFloat = true, Double.NaN, Double.NaN, 0L, 0L,
        empty = true))
    val decoded = rows.map(r => MdioStatsPublish.decodeRow(MdioStatsPublish.encodeRow(r)))
    rows.zip(decoded).foreach { case (a, d) =>
      assert(java.lang.Double.doubleToRawLongBits(a.minD) ==
        java.lang.Double.doubleToRawLongBits(d.minD))
      assert(java.lang.Double.doubleToRawLongBits(a.maxD) ==
        java.lang.Double.doubleToRawLongBits(d.maxD))
      assert(a.copy(minD = 0, maxD = 0) == d.copy(minD = 0, maxD = 0))
    }
  }

  test("leading-dim trim is manifest surgery: exactly one shard file opened") {
    // 16 leads over span 4 → 4 shard files; a trim boundary inside shard 2
    // must carry shards 0/1 BY REFERENCE (old generation in the manifest,
    // no read, no rewrite), read+filter+rewrite ONLY shard 2, and drop+GC
    // shard 3 — O(1) shard I/O regardless of store size (r13 verdict #1).
    val varDir = graft.zarr.VPath(
      Files.createTempDirectory("mdio_vstats").resolve("surgery").toString)
    varDir.mkdirs()
    val entries: Map[String, MdioChunkStats.Entry] = (0 until 16).map(i =>
      i.toString -> Some(MdioChunkStats.Bounds(BigDecimal(i), BigDecimal(i)))).toMap
    MdioChunkStats.replace(varDir, entries, span = 4L)
    val g1 = MdioChunkStats.generation(varDir)
    assert(MdioChunkStats.readManifest(varDir).get.shards.keySet == Set(0L, 1L, 2L, 3L))
    val before = MdioChunkStats.shardReadCount.get()
    MdioChunkStats.trimLeadSurgery(varDir, chunkKeep = 10L)
    assert(MdioChunkStats.shardReadCount.get() - before == 1L,
      "surgery must open ONLY the boundary shard")
    val m = MdioChunkStats.readManifest(varDir).get
    assert(m.gen == MdioChunkStats.generation(varDir) && m.gen == g1 + 1)
    assert(m.shards.keySet == Set(0L, 1L, 2L), m.shards.keySet)
    assert(m.shards(0L).gen == g1 && m.shards(1L).gen == g1,
      "wholly-surviving shards must carry by reference at their old generation")
    assert(m.shards(2L).gen == g1 + 1, "the boundary shard must rewrite")
    assert(m.shards(2L).count == 2L && m.shards(2L).hi.contains(BigDecimal(9)))
    assert(!varDir.resolve(MdioChunkStats.shardFile(3L)).exists,
      "the wholly-past shard file must GC")
    assert(MdioChunkStats.current(varDir).get.keySet ==
      (0 until 10).map(_.toString).toSet)
    // boundary ON a shard edge: zero shards opened
    val before2 = MdioChunkStats.shardReadCount.get()
    MdioChunkStats.trimLeadSurgery(varDir, chunkKeep = 8L)
    assert(MdioChunkStats.shardReadCount.get() - before2 == 0L,
      "a shard-aligned boundary opens no shard file")
    assert(MdioChunkStats.current(varDir).get.keySet ==
      (0 until 8).map(_.toString).toSet)
    // legacy monolithic sidecar: filtered in place (one file either way)
    val legacyDir = graft.zarr.VPath(
      Files.createTempDirectory("mdio_vstats").resolve("legacy").toString)
    legacyDir.mkdirs()
    legacyDir.resolve(MdioChunkStats.GenFile).writeString("1")
    legacyDir.resolve(MdioChunkStats.StatsFile).writeString(
      """{"generation": 1, "chunks": {"0": [0, 7], "1": [8, 15], "2": [16, 23]}}""")
    MdioChunkStats.trimLeadSurgery(legacyDir, chunkKeep = 2L)
    val lcur = MdioChunkStats.current(legacyDir)
    assert(lcur.isDefined && lcur.get.keySet == Set("0", "1"), lcur)
    // stale sidecar: surgery only bumps (today's invalidation)
    MdioChunkStats.bump(legacyDir)
    MdioChunkStats.trimLeadSurgery(legacyDir, chunkKeep = 1L)
    assert(MdioChunkStats.current(legacyDir).isEmpty)
  }

  test("trailing-dim trim filters stats per shard and keeps pruning live") {
    val dir = Files.createTempDirectory("mdio_vstats").resolve("t2.mdio").toString
    MdioWriter.create(MdioSpec.fromJson(
      """{
        |  "metadata": {"name": "t2", "apiVersion": "v1.0", "createdOn": "2026-01-01T00:00:00Z"},
        |  "variables": [
        |    {"name": "x", "dataType": "int64",
        |     "dimensions": [{"name": "x", "size": 8}]},
        |    {"name": "y", "dataType": "int64",
        |     "dimensions": [{"name": "y", "size": 8}]},
        |    {"name": "v", "dataType": "float64",
        |     "dimensions": [{"name": "x", "size": 8}, {"name": "y", "size": 8}],
        |     "metadata": {"chunkGrid": {"name": "regular", "configuration": {"chunkShape": [4, 4]}}}}
        |  ]
        |}""".stripMargin), dir)
    MdioWriter.writeVariable(spark,
      spark.range(64).select(($"id" / 8).cast("long").as("x"), ($"id" % 8).as("y"),
        $"id".cast("double").as("v")), dir, "v")
    val varDir = ZarrMeta.path(dir).resolve("v")
    assert(MdioChunkStats.current(varDir).get.keySet ==
      Set("0.0", "0.1", "1.0", "1.1"))
    // trim the TRAILING dim to 4: chunks (·,1) drop; the executor-side
    // per-shard filter must retain (·,0)'s exact entries, generation-current
    MdioWriter.trim(dir, "y", 4L)
    val cur = MdioChunkStats.current(varDir)
    assert(cur.isDefined, "trailing-dim trim must retain surviving stats")
    assert(cur.get.keySet == Set("0.0", "1.0"), cur.get.keySet)
    assert(stripped(cur.get("0.0")) ==
      Some(MdioChunkStats.Bounds(BigDecimal(0), BigDecimal(27))))
    assert(coveredChunks(dir, Array(GreaterThanOrEqual("v", 32.0))) == 1L)
    assert(coveredChunks(dir, Array.empty) == 2L)
    assert(spark.read.format("mdio").load(dir).count() == 32L)
    assert(spark.read.format("mdio").load(dir).filter($"v" >= 32.0).count() == 16L)
    MdioWriter.delete(dir)
  }

  test("trim deletes past-boundary chunk files from executors, not the driver") {
    // 128-chunk store, 112 past the boundary: the delete set is far past the
    // inline floor, so trim must run it as a Spark job (≥1 stage) whose
    // tasks return ~nothing — the r13 verdict's last O(chunks) driver stage.
    val dir = Files.createTempDirectory("mdio_vstats").resolve("deltrim.mdio").toString
    MdioWriter.create(MdioSpec.fromJson(
      """{
        |  "metadata": {"name": "deltrim", "apiVersion": "v1.0", "createdOn": "2026-01-01T00:00:00Z"},
        |  "variables": [
        |    {"name": "x", "dataType": "int64",
        |     "dimensions": [{"name": "x", "size": 512}]},
        |    {"name": "v", "dataType": "float64",
        |     "dimensions": [{"name": "x", "size": 512}],
        |     "metadata": {"chunkGrid": {"name": "regular", "configuration": {"chunkShape": [4]}}}}
        |  ]
        |}""".stripMargin), dir)
    MdioWriter.writeVariable(spark,
      spark.range(512).select($"id".as("x"), $"id".cast("double").as("v")), dir, "v")
    val ownStages = java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()
    val stagesSeen = new java.util.concurrent.atomic.AtomicInteger
    val maxResult = new java.util.concurrent.atomic.AtomicLong
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onStageSubmitted(
          s: org.apache.spark.scheduler.SparkListenerStageSubmitted): Unit =
        ownStages.add(s.stageInfo.stageId)
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (ownStages.contains(t.stageId) && t.taskMetrics != null)
          maxResult.getAndAccumulate(t.taskMetrics.resultSize, math.max)
      override def onStageCompleted(
          s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        if (ownStages.contains(s.stageInfo.stageId)) stagesSeen.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    // r16: the doomed-file listing STREAMS — cap the driver batch at 48
    // names (112 chunks fall past the boundary) and pin that no more than
    // one batch ever materializes on the driver at once
    val priorBatch = MdioWriter.DeleteStreamBatch
    MdioWriter.DeleteStreamBatch = 48
    MdioWriter.deleteStreamHeldMax.set(0L)
    try {
      MdioWriter.trim(dir, "x", 64L)
      eventually(stagesSeen.get() >= 1)
      assert(maxResult.get() < 16 * 1024,
        s"a delete task shipped ${maxResult.get()} B to the driver")
      val held = MdioWriter.deleteStreamHeldMax.get()
      assert(held > 0 && held <= 48,
        s"driver held $held doomed names at once; the listing must stream in batches")
    } finally {
      MdioWriter.DeleteStreamBatch = priorBatch
      spark.sparkContext.removeSparkListener(listener)
    }
    val arrayDir = ZarrMeta.path(dir).resolve("v")
    val chunkFiles = arrayDir.list().filter(p => p.isFile && !p.name.startsWith("."))
    assert(chunkFiles.size == 16, s"expected 16 surviving chunk files, got ${chunkFiles.size}")
    assert(chunkFiles.forall(_.name.toLong < 16))
    assert(spark.read.format("mdio").load(dir).count() == 64L)
    MdioWriter.delete(dir)
  }

  test("end-to-end trim over a multi-shard sidecar: surgery, GC, pruning exact") {
    // a real store whose sidecar spans 4 shards: MdioWriter.trim must go
    // through the surgery path — one shard opened, the past shard's file
    // GC'd, carried shards left at their old generation — and the store
    // must answer exactly afterwards (ragged boundary chunk read-clamped)
    val dir = Files.createTempDirectory("mdio_vstats").resolve("e2e.mdio").toString
    MdioWriter.create(MdioSpec.fromJson(
      """{
        |  "metadata": {"name": "e2e", "apiVersion": "v1.0", "createdOn": "2026-01-01T00:00:00Z"},
        |  "variables": [
        |    {"name": "x", "dataType": "int64",
        |     "dimensions": [{"name": "x", "size": 128}]},
        |    {"name": "v", "dataType": "float64",
        |     "dimensions": [{"name": "x", "size": 128}],
        |     "metadata": {"chunkGrid": {"name": "regular", "configuration": {"chunkShape": [8]}}}}
        |  ]
        |}""".stripMargin), dir)
    MdioWriter.writeVariable(spark,
      spark.range(128).select($"id".as("x"), $"id".cast("double").as("v")), dir, "v")
    val varDir = ZarrMeta.path(dir).resolve("v")
    // re-shard the sidecar at span 4: 16 chunk entries → shards 0..3
    MdioChunkStats.replace(varDir, MdioChunkStats.current(varDir).get, span = 4L)
    val g1 = MdioChunkStats.generation(varDir)
    val before = MdioChunkStats.shardReadCount.get()
    MdioWriter.trim(dir, "x", 84L) // chunkKeep 10: boundary inside shard 2
    assert(MdioChunkStats.shardReadCount.get() - before == 1L,
      "an end-to-end trim must open only the boundary shard")
    val m = MdioChunkStats.readManifest(varDir).get
    assert(m.gen == MdioChunkStats.generation(varDir))
    assert(m.shards.keySet == Set(0L, 1L, 2L))
    assert(m.shards(0L).gen == g1 && m.shards(2L).gen == g1 + 1)
    assert(!varDir.resolve(MdioChunkStats.shardFile(3L)).exists)
    assert(MdioChunkStats.current(varDir).get.keySet ==
      (0 until 10).map(_.toString).toSet)
    // answers exact over the surviving volume, ragged chunk clamped
    val df = spark.read.format("mdio").load(dir)
    assert(df.count() == 84L)
    assert(df.filter($"v" >= 72.0).count() == 12L) // cells 72..83 incl. ragged
    assert(planned(dir, Array(GreaterThanOrEqual("v", 72.0))) <
      planned(dir, Array.empty))
    MdioWriter.delete(dir)
  }

  test("MdioValueRange conjunction and boundary semantics") {
    val r = MdioValueRange(None, None)
      .narrow(Some((BigDecimal(10), true)), None)
      .narrow(Some((BigDecimal(10), false)), Some((BigDecimal(20), true)))
    // tie on the lo bound: open beats closed
    assert(!r.intersects(BigDecimal(5), BigDecimal(10)))  // max == open lo 10
    assert(r.intersects(BigDecimal(5), BigDecimal(11)))
    assert(r.intersects(BigDecimal(20), BigDecimal(30)))  // min == closed hi 20
    assert(!r.intersects(BigDecimal(21), BigDecimal(30)))
  }
}
