package graft.sources

import graft.SparkSpec
import graft.operators.MdioStats
import graft.spec.MdioSpec
import graft.zarr.ZarrMeta
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** WINDOWED rank-QC family (r18): kthSmallest / quantilesOf /
  * extremaLocation / countInRange restricted to a dim-index box — the
  * depth-window readouts (`WHERE inline BETWEEN a AND b`) a seismic user
  * runs against a crop. Chunk-aligned windows must ride the pruned
  * metadata machinery over the box's own chunks only; misaligned windows
  * must fall back to an exact SLICED scan (never the full variable); and
  * a NaN outside the box must not disturb the box's answers. Every case
  * compares against brute force over the sliced cells. */
class MdioWindowedQcSpec extends SparkSpec {
  import spark.implicits._

  private def create(values: Long => Double): String = {
    val dir = Files.createTempDirectory("mdio_wqc").resolve("s.mdio").toString
    MdioWriter.create(MdioSpec.fromJson(
      s"""{
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

  test("kthSmallest over a chunk-aligned window prunes; misaligned slices stay exact") {
    val vals = (0 until 64).map(i => ((i * 11) % 23).toDouble)
    val dir = create(i => vals(i.toInt))
    val win = vals.slice(16, 48).sorted
    val r = MdioStats.kthSmallest(spark, dir, "v", 5,
      ranges = Map("x" -> (16L, 48L)))
    assert(!r.fallback, "aligned window fell back")
    assert(r.value == win(4), r)
    // probe + window scans touch only in-box chunks (4 chunks, each at
    // most once per job)
    assert(r.scannedChunks <= 8, r)
    val mis = MdioStats.kthSmallest(spark, dir, "v", 5,
      ranges = Map("x" -> (13L, 48L)))
    assert(mis.fallback, "misaligned window must fall back")
    assert(mis.value == vals.slice(13, 48).sorted.apply(4), mis)
    MdioWriter.delete(dir)
  }

  test("quantilesOf over a window: the vector ranks the box's cells only") {
    val vals = (0 until 64).map(i => ((i * 7) % 13).toDouble)
    val dir = create(i => vals(i.toInt))
    val win = vals.slice(8, 40).sorted // n = 32
    val r = MdioStats.quantilesOf(spark, dir, "v", Seq(0.25, 0.5, 1.0),
      ranges = Map("x" -> (8L, 40L)))
    assert(!r.fallback, "aligned window fell back")
    assert(r.n == 32, r)
    assert(r.ks == Seq(8L, 16L, 32L), r)
    assert(r.values == Seq(win(7), win(15), win(31)), r)
    // the slab-median wrapper takes the same window: absolute slab ids,
    // the clipped first and last slabs rank their surviving cells
    val ml = MdioStats.medianByLead(spark, dir, "v", 16L,
      ranges = Map("x" -> (8L, 40L)))
    assert(!ml.fallback, "windowed medianByLead fell back")
    val wantMl = Seq((8, 16), (16, 32), (32, 40)).zipWithIndex.map {
      case ((lo, hi), g) =>
        val cells = vals.slice(lo, hi).sorted
        ((lo / 16).toLong, cells((cells.size + 1) / 2 - 1), cells.size.toLong)
    }
    assert(ml.result.orderBy("slab").collect()
      .map(x => (x.getLong(0), x.getDouble(1), x.getLong(2))).toSeq == wantMl, ml)
    MdioWriter.delete(dir)
  }

  test("extremaLocation over a window: the crop's own peak, not the global one") {
    // global max at x=0 and global min at x=63 sit OUTSIDE the window;
    // the window must locate its own extrema (first occurrence)
    val vals = (0 until 64).map {
      case 0 => 1000.0
      case 63 => -1000.0
      case i => ((i * 5) % 17).toDouble
    }
    val dir = create(i => vals(i.toInt))
    val r = MdioStats.extremaLocation(spark, dir, "v",
      ranges = Map("x" -> (8L, 56L)))
    assert(!r.fallback, "aligned window fell back")
    val row = r.result.head
    val win = vals.zipWithIndex.slice(8, 56)
    val (wmin, wminAt) = win.minBy(_._1)
    val (wmax, wmaxAt) = win.maxBy(_._1)
    assert(row.getDouble(0) == wmin && row.getLong(1) == wminAt, row)
    assert(row.getDouble(2) == wmax && row.getLong(3) == wmaxAt, row)
    // candidacy pruned to the chunks whose bounds equal a window extremum
    assert(r.scannedChunks >= 1 && r.scannedChunks <= 6, r)
    // misaligned: same answer through the sliced locate scan
    val mis = MdioStats.extremaLocation(spark, dir, "v",
      ranges = Map("x" -> (9L, 56L)))
    assert(mis.fallback)
    val win2 = vals.zipWithIndex.slice(9, 56)
    val m2 = mis.result.head
    assert(m2.getDouble(0) == win2.minBy(_._1)._1 &&
      m2.getDouble(2) == win2.maxBy(_._1)._1, m2)
    MdioWriter.delete(dir)
  }

  test("countInRange over a window: out-of-box chunks appear in no counter") {
    val vals = (0 until 64).map(i => ((i * 3) % 29).toDouble)
    val dir = create(i => vals(i.toInt))
    val r = MdioStats.countInRange(spark, dir, "v", 5.0, 20.0,
      ranges = Map("x" -> (16L, 48L)))
    assert(!r.fallback, "aligned window fell back")
    val want = vals.slice(16, 48).count(v => v >= 5.0 && v <= 20.0)
    assert(r.count == want, r)
    // every counter speaks about the box's 4 chunks only
    assert(r.metadataChunks + r.outsideChunks + r.scannedChunks <= 4, r)
    val mis = MdioStats.countInRange(spark, dir, "v", 5.0, 20.0,
      ranges = Map("x" -> (16L, 47L)))
    assert(mis.fallback)
    assert(mis.count == vals.slice(16, 47).count(v => v >= 5.0 && v <= 20.0), mis)
    MdioWriter.delete(dir)
  }

  test("histogramMeta over a window bins the crop's cells only") {
    val vals = (0 until 64).map(i => ((i * 13) % 31).toDouble)
    val dir = create(i => vals(i.toInt))
    def brute(lo: Int, hi: Int): Seq[(Long, Double, Long)] =
      vals.slice(lo, hi)
        .map(v => math.min(math.max(math.floor(v / 8.0).toLong, 0L), 3L))
        .groupBy(identity).toSeq.filter(_._2.nonEmpty).sortBy(_._1)
        .map { case (b, cs) => (b, (b + 0.5) * 8.0, cs.size.toLong) }
    val r = MdioStats.histogramMeta(spark, dir, "v", 0.0, 8.0, 4,
      ranges = Map("x" -> (16L, 48L)))
    assert(!r.fallback, "aligned window fell back")
    assert(r.result.collect().map(x =>
      (x.getLong(0), x.getDouble(1), x.getLong(2))).toSeq == brute(16, 48), r)
    // every chunk the triage speaks about is one of the window's 4
    assert(r.metadataChunks + r.scannedChunks <= 4, r)
    val mis = MdioStats.histogramMeta(spark, dir, "v", 0.0, 8.0, 4,
      ranges = Map("x" -> (17L, 48L)))
    assert(mis.fallback)
    assert(mis.result.collect().map(x =>
      (x.getLong(0), x.getDouble(1), x.getLong(2))).toSeq == brute(17, 48), mis)
    MdioWriter.delete(dir)
  }

  test("countInRangeByBox over a window: absolute slab ids, clipped slabs count surviving cells") {
    val vals = (0 until 64).map(i => ((i * 9) % 26).toDouble)
    val dir = create(i => vals(i.toInt))
    val r = MdioStats.countInRangeByBox(spark, dir, "v", 4.0, 18.0, Seq(16L),
      ranges = Map("x" -> (8L, 56L)))
    assert(!r.fallback, "aligned window fell back")
    val want = vals.zipWithIndex.slice(8, 56).groupBy(_._2 / 16).toSeq
      .sortBy(_._1).map { case (g, cs) =>
        (g.toLong, cs.count(c => c._1 >= 4.0 && c._1 <= 18.0).toLong,
          cs.size.toLong)
      }
    assert(r.result.orderBy("g_x").collect().map(x =>
      (x.getLong(0), x.getLong(1), x.getLong(2))).toSeq == want,
      r.result.collect().mkString("\n"))
    val mis = MdioStats.countInRangeByBox(spark, dir, "v", 4.0, 18.0, Seq(16L),
      ranges = Map("x" -> (8L, 55L)))
    assert(mis.fallback)
    val want2 = vals.zipWithIndex.slice(8, 55).groupBy(_._2 / 16).toSeq
      .sortBy(_._1).map { case (g, cs) =>
        (g.toLong, cs.count(c => c._1 >= 4.0 && c._1 <= 18.0).toLong,
          cs.size.toLong)
      }
    assert(mis.result.orderBy("g_x").collect().map(x =>
      (x.getLong(0), x.getLong(1), x.getLong(2))).toSeq == want2, mis)
    MdioWriter.delete(dir)
  }

  test("extremaByBox on a 2-D TILE geometry: per-tile peaks, windowed crop") {
    val dir = Files.createTempDirectory("mdio_wqc").resolve("t.mdio").toString
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
    val cells = spark.range(16).select($"id".as("inline"))
      .crossJoin(spark.range(8).select($"id".as("crossline")))
      .select($"inline", $"crossline",
        (($"inline" * 7 + $"crossline" * 11) % 23).cast("double").as("v"))
    MdioWriter.writeVariable(spark, cells, dir, "v")
    val data = cells.collect().map(r =>
      ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    def brute(iLo: Int, iHi: Int): Seq[Seq[Any]] =
      (for { ti <- 0 until 2; tj <- 0 until 2 } yield (ti, tj)).flatMap {
        case (ti, tj) =>
          val tc = (for {
            i <- math.max(8 * ti, iLo) until math.min(8 * (ti + 1), iHi)
            j <- 4 * tj until 4 * (tj + 1)
          } yield ((i.toLong, j.toLong), data((i.toLong, j.toLong)))).toSeq
          if (tc.isEmpty) None
          else {
            val mn = tc.map(_._2).min
            val mx = tc.map(_._2).max
            val pmn = tc.find(_._2 == mn).get._1
            val pmx = tc.find(_._2 == mx).get._1
            Some(Seq[Any](ti.toLong, tj.toLong, mn, pmn._1, pmn._2,
              mx, pmx._1, pmx._2, tc.size.toLong))
          }
      }
    def rows(r: graft.operators.MdioStats.GroupedExtrema) =
      r.result.orderBy("g_inline", "g_crossline").collect().map(_.toSeq).toSeq
    // full tiles (8x4 = 2x2 tiles of 4 chunks... 8x4 tile = 2x1 chunks)
    val full = MdioStats.extremaByBox(spark, dir, "v", Seq(8L, 4L))
    assert(!full.fallback)
    assert(rows(full) == brute(0, 16), s"full-tile mismatch:\n${rows(full)}")
    // inline-window crop: clipped tiles locate within surviving cells
    val crop = MdioStats.extremaByBox(spark, dir, "v", Seq(8L, 4L),
      ranges = Map("inline" -> (4L, 12L)))
    assert(!crop.fallback)
    assert(rows(crop) == brute(4, 12), s"cropped-tile mismatch:\n${rows(crop)}")
    MdioWriter.delete(dir)
  }

  test("selWindow resolves value windows to index ranges and rides the pruned machinery") {
    val vals = (0 until 64).map(i => ((i * 11) % 23).toDouble)
    val dir = create(i => vals(i.toInt))
    // dimension coordinate: x ↦ 100 + 25·i (monotonic survey numbering)
    MdioWriter.writeVariable(spark,
      spark.range(64).select($"id".as("x"),
        (lit(100L) + $"id" * 25).as("x__value")), dir, "x")
    // BOTH endpoints sit exactly on coordinate values: stop-INCLUSIVE P8
    // sel semantics must keep i = 8 (300) and i = 31 (875)
    val win = MdioStats.selWindow(spark, dir, Map("x" -> (300.0, 875.0)))
    assert(win == Map("x" -> (8L, 32L)), win)
    // the resolved range is an ordinary QC window: chunk-aligned, so the
    // rank machinery prunes, and the answer equals the index-window form
    val r = MdioStats.kthSmallest(spark, dir, "v", 5, ranges = win)
    assert(!r.fallback, "sel-resolved aligned window fell back")
    assert(r.value == vals.slice(8, 32).sorted.apply(4), r)
    // a value window resolving to a MISALIGNED index range stays exact
    // through the operators' sliced fallback
    val mis = MdioStats.selWindow(spark, dir, Map("x" -> (325.0, 875.0)))
    assert(mis == Map("x" -> (9L, 32L)), mis)
    val rm = MdioStats.kthSmallest(spark, dir, "v", 5, ranges = mis)
    assert(rm.fallback && rm.value == vals.slice(9, 32).sorted.apply(4), rm)
    MdioWriter.delete(dir)
  }

  test("selWindow on a listed coordinate; shuffled and empty windows decline loudly") {
    val dir = Files.createTempDirectory("mdio_wqc").resolve("c.mdio").toString
    MdioWriter.create(MdioSpec.fromJson(
      """{
        |  "metadata": {"name": "c", "apiVersion": "v1.0", "createdOn": "2026-01-01T00:00:00Z"},
        |  "variables": [
        |    {"name": "x", "dataType": "int64",
        |     "dimensions": [{"name": "x", "size": 64}]},
        |    {"name": "twt", "dataType": "float64",
        |     "dimensions": [{"name": "x", "size": 64}]},
        |    {"name": "shuf", "dataType": "int64",
        |     "dimensions": [{"name": "x", "size": 64}]},
        |    {"name": "v", "dataType": "float64",
        |     "dimensions": [{"name": "x", "size": 64}],
        |     "metadata": {"chunkGrid": {"name": "regular", "configuration": {"chunkShape": [8]}}}}
        |  ]
        |}""".stripMargin), dir)
    MdioWriter.writeVariable(spark,
      spark.range(64).select($"id".as("x"), ($"id" * 4.0).as("twt")), dir, "twt")
    // a SHUFFLED coordinate: matches of a value window scatter across
    // non-contiguous indices — a gather, not a slice
    MdioWriter.writeVariable(spark,
      spark.range(64).select($"id".as("x"), (($"id" * 37) % 64).as("shuf")),
      dir, "shuf")
    MdioWriter.writeVariable(spark,
      spark.range(64).select($"id".as("x"), ($"id" % 7).cast("double").as("v")),
      dir, "v")
    // listed coordinate (value column carries its own name, no __value)
    assert(MdioStats.selWindow(spark, dir, Map("twt" -> (32.0, 126.0))) ==
      Map("x" -> (8L, 32L)))
    val shuffled = intercept[IllegalArgumentException] {
      MdioStats.selWindow(spark, dir, Map("shuf" -> (10.0, 20.0)))
    }
    assert(shuffled.getMessage.contains("not monotonic"), shuffled.getMessage)
    val empty = intercept[IllegalArgumentException] {
      MdioStats.selWindow(spark, dir, Map("twt" -> (1000.0, 2000.0)))
    }
    assert(empty.getMessage.contains("matches no"), empty.getMessage)
    // the data variable is not a 1-D coordinate lookup target in a
    // multi-window map naming one dim twice
    val dup = intercept[IllegalArgumentException] {
      MdioStats.selWindow(spark, dir,
        Map("twt" -> (32.0, 126.0), "shuf" -> (0.0, 63.0)))
    }
    assert(dup.getMessage.contains("one dim twice") ||
      dup.getMessage.contains("not monotonic"), dup.getMessage)
    MdioWriter.delete(dir)
  }

  test("OR-of-ranges windows: a union of disjoint slabs ranks and counts in one pass") {
    val vals = (0 until 64).map(i => ((i * 13) % 29).toDouble)
    val dir = create(i => vals(i.toInt))
    val windows = Seq(Map("x" -> (0L, 16L)), Map("x" -> (32L, 48L)))
    val union = (vals.slice(0, 16) ++ vals.slice(32, 48)).sorted // n = 32
    // quantile vector over the union: one bracket/probe/window pass
    val q = MdioStats.quantilesOf(spark, dir, "v", Seq(0.25, 0.5, 1.0),
      windows = windows)
    assert(!q.fallback, "aligned union fell back")
    assert(q.n == 32 && q.ks == Seq(8L, 16L, 32L), q)
    assert(q.values == Seq(union(7), union(15), union(31)), q)
    // kthSmallest routes through the same batched machinery
    val k = MdioStats.kthSmallest(spark, dir, "v", 5, windows = windows)
    assert(!k.fallback && k.value == union(4), k)
    // countInRange over the union: out-of-union chunks in no counter
    val want = (vals.slice(0, 16) ++ vals.slice(32, 48)).count(v => v >= 5.0 && v <= 15.0)
    val cr = MdioStats.countInRange(spark, dir, "v", 5.0, 15.0, windows = windows)
    assert(!cr.fallback && cr.count == want, cr)
    // ADJACENT windows are disjoint: the union equals the merged slab
    val adj = MdioStats.kthSmallest(spark, dir, "v", 5,
      windows = Seq(Map("x" -> (0L, 16L)), Map("x" -> (16L, 32L))))
    val merged = MdioStats.kthSmallest(spark, dir, "v", 5,
      ranges = Map("x" -> (0L, 32L)))
    assert(!adj.fallback && adj.value == merged.value, (adj, merged))
    // a MISALIGNED member makes the whole union answer exactly through
    // the sliced-union scan, never the full variable's rank arithmetic
    val mis = MdioStats.quantilesOf(spark, dir, "v", Seq(0.5),
      windows = Seq(Map("x" -> (0L, 13L)), Map("x" -> (32L, 48L))))
    val misCells = (vals.slice(0, 13) ++ vals.slice(32, 48)).sorted
    assert(mis.fallback, "misaligned union must fall back")
    assert(mis.values == Seq(misCells((misCells.size + 1) / 2 - 1)), mis)
    // OVERLAPPING windows decline loudly — cells would double-count
    val dup = intercept[IllegalArgumentException] {
      MdioStats.countInRange(spark, dir, "v", 5.0, 15.0,
        windows = Seq(Map("x" -> (0L, 16L)), Map("x" -> (8L, 24L))))
    }
    assert(dup.getMessage.contains("overlap"), dup.getMessage)
    // ranges and windows are mutually exclusive
    val both = intercept[IllegalArgumentException] {
      MdioStats.quantilesOf(spark, dir, "v", Seq(0.5),
        ranges = Map("x" -> (0L, 16L)), windows = windows)
    }
    assert(both.getMessage.contains("not both"), both.getMessage)
    // extremaLocation over the union: the peak of two slabs in one call
    // (the global max at x=20 sits BETWEEN the slabs and must not win)
    val uvals = vals.indices.map(i => if (i == 20) 1000.0 else vals(i))
    val dir2 = create(i => uvals(i.toInt))
    val ex = MdioStats.extremaLocation(spark, dir2, "v", windows = windows)
    assert(!ex.fallback, "aligned union extremaLocation fell back")
    val exr = ex.result.head
    val ucells = uvals.slice(0, 16) ++ uvals.slice(32, 48)
    assert(exr.getDouble(0) == ucells.min && exr.getDouble(2) == ucells.max, exr)
    // histogramMeta over the union bins exactly the union's cells
    val h = MdioStats.histogramMeta(spark, dir2, "v", 0.0, 8.0, 4,
      windows = windows)
    assert(!h.fallback, "aligned union histogramMeta fell back")
    val bins = h.result.collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    (0 until 4).foreach { b =>
      val want = ucells.count(c => math.min(math.max(
        math.floor(c / 8.0).toInt, 0), 3) == b).toLong
      assert(bins.getOrElse(b.toLong, 0L) == want, s"bin $b: $bins vs $want")
    }
    MdioWriter.delete(dir2)
    // COMPOSITION: two selWindow-resolved VALUE windows ride `windows` —
    // the end-to-end "median of two depth slabs stated in depth values"
    MdioWriter.writeVariable(spark,
      spark.range(64).select($"id".as("x"),
        (lit(100L) + $"id" * 25).as("x__value")), dir, "x")
    val w1 = MdioStats.selWindow(spark, dir, Map("x" -> (100.0, 475.0)))
    val w2 = MdioStats.selWindow(spark, dir, Map("x" -> (900.0, 1275.0)))
    assert(w1 == Map("x" -> (0L, 16L)) && w2 == Map("x" -> (32L, 48L)), (w1, w2))
    val selQ = MdioStats.quantilesOf(spark, dir, "v", Seq(0.5),
      windows = Seq(w1, w2))
    assert(!selQ.fallback && selQ.values == Seq(union(15)), selQ)
    MdioWriter.delete(dir)
  }

  test("the opened-entry budget bounds every direct operator's driver triage") {
    // 2-D store, TRAILING-dim window: the window cuts every shard's
    // summary (a shard's [lo,hi]×cells describes cells the window drops),
    // so every shard in the lead box must OPEN for per-chunk triage —
    // exactly the O(all-shard-entries) driver parse the r19 entry budget
    // exists to bound. Past the budget every operator must DECLINE to its
    // exact distributed scan (fallback = true, same answer); within it,
    // the pruned path answers (fallback = false).
    val dir = Files.createTempDirectory("mdio_wqc").resolve("b.mdio").toString
    MdioWriter.create(MdioSpec.fromJson(
      """{
        |  "metadata": {"name": "b", "apiVersion": "v1.0", "createdOn": "2026-01-01T00:00:00Z"},
        |  "variables": [
        |    {"name": "x", "dataType": "int64", "dimensions": [{"name": "x", "size": 64}]},
        |    {"name": "y", "dataType": "int64", "dimensions": [{"name": "y", "size": 16}]},
        |    {"name": "v", "dataType": "float64",
        |     "dimensions": [{"name": "x", "size": 64}, {"name": "y", "size": 16}],
        |     "metadata": {"chunkGrid": {"name": "regular", "configuration": {"chunkShape": [8, 8]}}}}
        |  ]
        |}""".stripMargin), dir)
    def value(x: Long, y: Long): Double = ((x * 16 + y) * 7 % 23).toDouble
    val fn = udf(value _)
    MdioWriter.writeVariable(spark,
      spark.range(64 * 16).select(($"id" / 16).cast("long").as("x"),
        ($"id" % 16).as("y"),
        fn(($"id" / 16).cast("long"), $"id" % 16).as("v")), dir, "v")
    val win = Map("y" -> (0L, 8L))
    val cells = for (x <- 0L until 64L; y <- 0L until 8L) yield value(x, y)
    def slab(gx: Long): Seq[Double] =
      for (x <- gx * 16 until (gx + 1) * 16; y <- 0L until 8L) yield value(x, y)
    def runAll(expectFallback: Boolean): Unit = {
      val why = if (expectFallback) "under the lowered budget" else "within budget"
      val cr = MdioStats.countInRange(spark, dir, "v", 5.0, 15.0, ranges = win)
      assert(cr.fallback == expectFallback, s"countInRange $why: $cr")
      assert(cr.count == cells.count(c => c >= 5.0 && c <= 15.0), cr)
      val kth = MdioStats.kthSmallest(spark, dir, "v", 10, ranges = win)
      assert(kth.fallback == expectFallback, s"kthSmallest $why: $kth")
      assert(kth.value == cells.sorted.apply(9), kth)
      val ex = MdioStats.extremaLocation(spark, dir, "v", ranges = win)
      assert(ex.fallback == expectFallback, s"extremaLocation $why")
      val exr = ex.result.head
      assert(exr.getDouble(0) == cells.min && exr.getDouble(3) == cells.max, exr)
      val hist = MdioStats.histogramMeta(spark, dir, "v", 0.0, 6.0, 4, ranges = win)
      assert(hist.fallback == expectFallback, s"histogramMeta $why")
      val bins = hist.result.collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      (0 until 4).foreach { b =>
        val want = cells.count(c => (c / 6.0).toInt.min(3) == b).toLong
        assert(bins.getOrElse(b.toLong, 0L) == want, s"bin $b: $bins")
      }
      val gc = MdioStats.countInRangeByBox(spark, dir, "v", 5.0, 15.0,
        Seq(16L, 16L), ranges = win)
      assert(gc.fallback == expectFallback, s"countInRangeByBox $why")
      val gcRows = gc.result.collect()
        .map(r => r.getAs[Long]("g_x") -> r.getAs[Long]("cnt")).toMap
      (0L until 4L).foreach { gx =>
        assert(gcRows(gx) == slab(gx).count(c => c >= 5.0 && c <= 15.0), gcRows)
      }
      val ge = MdioStats.extremaByBox(spark, dir, "v", Seq(16L, 16L), ranges = win)
      assert(ge.fallback == expectFallback, s"extremaByBox $why")
      val geRows = ge.result.collect()
        .map(r => r.getAs[Long]("g_x") ->
          (r.getAs[Double]("v_min"), r.getAs[Double]("v_max"))).toMap
      (0L until 4L).foreach { gx =>
        assert(geRows(gx) == (slab(gx).min, slab(gx).max), geRows)
      }
      val gq = MdioStats.quantilesByBox(spark, dir, "v", Seq(0.5), Seq(16L, 16L),
        ranges = win)
      assert(gq.fallback == expectFallback, s"quantilesByBox $why")
      val gqRows = gq.result.collect()
        .map(r => r.getAs[Long]("g_x") -> r.getAs[Double]("q")).toMap
      (0L until 4L).foreach { gx =>
        assert(gqRows(gx) == slab(gx).sorted.apply(63), gqRows) // ⌈0.5·128⌉ = 64
      }
    }
    runAll(expectFallback = false)
    // the trailing-cut window feeds 8 leads × 2 trailing chunks = 16
    // entries; a budget of 8 must abort the walk in EVERY operator
    spark.conf.set("spark.graft.mdio.maxPushedGroups", "8")
    try runAll(expectFallback = true)
    finally spark.conf.unset("spark.graft.mdio.maxPushedGroups")
    // cap restored: the pruned path comes back
    runAll(expectFallback = false)
    MdioWriter.delete(dir)
  }

  test("the refinement loops share the entry budget") {
    // all-equal values + one chunk per shard: EVERY shard's summary rides
    // coarse through the walk (no keys fed), then every shard is a
    // bracket/extremum candidate — the refinement, not the walk, is where
    // the driver parse would blow up, and it must decline past the budget
    val dir = create(_ => 7.5)
    val varDir = graft.zarr.ZarrMeta.path(dir).resolve("v")
    MdioChunkStats.write(varDir, MdioChunkStats.generation(varDir),
      MdioChunkStats.current(varDir).get, span = 1)
    spark.conf.set("spark.graft.mdio.maxPushedGroups", "4")
    try {
      val k = MdioStats.kthSmallest(spark, dir, "v", 5)
      assert(k.fallback && k.value == 7.5, s"openCoarse budget: $k")
      val ex = MdioStats.extremaLocation(spark, dir, "v")
      assert(ex.fallback, "extremaLocation refinement budget")
      assert(ex.result.head.getDouble(0) == 7.5, ex)
      val ge = MdioStats.extremaByBox(spark, dir, "v", Seq(64L))
      assert(ge.fallback, "extremaByBox refinement budget")
      assert(ge.result.head.getAs[Double]("v_min") == 7.5, ge)
      val gq = MdioStats.quantilesByBox(spark, dir, "v", Seq(0.5), Seq(64L))
      assert(gq.fallback, "quantilesByBox refinement budget")
      assert(gq.result.head.getAs[Double]("q") == 7.5, gq)
    } finally spark.conf.unset("spark.graft.mdio.maxPushedGroups")
    // budget restored: the pruned paths return
    val k2 = MdioStats.kthSmallest(spark, dir, "v", 5)
    assert(!k2.fallback && k2.value == 7.5, k2)
    MdioWriter.delete(dir)
  }

  test("a NaN outside the window never disturbs the window's rank answers") {
    val vals = (0 until 64).map(i =>
      if (i == 3) Double.NaN else ((i * 7) % 19).toDouble)
    val dir = create(i => vals(i.toInt))
    // the NaN sits in chunk 0, the window starts at chunk 1
    val win = vals.slice(8, 64).sorted // no NaN inside
    val q = MdioStats.quantilesOf(spark, dir, "v", Seq(0.5),
      ranges = Map("x" -> (8L, 64L)))
    assert(!q.fallback && q.n == 56 && q.values == Seq(win(27)), q)
    val kth = MdioStats.kthSmallest(spark, dir, "v", 56,
      ranges = Map("x" -> (8L, 64L)))
    assert(!kth.fallback && kth.value == win(55), kth)
    // a window CONTAINING the NaN ranks finite cells only (n drops by 1)
    val qn = MdioStats.quantilesOf(spark, dir, "v", Seq(1.0),
      ranges = Map("x" -> (0L, 16L)))
    assert(qn.n == 15 && qn.values ==
      Seq(vals.slice(0, 16).filterNot(_.isNaN).max), qn)
    MdioWriter.delete(dir)
  }
}
