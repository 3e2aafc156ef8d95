package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class VectorsSpec extends SparkSpec {
  import spark.implicits._

  test("dot and cosine basics") {
    val df = Seq((Seq(1.0f, 2.0f), Seq(3.0f, 4.0f))).toDF("a", "b")
    assert(df.select(Vectors.dot(col("a"), col("b"))).as[Double].head() == 11.0)
    val cosSame = df.select(Vectors.cosine(col("a"), col("a"))).as[Double].head()
    assert(math.abs(cosSame - 1.0) < 1e-12)
  }

  test("bruteForceTopK returns k nearest by cosine, deterministic ties") {
    val vecs = Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(0.9f, 0.1f)),
      (3L, Seq(0.0f, 1.0f)), (4L, Seq(-1.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val ids = Vectors.bruteForceTopK(vecs, "vec_id", "embedding", Seq(1.0, 0.0), 2)
      .select("vec_id").as[Long].collect().toSeq
    assert(ids == Seq(1L, 2L))
  }

  test("batchTopK equals per-query bruteForceTopK in one corpus pass") {
    val emb = graft.Tables.embeddings(spark, sf)
    val queries = Seq(
      (0 until 64).map(i => math.sin(i + 1).abs / 8.0 + 0.01),
      (0 until 64).map(i => math.cos(i + 1).abs / 4.0))
    val batch = Vectors.batchTopK(emb, "vec_id", "embedding", queries, k = 10)
      .select("qid", "vec_id").as[(Int, Long)].collect()
      .groupBy(_._1).map { case (q, rows) => q -> rows.map(_._2).toSet }
    queries.zipWithIndex.foreach { case (q, i) =>
      val single = Vectors.bruteForceTopK(emb, "vec_id", "embedding", q, 10)
        .select("vec_id").as[Long].collect().toSet
      assert(batch(i) == single, s"query $i diverges from the single-query path")
    }
  }

  test("lshTopK recall vs brute force on the corpus (multi-probe)") {
    val emb = graft.Tables.embeddings(spark, sf)
    val q = graft.queries.Pipeline.annQuery
    val exact = Vectors.bruteForceTopK(emb, "vec_id", "embedding", q, 20)
      .select("vec_id").as[Long].collect().toSet
    val approx = Vectors.lshTopK(emb, "vec_id", "embedding", q, k = 20, planes = 4)
      .select("vec_id").as[Long].collect().toSet
    val recall = (exact intersect approx).size / 20.0
    assert(recall >= 0.5, s"recall $recall too low")
  }

  test("int8 quantization: exact values, zero-vector passthrough") {
    val df = Seq((Seq(0.5f, -1.0f, 0.25f), Seq(0.0f, 0.0f, 0.0f)))
      .toDF("v", "z")
    // max|v| = 1.0 → q = round(v·127): [64, -127, 32] (63.5 rounds away to 64)
    assert(df.select(Vectors.quantizeInt8(col("v"))).as[Seq[Double]].head()
      == Seq(64.0, -127.0, 32.0))
    assert(df.select(Vectors.quantizeInt8(col("z"))).as[Seq[Double]].head()
      == Seq(0.0, 0.0, 0.0))
    // Scala twin agrees with the column form
    assert(Vectors.quantizeInt8Local(Seq(0.5, -1.0, 0.25)) == Seq(64.0, -127.0, 32.0))
  }

  test("int8TopK recall vs float brute force on the corpus") {
    val emb = graft.Tables.embeddings(spark, sf)
    val q = graft.queries.Pipeline.annQuery
    val exact = Vectors.bruteForceTopK(emb, "vec_id", "embedding", q, 20)
      .select("vec_id").as[Long].collect().toSet
    val quant = Vectors.int8TopK(emb, "vec_id", "embedding", q, 20)
      .select("vec_id").as[Long].collect().toSet
    val recall = (exact intersect quant).size / 20.0
    assert(recall >= 0.85, s"int8 recall $recall too low") // ~0.4% per-element error
  }

  test("hyperplanes are deterministic under a fixed seed") {
    assert(Vectors.hyperplanes(8, 4) == Vectors.hyperplanes(8, 4))
  }

  test("ivfAssign places identical vectors into the same cell") {
    val centroids = Seq(Seq(1.0, 0.0), Seq(0.0, 1.0))
    val df = Seq((1L, Seq(0.9f, 0.05f)), (2L, Seq(0.95f, 0.01f)), (3L, Seq(0.0f, 0.9f)))
      .toDF("id", "v")
    val cells = Vectors.ivfAssign(df, "v", centroids)
      .select("id", "cell").as[(Long, Int)].collect().toMap
    assert(cells(1L) == cells(2L) && cells(1L) != cells(3L))
  }

  test("trainIvfCentroids is deterministic and spreads cells") {
    val emb = graft.Tables.embeddings(spark, sf)
    val c1 = Vectors.trainIvfCentroids(emb, "vec_id", "embedding", cells = 16, sampleN = 512)
    val c2 = Vectors.trainIvfCentroids(emb, "vec_id", "embedding", cells = 16, sampleN = 512)
    assert(c1 == c2)
    assert(c1.size == 16 && c1.forall(c => math.abs(math.sqrt(c.map(x => x * x).sum) - 1.0) < 1e-9))
    assert(c1.distinct.size == 16) // no collapsed duplicate centroids
  }

  test("IVF recall@20 >= 0.9 with 64 trained cells, nprobe=8, on clustered data") {
    // IVF's contract holds when embeddings cluster (real text/image
    // embeddings do): 64 ground-truth clusters, query near one of them —
    // the trained quantizer must put the true neighbors into the probed
    // cells while scanning ~nprobe/cells = 1/8 of the corpus
    val rnd = new scala.util.Random(5)
    val centers = Seq.fill(64)(Seq.fill(64)(rnd.nextGaussian()))
    val vecs = (for { c <- 0 until 64; j <- 0 until 40 } yield {
      val v = centers(c).map(x => (x + rnd.nextGaussian() * 0.15).toFloat)
      ((c * 40 + j).toLong, v)
    }).toDF("vec_id", "embedding")
    val q = centers(17).map(x => x + rnd.nextGaussian() * 0.15)
    val exact = Vectors.bruteForceTopK(vecs, "vec_id", "embedding", q, 20)
      .select("vec_id").as[Long].collect().toSet
    val centroids = Vectors.trainIvfCentroids(vecs, "vec_id", "embedding",
      cells = 64, sampleN = 2560)
    val approx = Vectors.ivfTopK(vecs, "vec_id", "embedding", q, k = 20, centroids, nprobe = 8)
      .select("vec_id").as[Long].collect().toSet
    val recall = (exact intersect approx).size / 20.0
    assert(recall >= 0.9, s"IVF recall $recall < 0.9")
    // the probe genuinely prunes: the corpus occupies (almost) all 64 cells
    val assigned = Vectors.ivfAssignNative(vecs, "embedding", centroids)
      .groupBy("cell").count().count()
    assert(assigned > 32, s"corpus occupies only $assigned cells")
  }

  test("IVF-PQ: full probe + full shortlist equals brute force; pruned recall holds") {
    // same clustered regime as the IVF gate: when nothing is pruned
    // (nprobe = cells, shortlist = N) the composition must EQUAL the
    // exact scan — any code/LUT/probe bug shows as a diff, not a recall
    // dip. Then the pruned configuration must still recall the cluster.
    val rnd = new scala.util.Random(7)
    val centers = Seq.fill(16)(Seq.fill(64)(rnd.nextGaussian()))
    val vecs = (for { c <- 0 until 16; j <- 0 until 40 } yield {
      val v = centers(c).map(x => (x + rnd.nextGaussian() * 0.15).toFloat)
      ((c * 40 + j).toLong, v)
    }).toDF("vec_id", "embedding")
    val q = centers(5).map(x => x + rnd.nextGaussian() * 0.15)
    val centroids = Vectors.trainIvfCentroids(vecs, "vec_id", "embedding",
      cells = 16, sampleN = 640)
    val books = Vectors.trainPqCodebooks(vecs, "vec_id", "embedding", m = 8, ks = 16)
    val exact = Vectors.bruteForceTopK(vecs, "vec_id", "embedding", q, 20)
      .select("vec_id").as[Long].collect().toSeq
    val full = Vectors.ivfPqTopK(vecs, "vec_id", "embedding", q, k = 20,
      centroids, books, nprobe = 16, shortlist = 640)
      .select("vec_id").as[Long].collect().toSeq
    assert(full == exact, "unpruned IVF-PQ must equal brute force exactly")
    val pruned = Vectors.ivfPqTopK(vecs, "vec_id", "embedding", q, k = 20,
      centroids, books, nprobe = 4, shortlist = 100)
      .select("vec_id").as[Long].collect().toSet
    val recall = (exact.toSet intersect pruned).size / 20.0
    assert(recall >= 0.8, s"pruned IVF-PQ recall $recall < 0.8")
  }

  test("groupedTopK equals per-group brute force, one scan") {
    val rnd = new scala.util.Random(11)
    val vecs = (0 until 120).map { i =>
      (i.toLong, Seq.fill(16)(rnd.nextGaussian().toFloat), s"g${i % 3}")
    }.toDF("vec_id", "embedding", "label")
    val q = Seq.fill(16)(rnd.nextGaussian())
    val got = Vectors.groupedTopK(vecs, "vec_id", "embedding", "label", q, k = 4)
      .select("label", "vec_id", "rank").as[(String, Long, Long)].collect()
      .groupBy(_._1).map { case (g, rs) => g -> rs.sortBy(_._3).map(_._2).toSeq }
    for (g <- Seq("g0", "g1", "g2")) {
      val expect = Vectors.bruteForceTopK(
        vecs.filter(col("label") === g), "vec_id", "embedding", q, 4)
        .select("vec_id").as[Long].collect().toSeq
      assert(got(g) == expect, s"group $g: ${got(g)} vs $expect")
    }
  }

  test("centroids: per-group elementwise means, exact on known vectors") {
    val df = Seq(
      (1L, Seq(1.0f, 2.0f), "a"), (2L, Seq(3.0f, 6.0f), "a"),
      (3L, Seq(10.0f, 20.0f), "b")).toDF("vec_id", "embedding", "label")
    val out = Vectors.centroids(df, "label", "embedding").collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(out(("a", 0)) == 2.0 && out(("a", 1)) == 4.0)
    assert(out(("b", 0)) == 10.0 && out(("b", 1)) == 20.0)
  }

  test("PQ: codebooks deterministic; encode ties to lowest code; ADC+re-rank recall") {
    val emb = graft.queries.embeddings(spark, sf)
    val b1 = Vectors.trainPqCodebooks(emb, "vec_id", "embedding", m = 8, ks = 16)
    val b2 = Vectors.trainPqCodebooks(emb, "vec_id", "embedding", m = 8, ks = 16)
    assert(b1 == b2, "training must be deterministic")
    assert(b1.size == 8 && b1.forall(_.size == 16) && b1.forall(_.forall(_.size == 8)))
    // codes are in range and stable
    val codes = Vectors.pqEncode(emb.limit(50), "embedding", b1)
      .select((0 until 8).map(j => col(s"__pq$j")): _*).collect()
    assert(codes.forall(r => (0 until 8).forall(j => r.getInt(j) >= 0 && r.getInt(j) < 16)))
    // shortlist + exact re-rank: every reported id must also be in the
    // brute-force top-50 (the re-rank is exact, so misses can only come
    // from shortlist pruning), and recall@20 on the shortlist path is
    // decent even on this near-uniform corpus
    val q = (0 until 64).map(i => math.sin(i * 0.7) / 8.0)
    val got = Vectors.pqTopK(emb, "vec_id", "embedding", q, k = 20, b1, shortlist = 400)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val exact50 = Vectors.bruteForceTopK(emb, "vec_id", "embedding", q, k = 50)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val exact20 = Vectors.bruteForceTopK(emb, "vec_id", "embedding", q, k = 20)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val recall = (got intersect exact20).size.toDouble / 20
    assert(recall >= 0.25, s"PQ recall@20 collapsed: $recall (got ${got.size})")
    assert(got.size == 20)
    assert((got intersect exact50).nonEmpty)
  }

  test("centroidVectors: ragged/null vectors use per-element denominators") {
    // group "a": one full vector, one short, one null — element 1 averages
    // over 2 rows, element 2 over 1 row (count(all rows)=3 would silently
    // deflate both means; advice finding)
    val df = Seq(
      (1L, Some(Seq(2.0f, 6.0f)), "a"),
      (2L, Some(Seq(4.0f)), "a"),
      (3L, Option.empty[Seq[Float]], "a"),
      (4L, Some(Seq(1.0f, 1.0f)), "b")).toDF("vec_id", "embedding", "label")
    val out = Vectors.centroidVectors(df, "label", "embedding", dim = 2)
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    assert(out("a") == Seq(3.0, 6.0), s"ragged group means wrong: ${out("a")}")
    assert(out("b") == Seq(1.0, 1.0))
  }

  test("embeddingOutliers flags the vector farthest from its group centroid") {
    // group "a": three near-identical vectors plus one pointing away
    val df = Seq(
      (1L, Seq(1.0f, 0.0f), "a"), (2L, Seq(0.99f, 0.01f), "a"),
      (3L, Seq(0.98f, 0.02f), "a"), (4L, Seq(-1.0f, 0.5f), "a"),
      (10L, Seq(0.0f, 1.0f), "b"), (11L, Seq(0.1f, 1.0f), "b")).toDF("vec_id", "embedding", "label")
    val out = Vectors.embeddingOutliers(df, "vec_id", "embedding", "label", k = 1, dim = 2)
      .select("label", "vec_id").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out("a") == 4L, s"the anti-aligned vector must be the outlier, got $out")
    assert(out.contains("b") && out.size == 2)
  }

  test("IVF on the (uniform) corpus: recall tracks scan fraction, pinned") {
    // the synthetic embeddings table is ~uniform on the sphere — no
    // cluster structure for ANY coarse quantizer to exploit, so recall ≈
    // scan fraction is the information-theoretic ceiling; pin the 25%-scan
    // operating point as the regression gate
    val emb = graft.Tables.embeddings(spark, sf)
    val q = graft.queries.Pipeline.annQuery
    val exact = Vectors.bruteForceTopK(emb, "vec_id", "embedding", q, 20)
      .select("vec_id").as[Long].collect().toSet
    val centroids = Vectors.trainIvfCentroids(emb, "vec_id", "embedding", cells = 64)
    val approx = Vectors.ivfTopK(emb, "vec_id", "embedding", q, k = 20, centroids, nprobe = 16)
      .select("vec_id").as[Long].collect().toSet
    val recall = (exact intersect approx).size / 20.0
    assert(recall >= 0.6, s"corpus IVF recall $recall below the 25%-scan pin")
  }

  test("ivfTopKPruned over a written index == ivfTopK over the in-memory corpus") {
    val emb = graft.Tables.embeddings(spark, sf)
    val cents = Vectors.trainIvfCentroids(emb, "vec_id", "embedding", cells = 16)
    val dir = java.nio.file.Files.createTempDirectory("ivfidx").toString
    Vectors.writeIvfIndex(emb, "vec_id", "embedding", cents, dir)
    val q = graft.queries.Pipeline.annQuery
    val inMem = Vectors.ivfTopK(emb, "vec_id", "embedding", q, 10, cents, nprobe = 4)
      .select("vec_id").as[Long].collect().toSeq
    val onDisk = Vectors.ivfTopKPruned(spark, dir, "vec_id", "embedding", q, 10, cents, nprobe = 4)
      .select("vec_id").as[Long].collect().toSeq
    assert(inMem == onDisk,
      "write-time cell assignment must reproduce the query-time assignment exactly")
  }

  test("compactIvfIndex: fragmented cells coalesce, the fat cell splits, untouched dirs stay") {
    val emb = graft.Tables.embeddings(spark, sf)
    val cents = Vectors.trainIvfCentroids(emb, "vec_id", "embedding", cells = 8)
    val dir = java.nio.file.Files.createTempDirectory("ivfcomp").toString
    // fragment the index: three append rounds = up to 3 files per cell
    // (the shape a streaming sink accumulates)
    val assigned = Vectors.ivfAssignNative(
      emb.select(col("vec_id"), col("embedding")), "embedding", cents)
    (0 until 3).foreach { r =>
      assigned.filter(pmod(col("vec_id"), lit(3)) === r)
        .repartition(col("cell"))
        .write.mode("append").partitionBy("cell").parquet(dir)
    }
    val rows = spark.read.parquet(dir).count()
    // contents before, keyed by id (cell ids change for the split cell)
    val before = spark.read.parquet(dir).select("vec_id").as[Long].collect().toSet
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    def filesOf(cell: Int): Set[String] = {
      val p = new org.apache.hadoop.fs.Path(dir, s"cell=$cell")
      if (!fs.exists(p)) Set.empty
      else fs.listStatus(p).map(_.getPath.getName).filter(_.endsWith(".parquet")).toSet
    }
    val comp = Vectors.compactIvfIndex(spark, dir, "vec_id", "embedding", cents,
      maxFilesPerCell = 2)
    // the maintenance contract
    assert(comp.filesAfter < comp.filesBefore, comp)
    assert(comp.compactedCells.nonEmpty, comp)
    comp.compactedCells.foreach(c => assert(filesOf(c).size == 1, s"cell $c not coalesced"))
    // the split cell's directory is gone; its rows live in the two subs
    assert(filesOf(comp.splitCell).isEmpty, "split cell dir must be removed")
    assert(comp.cells.map(_._1).toSet ==
      (cents.indices.toSet - comp.splitCell) ++ Set(cents.size, cents.size + 1))
    // NOTHING lost or duplicated: same ids, same total rows
    val after = spark.read.parquet(dir).select("vec_id").as[Long].collect().toSet
    assert(after == before && spark.read.parquet(dir).count() == rows)
    // sub-cell contents honor the trained sub-centroids exactly
    val Seq(subA, subB) = comp.subCentroids
    val reassigned = spark.read.parquet(dir)
      .filter(col("cell").isin(cents.size, cents.size + 1))
      .withColumn("want",
        when(call_function("cosine_vec", col("embedding"), typedLit(subA)) >=
          call_function("cosine_vec", col("embedding"), typedLit(subB)),
          lit(cents.size)).otherwise(lit(cents.size + 1)))
    assert(reassigned.filter(col("cell") =!= col("want")).count() == 0)
    assert(reassigned.count() == comp.rowsReassigned)
    // probe still answers through partition pruning, recall no worse
    val q = graft.queries.Pipeline.annQuery
    val exact = Vectors.bruteForceTopK(emb, "vec_id", "embedding", q, 10)
      .select("vec_id").as[Long].collect().toSet
    val probed = Vectors.ivfTopKPrunedCells(spark, dir, "vec_id", "embedding",
      q, 10, comp.cells, nprobe = 3).select("vec_id").as[Long].collect().toSet
    assert(probed.size == 10 && probed.intersect(exact).nonEmpty)
  }
}
