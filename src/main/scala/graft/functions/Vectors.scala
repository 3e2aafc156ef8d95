package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Embedding/vector operators: cosine similarity, brute-force ANN baseline,
  * and the LSH/IVF-style bucketed scale path.
  *
  * All per-row math is `zip_with`/`aggregate` column expressions (codegen'd,
  * no UDF). Accumulation is left-to-right over the array — deterministic and
  * identical in any engine that folds sequentially.
  */
object Vectors {

  /** Elementwise product sum (dot). Operands cast to double first. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(transform(a, _.cast("double")), transform(b, _.cast("double")), _ * _),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity in double precision. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / greatest(norm(a) * norm(b), lit(1e-300))

  /** Brute-force exact top-k by cosine to a constant query vector — the
    * correctness baseline. At scale this is one map stage + a
    * TakeOrderedAndProject (per-partition top-k, then k·P merge on the
    * driver): no shuffle of the full table. Scoring runs through the
    * native one-pass `cosine_vec` expression (float elements widened per
    * element — bit-identical to the lambda formulation). */
  def bruteForceTopK(df: DataFrame, idCol: String, vecCol: String,
                     query: Seq[Double], k: Int): DataFrame = {
    graft.GraftFunctions.register(df.sparkSession)
    df.select(col(idCol),
        call_function("cosine_vec", col(vecCol), typedLit(query)).as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }

  /** Per-group elementwise centroids of an embedding column, as
    * (group, pos, mean) rows — the distributed vector aggregation behind
    * cluster analysis, class prototypes, and IVF-style training at
    * corpus scale.
    *
    * Shape: posexplode to (group, pos, val) then ONE partial+final
    * aggregation on (group, pos) — the map-side partial collapses each
    * partition to |groups|·dim rows, so the shuffle never scales with
    * corpus size, only with groups × dimensions. Means use the decimal
    * accumulation pattern (graft.queries.dsum rationale): exact,
    * order-independent, engine-portable. */
  def centroids(df: DataFrame, groupCol: String, vecCol: String): DataFrame =
    df.select(col(groupCol).as("group"), posexplode(col(vecCol)).as(Seq("pos", "v")))
      .groupBy(col("group"), col("pos"))
      .agg((sum(col("v").cast("double").cast("decimal(27,6)")).cast("double") /
        count(col("v")).cast("double")).as("mean"))

  /** Per-group centroids as FULL double vectors — one partial/final
    * aggregation of `dim` decimal-exact elementwise means per group (no
    * explode: one pass, 64 agg expressions wide). The result is tiny
    * (groups × dim), built to broadcast back against the corpus.
    * Each element's denominator counts the rows that HAVE that element
    * (try_element_at is null past a short vector's end — and does not
    * throw under ANSI like element_at — and sum/count skip nulls;
    * counting all rows would silently deflate means on ragged or null
    * vectors), matching [[centroids]]' count(v) semantics. */
  def centroidVectors(df: DataFrame, groupCol: String, vecCol: String,
                      dim: Int): DataFrame =
    df.groupBy(col(groupCol).as("group"))
      .agg(array((0 until dim).map { i =>
        sum(try_element_at(col(vecCol), lit(i + 1)).cast("double").cast("decimal(27,6)"))
          .cast("double") / count(try_element_at(col(vecCol), lit(i + 1))).cast("double")
      }: _*).as("centroid"))

  /** Embedding outlier detection: the `k` vectors of each group FARTHEST
    * from their group centroid by cosine — the "probably mislabeled /
    * junk embedding" sweep of an embedding-quality pass.
    *
    * Scale shape: centroid aggregation collapses the corpus to
    * groups × dim, which broadcasts back for a map-side join; scoring is
    * a codegen'd fold per row; the per-group bottom-k is one window over
    * the (group, cos) shuffle. No corpus self-join anywhere. */
  def embeddingOutliers(df: DataFrame, idCol: String, vecCol: String,
                        groupCol: String, k: Int, dim: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cents = centroidVectors(df, groupCol, vecCol, dim)
    val scored = df
      .join(broadcast(cents), col(groupCol) === cents("group"))
      .select(col(groupCol), col(idCol),
        cosine(col(vecCol), col("centroid")).as("cos"))
    scored
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col(groupCol)).orderBy(col("cos").asc, col(idCol).asc)))
      .filter(col("rnk") <= k)
      .drop("rnk")
  }

  /** BATCHED brute-force top-k: score the corpus against MANY query
    * vectors in ONE pass — the realistic retrieval shape (a probe set,
    * an eval batch) where per-query scans would re-read the corpus Q
    * times. Queries attach as an exploded literal array (a pure
    * projection — no join, no extra scan), then a per-query window
    * top-k. One corpus scan, one shuffle on the Q query ids. Returns
    * (qid, id, cos) with ties broken by id, rank <= k per query. */
  def batchTopK(df: DataFrame, idCol: String, vecCol: String,
                queries: Seq[Seq[Double]], k: Int): DataFrame = {
    graft.GraftFunctions.register(df.sparkSession)
    require(queries.nonEmpty)
    val probes = explode(array(queries.zipWithIndex.map { case (q, i) =>
      struct(lit(i).as("qid"), typedLit(q).as("qv"))
    }: _*))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("cos").desc, col(idCol))
    df.select(col(idCol), col(vecCol).as("__v"))
      .withColumn("__p", probes)
      .select(col("__p.qid").as("qid"), col(idCol),
        call_function("cosine_vec", col("__v"), col("__p.qv")).as("cos"))
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k)
      .select(col("qid"), col(idCol), col("cos"))
  }

  /** GROUPED top-k: for every category, that category's k nearest
    * neighbors to the query — "show the closest examples per domain /
    * per language / per cluster", the faceted flavor of ANN a curation
    * UI asks for. ONE corpus scan (the cosine is a map), then one
    * row_number window per category after a hash shuffle — the grouped
    * top-k shape, no global sort, no per-category rescans. */
  def groupedTopK(df: DataFrame, idCol: String, vecCol: String,
                  groupCol: String, query: Seq[Double], k: Int): DataFrame = {
    graft.GraftFunctions.register(df.sparkSession)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col("cos").desc, col(idCol))
    df.select(col(groupCol), col(idCol),
        call_function("cosine_vec", col(vecCol), typedLit(query)).as("cos"))
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k)
      .select(col(groupCol), col(idCol), col("__rk").cast("long").as("rank"))
  }

  /** Symmetric per-vector int8 quantization — the standard memory-
    * reduction path for 100 TB-scale similarity search (4x smaller than
    * f32, integer dot products downstream). Returns integer-VALUED
    * doubles in [-127, 127]: q_i = round(v_i · 127 / max|v|), zero vector
    * unchanged. Every op is IEEE-exact (+,·,/, round-half-away-from-zero),
    * so quantized values are bit-identical in any IEEE engine — which is
    * what lets the quantized ANN query sit on the DuckDB oracle. */
  def quantizeInt8(vec: Column): Column = {
    val d = transform(vec, _.cast("double"))
    val maxabs = array_max(transform(d, x => abs(x)))
    when(maxabs === 0.0, d)
      .otherwise(transform(d, x => round(x * lit(127.0) / maxabs)))
  }

  /** Scala-side twin of [[quantizeInt8]] for constant query vectors
    * (HALF_UP = away-from-zero, matching SQL ROUND in both engines). */
  def quantizeInt8Local(v: Seq[Double]): Seq[Double] = {
    val m = v.map(math.abs).max
    if (m == 0.0) v
    else v.map(x => BigDecimal(x * 127.0 / m)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  /** Brute-force top-k by cosine over int8-QUANTIZED vectors: the
    * quantization scales cancel in the cosine, so the score is pure
    * integer sums + sqrt + division — exact cross-engine, ~4x less data
    * scanned at deployment (the quantized column is what a 100 TB corpus
    * stores; the float originals stay in cold storage). */
  def int8TopK(df: DataFrame, idCol: String, vecCol: String,
               query: Seq[Double], k: Int): DataFrame = {
    val qq = quantizeInt8Local(query)
    val qnorm = math.sqrt(qq.map(x => x * x).sum)
    df.select(col(idCol), quantizeInt8(col(vecCol)).as("qv"))
      .select(col(idCol),
        (dot(col("qv"), typedLit(qq)) /
          greatest(norm(col("qv")) * lit(qnorm), lit(1e-300))).as("qcos"))
      .orderBy(col("qcos").desc, col(idCol))
      .limit(k)
  }

  /** Deterministic pseudo-random hyperplanes (fixed seed) for sign-LSH. */
  def hyperplanes(dim: Int, planes: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(planes)(Seq.fill(dim)(rnd.nextGaussian()))
  }

  /** Sign-LSH bucket id: bit j = sign(v · plane_j). Map-only; vectors in
    * the same bucket are "probably similar" — the scale path partitions
    * the corpus by bucket so search touches one bucket, not the table. */
  def lshBucket(v: Column, planes: Int, dim: Int = 64, seed: Long = 42L): Column = {
    val hp = hyperplanes(dim, planes, seed)
    (0 until planes).map { j =>
      when(dot(v, typedLit(hp(j))) >= 0, shiftleft(lit(1L), j)).otherwise(lit(0L))
    }.reduce(_.bitwiseOR(_))
  }

  /** LSH-bucketed approximate top-k: score only vectors in the query's
    * bucket (multi-probe: optionally the Hamming-1 neighbor buckets).
    * Recall/latency trade is the `planes` knob; recall measured against
    * [[bruteForceTopK]] in VectorsSpec. */
  /** The query's LSH bucket plus (optionally) its Hamming-1 neighbor
    * buckets — shared by [[lshTopK]] and the DuckDB oracle SQL so both
    * engines probe the identical bucket set. */
  def lshProbes(query: Seq[Double], planes: Int,
                multiProbe: Boolean = true, seed: Long = 42L): Seq[Long] = {
    val hp = hyperplanes(query.size, planes, seed)
    val qBucket = (0 until planes).map { j =>
      val d = hp(j).zip(query).map { case (x, y) => x * y }.sum
      if (d >= 0) 1L << j else 0L
    }.reduce(_ | _)
    if (multiProbe) qBucket +: (0 until planes).map(j => qBucket ^ (1L << j))
    else Seq(qBucket)
  }

  def lshTopK(df: DataFrame, idCol: String, vecCol: String,
              query: Seq[Double], k: Int, planes: Int = 4,
              multiProbe: Boolean = true): DataFrame = {
    val probes: Seq[Long] = lshProbes(query, planes, multiProbe)
    graft.GraftFunctions.register(df.sparkSession)
    df.select(col(idCol), col(vecCol).as("v"))
      .withColumn("bucket", lshBucketNative(col("v"), planes, query.size))
      .filter(col("bucket").isin(probes: _*))
      .select(col(idCol), call_function("cosine_vec", col("v"), typedLit(query)).as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }

  /** [[lshBucket]] built on the native dot_vec expression (caller must
    * have run [[graft.GraftFunctions.register]] on the session). */
  def lshBucketNative(v: Column, planes: Int, dim: Int = 64, seed: Long = 42L): Column = {
    val hp = hyperplanes(dim, planes, seed)
    (0 until planes).map { j =>
      when(call_function("dot_vec", v, typedLit(hp(j))) >= 0, shiftleft(lit(1L), j))
        .otherwise(lit(0L))
    }.reduce(_.bitwiseOR(_))
  }

  /** IVF-style coarse quantization: assign each vector to the nearest of
    * `centroids`; search scans only the query's cell (+neighbor cells).
    * Lambda-expression variant kept for small centroid sets; use
    * [[ivfAssignNative]] for trained quantizers (native one-pass kernel
    * per centroid). */
  def ivfAssign(df: DataFrame, vecCol: String, centroids: Seq[Seq[Double]]): DataFrame = {
    val scored = centroids.zipWithIndex.map { case (c, i) =>
      struct(cosine(col(vecCol), typedLit(c)).as("score"), lit(i).as("cell"))
    }
    df.withColumn("cell", array_max(array(scored: _*)).getField("cell"))
  }

  /** [[ivfAssign]] on the native `cosine_vec` kernel — one codegen'd
    * struct-array argmax per row, viable at O(√N) centroid counts. Ties
    * break to the HIGHEST cell index (array_max on (score, cell) structs);
    * [[nearestCells]] matches this exactly. */
  def ivfAssignNative(df: DataFrame, vecCol: String, centroids: Seq[Seq[Double]]): DataFrame = {
    graft.GraftFunctions.register(df.sparkSession)
    val scored = centroids.zipWithIndex.map { case (c, i) =>
      struct(call_function("cosine_vec", col(vecCol), typedLit(c)).as("score"),
        lit(i).as("cell"))
    }
    df.withColumn("cell", array_max(array(scored: _*)).getField("cell"))
  }

  /** Train an IVF coarse quantizer with deterministic sampled spherical
    * k-means: hash-ordered sample of `sampleN` vectors to the driver
    * (at 100 TB a fixed-size sample is still the standard way to train a
    * coarse quantizer — training cost is independent of corpus size),
    * then `iters` Lloyd rounds with cosine assignment (unit-normalized
    * means). Fully deterministic: the sample order is xxhash64(id, seed)
    * and ties break to the lowest cell. */
  def trainIvfCentroids(df: DataFrame, idCol: String, vecCol: String,
                        cells: Int = 64, iters: Int = 8,
                        sampleN: Int = 4096, seed: Long = 42L): Seq[Seq[Double]] = {
    val sample: Array[Array[Double]] = df
      .select(col(vecCol).cast("array<double>").as("v"), col(idCol).as("id"))
      .orderBy(xxhash64(col("id"), lit(seed)), col("id"))
      .limit(sampleN)
      .select("v").collect().map(_.getSeq[Double](0).toArray)
    require(sample.nonEmpty, "cannot train IVF centroids on an empty table")
    def normalize(x: Array[Double]): Array[Double] = {
      val n = math.sqrt(x.map(v => v * v).sum)
      if (n < 1e-300) x else x.map(_ / n)
    }
    val unit = sample.map(normalize)
    val k = math.min(cells, unit.length)
    var cents: Array[Array[Double]] = unit.take(k).map(_.clone())
    for (_ <- 0 until iters) {
      val sums = Array.fill(k)(new Array[Double](unit.head.length))
      val counts = new Array[Int](k)
      unit.foreach { x =>
        var best = 0; var bestDot = Double.NegativeInfinity
        var c = 0
        while (c < k) {
          var d = 0.0; var j = 0
          while (j < x.length) { d += x(j) * cents(c)(j); j += 1 }
          if (d > bestDot) { bestDot = d; best = c }
          c += 1
        }
        var j = 0
        while (j < x.length) { sums(best)(j) += x(j); j += 1 }
        counts(best) += 1
      }
      cents = Array.tabulate(k) { c =>
        if (counts(c) == 0) cents(c) // empty cell keeps its centroid
        else normalize(sums(c))
      }
    }
    cents.map(_.toSeq).toSeq
  }

  /** The `nprobe` cells nearest to a query under the same scoring and
    * tie-breaking as [[ivfAssignNative]]. */
  def nearestCells(centroids: Seq[Seq[Double]], query: Seq[Double], nprobe: Int): Seq[Int] = {
    val nq = math.sqrt(query.map(x => x * x).sum).max(1e-300)
    centroids.zipWithIndex.map { case (c, i) =>
      val nc = math.sqrt(c.map(x => x * x).sum).max(1e-300)
      val d = c.zip(query).map { case (x, y) => x * y }.sum
      (d / (nc * nq), i)
    }.sortBy { case (s, i) => (-s, -i) }.take(nprobe).map(_._2)
  }

  /** Train PRODUCT-QUANTIZATION codebooks: split the `d`-dim space into
    * `m` subspaces of d/m dims and run deterministic L2 Lloyd k-means
    * (`ks` centroids each) per subspace over a fixed hash-ordered driver
    * sample — the same bounded-training discipline as
    * [[trainIvfCentroids]] (cost independent of corpus size). Returns
    * m × ks × (d/m) codebooks. Deterministic: sample order is
    * xxhash64(id, seed), init = the first `ks` sample subvectors,
    * assignment ties break to the lowest code, empty cells keep their
    * centroid. */
  def trainPqCodebooks(df: DataFrame, idCol: String, vecCol: String,
                       m: Int = 8, ks: Int = 16, iters: Int = 8,
                       sampleN: Int = 4096, seed: Long = 42L): Seq[Seq[Seq[Double]]] = {
    val sample: Array[Array[Double]] = df
      .select(col(vecCol).cast("array<double>").as("v"), col(idCol).as("id"))
      .orderBy(xxhash64(col("id"), lit(seed)), col("id"))
      .limit(sampleN)
      .select("v").collect().map(_.getSeq[Double](0).toArray)
    require(sample.nonEmpty, "cannot train PQ codebooks on an empty table")
    val d = sample.head.length
    require(d % m == 0, s"dim $d must divide into $m subspaces")
    val sub = d / m
    (0 until m).map { j =>
      val xs = sample.map(v => java.util.Arrays.copyOfRange(v, j * sub, (j + 1) * sub))
      val k = math.min(ks, xs.length)
      var cents: Array[Array[Double]] = xs.take(k).map(_.clone())
      for (_ <- 0 until iters) {
        val sums = Array.fill(k)(new Array[Double](sub))
        val counts = new Array[Int](k)
        xs.foreach { x =>
          var best = 0; var bestD = Double.PositiveInfinity
          var c = 0
          while (c < k) {
            var dd = 0.0; var i = 0
            while (i < sub) { val t = x(i) - cents(c)(i); dd += t * t; i += 1 }
            if (dd < bestD) { bestD = dd; best = c } // strict <: ties to lowest
            c += 1
          }
          var i = 0
          while (i < sub) { sums(best)(i) += x(i); i += 1 }
          counts(best) += 1
        }
        cents = Array.tabulate(k) { c =>
          if (counts(c) == 0) cents(c)
          else sums(c).map(_ / counts(c))
        }
      }
      cents.map(_.toSeq).toSeq
    }
  }

  /** Per-subspace PQ code columns (`__pq0..__pq{m-1}`): argmin-L2 against
    * the codebook, computed as argmin of |c|² − 2·(x·c) (the |x|² term is
    * constant per subvector, so it cancels from the argmin) — one
    * codegen'd dot per (subspace, code), ties to the LOWEST code via
    * array_min on (score, code) structs. */
  def pqEncode(df: DataFrame, vecCol: String,
               books: Seq[Seq[Seq[Double]]]): DataFrame = {
    graft.GraftFunctions.register(df.sparkSession)
    val sub = books.head.head.size
    val withCodes = books.indices.foldLeft(df) { (acc, j) =>
      val sv = slice(col(vecCol).cast("array<double>"), j * sub + 1, sub)
      val scored = books(j).zipWithIndex.map { case (c, i) =>
        val cc = c.map(x => x * x).sum
        struct((lit(cc) - lit(2.0) * call_function("dot_vec", sv, typedLit(c))).as("d"),
          lit(i).as("code"))
      }
      acc.withColumn(s"__pq$j", array_min(array(scored: _*)).getField("code"))
    }
    withCodes
  }

  /** The per-subspace ADC lookup table for `query`: lut(j)(c) = squared L2
    * between the query's j-th subvector and codebook entry c. */
  def pqLut(books: Seq[Seq[Seq[Double]]], query: Seq[Double]): Seq[Seq[Double]] = {
    val sub = books.head.head.size
    books.zipWithIndex.map { case (book, j) =>
      val q = query.slice(j * sub, (j + 1) * sub)
      book.map(c => c.zip(q).map { case (x, y) => (x - y) * (x - y) }.sum)
    }
  }

  /** PQ search (ADC): approximate distance = Σ_j lut_j[code_j] — each
    * vector costs m table lookups instead of d multiplies, and the stored
    * representation is m small codes instead of d floats (16× smaller at
    * m=8/ks=16 over 64 f32 dims) — THE standard compressed-corpus ANN
    * path at 100 TB scale. Shortlists `shortlist` candidates by ADC
    * distance, then exact-cosine re-ranks the shortlist to `k` (the
    * IVFADC/DiskANN re-rank discipline: cheap scan, exact finish).
    * Deterministic ties: (adist ASC, id) then (cos DESC, id). */
  def pqTopK(df: DataFrame, idCol: String, vecCol: String,
             query: Seq[Double], k: Int, books: Seq[Seq[Seq[Double]]],
             shortlist: Int = 200): DataFrame = {
    graft.GraftFunctions.register(df.sparkSession)
    val lut = pqLut(books, query)
    val adist = books.indices
      .map(j => element_at(typedLit(lut(j)), col(s"__pq$j") + 1))
      .reduce(_ + _)
    pqEncode(df, vecCol, books)
      .select(col(idCol), col(vecCol), adist.as("adist"))
      .orderBy(col("adist").asc, col(idCol))
      .limit(shortlist)
      .select(col(idCol),
        call_function("cosine_vec", col(vecCol).cast("array<double>"), typedLit(query)).as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }

  /** IVF-PQ search (IVFADC): the coarse quantizer prunes the scan to
    * `nprobe` cells, PQ codes ADC-score ONLY the probed subset, and exact
    * cosine re-ranks the shortlist — the standard billion-scale recipe:
    * cells bound WHAT is read (at deployment the cell id is a partition
    * column, so pruning happens at the source), codes shrink each read
    * row 16×, and full-precision math touches only `shortlist` rows.
    * Composition of [[ivfTopK]]'s probe stage and [[pqTopK]]'s ADC+re-rank
    * stage; same deterministic tie discipline throughout. */
  def ivfPqTopK(df: DataFrame, idCol: String, vecCol: String,
                query: Seq[Double], k: Int,
                centroids: Seq[Seq[Double]], books: Seq[Seq[Seq[Double]]],
                nprobe: Int = 8, shortlist: Int = 200): DataFrame = {
    graft.GraftFunctions.register(df.sparkSession)
    val probes = nearestCells(centroids, query, nprobe)
    val probed = ivfAssignNative(df, vecCol, centroids)
      .filter(col("cell").isin(probes: _*))
    val lut = pqLut(books, query)
    val adist = books.indices
      .map(j => element_at(typedLit(lut(j)), col(s"__pq$j") + 1))
      .reduce(_ + _)
    pqEncode(probed, vecCol, books)
      .select(col(idCol), col(vecCol), adist.as("adist"))
      .orderBy(col("adist").asc, col(idCol))
      .limit(shortlist)
      .select(col(idCol),
        call_function("cosine_vec", col(vecCol).cast("array<double>"), typedLit(query)).as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }

  /** IVF search: score only the `nprobe` cells nearest to the query —
    * with √N cells and nprobe probes the scan covers ~nprobe/cells of the
    * corpus. At deployment the cell id is a partition column so pruning
    * happens at the source; recall vs [[bruteForceTopK]] is the gate
    * (VectorsSpec). */
  def ivfTopK(df: DataFrame, idCol: String, vecCol: String,
              query: Seq[Double], k: Int, centroids: Seq[Seq[Double]],
              nprobe: Int = 8): DataFrame = {
    graft.GraftFunctions.register(df.sparkSession)
    val probes = nearestCells(centroids, query, nprobe)
    ivfAssignNative(df, vecCol, centroids)
      .filter(col("cell").isin(probes: _*))
      .select(col(idCol), call_function("cosine_vec", col(vecCol), typedLit(query)).as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }

  /** Materialize the corpus as an on-disk IVF index: one Parquet
    * PARTITION per trained cell id — the deployment shape [[ivfTopK]]'s
    * docstring promises. Build cost is one assignment map + one
    * cell-clustered shuffle + a partitioned write (the same single pass
    * any partitioned ingest pays); after it, a probe's cell filter is a
    * partition-DIRECTORY prune at planning time, so nprobe/cells of the
    * corpus is the fraction of FILES read — an I/O fact, not a row-filter
    * fact. At 100 TB this turns every query from a full scan into
    * ~nprobe/√N of the bytes. */
  def writeIvfIndex(df: DataFrame, idCol: String, vecCol: String,
                    centroids: Seq[Seq[Double]], path: String): Unit =
    ivfAssignNative(df.select(col(idCol), col(vecCol)), vecCol, centroids)
      .repartition(col("cell")) // one writer per cell → one file per cell
      .write.mode("overwrite").partitionBy("cell").parquet(path)

  /** [[ivfTopK]] against a [[writeIvfIndex]] store: identical results
    * (assignment happened at write time with the same centroids and
    * tie-breaking), but the nprobe filter now prunes partitions at the
    * source — PlanQualitySpec pins that the scan touches exactly the
    * probed directories. */
  def ivfTopKPruned(spark: SparkSession, path: String, idCol: String,
                    vecCol: String, query: Seq[Double], k: Int,
                    centroids: Seq[Seq[Double]], nprobe: Int = 8): DataFrame = {
    graft.GraftFunctions.register(spark)
    val probes = nearestCells(centroids, query, nprobe)
    spark.read.parquet(path)
      .filter(col("cell").isin(probes: _*))
      .select(col(idCol), call_function("cosine_vec", col(vecCol), typedLit(query)).as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }

  /** [[nearestCells]] over an EXPLICIT cell-id → centroid quantizer — the
    * shape a [[compactIvfIndex]] rebalance leaves behind (cell ids are no
    * longer positional once a cell splits). Same scoring and tie rule
    * (highest cell id wins a tie). */
  def nearestCellsOf(cells: Seq[(Int, Seq[Double])], query: Seq[Double],
                     nprobe: Int): Seq[Int] = {
    val nq = math.sqrt(query.map(x => x * x).sum).max(1e-300)
    cells.map { case (i, c) =>
      val nc = math.sqrt(c.map(x => x * x).sum).max(1e-300)
      val d = c.zip(query).map { case (x, y) => x * y }.sum
      (d / (nc * nq), i)
    }.sortBy { case (s, i) => (-s, -i) }.take(nprobe).map(_._2)
  }

  /** [[ivfTopKPruned]] against a rebalanced index: probes come from the
    * explicit cell-id quantizer, the partition-directory prune is
    * unchanged. */
  def ivfTopKPrunedCells(spark: SparkSession, path: String, idCol: String,
                         vecCol: String, query: Seq[Double], k: Int,
                         cells: Seq[(Int, Seq[Double])], nprobe: Int = 8): DataFrame = {
    val probes = nearestCellsOf(cells, query, nprobe)
    ivfTopKPrunedAt(spark, path, idCol, vecCol, query, k, probes)
  }

  /** Probe an EXPLICIT cell-id list — the probe-planner seam: after a
    * [[compactIvfIndex]] rebalance, a pre-split probe set maps through
    * the split (parent cell → both children), so the probed ROWS are
    * identical before and after maintenance and the top-k must reproduce
    * exactly. */
  def ivfTopKPrunedAt(spark: SparkSession, path: String, idCol: String,
                      vecCol: String, query: Seq[Double], k: Int,
                      probes: Seq[Int]): DataFrame = {
    graft.GraftFunctions.register(spark)
    spark.read.parquet(path)
      .filter(col("cell").isin(probes: _*))
      .select(col(idCol), call_function("cosine_vec", col(vecCol), typedLit(query)).as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }

  /** [[compactIvfIndex]] result: `cells` is the post-maintenance coarse
    * quantizer as explicit (cell id, centroid) pairs — the split cell's
    * id is gone, its two sub-cells carry fresh ids; `subCentroids` are
    * the two trained sub-centroids (the trained literals an oracle
    * re-derives assignment from); `compactedCells` lists the fragmented
    * cells whose files were coalesced. */
  final case class IvfCompaction(cells: Seq[(Int, Seq[Double])],
                                 splitCell: Int,
                                 subCentroids: Seq[Seq[Double]],
                                 filesBefore: Long, filesAfter: Long,
                                 rowsReassigned: Long,
                                 compactedCells: Seq[Int])

  /** MAINTENANCE pass for a [[writeIvfIndex]]/streamed IVF store — the
    * two chores a live ANN index accumulates (reference has no analog;
    * this is the north-star growth of the `stream_ivf_exec` landing
    * path): (1) FILE COMPACTION — streaming appends leave one file per
    * micro-batch per cell, so cells with more than `maxFilesPerCell`
    * files are coalesced in place (read cell dir → one file → atomic
    * swap), touching ONLY fragmented directories; (2) REBALANCE — the
    * fattest cell (most rows; ties to the smallest id — the cell that
    * hurts nprobe selectivity most) SPLITS: two sub-centroids train on a
    * deterministic `sampleN`-vector driver sample of that cell alone
    * (xxhash64 order, seeds = first two sample vectors, `iters` Lloyd
    * rounds on the unit sphere — the [[trainIvfCentroids]] bounded-
    * training discipline, cost independent of cell size), every vector
    * of the split cell reassigns DISTRIBUTED between the two new
    * partition directories (ties to the first sub-cell), and the old
    * directory is removed. Cost ∝ fragmented + split cells — untouched
    * cell directories are never read, which is what makes periodic
    * maintenance viable on a 100 TB index. Probe with
    * [[ivfTopKPrunedCells]] and the returned quantizer; recall parity
    * against the pre-compaction probe is the caller's gate. */
  def compactIvfIndex(spark: SparkSession, path: String, idCol: String,
                      vecCol: String, centroids: Seq[Seq[Double]],
                      maxFilesPerCell: Int = 2, iters: Int = 8,
                      sampleN: Int = 4096, seed: Long = 42L): IvfCompaction = {
    graft.GraftFunctions.register(spark)
    val conf = spark.sessionState.newHadoopConf()
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(conf)
    // a STREAMED index carries the file sink's _spark_metadata log, which
    // pins the file inventory to the append history — compaction takes
    // ownership of the inventory (the maintenance job is now the writer
    // of record), so the log goes first and every read below lists
    // directories directly. Exactly-once mattered only while the stream
    // was the writer.
    val sinkLog = new org.apache.hadoop.fs.Path(root, "_spark_metadata")
    if (fs.exists(sinkLog)) fs.delete(sinkLog, true)
    def parquetFiles(p: org.apache.hadoop.fs.Path): Seq[org.apache.hadoop.fs.Path] =
      fs.listStatus(p).toSeq.filter(_.isFile).map(_.getPath)
        .filter(_.getName.endsWith(".parquet"))
    def cellDirs(): Map[Int, org.apache.hadoop.fs.Path] =
      fs.listStatus(root).toSeq.filter(_.isDirectory).map(_.getPath)
        .filter(_.getName.startsWith("cell="))
        .map(p => p.getName.stripPrefix("cell=").toInt -> p).toMap
    val dirs = cellDirs()
    require(dirs.nonEmpty, s"no cell=* partitions under $path")
    val filesPerCell: Map[Int, Seq[org.apache.hadoop.fs.Path]] =
      dirs.map { case (c, p) => c -> parquetFiles(p) }
    val filesBefore = filesPerCell.valuesIterator.map(_.size.toLong).sum

    // the fattest cell by ROWS (one footer-driven count per partition —
    // no vector data moves), ties to the smallest id
    val counts: Map[Int, Long] = spark.read.parquet(path)
      .groupBy(col("cell")).count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val splitCell = counts.toSeq.maxBy { case (c, n) => (n, -c) }._1
    val splitDir = dirs(splitCell)

    // two sub-centroids from a deterministic driver sample of the split
    // cell alone (bounded training; spherical 2-means)
    val sample: Array[Array[Double]] = spark.read.parquet(splitDir.toString)
      .select(col(vecCol).cast("array<double>").as("v"), col(idCol).as("id"))
      .orderBy(xxhash64(col("id"), lit(seed)), col("id"))
      .limit(sampleN)
      .select("v").collect().map(_.getSeq[Double](0).toArray)
    require(sample.nonEmpty, s"split cell $splitCell is empty")
    def normalize(x: Array[Double]): Array[Double] = {
      val n = math.sqrt(x.map(v => v * v).sum)
      if (n < 1e-300) x else x.map(_ / n)
    }
    val unit = sample.map(normalize)
    var subs: Array[Array[Double]] =
      Array(unit(0).clone(), unit(math.min(1, unit.length - 1)).clone())
    for (_ <- 0 until iters) {
      val sums = Array.fill(2)(new Array[Double](unit.head.length))
      val ns = new Array[Int](2)
      unit.foreach { x =>
        var d0 = 0.0; var d1 = 0.0; var j = 0
        while (j < x.length) { d0 += x(j) * subs(0)(j); d1 += x(j) * subs(1)(j); j += 1 }
        val side = if (d0 >= d1) 0 else 1 // ties to the first sub-cell
        j = 0
        while (j < x.length) { sums(side)(j) += x(j); j += 1 }
        ns(side) += 1
      }
      subs = Array.tabulate(2)(c => if (ns(c) == 0) subs(c) else normalize(sums(c)))
    }
    val (subA, subB) = (subs(0).toSeq, subs(1).toSeq)
    val (idA, idB) = (centroids.size, centroids.size + 1)

    // distributed reassignment of ONLY the split cell, written as two new
    // partition directories; ties to the first sub-cell, matching the
    // driver training above and the oracle's CASE WHEN >=
    val tmp = new org.apache.hadoop.fs.Path(root, s"_compact_tmp_$splitCell")
    val rowsReassigned = counts(splitCell)
    spark.read.parquet(splitDir.toString)
      .withColumn("cell",
        when(call_function("cosine_vec", col(vecCol), typedLit(subA)) >=
          call_function("cosine_vec", col(vecCol), typedLit(subB)), lit(idA))
          .otherwise(lit(idB)))
      .repartition(col("cell"))
      .write.partitionBy("cell").parquet(tmp.toString)
    Seq(idA, idB).foreach { c =>
      val from = new org.apache.hadoop.fs.Path(tmp, s"cell=$c")
      if (fs.exists(from)) // a sub-cell can legitimately end empty
        require(fs.rename(from, new org.apache.hadoop.fs.Path(root, s"cell=$c")),
          s"rename of $from failed")
    }
    fs.delete(splitDir, true)
    fs.delete(tmp, true)

    // in-place file compaction of the remaining fragmented cells: read
    // one directory, write one file, atomic-ish swap (new files land
    // under spark's collision-free names before the old ones delete)
    val toCompact = filesPerCell.collect {
      case (c, fls) if c != splitCell && fls.size > maxFilesPerCell => c
    }.toSeq.sorted
    toCompact.foreach { c =>
      val dir = dirs(c)
      val old = parquetFiles(dir)
      val ctmp = new org.apache.hadoop.fs.Path(root, s"_compact_tmp_$c")
      spark.read.parquet(dir.toString).coalesce(1).write.parquet(ctmp.toString)
      parquetFiles(ctmp).foreach { f =>
        require(fs.rename(f, new org.apache.hadoop.fs.Path(dir, f.getName)),
          s"rename of $f failed")
      }
      old.foreach(f => fs.delete(f, false))
      fs.delete(ctmp, true)
    }
    val filesAfter = cellDirs().valuesIterator.map(parquetFiles(_).size.toLong).sum
    val cells = centroids.zipWithIndex.collect {
      case (c, i) if i != splitCell => i -> c
    } ++ Seq(idA -> subA, idB -> subB)
    IvfCompaction(cells, splitCell, Seq(subA, subB), filesBefore, filesAfter,
      rowsReassigned, toCompact)
  }
}
