package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
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
  def lshTopK(df: DataFrame, idCol: String, vecCol: String,
              query: Seq[Double], k: Int, planes: Int = 4,
              multiProbe: Boolean = true): DataFrame = {
    val qBucket = {
      val hp = hyperplanes(query.size, planes)
      (0 until planes).map { j =>
        val d = hp(j).zip(query).map { case (x, y) => x * y }.sum
        if (d >= 0) 1L << j else 0L
      }.reduce(_ | _)
    }
    val probes: Seq[Long] =
      if (multiProbe) qBucket +: (0 until planes).map(j => qBucket ^ (1L << j))
      else Seq(qBucket)
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
    * Centroids would come from a sampled k-means at scale; here they are
    * supplied (deterministic) — the plan shape is the deliverable. */
  def ivfAssign(df: DataFrame, vecCol: String, centroids: Seq[Seq[Double]]): DataFrame = {
    val scored = centroids.zipWithIndex.map { case (c, i) =>
      struct(cosine(col(vecCol), typedLit(c)).as("score"), lit(i).as("cell"))
    }
    df.withColumn("cell", array_max(array(scored: _*)).getField("cell"))
  }
}
