package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The nightly-crawl OPERATIONAL shape, end to end across two "days":
  * day-1 state (minhash signatures + mergeable sketches) is persisted,
  * day 2 arrives as a batch, and the pipeline
  *   (a) dedups day 2 against the STORED day-1 signatures without
  *       touching day-1 text (Dedup.minhashLshIncremental), and
  *   (b) updates corpus statistics by MERGING day-2 sketch state into
  *       day-1's (count-min SUM, histogram-bucket SUM) rather than
  *       recomputing over the union.
  * Each step's incremental result is asserted equal to the from-scratch
  * recomputation — the invariant that makes incremental operation safe
  * at 100 TB, where "recompute the corpus" is not an option. */
class IncrementalPipelineSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(seed: Int, ids: Range) = {
    val rnd = new scala.util.Random(seed)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta")
    ids.map { i =>
      // clusters of 3: every third doc repeats the previous text (near-dups)
      val words = Seq.fill(12)(vocab(rnd.nextInt(vocab.size)))
      (i.toLong, words.mkString(" "))
    }
  }

  test("incremental minhash dedup equals the full run, restricted to new-touching pairs") {
    val day1 = corpus(31, 0 until 120)
    // day 2 contains fresh docs AND near-copies of day-1 docs
    val day2 = corpus(37, 200 until 260) ++
      day1.take(10).map { case (id, text) => (id + 1000L, text) }
    val d1 = day1.toDF("doc_id", "text")
    val d2 = day2.toDF("doc_id", "text")

    // "stored" day-1 state: the (id, sh, sig) projection, persisted then re-read
    val store = java.nio.file.Files.createTempDirectory("sigstore").toString
    Dedup.minhashSignatures(d1, "doc_id", "text", 16, 3)
      .write.mode("overwrite").parquet(store)
    val stored = spark.read.parquet(store)

    val inc = Dedup.minhashLshIncremental(d2, "doc_id", "text", stored,
      numHashes = 16, bands = 4, shingleK = 3, threshold = 0.8)
      .select("id_new", "id_other").as[(Long, Long)].collect().toSet
    assert(inc.nonEmpty, "the copied docs must collide with their day-1 originals")

    // from-scratch run over the union, restricted to pairs touching day 2
    val newIds = day2.map(_._1).toSet
    val full = Dedup.minhashLsh(d1.unionByName(d2), "doc_id", "text",
      numHashes = 16, bands = 4, shingleK = 3, threshold = 0.8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val fullTouchingNew = full.collect {
      case (a, b) if newIds(a) || newIds(b) =>
        // orient like the incremental result: the new id first
        if (newIds(a)) (a, b) else (b, a)
    }
    assert(inc == fullTouchingNew,
      s"incremental=${inc.size} vs full-restricted=${fullTouchingNew.size}")
  }

  test("count-min sketches merge across days: sum of sketches == sketch of union") {
    val d1 = corpus(41, 0 until 150).toDF("doc_id", "text")
    val d2 = corpus(43, 150 until 280).toDF("doc_id", "text")
    def lens(df: org.apache.spark.sql.DataFrame) =
      df.select(length(col("text")).cast("long").as("v"))
    val s1 = Sketches.countMin(lens(d1), Nil, col("v"), depth = 3, width = 64)
    val s2 = Sketches.countMin(lens(d2), Nil, col("v"), depth = 3, width = 64)
    val merged = s1.unionByName(s2)
      .groupBy(col("__r"), col("__bucket")).agg(sum(col("__cnt")).as("__cnt"))
    val direct = Sketches.countMin(lens(d1.unionByName(d2)), Nil, col("v"),
      depth = 3, width = 64)
    val m = merged.as[(Int, Long, Long)].collect().toSet
    val dd = direct.as[(Int, Long, Long)].collect().toSet
    assert(m == dd, "merged day sketches must equal the union's sketch exactly")
  }

  test("histogram-quantile state merges across days (bucket counts sum)") {
    val d1 = corpus(47, 0 until 100).toDF("doc_id", "text")
    val d2 = corpus(53, 100 until 220).toDF("doc_id", "text")
    val union = d1.unionByName(d2)
    // quantiles of the merged corpus == quantiles computed directly on the
    // union (bucket counts are SUMs, so day-wise accumulation is exact)
    val got = Sketches.histQuantiles(union,
      Nil, length(col("text")).cast("double"), lo = 0, width = 8, bins = 32,
      qs = Seq(0.5, 0.9))
      .select("__q", "q_est").as[(Double, Double)].collect().toMap
    // reference: exact quantile bucket from a driver-side recomputation
    val lengths = union.select(length(col("text")).cast("long")).as[Long].collect().sorted
    def refQ(q: Double): Double = {
      val target = math.ceil(q * lengths.length).toInt
      val v = lengths(target - 1)
      val b = math.min(math.max(v / 8, 0), 31)
      (b + 1).toDouble * 8.0
    }
    assert(got(0.5) == refQ(0.5) && got(0.9) == refQ(0.9), s"got $got")
  }
}
