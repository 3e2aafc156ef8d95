package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy dog"),        // exact dup of 1
    (3L, "the quick brown fox jumps over the lazy cat"),        // near dup of 1
    (4L, "completely different content about spark engines"),
    (5L, "completely different content about spark engines entirely")
  ).toDF("doc_id", "text")

  test("exact dedup groups identical texts, keeps smallest id") {
    val r = Dedup.exact(docs, "doc_id", "text")
    assert(r.count() == 4)
    val dup = r.filter(col("n_copies") === 2).collect()
    assert(dup.length == 1 && dup(0).getAs[Long]("keep_id") == 1L)
  }

  test("shingles produce distinct k-grams") {
    val sh = docs.filter(col("doc_id") === 1)
      .select(Dedup.shingles(col("text"), 2).as("sh"))
      .as[Seq[String]].head()
    assert(sh.contains("the quick") && sh.contains("lazy dog"))
    assert(sh.distinct.size == sh.size)
  }

  test("jaccard of identical sets is 1, disjoint is 0") {
    val df = Seq((Seq("a", "b"), Seq("a", "b"), Seq("c", "d")))
      .toDF("s1", "s2", "s3")
    val r = df.select(
      Dedup.jaccard(col("s1"), col("s2")).as("same"),
      Dedup.jaccard(col("s1"), col("s3")).as("disj")).head()
    assert(r.getDouble(0) == 1.0 && r.getDouble(1) == 0.0)
  }

  test("minhashLsh finds exact and near duplicates, not unrelated pairs") {
    val pairs = Dedup.minhashLsh(docs, "doc_id", "text",
      numHashes = 16, bands = 8, shingleK = 2, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))  // exact dup always found
    assert(!pairs.exists { case (a, b) => (a <= 3) != (b <= 3) }) // no cross-group pair
  }

  test("minhash signature of identical text is identical") {
    val sigs = docs.filter(col("doc_id") <= 2)
      .select(Dedup.minhashSignature(Dedup.shingles(col("text"), 2), 8).as("sig"))
      .as[Seq[Long]].collect()
    assert(sigs(0) == sigs(1))
  }

  test("simhash groups identical docs; distinct content differs") {
    val r = Dedup.simhashDups(docs, "doc_id", "text").collect()
    assert(r.length == 1)  // only the 1/2 pair shares a signature
    assert(r(0).getAs[Long]("n_docs") == 2 && r(0).getAs[Long]("keep_id") == 1L)
  }

  test("ngramJaccardDups respects the blocking column") {
    val blocked = docs.withColumn("blk", when(col("doc_id") <= 3, "a").otherwise("b"))
    val pairs = Dedup.ngramJaccardDups(blocked, "doc_id", "text",
      blockCol = col("blk"), shingleK = 2, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(pairs.forall { case (a, b) => (a <= 3) == (b <= 3) })
  }

  test("embeddingCosineDups finds only high-cosine pairs") {
    val vecs = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
      (2L, Seq(0.999f, 0.04f, 0.0f, 0.0f)),   // ~same direction as 1
      (3L, Seq(0.0f, 1.0f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingCosineDups(vecs, "vec_id", "embedding",
      planes = 2, threshold = 0.99)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
  }
}
