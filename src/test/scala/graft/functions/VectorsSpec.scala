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
}
