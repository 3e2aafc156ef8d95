package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Deterministic sampling/splitting ([[Sampling]]) and Z-order clustering
  * ([[ZOrder]]) — the training-pipeline primitives whose whole value is
  * determinism and locality, so that is what the spec pins. */
class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private val ids = (0L until 10000L).toDF("id")

  test("assignSplit fractions land near targets and depend only on the id") {
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val counts = Sampling.assignSplit(ids, col("id"), splits)
      .groupBy("split").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(counts("train") - 8000L) < 300, s"train=${counts("train")}")
    assert(math.abs(counts("val") - 1000L) < 150, s"val=${counts("val")}")
    assert(math.abs(counts("test") - 1000L) < 150, s"test=${counts("test")}")
    // partitioning must not matter: identical per-id assignment
    val a = Sampling.assignSplit(ids.repartition(13), col("id"), splits)
      .select("id", "split").as[(Long, String)].collect().toMap
    val b = Sampling.assignSplit(ids.coalesce(1), col("id"), splits)
      .select("id", "split").as[(Long, String)].collect().toMap
    assert(a == b)
  }

  test("sampleByHash is a stable subset: rate 0.1 ⊂ rate 0.2, same rows every run") {
    val s10 = Sampling.sampleByHash(ids, col("id"), 0.1).as[Long].collect().toSet
    val s20 = Sampling.sampleByHash(ids, col("id"), 0.2).as[Long].collect().toSet
    assert(s10.subsetOf(s20), "smaller rate must nest inside larger")
    assert(math.abs(s10.size - 1000) < 150 && math.abs(s20.size - 2000) < 200)
    assert(Sampling.sampleByHash(ids, col("id"), 0.1).as[Long].collect().toSet == s10)
  }

  test("sampleStratified keeps exactly n per category, stable, priority-ordered") {
    val df = (0L until 200L).map(i => (i, if (i % 2 == 0) "a" else "b"))
      .toDF("id", "cat")
    val kept = Sampling.sampleStratified(df, col("id"), "cat", n = 10)
    val byCat = kept.groupBy("cat").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byCat == Map("a" -> 10L, "b" -> 10L))
    // stable: a rerun keeps the identical ids
    val ids = kept.select("id").as[Long].collect().toSet
    val again = Sampling.sampleStratified(df, col("id"), "cat", n = 10)
      .select("id").as[Long].collect().toSet
    assert(again == ids)
    // exactly the n smallest by (portableMix(id), id) within each category
    val pri = df.select(col("id"), col("cat"),
      graft.functions.Sketches.portableMix(col("id")).as("h")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val expect = pri.groupBy(_._2).values.flatMap { rows =>
      rows.sortBy(t => (t._3, t._1)).take(10).map(_._1)
    }.toSet
    assert(ids == expect)
  }

  test("a category with fewer than n rows keeps all of them") {
    val df = Seq((1L, "tiny"), (2L, "tiny")).toDF("id", "cat")
    assert(Sampling.sampleStratified(df, col("id"), "cat", n = 10).count() == 2)
  }

  test("shuffled is a total deterministic order: permutation, stable, epoch-decorrelated") {
    val df = ids.limit(1000)
    def order(e: Long) = Sampling.shuffled(df, col("id"), epoch = e)
      .select("id").as[Long].collect().toSeq
    val o0 = order(0)
    assert(o0.sorted == (0L until 1000L), "must be a permutation of the input")
    assert(o0 != (0L until 1000L).toSeq, "must not be the identity order")
    assert(o0 == order(0), "same epoch, same order, every run")
    val o1 = order(1)
    assert(o1 != o0, "different epochs must produce different orders")
    // prefix decorrelation: epoch 0's first 100 and epoch 1's first 100
    // share about 100^2/1000 = 10 ids; 50 would mean correlated epochs
    assert(o0.take(100).toSet.intersect(o1.take(100).toSet).size < 50)
  }

  test("shuffleKey is a pure function of (id, epoch): stable under repartitioning") {
    val a = Sampling.shuffled(ids.repartition(13), col("id"))
      .select("id").as[Long].collect().toSeq
    val b = Sampling.shuffled(ids.repartition(3), col("id"))
      .select("id").as[Long].collect().toSeq
    assert(a == b)
    intercept[IllegalArgumentException] { Sampling.shuffleKey(col("id"), -1L) }
  }

  test("zvalue interleaves bits: known codes, and order groups both dims") {
    // (x=3, y=1) with 2 bits: x bits at even positions, y at odd ->
    // z = (1<<0) + (1<<2) [x=0b11] + (1<<1) [y=0b01] = 0b0111 = 7
    val z = Seq((3L, 1L)).toDF("x", "y")
      .select(ZOrder.zvalue(Seq(col("x"), col("y")), 2).as("z"))
      .as[Long].head()
    assert(z == 7L, s"expected 7, got $z")
    // locality: within a 2^k-aligned square, all z-values are contiguous —
    // the defining property that makes min/max stats selective on BOTH dims
    val grid = (for { x <- 0L until 16L; y <- 0L until 16L } yield (x, y)).toDF("x", "y")
    val zs = grid.select(col("x"), col("y"),
        ZOrder.zvalue(Seq(col("x"), col("y")), 4).as("z"))
      .as[(Long, Long, Long)].collect()
    assert(zs.map(_._3).distinct.length == 256) // bijective on the grid
    for (qx <- 0 until 2; qy <- 0 until 2) {
      val quad = zs.filter(t => t._1 / 8 == qx && t._2 / 8 == qy).map(_._3)
      assert(quad.max - quad.min == 63, "each 8x8 quadrant is one contiguous z-range")
    }
  }

  test("temperatureTargets: alpha=1 keeps proportions, alpha->0 flattens, caps bind") {
    val counts = Seq(("a", 400L), ("b", 1600L), ("c", 6400L))
    // alpha=1: natural proportions of a 4200 target = exactly half each
    val nat = Sampling.temperatureTargets(counts, 4200L, alpha = 1.0).toMap
    assert(nat == Map("a" -> 200L, "b" -> 800L, "c" -> 3200L), s"$nat")
    // alpha=0.5: sqrt weights 20/40/80 -> 200/400/800 of 1400 — the rare
    // domain's share triples relative to natural (1/21 -> 1/7)
    val t = Sampling.temperatureTargets(counts, 1400L, alpha = 0.5).toMap
    assert(t == Map("a" -> 200L, "b" -> 400L, "c" -> 800L), s"$t")
    // targets sum to the requested total when no cap binds
    assert(Sampling.temperatureTargets(counts, 1300L, 0.5).map(_._2).sum == 1300L)
    // a domain can never exceed its count
    val capped = Sampling.temperatureTargets(counts, 8000L, alpha = 0.1).toMap
    assert(capped("a") == 400L, s"cap must bind: $capped")
    // unsorted input rejects loud
    intercept[IllegalArgumentException](
      Sampling.temperatureTargets(Seq(("z", 1L), ("a", 1L)), 1L, 0.5))
  }

  test("mixture keeps exactly the target count per domain, deterministically") {
    val docs = (0L until 300L).map(i => (i, if (i % 3 == 0) "x" else "y")).toDF("id", "src")
    val targets = Seq(("x", 40L), ("y", 10L))
    val kept = Sampling.mixture(docs, col("id"), "src", targets)
      .select("id", "src").as[(Long, String)].collect()
    assert(kept.count(_._2 == "x") == 40 && kept.count(_._2 == "y") == 10)
    // stable: same inputs -> same kept set
    val again = Sampling.mixture(docs, col("id"), "src", targets)
      .select("id", "src").as[(Long, String)].collect()
    assert(kept.toSet == again.toSet)
    // domains without a target are dropped
    val dropped = Sampling.mixture(docs, col("id"), "src", Seq(("x", 5L)))
      .select("id", "src").as[(Long, String)].collect()
    assert(dropped.length == 5 && dropped.forall(_._2 == "x"))
  }

  test("cluster range-partitions by z and sorts within partitions") {
    val grid = (for { x <- 0L until 32L; y <- 0L until 32L } yield (x, y)).toDF("x", "y")
    val clustered = ZOrder.cluster(grid, Seq(col("x"), col("y")), 5, 4)
    val perPart = clustered
      .select(ZOrder.zvalue(Seq(col("x"), col("y")), 5).as("z"),
        spark_partition_id().as("p"))
      .as[(Long, Int)].collect().groupBy(_._2).values.toSeq
    assert(perPart.size == 4)
    // partitions cover disjoint z-ranges and are internally sorted
    val ranges = perPart.map(rows => (rows.map(_._1).min, rows.map(_._1).max)).sortBy(_._1)
    assert(ranges.sliding(2).forall { case Seq((_, hi), (lo, _)) => hi < lo; case _ => true })
    perPart.foreach { rows => assert(rows.map(_._1).toSeq == rows.map(_._1).toSeq.sorted) }
  }
}
