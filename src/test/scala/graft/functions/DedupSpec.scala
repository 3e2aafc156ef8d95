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

  test("simhash groups identical/near docs; distinct content differs") {
    import org.apache.spark.sql.functions.call_function
    graft.GraftFunctions.register(spark)
    val sigs = docs.select(col("doc_id"),
        call_function("simhash_poly", TextFunctions.tokens(col("text"))).as("sig"))
      .as[(Long, Long)].collect().toMap
    assert(sigs(1L) == sigs(2L))       // identical text, identical signature
    assert(sigs(1L) != sigs(4L))       // distinct content separates
    val r = Dedup.simhashDups(docs, "doc_id", "text").collect()
    // the group anchored at doc 1 exists (docs 2, and possibly the one-
    // token-away doc 3 — near-dup grouping is simhash's purpose)
    val g1 = r.find(_.getAs[Long]("keep_id") == 1L)
    assert(g1.isDefined && g1.get.getAs[Long]("n_docs") >= 2)
    // docs 4/5 never land in doc 1's group
    assert(g1.get.getAs[Long]("n_docs") <= 3)
  }

  test("ngramJaccardDups respects the blocking column") {
    val blocked = docs.withColumn("blk", when(col("doc_id") <= 3, "a").otherwise("b"))
    val pairs = Dedup.ngramJaccardDups(blocked, "doc_id", "text",
      blockCol = col("blk"), shingleK = 2, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(pairs.forall { case (a, b) => (a <= 3) == (b <= 3) })
  }

  test("maxShingleDf caps posting skew without changing results below the cap") {
    // "zz tail" appears in EVERY doc (the skewed mega-gram); docs 1/2 are
    // real near-dups, docs 10/11 share ONLY the mega-gram
    val skewed = Seq(
      (1L, "alpha beta gamma delta zz tail"),
      (2L, "alpha beta gamma delta epsilon zz tail"),
      (10L, "one two three four five zz tail"),
      (11L, "six seven eight nine ten zz tail")
    ).toDF("doc_id", "text")
    def pairs(cap: Int) = Dedup.ngramJaccardDups(skewed, "doc_id", "text",
      blockCol = lit("x"), shingleK = 2, threshold = 0.05, maxShingleDf = cap)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val exact = pairs(0)
    assert(exact.contains((1L, 2L)))
    assert(exact.contains((10L, 11L))) // connected via the mega-gram alone
    // a cap no gram exceeds (every gram df <= 4 here) changes NOTHING
    assert(pairs(4) == exact)
    // a binding cap (df <= 3 keeps all but the mega-gram) drops only the
    // pairs connected through the ultra-common gram; 1-2 still found via
    // their four shared rare grams
    val capped = pairs(3)
    assert(capped.contains((1L, 2L)))
    assert(!capped.exists { case (a, b) => a >= 10L || b >= 10L })
  }

  test("embeddingCosineDups finds only high-cosine pairs") {
    val vecs = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
      (2L, Seq(0.999f, 0.04f, 0.0f, 0.0f)),   // ~same direction as 1
      (3L, Seq(0.0f, 1.0f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingCosineDups(vecs, "vec_id", "embedding",
      bands = 4, bitsPerBand = 2, threshold = 0.99)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("banded embedding LSH recall: finds the near-dup pairs a full scan finds") {
    // 40 vectors in 8 near-identical clusters of 5 + noise directions;
    // every within-cluster pair has cos >= 0.99 and must be recovered
    // through the banded blocking (8 bands x 8 bits, the query's config)
    val rnd = new scala.util.Random(11)
    val base = Seq.fill(8)(Seq.fill(16)(rnd.nextGaussian()))
    val vecs = (for {
      c <- 0 until 8; j <- 0 until 5
    } yield {
      val jitter = base(c).map(x => (x + rnd.nextGaussian() * 0.01).toFloat)
      ((c * 5 + j).toLong, jitter)
    }).toDF("vec_id", "embedding")
    val got = Dedup.embeddingCosineDups(vecs, "vec_id", "embedding",
      bands = 8, bitsPerBand = 8, threshold = 0.99, dim = 16)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val want = (for {
      c <- 0 until 8; i <- 0 until 5; j <- i + 1 until 5
    } yield ((c * 5 + i).toLong, (c * 5 + j).toLong)).toSet
    // all pairs found are within-cluster, and recall is essentially total
    assert(got.subsetOf(want))
    assert(got.size >= want.size - 2, s"recall too low: ${got.size}/${want.size}")
  }

  test("connected components: chains, cliques, isolated pairs; non-convergence is loud") {
    // a 10-node chain (diameter 9 — exercises the iteration), a clique,
    // and an isolated pair
    val edges = ((0L until 9L).map(i => (i, i + 1)) ++
      Seq((20L, 21L), (21L, 22L), (20L, 22L), (30L, 31L))).toDF("a", "b")
    val labels = Dedup.connectedComponents(edges, "a", "b")
      .as[(Long, Long)].collect().toMap
    (0L to 9L).foreach(i => assert(labels(i) == 0L, s"chain node $i"))
    Seq(20L, 21L, 22L).foreach(i => assert(labels(i) == 20L))
    Seq(30L, 31L).foreach(i => assert(labels(i) == 30L))
    assert(labels.size == 15)
    // a diameter larger than maxIter must throw, never return wrong labels
    intercept[IllegalArgumentException] {
      Dedup.connectedComponents(edges, "a", "b", maxIter = 3)
    }
  }

  test("keepBest keeps the highest-quality member per cluster, min id on ties") {
    // cluster {1,2,3} (chain) + cluster {10,11}; scores pick 2 and tie 10/11
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("a", "b")
    val docs = Seq(
      (1L, 0.3), (2L, 0.9), (3L, 0.5),
      (10L, 0.7), (11L, 0.7), // tie -> min id 10 wins
      (99L, 1.0)              // in no pair: not emitted
    ).toDF("doc_id", "score")
    val out = Dedup.keepBest(pairs, "a", "b", docs, "doc_id", col("score"))
      .as[(Long, Long, Boolean)].collect()
    assert(out.length == 5, "only clustered docs are emitted")
    val kept = out.filter(_._3).map(t => t._2 -> t._1).toMap // label -> kept id
    assert(kept == Map(1L -> 2L, 10L -> 10L),
      s"quality argmax with min-id ties, got $kept")
    assert(out.filterNot(_._3).map(_._1).toSet == Set(1L, 3L, 11L))
  }

  test("connected components: an empty pair set converges immediately") {
    // legal input (a cluster-scoped pass that found nothing) — the
    // union-propagation round must never run and the checksum must not NPE
    val empty = Seq.empty[(Long, Long)].toDF("a", "b")
    assert(Dedup.connectedComponents(empty, "a", "b").count() == 0)
  }

  test("connected components converge on a path graph far beyond maxIter rounds") {
    // a 1000-node path has diameter 999 — plain min-label propagation
    // needs 999 synchronous rounds and would blow the maxIter=25 guard;
    // the pointer-doubling shortcut must converge in ~log2(999)+1 rounds
    val n = 1000L
    val path = (0L until n - 1).map(i => (i, i + 1)).toDF("a", "b")
    val labels = Dedup.connectedComponents(path, "a", "b") // default maxIter=25
      .as[(Long, Long)].collect()
    assert(labels.length == n)
    assert(labels.forall(_._2 == 0L), "every path node must label to the min id 0")
  }

  test("prefix-filtered ngram jaccard equals the naive quadratic definition") {
    // dense random corpus over a tiny vocabulary — heavy gram sharing, the
    // regime where a prefix-filter bug (too-short prefix, wrong order,
    // float ceil edge) would actually lose pairs
    graft.GraftFunctions.register(spark)
    val r = new scala.util.Random(97)
    val vocab = Vector.tabulate(60)(i => s"t$i")
    val docs = (0 until 60).map { i =>
      val n = 6 + r.nextInt(20)
      (i.toLong, Vector.fill(n)(vocab(r.nextInt(vocab.size))).mkString(" "))
    }.toDF("doc_id", "text")
    val sh = docs.select(col("doc_id").as("id"),
        array_distinct(call_function("word_ngrams",
          TextFunctions.tokens(col("text")), lit(2))).as("sh"))
      .filter(size(col("sh")) >= 1)
    def inter = size(array_intersect(col("a.sh"), col("b.sh"))).cast("double")
    def uni = (size(col("a.sh")) + size(col("b.sh"))).cast("double") - inter
    for (t <- Seq(0.2, 0.35, 0.5, 0.8)) {
      val fast = Dedup.ngramJaccardDups(docs, "doc_id", "text",
          blockCol = lit("x"), shingleK = 2, threshold = t)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      val naive = sh.alias("a").crossJoin(sh.alias("b"))
        .filter(col("a.id") < col("b.id") && inter / greatest(uni, lit(1.0)) >= t)
        .select(col("a.id"), col("b.id")).as[(Long, Long)].collect().toSet
      assert(fast == naive,
        s"t=$t: missing=${naive -- fast} extra=${fast -- naive}")
    }
  }

  test("containmentDups equals the naive quadratic definition, ordered pairs") {
    // same dense-sharing regime as the jaccard equivalence test: any
    // size-prune bug (wrong direction, off-by-threshold) would lose pairs
    graft.GraftFunctions.register(spark)
    val r = new scala.util.Random(53)
    val vocab = Vector.tabulate(40)(i => s"c$i")
    val docs = (0 until 50).map { i =>
      val n = 4 + r.nextInt(24)
      (i.toLong, Vector.fill(n)(vocab(r.nextInt(vocab.size))).mkString(" "))
    }.toDF("doc_id", "text")
    val sh = docs.select(col("doc_id").as("id"),
        array_distinct(call_function("word_ngrams",
          TextFunctions.tokens(col("text")), lit(2))).as("sh"))
    def inter = size(array_intersect(col("a.sh"), col("b.sh"))).cast("double")
    for (t <- Seq(0.3, 0.5, 0.8)) {
      val fast = Dedup.containmentDups(docs, "doc_id", "text",
          blockCol = lit("x"), shingleK = 2, threshold = t)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      val naive = sh.alias("a").crossJoin(sh.alias("b"))
        .filter(col("a.id") =!= col("b.id") &&
          inter / greatest(size(col("a.sh")).cast("double"), lit(1.0)) >= t)
        .select(col("a.id"), col("b.id")).as[(Long, Long)].collect().toSet
      assert(fast == naive,
        s"t=$t: missing=${naive -- fast} extra=${fast -- naive}")
    }
  }

  test("containment is asymmetric: excerpt -> container found, reverse is not") {
    // doc 2 = the first third of doc 1: C(2,1) = 1.0 but C(1,2) ~ 0.33,
    // exactly the doc-in-doc case symmetric jaccard (~0.33) misses at 0.8
    val long = (0 until 30).map(i => s"u$i").mkString(" ")
    val short = (0 until 10).map(i => s"u$i").mkString(" ")
    val df = Seq((1L, long), (2L, short)).toDF("doc_id", "text")
    val pairs = Dedup.containmentDups(df, "doc_id", "text",
        blockCol = lit("x"), shingleK = 3, threshold = 0.8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((2L, 1L)), s"expected only (2,1), got $pairs")
  }

  test("cascadeDups: lexical recall gated by semantic precision") {
    // docs 1/2: same text AND aligned embeddings -> survives the cascade
    // docs 3/4: same text but ANTI-aligned embeddings (template page,
    //           different meaning) -> candidate, killed by the cosine gate
    // docs 5/6: aligned embeddings but disjoint text -> never a candidate
    val base = (0 until 30).map(i => s"tok$i").mkString(" ")
    val other = (100 until 130).map(i => s"tok$i").mkString(" ")
    val docs = Seq(
      (1L, base), (2L, base),
      (3L, base + " x"), (4L, base + " y"),
      (5L, other), (6L, (200 until 230).map(i => s"tok$i").mkString(" "))
    ).toDF("doc_id", "text")
    val up = Seq.tabulate(8)(i => math.sin(i + 1).toFloat)
    val vecs = Seq(
      (1L, up.toSeq), (2L, up.map(x => x * 0.9f).toSeq),
      (3L, up.toSeq), (4L, up.map(x => -x).toSeq),
      (5L, up.toSeq), (6L, up.map(x => x * 1.1f).toSeq)
    ).toDF("vec_id", "embedding")
    val pairs = Dedup.cascadeDups(docs, vecs, "doc_id", "text",
        "vec_id", "embedding", minCos = 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)), s"aligned near-dup must survive: $pairs")
    assert(!pairs.contains((3L, 4L)), "anti-aligned template pair must be gated out")
    assert(!pairs.exists(p => p._1 == 5L || p._2 == 5L || p._2 == 6L),
      s"disjoint text must never become a candidate: $pairs")
  }

  test("incremental minhash-LSH equals the full run restricted to new-touching pairs") {
    import org.apache.spark.sql.DataFrame
    // 12 clusters of 3 near-dup docs; first 8 clusters are the existing
    // corpus, last 4 plus one extra member of cluster 2 arrive as the
    // new batch — so the increment must find new-new AND new-old pairs
    val vocab = Vector.tabulate(300)(i => s"w${i}q${(i * 48271) % 611}")
    val r = new scala.util.Random(41)
    val docs: Seq[(Long, String)] = (0 until 12).flatMap { c =>
      val words = Vector.fill(25)(vocab(r.nextInt(vocab.size)))
      (0 until 3).map { m =>
        val w = if (m == 0) words else words.updated(24, vocab(r.nextInt(vocab.size)))
        ((c * 3 + m).toLong, w.mkString(" "))
      }
    }
    val crossDoc = (100L, docs.find(_._1 == 6L).get._2) // near-dup of cluster-2 doc
    val oldDocs = docs.filter(_._1 < 24L)
    val newDocs = docs.filter(_._1 >= 24L) :+ crossDoc
    val oldDf = oldDocs.toDF("doc_id", "text")
    val newDf = newDocs.toDF("doc_id", "text")
    val allDf = (oldDocs ++ newDocs).toDF("doc_id", "text")
    def norm(df: DataFrame, a: String, b: String) =
      df.select(col(a), col(b)).as[(Long, Long)].collect()
        .map(p => (math.min(p._1, p._2), math.max(p._1, p._2))).toSet
    val full = norm(Dedup.minhashLsh(allDf, "doc_id", "text", threshold = 0.5), "id_a", "id_b")
    val newIds = newDocs.map(_._1).toSet
    val expected = full.filter(p => newIds.contains(p._1) || newIds.contains(p._2))
    assert(expected.nonEmpty && expected.exists(p => p._1 < 24L || p._2 < 24L),
      "fixture must produce new-old pairs")
    val existing = Dedup.minhashSignatures(oldDf, "doc_id", "text", 16, 3)
      .select("id", "sh", "sig")
    val inc = norm(Dedup.minhashLshIncremental(newDf, "doc_id", "text", existing,
      threshold = 0.5), "id_new", "id_other")
    assert(inc == expected, s"incremental=$inc expected=$expected")
  }

  test("LSH candidate sets grow linearly with corpus size, not quadratically") {
    // clustered corpora whose cluster COUNT doubles with N (cluster size
    // fixed at 4): true near-dup pairs grow linearly, so a bucketed
    // candidate generator must too — an all-pairs generator would grow
    // ~4x on a 2x corpus. The 3.0 bound splits the regimes with headroom
    // for stray cross-cluster bucket collisions (which the verification
    // stage later discards). This pins the "banded, never N^2" design
    // claim as a regression-proof invariant.
    graft.GraftFunctions.register(spark)
    val vocab = Vector.tabulate(500)(i => s"tok${i}x${(i * 2654435761L % 997)}")
    def corpus(nClusters: Int): Seq[(Long, String)] = {
      val r = new scala.util.Random(13)
      (0 until nClusters).flatMap { c =>
        val words = Vector.fill(30)(vocab(r.nextInt(vocab.size)))
        (0 until 4).map { m =>
          val w = if (m == 0) words else words.updated(29, vocab(r.nextInt(vocab.size)))
          ((c * 4 + m).toLong, w.mkString(" "))
        }
      }
    }
    def minhashCand(nClusters: Int): Long =
      Dedup.candidatePairs(Dedup.minhashBanded(
        Dedup.minhashSignatures(corpus(nClusters).toDF("doc_id", "text"),
          "doc_id", "text", numHashes = 16, shingleK = 3),
        numHashes = 16, bands = 4)).count()
    val m1 = minhashCand(40)
    val m2 = minhashCand(80)
    assert(m1 >= 40L, s"clusters must collide in buckets: $m1 candidates")
    assert(m2 <= 3.0 * m1, s"minhash candidates $m1 -> $m2 on a 2x corpus: super-linear")

    def vecCorpus(nClusters: Int): Seq[(Long, Seq[Float])] = {
      val r = new scala.util.Random(29)
      (0 until nClusters).flatMap { c =>
        val center = Array.fill(64)(r.nextGaussian())
        (0 until 4).map { m =>
          ((c * 4 + m).toLong,
            center.map(x => (x + 0.01 * r.nextGaussian()).toFloat).toSeq)
        }
      }
    }
    def embCand(nClusters: Int): Long =
      Dedup.candidatePairs(Dedup.embeddingBanded(
        vecCorpus(nClusters).toDF("id", "v"), bands = 8, bitsPerBand = 12,
        dim = 64)).count()
    val e1 = embCand(40)
    val e2 = embCand(80)
    assert(e1 >= 40L, s"clusters must collide in buckets: $e1 candidates")
    assert(e2 <= 3.0 * e1, s"embedding candidates $e1 -> $e2 on a 2x corpus: super-linear")
  }

  test("scoped embedding pass: equals global+filter; sub-quadratic when K scales with corpus") {
    // SemDeDup scale claim, pinned two ways.
    graft.GraftFunctions.register(spark)
    def vecCorpus(nClusters: Int): Seq[(Long, Seq[Float])] = {
      val r = new scala.util.Random(29)
      (0 until nClusters).flatMap { c =>
        val center = Array.fill(64)(r.nextGaussian())
        (0 until 4).map { m =>
          ((c * 4 + m).toLong,
            center.map(x => (x + 0.01 * r.nextGaussian()).toFloat).toSeq)
        }
      }
    }
    // (1) EQUIVALENCE: scoping the bucket key by an assignment yields
    // exactly the global pass's pairs restricted to same-scope — the
    // invariant that lets pipeline_semdedup keep its oracle SQL in the
    // generate-globally-then-filter form while executing scoped.
    val docs = vecCorpus(24)
    val df = docs.toDF("id", "v")
    val k1 = 6
    val scope = docs.map { case (id, _) => (id, (id / 4) % k1) }.toDF("id", "ck")
    def norm(p: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      p.select(col("id_a"), col("id_b")).as[(Long, Long)].collect().toSet
    val scoped = norm(Dedup.embeddingCosineDupsScoped(df, "id", "v",
      scope, "id", "ck", bands = 8, bitsPerBand = 8, threshold = 0.9))
    val byId = docs.map { case (id, _) => id -> (id / 4) % k1 }.toMap
    val globalFiltered = norm(Dedup.embeddingCosineDups(df, "id", "v",
      bands = 8, bitsPerBand = 8, threshold = 0.9))
      .filter { case (a, b) => byId(a) == byId(b) }
    assert(scoped.nonEmpty, "fixture must produce same-scope near-dup pairs")
    assert(scoped == globalFiltered,
      s"scoped pass diverged from global+filter: ${scoped.size} vs ${globalFiltered.size}")

    // (2) GROWTH with K SCALING: double the corpus AND double K (the
    // paper's regime — K proportional to corpus / cluster-budget); scoped
    // candidate volume must stay ~linear. Same 3.0 bound as the global
    // LSH gates above. Narrow bands (bitsPerBand=4) make buckets coarse
    // enough that an unscoped generator would visibly super-scale, so the
    // gate exercises the scope key, not just the LSH.
    def scopedCand(nClusters: Int, k: Int): Long = {
      val cs = vecCorpus(nClusters)
      val sc = cs.map { case (id, _) => (id, (id / 4) % k) }.toDF("id", "ck")
      Dedup.candidatePairsKeyed(
        Dedup.embeddingBanded(cs.toDF("id", "v"), bands = 4, bitsPerBand = 4, dim = 64)
          .join(sc.select(col("id"), col("ck").as("scope")), Seq("id")),
        Seq("scope", "band", "bucket")).count()
    }
    val s1 = scopedCand(40, 10)
    val s2 = scopedCand(80, 20)
    assert(s1 >= 40L, s"clusters must collide in scoped buckets: $s1 candidates")
    assert(s2 <= 3.0 * s1, s"scoped candidates $s1 -> $s2 on a 2x corpus with 2x K: super-linear")

    // (3) the bucket cap bounds a hot bucket without touching others:
    // capping at 3 removes every pair from the 4-member scoped buckets
    val capped = Dedup.candidatePairsKeyed(
      Dedup.embeddingBanded(df, bands = 8, bitsPerBand = 8, dim = 64)
        .join(scope.select(col("id"), col("ck").as("scope")), Seq("id")),
      Seq("scope", "band", "bucket"), maxBucketSize = 3).count()
    val uncapped = Dedup.candidatePairsKeyed(
      Dedup.embeddingBanded(df, bands = 8, bitsPerBand = 8, dim = 64)
        .join(scope.select(col("id"), col("ck").as("scope")), Seq("id")),
      Seq("scope", "band", "bucket")).count()
    assert(capped < uncapped,
      s"maxBucketSize must drop over-cap buckets: capped=$capped uncapped=$uncapped")
  }

  test("winnow kernel: matches the brute-force definition; guarantee holds") {
    import graft.expressions.TextKernels
    import org.apache.spark.unsafe.types.UTF8String
    val P = 2147483647L
    def brute(s: String, k: Int, w: Int): Set[Long] = {
      val cps = s.codePoints().toArray.map(_.toLong)
      if (cps.isEmpty) return Set.empty
      def hashOf(xs: Array[Long]): Long = xs.foldLeft(0L)((a, x) => (a * 131 + x) % P)
      val hs = if (cps.length < k) Array(hashOf(cps))
               else cps.sliding(k).map(hashOf).toArray
      val ww = math.min(w, hs.length)
      hs.sliding(ww).map(_.min).toSet
    }
    def kernel(s: String, k: Int, w: Int): Set[Long] = {
      val a = TextKernels.winnow(UTF8String.fromString(s), k, w)
      (0 until a.numElements()).map(a.getLong).toSet
    }
    val rnd = new scala.util.Random(41)
    val texts = Seq("", "ab", "abcdefgh",
      "the quick brown fox jumps over the lazy dog") ++
      (0 until 20).map(_ => rnd.alphanumeric.take(rnd.nextInt(120)).mkString)
    for (t <- texts; (k, w) <- Seq((8, 4), (5, 3), (3, 7)))
      assert(kernel(t, k, w) == brute(t, k, w), s"k=$k w=$w text='$t'")
    // the winnowing guarantee: a shared run of length >= w+k-1 shares a
    // fingerprint VALUE even at different offsets in unrelated texts
    val run = "SHARED-PASSAGE-XYZ" // 18 >= 8+4-1
    val a = kernel("aaaa " + run + " bbbb", 8, 4)
    val b = kernel("ccccccccc " + run, 8, 4)
    assert(a.intersect(b).nonEmpty, "guaranteed shared fingerprint missing")
  }

  test("winnowDups finds substring-sharing docs, df cap cuts corpus-wide boilerplate") {
    val shared = "an exceptionally distinctive copied passage nobody else has"
    val docs = Seq(
      (1L, s"first document carries $shared inside it"),
      (2L, s"$shared opens the second document"),
      (3L, "a wholly unrelated text with nothing in common qq"),
      (4L, "another distinct body of text zz")) ++
      // every doc shares this header -> its fingerprints blow past maxDf=3
      (10L until 30L).map(i => (i, s"COMMON HEADER LINE ALWAYS THE SAME $i"))
    val out = Dedup.winnowDups(docs.toDF("doc_id", "text"), "doc_id", "text",
      k = 8, window = 4, minShared = 2, maxDf = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out.contains((1L, 2L)), s"substring pair missed: $out")
    assert(out.forall { case (x, y) => x < 10 && y < 10 },
      s"df cap failed to cut the boilerplate cluster: $out")
  }
}
