package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("decontaminate flags documents sharing >= minOverlap distinct k-grams") {
    val bench = Seq((100L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val train = Seq(
      // shares 3 distinct trigrams with the benchmark doc
      (1L, "alpha beta gamma delta epsilon zeta"),
      // shares exactly 1 trigram — below the threshold
      (2L, "alpha beta gamma xyz qqq www"),
      // shares nothing
      (3L, "one two three four five six")).toDF("doc_id", "text")
    val out = Curation.decontaminate(train, bench, "doc_id", "text",
      k = 3, minOverlap = 3L).collect()
    assert(out.map(r => r.getLong(0) -> r.getLong(1)).toMap == Map(1L -> 3L))
  }

  test("decontaminate at minOverlap=1 catches any shared gram") {
    val bench = Seq((100L, "alpha beta gamma")).toDF("doc_id", "text")
    val train = Seq(
      (1L, "alpha beta gamma tail"),
      (2L, "no overlap here at all")).toDF("doc_id", "text")
    val out = Curation.decontaminate(train, bench, "doc_id", "text",
      k = 3, minOverlap = 1L).collect()
    assert(out.map(_.getLong(0)).toSet == Set(1L))
  }

  test("decontaminateBloom flags a superset of the exact sweep, map-only probe") {
    val bench = Seq((100L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val train = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"), // 3 shared trigrams
      (2L, "alpha beta gamma xyz qqq www"),        // 1 shared
      (3L, "one two three four five six")).toDF("doc_id", "text")
    def ids(df: org.apache.spark.sql.DataFrame) = df.select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val exact1 = ids(Curation.decontaminate(train, bench, "doc_id", "text", 3, 1L))
    val bloomDf = Curation.decontaminateBloom(train, bench, "doc_id", "text", 3, 1L)
    val bloom1 = ids(bloomDf)
    assert(exact1.subsetOf(bloom1), "bloom must never lose an exact hit")
    // at 2^16 bits over a handful of grams, no false positive fits: equal
    assert(bloom1 == exact1)
    assert(ids(Curation.decontaminateBloom(train, bench, "doc_id", "text", 3, 3L)) == Set(1L))
    // a deliberately tiny filter (64 bits) collides hard — still a superset
    val tiny = ids(Curation.decontaminateBloom(train, bench, "doc_id", "text", 3, 1L, mBits = 64))
    assert(exact1.subsetOf(tiny))
    // the probe is a pure map: no join anywhere in the probe plan
    val plan = bloomDf.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(!plan.contains("Join"), plan.take(400))
  }

  test("repetitionRatio: 0 for all-distinct, high for repeated tokens") {
    val df = Seq(
      (1L, "a b c d"),          // 0.0
      (2L, "a a a a"),          // 1 - 1/4 = 0.75
      (3L, "a a b b")           // 1 - 2/4 = 0.5
    ).toDF("doc_id", "text")
    val out = df.select(col("doc_id"), Curation.repetitionRatio(col("text")).as("r"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out(1L) == 0.0 && out(2L) == 0.75 && out(3L) == 0.5)
  }

  test("packSequences: greedy bins advance when the running total crosses the target") {
    // tokens per doc: 3, 3, 3 with target 4:
    //   doc 1 starts at 0  -> bin 0
    //   doc 2 starts at 3  -> bin 0 (3 < 4: greedy overflow allowed)
    //   doc 3 starts at 6  -> bin 1
    val df = Seq(
      (1L, "g", "a b c"), (2L, "g", "d e f"), (3L, "g", "g h i")
    ).toDF("doc_id", "grp", "text")
    val out = Curation.packSequences(df, "text", "doc_id", Seq("grp"), 4L)
      .select(col("doc_id"), col("bin")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 0L, 2L -> 0L, 3L -> 1L))
  }

  test("packSequences packs independently per partition group") {
    val df = Seq(
      (1L, "x", "a b"), (2L, "x", "c d"),
      (10L, "y", "e f"), (11L, "y", "g h")
    ).toDF("doc_id", "grp", "text")
    val out = Curation.packSequences(df, "text", "doc_id", Seq("grp"), 3L)
      .select(col("grp"), col("doc_id"), col("bin")).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    // each group restarts at bin 0: 2 tokens -> bin 0, next doc starts at 2 -> bin 0
    // (2 < 3), third token total crosses only within the second doc.
    assert(out(("x", 1L)) == 0L && out(("y", 10L)) == 0L)
    assert(out(("x", 2L)) == 0L && out(("y", 11L)) == 0L)
  }

  test("quotaCap keeps hash-priority prefix until the token budget") {
    // 4 docs of 3 tokens each in one category with a 7-token budget:
    // exactly the 2 lowest-priority-hash docs survive (3+3=6 <= 7 < 9).
    val df = Seq(
      (1L, "s", "a b c"), (2L, "s", "d e f"),
      (3L, "s", "g h i"), (4L, "s", "j k l")).toDF("doc_id", "source", "text")
    val kept = Curation.quotaCap(df, "doc_id", "source", "text", 7L)
    val ids = kept.select("doc_id").as[Long].collect().toSet
    assert(ids.size == 2, s"7-token budget over 3-token docs keeps 2, got $ids")
    // determinism + priority order: re-running keeps the identical set,
    // and it is the 2 smallest by (rollingHash(id), id)
    val pri = df.select(col("doc_id"),
      graft.functions.TextFunctions.rollingHash(col("doc_id").cast("string")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expect = pri.toSeq.sortBy { case (id, h) => (h, id) }.take(2).map(_._1).toSet
    assert(ids == expect)
    val again = Curation.quotaCap(df, "doc_id", "source", "text", 7L)
      .select("doc_id").as[Long].collect().toSet
    assert(again == ids)
  }

  test("quotaCap budgets each category independently") {
    val df = Seq(
      (1L, "x", "a b c d e"), (2L, "x", "f g h i j"),
      (10L, "y", "k l"), (11L, "y", "m n")).toDF("doc_id", "source", "text")
    // budget 5: category x keeps exactly one 5-token doc; y keeps both 2-token docs
    val out = Curation.quotaCap(df, "doc_id", "source", "text", 5L)
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("x" -> 1L, "y" -> 2L))
  }

  test("chunkDocuments: boundaries, overlap, and short tails") {
    // 10 tokens, chunk 4, overlap 2 -> stride 2: starts 0,2,4,6,8
    val df = Seq((1L, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9")).toDF("doc_id", "text")
    val out = Curation.chunkDocuments(df, "text", chunkTokens = 4, overlap = 2)
      .select("chunk_idx", "chunk_text", "chunk_tokens").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getInt(2))).sortBy(_._1)
    assert(out.length == 5)
    assert(out(0) == ((0, "t0 t1 t2 t3", 4)))
    assert(out(1) == ((1, "t2 t3 t4 t5", 4)), "consecutive chunks share the overlap")
    assert(out(4) == ((4, "t8 t9", 2)), "the tail chunk may be short")
  }

  test("chunkDocuments: a doc shorter than one chunk yields exactly one chunk") {
    val df = Seq((1L, "a b")).toDF("doc_id", "text")
    val out = Curation.chunkDocuments(df, "text", chunkTokens = 64, overlap = 16)
      .select("chunk_idx", "chunk_text", "chunk_tokens").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getInt(2)))
    assert(out.toSeq == Seq((0, "a b", 2)))
  }

  test("lineDedup drops segments with df >= minDf, keeps order, counts distinct docs") {
    // "nav bar" repeats in docs 1,2,3 (df=3) -> dropped at minDf=3;
    // "body one/two/three" are unique -> kept; doc 4 repeats "nav bar"
    // INTERNALLY only (df=1 by distinct-doc counting) -> kept both times
    val docs = Seq(
      (1L, Seq("nav bar", "body one", "footer x")),
      (2L, Seq("nav bar", "body two")),
      (3L, Seq("body three", "nav bar")),
      (4L, Seq("same seg", "same seg"))
    ).toDF("doc_id", "segs")
    val out = Curation.lineDedup(docs, "doc_id", col("segs"), minDf = 3L, sep = " | ")
      .as[(Long, String, Long, Long)].collect().sortBy(_._1)
    assert(out(0) == ((1L, "body one | footer x", 3L, 2L)))
    assert(out(1) == ((2L, "body two", 2L, 1L)))
    assert(out(2) == ((3L, "body three", 2L, 1L)))
    assert(out(3) == ((4L, "same seg | same seg", 2L, 2L)),
      "internal repeats must not inflate df")
  }

  test("lineDedup: a doc that loses every segment survives with empty text") {
    val docs = Seq(
      (1L, Seq("dup")), (2L, Seq("dup")), (3L, Seq("dup", "keep"))
    ).toDF("doc_id", "segs")
    val out = Curation.lineDedup(docs, "doc_id", col("segs"), minDf = 3L)
      .as[(Long, String, Long, Long)].collect().sortBy(_._1)
    assert(out(0) == ((1L, "", 1L, 0L)))
    assert(out(1) == ((2L, "", 1L, 0L)))
    assert(out(2) == ((3L, "keep", 2L, 1L)))
  }

  test("lineDedupIncremental equals the full recompute restricted to the new batch") {
    // old corpus: "nav" has df=2 (below minDf=3); the new batch adds a
    // third "nav" doc — the increment must see the MERGED count, clean
    // the new doc accordingly, and surface "nav" as newly frequent so
    // old docs 1/2 can be invalidated downstream
    val old = Seq(
      (1L, Seq("nav", "body one")),
      (2L, Seq("nav", "body two")),
      (3L, Seq("body three"))
    ).toDF("doc_id", "segs")
    val fresh = Seq(
      (10L, Seq("nav", "body ten")),
      (11L, Seq("body eleven", "body eleven"))
    ).toDF("doc_id", "segs")
    val state = Curation.segmentDf(old, "doc_id", col("segs"))
    val delta = Curation.lineDedupIncremental(fresh, "doc_id", col("segs"),
      state, minDf = 3L)
    val full = Curation.lineDedup(old.unionByName(fresh), "doc_id", col("segs"), minDf = 3L)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, String, Long, Long)].collect().toSet
    assert(rows(delta.cleaned) == rows(full.filter(col("id") >= 10L)))
    assert(rows(delta.cleaned).contains((10L, "body ten", 2L, 1L)),
      "the merged count must push nav over the threshold for the new doc")
    assert(delta.newlyFrequent.as[String].collect().toSeq == Seq("nav"))
    // the merged state equals a from-scratch df count over the whole corpus
    val fromScratch = Curation.segmentDf(old.unionByName(fresh), "doc_id", col("segs"))
      .as[(String, Long)].collect().toSet
    assert(delta.mergedDf.as[(String, Long)].collect().toSet == fromScratch)
  }

  test("tokenWindows: non-overlapping windows with a partial tail") {
    val df = Seq(("a b c d e f g"), ("x"), ("")).toDF("text")
      .select(Curation.tokenWindows(col("text"), 3).as("w"))
      .as[Seq[String]].collect()
    assert(df(0) == Seq("a b c", "d e f", "g"))
    assert(df(1) == Seq("x"))
    assert(df(2) == Seq(""), "empty text tokenizes to one empty window")
  }

  test("tokenWindows (regex pass) equals the split-and-slice reference on random text") {
    // the segmenter was rewritten from transform-of-slices to one greedy
    // regex pass for speed; this differential pins the semantics across
    // window sizes, whitespace runs, and short/empty docs
    val r = new scala.util.Random(71)
    val texts = (0 until 200).map { _ =>
      val n = r.nextInt(12)
      (0 until n).map(_ => "w" + r.nextInt(9))
        .mkString(if (r.nextBoolean()) " " else "  ") +
        (if (r.nextBoolean()) " " else "")
    } :+ "" :+ "   " :+ "one"
    def reference(t: String, w: Int): Seq[String] = {
      val toks = t.trim.split("\\s+").toSeq // split("") = Seq("")
      toks.grouped(w).map(_.mkString(" ")).toSeq match {
        case Seq() => Seq("")
        case ws => ws
      }
    }
    for (w <- Seq(1, 3, 5)) {
      val got = texts.toDF("text")
        .select(col("text"), Curation.tokenWindows(col("text"), w).as("ws"))
        .as[(String, Seq[String])].collect()
      got.foreach { case (t, ws) =>
        assert(ws == reference(t, w), s"w=$w text='$t'")
      }
    }
  }

  test("unigramScore: common-token docs score higher than rare-token docs") {
    // corpus: "x" appears 6 times of 8 tokens; "q r" are singletons
    val df = Seq(
      (1L, "x x x"), (2L, "x x x"), (3L, "q r")).toDF("doc_id", "text")
    val out = Curation.unigramScore(df, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out(1L) == 0.75 && out(2L) == 0.75, s"x freq 6/8 -> score 0.75: $out")
    assert(out(3L) == 0.125, s"singleton freq 1/8 -> score 0.125: $out")
    assert(out(1L) > out(3L), "fluent (common) text must outscore gibberish")
  }

  test("edge cases: empty benchmark, zero budget, single-doc pack") {
    val docs = Seq((1L, "g", "a b c")).toDF("doc_id", "grp", "text")
    val noBench = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Curation.decontaminate(
      docs.toDF("doc_id", "grp", "text").withColumnRenamed("grp", "unused"),
      noBench, "doc_id", "text").count() == 0,
      "empty benchmark flags nothing")
    assert(Curation.quotaCap(docs, "doc_id", "grp", "text", 0L).count() == 0,
      "zero budget keeps nothing")
    val packed = Curation.packSequences(docs, "text", "doc_id", Seq("grp"), 512L)
      .select("bin").as[Long].collect()
    assert(packed.sameElements(Array(0L)), "a single doc packs into bin 0")
  }

  test("argument contracts fail fast") {
    val df = Seq((1L, "g", "a b")).toDF("doc_id", "grp", "text")
    intercept[IllegalArgumentException] {
      Curation.chunkDocuments(df, "text", chunkTokens = 4, overlap = 4)
    }
    intercept[IllegalArgumentException] {
      Curation.chunkDocuments(df, "text", chunkTokens = 4, overlap = -1)
    }
  }

  test("sampleWeighted is deterministic and monotone in the rate") {
    val df = (0L until 400L).map(i => (i, if (i % 2 == 0) "a" else "b", i))
      .toDF("doc_id", "source", "payload")
    val half = Curation.sampleWeighted(df, "doc_id", "source",
      Map("a" -> 500, "b" -> 500), 100)
    val all = Curation.sampleWeighted(df, "doc_id", "source",
      Map("a" -> 1000, "b" -> 1000), 100)
    val halfIds = half.select("doc_id").as[Long].collect().toSet
    val allIds = all.select("doc_id").as[Long].collect().toSet
    assert(allIds.size == 400, "rate 1000 permille must keep everything")
    assert(halfIds.subsetOf(allIds))
    // roughly half survive (hash spread, not exact): wide tolerance
    assert(halfIds.size > 100 && halfIds.size < 300, s"got ${halfIds.size}")
    // deterministic: a second run selects the identical set
    val again = Curation.sampleWeighted(df, "doc_id", "source",
      Map("a" -> 500, "b" -> 500), 100).select("doc_id").as[Long].collect().toSet
    assert(again == halfIds)
  }

  test("sampleWeighted applies per-category rates and the default") {
    val df = (0L until 300L).map(i =>
      (i, Seq("keep", "drop", "other")(i.toInt % 3))).toDF("doc_id", "source")
    val out = Curation.sampleWeighted(df, "doc_id", "source",
      Map("keep" -> 1000, "drop" -> 0), 100)
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out("keep") == 100L)
    assert(!out.contains("drop"))
    assert(out.getOrElse("other", 0L) < 40L) // ~10% of 100
  }
}
