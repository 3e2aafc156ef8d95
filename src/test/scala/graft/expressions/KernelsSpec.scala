package graft.expressions

import graft.SparkSpec
import graft.functions.{Dedup, TextFunctions, Vectors}
import org.apache.spark.sql.functions._

/** Native Catalyst kernels must agree bit-for-bit with the portable
  * higher-order-function formulations they replace. */
class KernelsSpec extends SparkSpec {
  import spark.implicits._

  test("simhash64 expression == lambda simhash on the corpus") {
    graft.GraftFunctions.register(spark)
    val docs = graft.Tables.documents(spark, sf).limit(200)
    val mismatch = docs.select(
        Dedup.simhash(col("text")).as("lambda"),
        call_function("simhash64", TextFunctions.tokens(col("text"))).as("native"))
      .filter(col("lambda") =!= col("native")).count()
    assert(mismatch == 0)
  }

  test("cosine_vec == lambda cosine on float vectors and double literals") {
    graft.GraftFunctions.register(spark)
    val emb = graft.Tables.embeddings(spark, sf).limit(200)
    val q = graft.queries.Pipeline.annQuery
    val mismatch = emb.select(
        Vectors.cosine(col("embedding"), typedLit(q)).as("lambda"),
        call_function("cosine_vec", col("embedding"), typedLit(q)).as("native"))
      .filter(col("lambda") =!= col("native")).count()
    assert(mismatch == 0)
  }

  test("dot_vec == lambda dot, float x float") {
    graft.GraftFunctions.register(spark)
    val df = Seq((Seq(1.5f, -2.0f, 3.25f), Seq(0.5f, 4.0f, -1.0f))).toDF("a", "b")
    val r = df.select(
      Vectors.dot(col("a"), col("b")).as("lambda"),
      call_function("dot_vec", col("a"), col("b")).as("native")).head()
    assert(r.getDouble(0) == r.getDouble(1))
  }

  test("expressions participate in codegen (no interpreter fallback errors)") {
    graft.GraftFunctions.register(spark)
    // run through a wholestage-codegen'd aggregate to force doGenCode
    val n = graft.Tables.embeddings(spark, sf).limit(100)
      .select(call_function("cosine_vec", col("embedding"), col("embedding")).as("c"))
      .agg(sum(col("c"))).as[Double].head()
    assert(math.abs(n - 100.0) < 1e-9) // self-cosine = 1 per row
  }

  test("word_ngrams expression == lambda shingles formulation") {
    graft.GraftFunctions.register(spark)
    val docs = graft.Tables.documents(spark, sf).limit(200)
    val mismatch = docs.select(
        Dedup.shingles(col("text"), 2).as("lambda"),
        array_distinct(call_function("word_ngrams",
          TextFunctions.tokens(col("text")), lit(2))).as("native"))
      .filter(col("lambda") =!= col("native")).count()
    assert(mismatch == 0)
  }

  test("minhash_sig expression == lambda minhashSignature") {
    graft.GraftFunctions.register(spark)
    val docs = graft.Tables.documents(spark, sf).limit(200)
    val sh = Dedup.shingles(col("text"), 2)
    val mismatch = docs.select(
        Dedup.minhashSignature(sh, 16).as("lambda"),
        call_function("minhash_sig", sh, lit(16)).as("native"))
      .filter(col("lambda") =!= col("native")).count()
    assert(mismatch == 0)
  }

  test("polyHash: hand-computed values and the empty fold") {
    import org.apache.spark.unsafe.types.UTF8String
    // 'ab': (0·131+97)·131+98 = 12805; chained mod 2^31−1
    assert(TextKernels.polyHash(UTF8String.fromString("ab")) == 12805L)
    assert(TextKernels.polyHash(UTF8String.fromString("cd")) == 13069L)
    assert(TextKernels.polyHash(UTF8String.fromString("")) == 0L)
    // BMP codepoint (的 = 30340) folds as a single value
    assert(TextKernels.polyHash(UTF8String.fromString("的")) == 30340L)
  }

  test("minhash_poly: affine-family minima, hand-computed") {
    graft.GraftFunctions.register(spark)
    val sig = Seq(Seq("ab", "cd")).toDF("sh")
      .select(call_function("minhash_poly", col("sh"), lit(4)))
      .as[Seq[Long]].head()
    // j=0: min(12805, 13069); j=1: min((3·12805+1013904223)%P, (3·13069+1013904223)%P)
    assert(sig(0) == 12805L)
    assert(sig(1) == 1013942638L)
    assert(sig.length == 4)
  }

  test("bloom_hits expression == interpreted HOF probe on the corpus") {
    graft.GraftFunctions.register(spark)
    val m = 256L // small dense filter: exercises word indexing and bit 63
    val rnd = new scala.util.Random(42)
    val words = Seq.fill(4)(rnd.nextLong())
    val bloom = typedlit(words)
    val docs = graft.Tables.documents(spark, sf).limit(200)
    val grams = array_distinct(call_function("word_ngrams",
      TextFunctions.tokens(col("text")), lit(3)))
    // the aggregate() HOF probe this kernel replaced, verbatim
    def polyHashC(s: org.apache.spark.sql.Column, base: Long) =
      aggregate(split(s, ""), lit(0L),
        (acc, c) => (acc * lit(base) + ascii(c)) % lit(2147483647L))
    def hit(g: org.apache.spark.sql.Column, base: Long) = {
      val p = polyHashC(g, base) % lit(m)
      (element_at(bloom, shiftright(p, 6).cast("int") + 1)
        .bitwiseAND(call_function("shiftleft", lit(1L), p.bitwiseAND(lit(63L)).cast("int")))) =!= lit(0L)
    }
    val mismatch = docs.select(
        aggregate(grams, lit(0L),
          (acc, g) => acc + when(hit(g, 131L) && hit(g, 137L), 1L).otherwise(0L)).as("lambda"),
        call_function("bloom_hits", grams, bloom).as("native"))
      .filter(col("lambda") =!= col("native")).count()
    assert(mismatch == 0)
    // degenerate tables: all-ones counts every gram, all-zeros counts none
    val ones = typedlit(Seq.fill(4)(-1L))
    val zeros = typedlit(Seq.fill(4)(0L))
    val bad = docs.select(size(grams).cast("long").as("n"),
        call_function("bloom_hits", grams, ones).as("all"),
        call_function("bloom_hits", grams, zeros).as("none"))
      .filter(col("all") =!= col("n") || col("none") =!= lit(0L)).count()
    assert(bad == 0)
  }

  test("weight_sum expression == interpreted HOF fold; hand-computed buckets") {
    graft.GraftFunctions.register(spark)
    val w = (0 until 64).map(i => math.sin(i.toDouble) / 4.0)
    val wl = typedlit(w)
    val docs = graft.Tables.documents(spark, sf).limit(200)
    val grams = call_function("word_ngrams", TextFunctions.tokens(col("text")), lit(2))
    def polyHashC(s: org.apache.spark.sql.Column) =
      aggregate(split(s, ""), lit(0L),
        (acc, c) => (acc * lit(131L) + ascii(c)) % lit(2147483647L))
    val mismatch = docs.select(
        aggregate(grams, lit(0.0),
          (acc, g) => acc + element_at(wl, (polyHashC(g) % 64).cast("int") + 1)).as("lambda"),
        call_function("weight_sum", grams, wl).as("native"))
      .filter(col("lambda") =!= col("native")).count()
    assert(mismatch == 0)
    // 'ab' hashes to 12805 -> bucket 5; 'cd' to 13069 -> bucket 13
    val got = Seq(Seq("ab", "cd")).toDF("g")
      .select(call_function("weight_sum", col("g"), wl)).as[Double].head()
    assert(got == w(5) + w(13))
  }

  test("simhash_poly: deterministic, 62-bit, separates distinct content") {
    graft.GraftFunctions.register(spark)
    val df = Seq(
      ("a", "the quick brown fox"), ("b", "the quick brown fox"),
      ("c", "completely different words entirely")).toDF("id", "t")
      .select(col("id"), call_function("simhash_poly", TextFunctions.tokens(col("t"))).as("sig"))
    val m = df.as[(String, Long)].collect().toMap
    assert(m("a") == m("b"))
    assert(m("a") != m("c"))
    assert(m.values.forall(s => s >= 0 && s < (1L << 62)))
  }
}
