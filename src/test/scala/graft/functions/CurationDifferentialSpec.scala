package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Differential tests: each curation operator vs an independent
  * sequential Scala reference on a seeded random corpus — the
  * example-based CurationSpec cases pin known answers; these pin the
  * operators' SEMANTICS across a few hundred irregular documents
  * (odd whitespace, empty texts, repeated tokens, skewed categories).
  * Deterministic seeded sampling (the scalatest/scalacheck bridge is
  * not in the offline artifact cache — SliceAlgebraSpec discipline). */
class CurationDifferentialSpec extends SparkSpec {
  import spark.implicits._

  private val P = 2147483647L

  /** The portable digit-fold hash ([[TextFunctions.rollingHash]] twin). */
  private def refHash(s: String): Long = {
    val norm = s.trim.replaceAll("\\s+", " ")
    norm.foldLeft(0L)((h, c) => (h * 131 + c.toLong) % P)
  }

  /** The tokenizer twin: split(trim(text), "\\s+"). */
  private def refTokens(text: String): Array[String] = text.trim.split("\\s+")

  private case class Doc(id: Long, cat: String, text: String)

  private def corpus(seed: Int, n: Int): Seq[Doc] = {
    val rnd = new scala.util.Random(seed)
    val vocab = Vector("a", "bb", "ccc", "dd", "e", "ffff", "gg", "hi", "jk", "lmn")
    (0 until n).map { i =>
      val cat = s"c${rnd.nextInt(4)}"
      val words = Seq.fill(rnd.nextInt(20))(vocab(rnd.nextInt(vocab.size)))
      val sep = if (rnd.nextBoolean()) " " else "   "
      val pad = if (rnd.nextBoolean()) "  " else ""
      Doc(i.toLong, cat, pad + words.mkString(sep) + pad)
    }
  }

  test("packSequences matches a sequential fold on a random corpus") {
    val docs = corpus(seed = 11, n = 250)
    val df = docs.map(d => (d.id, d.cat, d.text)).toDF("doc_id", "cat", "text")
    val got = Curation.packSequences(df, "text", "doc_id", Seq("cat"), 32L)
      .select("doc_id", "bin").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = docs.groupBy(_.cat).values.flatMap { group =>
      var before = 0L
      group.sortBy(_.id).map { d =>
        val tok = refTokens(d.text).length.toLong
        val bin = before / 32L
        before += tok
        d.id -> bin
      }
    }.toMap
    assert(got == want)
  }

  test("quotaCap matches a sequential budget fold on a random corpus") {
    val docs = corpus(seed = 13, n = 250)
    val df = docs.map(d => (d.id, d.cat, d.text)).toDF("doc_id", "cat", "text")
    val got = Curation.quotaCap(df, "doc_id", "cat", "text", 200L)
      .select("doc_id").as[Long].collect().toSet
    val want = docs.groupBy(_.cat).values.flatMap { group =>
      var cum = 0L
      group.sortBy(d => (refHash(d.id.toString), d.id)).flatMap { d =>
        cum += refTokens(d.text).length.toLong
        if (cum <= 200L) Some(d.id) else None
      }
    }.toSet
    assert(got == want)
  }

  test("chunkDocuments matches reference chunking on a random corpus") {
    val docs = corpus(seed = 17, n = 150)
    val df = docs.map(d => (d.id, d.cat, d.text)).toDF("doc_id", "cat", "text")
    val got = Curation.chunkDocuments(df, "text", chunkTokens = 8, overlap = 3)
      .select("doc_id", "chunk_idx", "chunk_text", "chunk_tokens").collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> (r.getString(2), r.getInt(3))).toMap
    val want = docs.flatMap { d =>
      val toks = refTokens(d.text)
      val stride = 5
      Iterator.from(0).map(_ * stride).takeWhile(_ < toks.length).zipWithIndex.map {
        case (start, idx) =>
          val chunk = toks.slice(start, start + 8)
          (d.id, idx) -> (chunk.mkString(" "), chunk.length)
      }
    }.toMap
    assert(got == want)
  }

  test("sampleWeighted matches the reference gate on a random corpus") {
    val docs = corpus(seed = 19, n = 300)
    val df = docs.map(d => (d.id, d.cat, d.text)).toDF("doc_id", "cat", "text")
    val rates = Map("c0" -> 1000, "c1" -> 500, "c2" -> 0)
    val got = Curation.sampleWeighted(df, "doc_id", "cat", rates, defaultPermille = 250)
      .select("doc_id").as[Long].collect().toSet
    val want = docs.filter { d =>
      refHash(d.id.toString) % 1000L < rates.getOrElse(d.cat, 250).toLong
    }.map(_.id).toSet
    assert(got == want)
  }

  test("unigramScore matches the reference distribution on a random corpus") {
    val docs = corpus(seed = 23, n = 200)
    val df = docs.map(d => (d.id, d.cat, d.text)).toDF("doc_id", "cat", "text")
    val got = Curation.unigramScore(df, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val all = docs.flatMap(d => refTokens(d.text))
    val cnt = all.groupBy(identity).map { case (t, o) => t -> o.size.toLong }
    val n = all.size.toDouble
    docs.foreach { d =>
      val toks = refTokens(d.text)
      val want = toks.map(t => cnt(t) / n).sum / toks.length
      assert(math.abs(got(d.id) - want) < 1e-12,
        s"doc ${d.id}: got ${got(d.id)}, want $want")
    }
  }
}
