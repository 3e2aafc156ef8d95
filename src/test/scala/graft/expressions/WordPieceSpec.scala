package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String

/** The wordpiece kernel's greedy longest-match contract, pinned at the
  * kernel level (the query-level walk is certified by the DuckDB oracle
  * — text_wordpiece re-derives it with a recursive CTE). */
class WordPieceSpec extends SparkSpec {

  private def arr(xs: String*): GenericArrayData =
    new GenericArrayData(xs.map(s => UTF8String.fromString(s): AnyRef).toArray)

  private def run(words: Seq[String], vocab: Seq[String]): Seq[String] = {
    val out = TextKernels.wordpiece(arr(words: _*), arr(vocab: _*))
    (0 until out.numElements()).map(i => out.getUTF8String(i).toString)
  }

  test("longest match wins over shorter prefixes") {
    // "tab" and "ta" both prefix "table": the longer one must be taken
    assert(run(Seq("table"), Seq("ta", "tab", "le")) == Seq("tab", "le"))
  }

  test("no match falls back to a single character and advances") {
    assert(run(Seq("xyz"), Seq("ab")) == Seq("x", "y", "z"))
  }

  test("match at word start, middle, and end") {
    assert(run(Seq("orderkey"), Seq("or", "der", "ke", "y")) ==
      Seq("or", "der", "ke", "y"))
  }

  test("tokenization is per word — matches never span word boundaries") {
    // vocab "ab" must not fuse the 'a' ending word 1 with 'b' starting word 2
    assert(run(Seq("xa", "bx"), Seq("ab")) == Seq("x", "a", "b", "x"))
  }

  test("empty word and empty array produce no tokens") {
    assert(run(Seq(""), Seq("a")) == Seq.empty)
    assert(run(Seq.empty, Seq("a")) == Seq.empty)
  }

  test("vocab table cache does not leak across different vocab literals") {
    // same thread, two different vocabs back to back: results must follow
    // the vocab passed, not the cached table from the previous call
    assert(run(Seq("table"), Seq("tab", "le")) == Seq("tab", "le"))
    assert(run(Seq("table"), Seq("ta", "ble")) == Seq("ta", "ble"))
    assert(run(Seq("table"), Seq("tab", "le")) == Seq("tab", "le"))
  }

  test("duplicate vocab entries and empty strings in the vocab are inert") {
    assert(run(Seq("aa"), Seq("a", "a", "")) == Seq("a", "a"))
  }

  test("concatenation of per-word pieces reconstructs every word") {
    val vocab = graft.queries.Relational6.wpVocab
    val words = Seq("customer", "window", "spark", "aggregate", "zzz", "a")
    val toks = run(words, vocab)
    assert(toks.mkString == words.mkString)
  }
}
