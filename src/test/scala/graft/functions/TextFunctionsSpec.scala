package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def one(text: String) = Seq(Tuple1(text)).toDF("text")

  test("tokenCount counts whitespace tokens") {
    assert(one("a b  c\td").select(TextFunctions.tokenCount(col("text")))
      .as[Long].head() == 4L)
  }

  test("punctRatio counts sentence punctuation over length") {
    assert(one("ab.!").select(TextFunctions.punctRatio(col("text")))
      .as[Double].head() == 0.5)
  }

  test("stopwordRatio: all-stopword text scores 1") {
    assert(one("the a of").select(TextFunctions.stopwordRatio(col("text"), "en"))
      .as[Double].head() == 1.0)
  }

  test("langId picks the language with most stopword hits") {
    assert(one("el perro de la casa que en un").select(TextFunctions.langId(col("text")))
      .as[String].head() == "es")
    assert(one("the cat of the house and it is").select(TextFunctions.langId(col("text")))
      .as[String].head() == "en")
  }

  test("qualityScore is within [0,1] and favors real text over junk") {
    val real = one("the quick brown fox jumps over the lazy dog and then runs far away to the hills where it rests for a while")
      .select(TextFunctions.qualityScore(col("text"))).as[Double].head()
    val junk = one("x").select(TextFunctions.qualityScore(col("text"))).as[Double].head()
    assert(real > junk && real <= 1.0 && junk >= 0.0)
  }

  test("fingerprint is order-insensitive over the token bag") {
    val fps = Seq("b a c", "c b a", "a b c d").toDF("text")
      .select(TextFunctions.fingerprint(col("text"))).as[String].collect()
    assert(fps(0) == fps(1) && fps(0) != fps(2))
  }

  test("rollingHash is order-sensitive") {
    val hs = Seq("a b c", "c b a", "a b c").toDF("text")
      .select(TextFunctions.rollingHash(col("text"))).as[Long].collect()
    assert(hs(0) != hs(1) && hs(0) == hs(2))
  }

  test("bpeTokenEstimate grows with word length and punctuation") {
    val est = Seq("hi yo", "internationalization, extraordinarily!").toDF("text")
      .select(TextFunctions.bpeTokenEstimate(col("text"))).as[Long].collect()
    assert(est(0) == 2L)
    assert(est(1) > 6L)
  }
}
