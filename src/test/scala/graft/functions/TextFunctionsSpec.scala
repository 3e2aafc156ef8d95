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

  test("piiCounts finds emails, IPv4s, and 2-3-3-4 phones; boundaries respected") {
    def counts(t: String): (Long, Long, Long) =
      one(t).select(TextFunctions.piiCounts(col("text")).as("p"))
        .select("p.n_emails", "p.n_ipv4", "p.n_phones")
        .as[(Long, Long, Long)].head()
    assert(counts("mail a.b@x.io and c_d%e@sub.dom.org here") == ((2L, 0L, 0L)))
    assert(counts("hosts 10.0.0.1 and 192.168.255.3, dots 1.2.3 no") == ((0L, 2L, 0L)))
    assert(counts("call 25-989-741-2988 or 10-100-100-1000") == ((0L, 0L, 2L)))
    // a five-part quad consumes one IPv4 match, not two; digits glued to
    // the pattern break \b
    assert(counts("1.2.3.4.5")._2 == 1L)
    assert(counts("x25-989-741-29881")._3 == 0L)
    assert(counts("plain text, no pii at all") == ((0L, 0L, 0L)))
  }

  test("piiRedact replaces all matches with typed placeholders, email first") {
    def red(t: String): String =
      one(t).select(TextFunctions.piiRedact(col("text"))).as[String].head()
    assert(red("a.b@x.io then 10.0.0.1 then 25-989-741-2988")
      == "[EMAIL] then [IP] then [PHONE]")
    assert(red("two a@x.io b@y.net mails") == "two [EMAIL] [EMAIL] mails")
    // the email's digits-and-dots local part must never leak into the IP
    // pass: redacted as ONE email, zero IPs
    assert(red("u.1.2.3.4@x.io") == "[EMAIL]")
    assert(red("nothing here") == "nothing here")
  }

  test("bpeTokenEstimate grows with word length and punctuation") {
    val est = Seq("hi yo", "internationalization, extraordinarily!").toDF("text")
      .select(TextFunctions.bpeTokenEstimate(col("text"))).as[Long].collect()
    assert(est(0) == 2L)
    assert(est(1) > 6L)
  }
}
