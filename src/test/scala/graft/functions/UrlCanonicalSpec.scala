package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Edge-case contract of [[Curation.canonicalizeUrl]] — each rule pinned
  * on the inputs that exercise it alone, plus the inputs that must NOT
  * change (non-default ports, non-utm params, percent-encoding). */
class UrlCanonicalSpec extends SparkSpec {
  import spark.implicits._

  private def canon(url: String): String =
    Seq(url).toDF("u").select(Curation.canonicalizeUrl(col("u")).as("c"))
      .as[String].head()

  test("scheme and host lowercase; path case preserved") {
    assert(canon("HTTP://WWW.Ex.COM/Path/File") === "http://www.ex.com/Path/File")
  }

  test("default ports strip only for their scheme") {
    assert(canon("http://h.com:80/a") === "http://h.com/a")
    assert(canon("https://h.com:443/a") === "https://h.com/a")
    assert(canon("http://h.com:443/a") === "http://h.com:443/a") // not http's default
    assert(canon("http://h.com:8080/a") === "http://h.com:8080/a")
  }

  test("fragment drops; bare host becomes /; trailing slashes strip") {
    assert(canon("http://h.com#frag") === "http://h.com/")
    assert(canon("http://h.com/") === "http://h.com/")
    assert(canon("http://h.com/a/b///") === "http://h.com/a/b")
  }

  test("query params sort, utm_* params drop, empty query vanishes") {
    assert(canon("http://h.com/a?z=1&a=2") === "http://h.com/a?a=2&z=1")
    assert(canon("http://h.com/a?utm_source=x&b=1&utm_campaign=y") ===
      "http://h.com/a?b=1")
    assert(canon("http://h.com/a?utm_source=x") === "http://h.com/a")
    // utm must be a prefix, not a substring: 'xutm_a' survives
    assert(canon("http://h.com/a?xutm_a=1") === "http://h.com/a?xutm_a=1")
  }

  test("the messy composite collapses to the clean twin") {
    assert(canon("HTTP://Host.COM:80/a/?utm_source=x&b=1#frag") ===
      canon("http://host.com/a?b=1"))
  }

  test("untouched: param values, percent-encoding, userinfo-free hosts") {
    assert(canon("http://h.com/a?b=UPPER%20case") === "http://h.com/a?b=UPPER%20case")
  }
}
