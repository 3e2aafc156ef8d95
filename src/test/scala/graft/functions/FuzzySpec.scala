package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The fuzzy join's losslessness claim, tested beyond the corpus: on
  * random small-alphabet strings (dense near-duplicate space, repetitive
  * degenerate strings included) the prefix-filtered plan must return
  * EXACTLY the brute-force pair set — if the prefix bound or the
  * degenerate-bucket routing were wrong, random inputs find it. */
class FuzzySpec extends SparkSpec {
  import spark.implicits._

  private def bruteForce(names: Seq[String], k: Int): Set[(String, String)] = {
    def lev(a: String, b: String): Int = {
      val dp = Array.tabulate(a.length + 1)(i => Array.tabulate(b.length + 1) {
        j => if (i == 0) j else if (j == 0) i else 0
      })
      for (i <- 1 to a.length; j <- 1 to b.length)
        dp(i)(j) = math.min(math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1),
          dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      dp(a.length)(b.length)
    }
    (for {
      a <- names.distinct; b <- names.distinct
      if a < b && lev(a, b) <= k
    } yield (a, b)).toSet
  }

  test("random small-alphabet corpus: filtered pairs == brute-force pairs") {
    val rnd = new scala.util.Random(7)
    // alphabet of 3 chars + lengths 2..9 → dense edit-distance space;
    // includes repetitive strings like "aaaa" (the degenerate route)
    val names = Seq.fill(120)(
      (0 until (2 + rnd.nextInt(8))).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString)
    val df = names.toDF("s")
    val got = Fuzzy.editDistancePairs(df, "s", k = 2)
      .select(col("name_a"), col("name_b")).as[(String, String)].collect().toSet
    assert(got === bruteForce(names, 2))
  }

  test("longer mixed strings with true typos: still exactly brute force") {
    val rnd = new scala.util.Random(11)
    val base = Seq("gradient checkpoint", "shuffle partition", "broadcast join",
      "watermark state", "columnar batch")
    val names = base ++ base.flatMap { s =>
      Seq.fill(4) { // 1-2 random edits
        val sb = new StringBuilder(s)
        (0 until 1 + rnd.nextInt(2)).foreach { _ =>
          val i = rnd.nextInt(sb.length)
          rnd.nextInt(3) match {
            case 0 => sb.setCharAt(i, ('a' + rnd.nextInt(26)).toChar)
            case 1 => sb.deleteCharAt(i)
            case _ => sb.insert(i, ('a' + rnd.nextInt(26)).toChar)
          }
        }
        sb.toString
      }
    } ++ Seq("zzzz", "zzz", "qq") // short/degenerate stragglers
    val got = Fuzzy.editDistancePairs(names.toDF("s"), "s", k = 2)
      .select(col("name_a"), col("name_b")).as[(String, String)].collect().toSet
    assert(got === bruteForce(names, 2))
  }

  test("multiplicities: cnt columns recover row-level pair counts") {
    val df = Seq("abc", "abc", "abc", "abd", "xyz").toDF("s")
    val rows = Fuzzy.editDistancePairs(df, "s", k = 1)
      .select(col("name_a"), col("name_b"), col("dist"), col("cnt_a"), col("cnt_b"))
      .as[(String, String, Long, Long, Long)].collect()
    assert(rows.toSet === Set(("abc", "abd", 1L, 3L, 1L)))
  }
}
