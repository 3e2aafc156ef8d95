package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for heavy-hitter join keys.
  *
  * AQE's skew-join splitting handles most cases at runtime; salting is the
  * plan-level tool for when one key dominates so hard that even split
  * partitions hot-spot (the classic power-law user_id). The big side
  * scatters each row to one of `salts` sub-keys; the small side replicates
  * each row to ALL sub-keys — results are identical to the plain join, but
  * the hot key's rows spread across `salts` reducers.
  *
  * Cost model at 100 TB: small side grows ×salts (it must be the
  * broadcast-able / modest side), big side is unchanged, and the shuffle
  * key gains entropy exactly where it was degenerate.
  */
object Skew {

  /** Equi-join `big ⋈ small` on `key`, salted `salts` ways. Inner joins
    * only (outer semantics would need per-key salt accounting). */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salts: Int): DataFrame = {
    require(salts > 0, "salts must be positive")
    // deterministic scatter: hash the big row's key + a uniformizer column
    // set (the key alone would put the whole hot key in one salt again)
    val scatter = pmod(xxhash64(col(key), monotonically_increasing_id()), lit(salts))
    val b = big.withColumn("__salt", scatter)
    val s = small.withColumn("__salt", explode(array((0 until salts).map(lit(_)): _*)))
    b.join(s, Seq(key, "__salt")).drop("__salt")
  }

  /** Top-N heavy-hitter keys of a column with their frequencies — the
    * diagnostic used to decide between AQE splitting and salting. */
  def heavyHitters(df: DataFrame, key: Column, n: Int = 20): DataFrame =
    df.groupBy(key.as("key")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("key")).limit(n)
}
