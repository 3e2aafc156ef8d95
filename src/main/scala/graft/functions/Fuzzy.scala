package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fuzzy (edit-distance) string join — the entity-resolution primitive
  * (near-identical names/titles/URLs differing by typos) that complements
  * the set-similarity dedup family in [[Dedup]].
  *
  * Scale shape, in order of importance at 100 TB:
  *  1. FOLD TO DISTINCT VALUES FIRST. Real string columns are heavily
  *     duplicated; the expensive pairwise work scales with distinct
  *     values, and row-level pair counts recover exactly from the
  *     per-value multiplicities.
  *  2. PREFIX-FILTERED q-GRAM CANDIDATES (the AllPairs discipline already
  *     used by [[Dedup.ngramJaccard]]): an edit destroys at most q
  *     distinct q-grams, so ed(a,b) ≤ k forces
  *     |grams(a) ∩ grams(b)| ≥ max(|Ga|,|Gb|) − k·q, and by the standard
  *     prefix-filter theorem any such pair shares a gram among each
  *     side's (k·q+1) globally RAREST grams. The posting join therefore
  *     runs over ≤ k·q+1 postings per value, dominated by rare grams —
  *     never over the full gram inventory.
  *  3. Values with ≤ k·q distinct grams (degenerate ultra-short or
  *     single-letter-repeat strings, where the overlap bound is vacuous)
  *     route to a separate bucket joined pairwise via a LENGTH-BAND equi
  *     key — bounded because such strings are a tiny, low-cardinality
  *     residue of any real corpus.
  *  4. Exact Levenshtein verification runs only on surviving candidates
  *     (codegen'd built-in; identical DP in DuckDB, so results sit on
  *     the hash-exact oracle).
  */
object Fuzzy {

  /** All unordered pairs of DISTINCT values of `column` within Levenshtein
    * distance `k` (k ≥ 1), with per-value row multiplicities. Output
    * columns: name_a < name_b, dist ∈ [1, k], cnt_a, cnt_b. Lossless by
    * the prefix-filter + degenerate-bucket argument in the object doc —
    * the result equals the naive all-pairs join's. */
  def editDistancePairs(df: DataFrame, column: String, k: Int = 2): DataFrame = {
    val q = 2
    val prefixLen = k * q + 1
    val names = df.groupBy(col(column).cast("string").as("name"))
      .agg(count(lit(1)).as("cnt"))
    val grams = names.select(col("name"), explode(array_distinct(
      expr("transform(sequence(0, greatest(length(name) - 2, -1)), i -> substring(name, i + 1, 2))")))
      .as("gram"))
    val dfreq = grams.groupBy(col("gram")).agg(count(lit(1)).as("df"))
    val ng = grams.groupBy(col("name")).agg(count(lit(1)).as("ng"))
    val prefix = grams.join(dfreq, Seq("gram"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("name")).orderBy(col("df"), col("gram"))))
      .filter(col("rk") <= prefixLen)
      .select(col("name"), col("gram"))
    val candGram = prefix.as("a").join(prefix.as("b"),
        col("a.gram") === col("b.gram") && col("a.name") < col("b.name"))
      .select(col("a.name").as("name_a"), col("b.name").as("name_b"))
    // degenerate route: BOTH sides ≤ k·q distinct grams — pair within a
    // ±k length band as an equi join (no nested loop reaches the plan)
    val small = ng.filter(col("ng") <= k * q)
      .select(col("name"), length(col("name")).cast("long").as("len"))
    val candSmall = small.as("a")
      .select(col("a.name").as("name_a"),
        explode(sequence(col("a.len") - k, col("a.len") + k)).as("len_b"))
      .join(small.as("b"), col("len_b") === col("b.len") &&
        col("name_a") < col("b.name"))
      .select(col("name_a"), col("b.name").as("name_b"))
    candGram.union(candSmall).distinct()
      .filter(abs(length(col("name_a")) - length(col("name_b"))) <= k)
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
      .filter(col("dist") <= k)
      .join(names.select(col("name").as("name_a"), col("cnt").as("cnt_a")), Seq("name_a"))
      .join(names.select(col("name").as("name_b"), col("cnt").as("cnt_b")), Seq("name_b"))
      .select(col("name_a"), col("name_b"), col("dist").cast("long").as("dist"),
        col("cnt_a"), col("cnt_b"))
  }
}
