package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full operator inventory (SURVEY §2 families + the
  * training-data-pipeline operators), each runnable at any scale-factor
  * directory; `oracleSql` carries the DuckDB-equivalent SQL for every
  * SQL-expressible entry (same column names — the driver's compare sorts
  * columns by name and hashes values).
  */
object SparkEntry {

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    graft.queries.Relational.q1PricingSummary(spark, "/root/testdata/sf0.001")

  /** Merge registry maps, failing loudly on duplicate keys: a silently
    * shadowed registration (the `++` right-side-wins trap) would let the
    * query map and the oracle map certify DIFFERENT definitions. */
  private def merged[V](maps: Seq[Map[String, V]]): Map[String, V] = {
    val dups = maps.flatMap(_.keys).groupBy(identity).collect {
      case (k, ks) if ks.size > 1 => k
    }
    require(dups.isEmpty,
      s"duplicate query registrations: ${dups.toSeq.sorted.mkString(", ")}")
    maps.reduce(_ ++ _)
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = merged(Seq(
    graft.queries.Relational.queries,
    graft.queries.Relational2.queries,
    graft.queries.Relational3.queries,
    graft.queries.Relational4.queries,
    graft.queries.Relational5.queries,
    graft.queries.Relational6.queries,
    graft.queries.Relational7.queries,
    graft.queries.Relational8.queries,
    graft.queries.Mdio.queries,
    graft.queries.Pipeline.queries,
    graft.queries.Pipeline2.queries,
    graft.queries.Pipeline3.queries,
    graft.queries.Media.queries,
    graft.queries.LanguageModel.queries,
    graft.queries.StreamingExec.queries))

  /** For each key in `queries`, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys → weaker rows-only check. */
  def oracleSql: Map[String, String] = merged(Seq(
    graft.queries.Relational.oracleSql,
    graft.queries.Relational2.oracleSql,
    graft.queries.Relational3.oracleSql,
    graft.queries.Relational4.oracleSql,
    graft.queries.Relational5.oracleSql,
    graft.queries.Relational6.oracleSql,
    graft.queries.Relational7.oracleSql,
    graft.queries.Relational8.oracleSql,
    graft.queries.Mdio.oracleSql,
    graft.queries.Pipeline.oracleSql,
    graft.queries.Pipeline2.oracleSql,
    graft.queries.Pipeline3.oracleSql,
    graft.queries.Media.oracleSql,
    graft.queries.LanguageModel.oracleSql,
    graft.queries.StreamingExec.oracleSql))
}
