package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared helpers for the oracle-checked query surface.
  *
  * Numeric determinism: Spark's partial aggregation sums doubles in
  * partition order, which is nondeterministic; DuckDB sums in its own
  * order. Both engines cast a given double to DECIMAL identically (no
  * decimal tie falls exactly on a binary double), and decimal sums are
  * exact, so `SUM(CAST(x AS DECIMAL))::DOUBLE` is bit-identical across
  * engines regardless of execution order. Every float aggregate below
  * uses that pattern; per-row arithmetic restricted to IEEE-exact ops
  * (+,-,*,/,sqrt,abs,floor) is likewise bit-identical.
  */
package object queries {
  type Q = (SparkSession, String) => DataFrame

  /** Order-independent, cross-engine-exact sum of a double expression. */
  def dsum(c: Column): Column = sum(c.cast("decimal(27,6)")).cast("double")

  /** Exact mean: decimal sum / count, division done in double (exact). */
  def davg(c: Column): Column =
    sum(c.cast("decimal(27,6)")).cast("double") / count(c).cast("double")

  /** Exact sum of squares (wider scale: squares of ~5e5 values). */
  def dsumsq(c: Column): Column =
    sum((c * c).cast("decimal(30,6)")).cast("double")

  /** DuckDB-side equivalents (kept adjacent so they stay in sync). */
  def sqlDsum(e: String): String  = s"CAST(SUM(CAST(($e) AS DECIMAL(27,6))) AS DOUBLE)"
  def sqlDavg(e: String): String  = s"CAST(SUM(CAST(($e) AS DECIMAL(27,6))) AS DOUBLE) / CAST(COUNT($e) AS DOUBLE)"
  def sqlDsumsq(e: String): String = s"CAST(SUM(CAST((($e)*($e)) AS DECIMAL(30,6))) AS DOUBLE)"

  def lineitem(s: SparkSession, d: String): DataFrame   = Tables.lineitem(s, d)
  def orders(s: SparkSession, d: String): DataFrame     = Tables.orders(s, d)
  def customer(s: SparkSession, d: String): DataFrame   = Tables.customer(s, d)
  def supplier(s: SparkSession, d: String): DataFrame   = Tables.supplier(s, d)
  def nation(s: SparkSession, d: String): DataFrame     = Tables.nation(s, d)
  def region(s: SparkSession, d: String): DataFrame     = Tables.region(s, d)
  def part(s: SparkSession, d: String): DataFrame       = Tables.part(s, d)
  def events(s: SparkSession, d: String): DataFrame     = Tables.events(s, d)
  def documents(s: SparkSession, d: String): DataFrame  = Tables.documents(s, d)
  def embeddings(s: SparkSession, d: String): DataFrame = Tables.embeddings(s, d)
}
