package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** One engine query: name, Spark implementation, optional DuckDB oracle SQL.
  * The driver hash-compares the Spark result against the oracle run on the
  * same parquet tables, sorting columns by name — so every computed column is
  * aliased identically on both sides.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  /** Exact, order-independent sum of a double column: sum in decimal (exact,
    * associative) then one deterministic IEEE cast back to double. Makes
    * Spark-vs-DuckDB aggregate comparison bit-exact regardless of partial-agg
    * ordering. Oracle twin: CAST(SUM(CAST(x AS DECIMAL(18,s))) AS DOUBLE).
    */
  def dsum(c: Column, scale: Int = 4): Column =
    sum(c.cast(DecimalType(18, scale))).cast("double")

  /** Oracle-side twin of [[dsum]]. */
  def dsumSql(expr: String, scale: Int = 4): String =
    s"CAST(SUM(CAST($expr AS DECIMAL(18,$scale))) AS DOUBLE)"

  /** Exact mean: decimal sum divided by count in double space — both engines
    * perform the identical two IEEE operations. */
  def davg(c: Column, scale: Int = 4): Column =
    (sum(c.cast(DecimalType(18, scale))).cast("double") / count(c)).cast("double")

  def davgSql(expr: String, scale: Int = 4): String =
    s"CAST(CAST(SUM(CAST($expr AS DECIMAL(18,$scale))) AS DOUBLE) / COUNT($expr) AS DOUBLE)"

  /** Exact mean over 1e-9-TRUNCATED values: floor(x*1e9) summed in long,
    * then two deterministic IEEE divisions. Unlike the decimal casts above,
    * floor has no rounding-mode ties (HALF_UP Spark vs HALF_EVEN DuckDB
    * disagree on exact half-ulp values, which binary floats can hit), so
    * this is safe for float-valued columns with no exact decimal form.
    */
  def tavg(c: Column): Column =
    (sum(floor(c * lit(1e9)).cast("long")).cast("double") / lit(1e9)) / count(c)

  /** Oracle-side twin of [[tavg]]. */
  def tavgSql(expr: String): String =
    s"(CAST(SUM(CAST(floor(($expr) * 1e9) AS BIGINT)) AS DOUBLE) / 1e9) / COUNT($expr)"

  /** Tie-FREE round to 9 decimals: floor(x·1e9 + 0.5)/1e9 — the same three
    * IEEE operations in both engines, so a value landing exactly on a .5
    * boundary rounds identically (up) on both sides. `round(x, 9)` is NOT
    * tie-free across engines: Spark rounds the shortest-decimal
    * representation HALF_UP while DuckDB rounds the binary value, and a
    * mean that lands on a half-way point (first observed on the locally
    * generated round-15 scale fixture: q124's mean_quality at
    * 0.5366666665) diverges in the 9th decimal. Use this for any NEW
    * rounded output; existing `round(_, 9)` sites are tie-latent but
    * hash-stable on the driver fixture.
    */
  def r9(c: Column): Column =
    floor(c * lit(1e9) + lit(0.5)).cast("double") / lit(1e9)

  /** Oracle-side twin of [[r9]]. */
  def r9Sql(expr: String): String =
    s"(CAST(floor(($expr) * 1e9 + 0.5) AS DOUBLE) / 1e9)"
}
