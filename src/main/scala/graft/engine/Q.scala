package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared Tier-1 query: the SURVEY §2.1 contract unit.
  *
  * @param name   key in `SparkEntry.queries` (e.g. "d02_agg_group_q1")
  * @param sql    equivalent DuckDB SQL over bare table names (the driver
  *               resolves `lineitem` etc. against the same parquet dir)
  * @param fn     the Spark implementation; must produce the SAME column names
  *               and the SAME total row order as `sql` (SURVEY §2 determinism
  *               rules — the driver hash-compares values after sorting columns
  *               by name).
  */
final case class Q(name: String, sql: String, fn: (SparkSession, String) => DataFrame)

/** Shared determinism helpers (SURVEY §2 rules 1–4). */
object Determinism {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions._

  /** Exact, order-independent sum of a double expression: route through
    * DECIMAL(18,6) so partial-aggregate merge order cannot perturb low bits
    * (double summation is order-dependent; decimal summation is exact in both
    * Spark and DuckDB). Result cast back to DOUBLE — identical bits on both
    * engines because the exact decimal→binary conversion is correctly rounded.
    */
  def dsum(e: Column): Column = sum(e.cast("decimal(18,6)")).cast("double")

  /** Matching DuckDB SQL fragment for [[dsum]]. */
  def dsumSql(e: String): String =
    s"CAST(SUM(CAST(($e) AS DECIMAL(18,6))) AS DOUBLE)"

  /** Order-independent average: exact decimal sum divided by count, rounded.
    * The division operands are bit-identical across engines, so the double
    * quotient and its rounding are too. */
  def davg(e: Column): Column =
    round(sum(e.cast("decimal(18,6)")).cast("double") / count(e), 4)

  def davgSql(e: String): String =
    s"ROUND(CAST(SUM(CAST(($e) AS DECIMAL(18,6))) AS DOUBLE) / COUNT($e), 4)"
}
