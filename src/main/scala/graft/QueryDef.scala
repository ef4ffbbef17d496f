package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** One verifiable operator: a Spark implementation plus (optionally) a
  * DuckDB-ANSI oracle over the same parquet tables. Queries without an
  * oracle get the driver's weaker rows-only check and are covered by
  * ScalaTest instead.
  */
final case class QueryDef(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  def sql(name: String)(run: (SparkSession, String) => DataFrame)(oracle: String): QueryDef =
    QueryDef(name, run, Some(oracle.stripMargin.trim))

  def noOracle(name: String)(run: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, run, None)
}

/** Determinism helpers for oracle-comparable floating-point aggregates.
  *
  * A plain `SUM(double)` is order-dependent, and Spark's partitioned
  * aggregation will not add in DuckDB's order. We instead compute each row's
  * value in double (bit-identical IEEE arithmetic on both engines), round it
  * into an exact DECIMAL(18,6), sum exactly (order-free), and cast the total
  * back to double. Ties in the double→decimal rounding cannot occur at scale
  * 6 (no binary double lands exactly on an odd multiple of 5e-7).
  */
object Det {
  private val D = DecimalType(18, 6)

  /** Order-insensitive, engine-exact sum of a double expression. */
  def dsum(c: Column): Column = sum(c.cast(D)).cast("double")

  /** DuckDB fragment equivalent to [[dsum]]. */
  def dsumSql(expr: String): String =
    s"CAST(SUM(CAST(($expr) AS DECIMAL(18,6))) AS DOUBLE)"

  /** Order-insensitive mean: exact sum divided by count as double. */
  def davg(c: Column): Column = dsum(c) / count(lit(1))

  def davgSql(expr: String): String = s"(${dsumSql(expr)} / COUNT(*))"
}
