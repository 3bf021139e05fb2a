package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** One declared engine query: a Spark-native builder plus (optionally) the
  * equivalent ANSI SQL the DuckDB oracle runs on the same parquet tables.
  *
  * Oracle-parity rules (see FIXTURES.md §5):
  *   - every float aggregate goes through an exact DECIMAL intermediate,
  *     then is cast to double and rounded — identical in Spark and DuckDB;
  *   - column names/aliases must match the oracle SQL exactly (the driver
  *     sorts columns by name before hashing);
  *   - no dependence on row order (driver sorts rows) but ranking/limits
  *     must be made deterministic with explicit tiebreak columns.
  */
final case class QueryDef(
    name: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  def apply(name: String, oracle: String)(build: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, build, Some(oracle))
  def noOracle(name: String)(build: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, build, None)
}

/** Shared expression helpers for exact cross-engine arithmetic. */
object Exact {
  /** Exact fixed-point view of a double. Scale 8 is chosen safely beyond the
    * data's decimal precision (money columns are 2 dp, so products of three
    * have ≤6 dp): at 8 dp the true value is never near a rounding boundary,
    * so Spark's exact HALF_UP cast and DuckDB's FP-scaled ties-to-even cast
    * agree bit-for-bit. */
  def dec4(c: Column): Column = c.cast(DecimalType(22, 8))

  /** Exact decimal sum rendered as a 2-decimal double (deterministic). */
  def moneySum(c: Column): Column = round(sum(dec4(c)).cast("double"), 2)

  /** Exact decimal sum / count rendered as 6-decimal double. */
  def moneyAvg(c: Column): Column =
    round((sum(dec4(c)).cast("double") / count(lit(1))), 6)
}
