package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One declared operator: a Spark implementation plus (when the semantics
  * are batch-SQL-expressible) an equivalent DuckDB oracle SQL.
  *
  * Oracle conventions (see tools/check_parity.py, TESTDATA.md):
  *   - the driver compares column-name-sorted, row-sorted values, so every
  *     computed column is aliased identically on both sides (lowercase);
  *   - `events.ts` is parquet TIMESTAMP(NANOS): Spark reads a LONG of
  *     nanos (spark.sql.legacy.parquet.nanosAsLong), DuckDB a micros
  *     TIMESTAMP — both sides normalize to epoch MICROS (`ts div 1000` /
  *     `epoch_us(ts)`);
  *   - money-like double sums go through DECIMAL so the accumulation is
  *     exact and order-independent (a plain double sum over a shuffled
  *     100 TB dataset is nondeterministic), then cast back to double;
  *   - any remaining double output is `round(..., 6)` on both sides.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    sql: Option[String])

object Q {
  /** events.ts nanos → epoch micros, exactly (integral division). */
  val us: Column = expr("ts div 1000")
  val usSql = "epoch_us(ts)"

  /** Exact, order-independent sum of a 2-dp money-like double column:
    * accumulate as decimal, surface as double. */
  def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(s"decimal(18,$scale)")).cast("double")
  def dsumSql(e: String, scale: Int = 2): String =
    s"CAST(sum(CAST($e AS DECIMAL(18,$scale))) AS DOUBLE)"

  /** Exact average via decimal sum / count (both engines compute the same
    * double division on identical inputs). */
  def davg(c: Column, scale: Int = 2): Column =
    (sum(c.cast(s"decimal(18,$scale)")).cast("double") / count(lit(1)))
  def davgSql(e: String, scale: Int = 2): String =
    s"(CAST(sum(CAST($e AS DECIMAL(18,$scale))) AS DOUBLE) / count(*))"
}
