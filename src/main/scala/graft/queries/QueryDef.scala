package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One declared operator: a Spark implementation plus (when the semantics
  * are batch-SQL-expressible) an equivalent DuckDB oracle SQL.
  *
  * Oracle conventions (see tools/check_parity.py, TESTDATA.md):
  *   - the driver compares column-name-sorted, row-sorted values, so every
  *     computed column is aliased identically on both sides (lowercase);
  *   - `events.ts` physical type varies by testdata generation
  *     (TIMESTAMP(NANOS) read as LONG nanos, or TIMESTAMP(MICROS) NTZ);
  *     [[graft.Tables.events]] normalizes to LONG epoch-nanos at load,
  *     so the engine always sees nanos — both sides then normalize to
  *     epoch MICROS (`ts div 1000` / `epoch_us(ts)`);
  *   - money-like double sums go through DECIMAL so the accumulation is
  *     exact and order-independent (a plain double sum over a shuffled
  *     100 TB dataset is nondeterministic), then cast back to double;
  *   - MEASUREMENT ratios (recall, share, rate — any column whose only
  *     job is to be compared across rounds) are INTEGER-EXACT: emitted
  *     as basis points / fixed-point thousandths via BIGINT division
  *     (`(10000 * num) div den` / DuckDB `//`), never `round(<double
  *     quotient>)`. Engines disagree on double rounding (Spark rounds
  *     the shortest decimal repr HALF_UP via BigDecimal; DuckDB rounds
  *     the true binary value, with semantics that changed across
  *     releases), and DuckDB widens sum(BIGINT) to HUGEINT — both are
  *     hash-divergence channels under a driver-side DuckDB version
  *     bump (the r11 q170 failure). Oracle-side aggregate outputs are
  *     always CAST(... AS BIGINT);
  *   - any remaining double output (reference-semantics values, e.g.
  *     money or signal amplitudes) is `round(..., 6)` on both sides.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    sql: Option[String])

object Q {
  /** events.ts nanos → epoch micros, exactly (integral division). */
  val us: Column = expr("ts div 1000")
  val usSql = "epoch_us(ts)"

  /** Exact, order-independent sum of a `scale`-dp money-like double
    * column: round to integer units (cents at scale 2) and sum as LONG.
    * Primitive codegen arithmetic — measured ~2× faster than DECIMAL
    * accumulation on the TPC-H Q1 shape — with the same determinism:
    * both engines round the SAME IEEE double to the same integer, and
    * integer addition is associative, so the result is independent of
    * shuffle order on either engine. (Ties round identically because
    * the money columns are positive: Spark HALF_UP == DuckDB
    * away-from-zero.) Overflow only past ~9e16 units. */
  def dsum(c: Column, scale: Int = 2): Column = {
    val f = math.pow(10, scale)
    sum(round(c * f).cast("long")).cast("double") / f
  }
  def dsumSql(e: String, scale: Int = 2): String = {
    val f = math.pow(10, scale)
    s"(CAST(sum(CAST(round(($e) * $f) AS BIGINT)) AS DOUBLE) / $f)"
  }

  /** Exact average via the integer-unit sum / count (both engines
    * compute the same double division on identical inputs). */
  def davg(c: Column, scale: Int = 2): Column =
    dsum(c, scale) / count(lit(1))
  def davgSql(e: String, scale: Int = 2): String =
    s"(${dsumSql(e, scale)} / count(*))"
}
