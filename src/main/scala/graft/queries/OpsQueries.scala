package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Operational diagnostics a data platform runs ABOUT its tables before
  * running queries over them: join-key skew reports (choose salting /
  * AQE skew handling before the shuffle burns) and column profiling
  * (the null/distinct screen that gates ingestion). Both reduce the
  * fact table to per-key or per-column counters — integer-exact, so the
  * DuckDB oracles are hash-tight at every scale. */
object OpsQueries {

  /** q135: join-key skew report over lineitem's three join keys — the
    * pre-flight a pipeline runs to decide between a plain shuffle join,
    * salting (q48), or AQE skew splitting: per key column, cardinality,
    * total rows, the hottest key's frequency, the exact p99 frequency,
    * and the max/mean skew ratio. One hash-keyed count per key column
    * (map-side combined), then a tiny percentile over the count
    * distribution; the three reports union into one frame. */
  private def q135(s: SparkSession, d: String): DataFrame = {
    def report(key: String): DataFrame =
      Tables.lineitem(s, d)
        .groupBy(col(key)).agg(count(lit(1)).as("c"))
        .agg(lit(key).as("key_col"),
          count(lit(1)).as("n_keys"),
          sum(col("c")).as("total_rows"),
          max(col("c")).as("max_freq"),
          round(expr("percentile(c, 0.99)"), 6).as("p99_freq"),
          round(max(col("c")).cast("double") /
            (sum(col("c")).cast("double") / count(lit(1))), 6)
            .as("skew_ratio"))
    Seq("l_orderkey", "l_partkey", "l_suppkey").map(report).reduce(_ union _)
  }

  private def q135Report(key: String): String =
    s"""SELECT '$key' AS key_col, count(*) AS n_keys,
       |  CAST(sum(c) AS BIGINT) AS total_rows,
       |  CAST(max(c) AS BIGINT) AS max_freq,
       |  round(quantile_cont(c, 0.99), 6) AS p99_freq,
       |  round(CAST(max(c) AS DOUBLE)
       |    / (CAST(sum(c) AS DOUBLE) / count(*)), 6) AS skew_ratio
       |FROM (SELECT count(*) AS c FROM lineitem GROUP BY $key)""".stripMargin

  private val q135Sql =
    Seq("l_orderkey", "l_partkey", "l_suppkey")
      .map(q135Report).mkString("\nUNION ALL\n")

  /** q136: column profile of the events table — the Deequ-style
    * completeness/cardinality screen: per column, row count, null
    * count, exact distinct count. Integer-only outputs on purpose
    * (min/max would need engine-identical value-to-string formatting;
    * counts need nothing). One pass per column, each a hash-keyed
    * distinct with map-side partials; at 100 TB the distinct counts are
    * the expensive half, and the approx variant (q43's HLL) is the
    * documented fallback. */
  private def q136(s: SparkSession, d: String): DataFrame = {
    val cols = Seq("event_id", "ts", "user_id", "event_type", "value",
      "props")
    cols.map { c =>
      Tables.events(s, d).agg(
        lit(c).as("col_name"),
        count(lit(1)).as("n_rows"),
        (count(lit(1)) - count(col(c))).as("n_nulls"),
        countDistinct(col(c)).as("n_distinct"))
    }.reduce(_ union _)
  }

  private val q136Sql =
    Seq("event_id", "ts", "user_id", "event_type", "value", "props")
      .map(c =>
        s"""SELECT '$c' AS col_name, count(*) AS n_rows,
           |  count(*) - count($c) AS n_nulls,
           |  count(DISTINCT $c) AS n_distinct
           |FROM events""".stripMargin)
      .mkString("\nUNION ALL\n")

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q135_skew_report", q135, Some(q135Sql)),
    QueryDef("q136_column_profile", q136, Some(q136Sql)))
}
