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

  /** q142: Bloom-filter membership — the runtime-filter mechanic behind
    * bloom-join pruning (build a compact filter on the small side, test
    * the big side before shuffling it): a 4096-bit, k=4 filter over the
    * signup users, probed by EVERY user, with ground truth joined back
    * so the false-positive rate is measured, not assumed. Deliberately
    * deterministic: the 4 row hashes are disjoint 12-bit slices of the
    * 60-bit md5 (the q132 rule — no seeded RNG), and the bit array is
    * its relational form (the ≤4096-row set of set positions, broadcast
    * to the probe side exactly as a runtime filter would ship). A probe
    * is positive iff all 4 of its positions are set; positives that are
    * not members are the measured FP cost of the 4096-bit sizing. */
  private def q142(s: SparkSession, d: String): DataFrame = {
    // 60-bit md5 of the named column's string form (the shared engine
    // pair of this idiom lives in TextQueries.tokenHashes; here the
    // input is a numeric key, hence the extra cast-to-string).
    def h(name: String) = expr(
      s"cast(conv(substring(md5(cast(cast($name as string) as binary)), 1, 15), 16, 10) as bigint)")
    val users = Tables.events(s, d).select(col("user_id")).distinct()
      .withColumn("h", h("user_id"))
    // members: first-3-day signups — a strict subset of the user base at
    // every scale (all-user signups would leave no true negatives to
    // measure the FP rate against). 1704326400000000 = 2024-01-04 UTC
    // in epoch micros.
    val members = Tables.events(s, d)
      .filter(col("event_type") === "signup" &&
        Q.us < lit(1704326400000000L))
      .select(col("user_id")).distinct()
    val slices = (0 to 3).map(r =>
      shiftright(col("h"), 12 * r).bitwiseAND(lit(4095L)))
    val bits = users.join(members, "user_id")
      .select(explode(array(slices: _*)).as("bitpos")).distinct()
      .withColumn("present", lit(1))
    users
      .select(col("user_id"), explode(array(slices: _*)).as("bitpos"))
      .join(broadcast(bits), Seq("bitpos"), "left")
      .groupBy(col("user_id"))
      .agg((count(col("present")) === 4).as("bloom_positive"))
      .join(members.withColumn("member_flag", lit(true)),
        Seq("user_id"), "left")
      .select(col("user_id"),
        col("member_flag").isNotNull.as("is_member"),
        col("bloom_positive"),
        (col("bloom_positive") && col("member_flag").isNull)
          .as("false_positive"))
  }

  private val q142Sql =
    s"""WITH users AS (
      |  SELECT user_id,
      |    CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
      |      AS BIGINT) AS h
      |  FROM (SELECT DISTINCT user_id FROM events)),
      |members AS (
      |  SELECT DISTINCT user_id FROM events
      |  WHERE event_type = 'signup'
      |    AND ${Q.usSql} < 1704326400000000),
      |bits AS (
      |  SELECT DISTINCT (u.h >> (12 * r.r)) & 4095 AS bitpos
      |  FROM users u
      |  JOIN members m ON u.user_id = m.user_id,
      |  (SELECT unnest([0, 1, 2, 3]) AS r) r),
      |probes AS (
      |  SELECT user_id, count(b.bitpos) = 4 AS bloom_positive
      |  FROM (
      |    SELECT u.user_id, (u.h >> (12 * r.r)) & 4095 AS bitpos
      |    FROM users u, (SELECT unnest([0, 1, 2, 3]) AS r) r) pb
      |  LEFT JOIN bits b ON b.bitpos = pb.bitpos
      |  GROUP BY 1)
      |SELECT p.user_id,
      |  m.user_id IS NOT NULL AS is_member,
      |  p.bloom_positive,
      |  p.bloom_positive AND m.user_id IS NULL AS false_positive
      |FROM probes p LEFT JOIN members m ON p.user_id = m.user_id""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q135_skew_report", q135, Some(q135Sql)),
    QueryDef("q136_column_profile", q136, Some(q136Sql)),
    QueryDef("q142_bloom_membership", q142, Some(q142Sql)))
}
