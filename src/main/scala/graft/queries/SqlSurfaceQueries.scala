package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.CoreFunctions._

/** Remaining relational engine surface (SURVEY §2.5/§2.9 extensions):
  * grouping sets, pivot, ntile ranking, calendar bucketing, and the
  * string-function kit — all declared with oracles so a reference user
  * migrating real queries has the full SQL surface verified. */
object SqlSurfaceQueries {

  /** q54: GROUPING SETS with an explicit group-type tag (portable
    * across engines, unlike grouping_id encodings). */
  private def q54(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .withColumn("priority", priorityOf(col("event_type")))
    val byType = ev.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(lit("by_type").as("grp"), col("event_type"),
        lit(null).cast("int").as("priority"), col("n"))
    val byPrio = ev.groupBy(col("priority"))
      .agg(count(lit(1)).as("n"))
      .select(lit("by_priority").as("grp"),
        lit(null).cast("string").as("event_type"), col("priority"), col("n"))
    val total = ev.agg(count(lit(1)).as("n"))
      .select(lit("total").as("grp"), lit(null).cast("string").as("event_type"),
        lit(null).cast("int").as("priority"), col("n"))
    byType.unionAll(byPrio).unionAll(total)
  }

  private val q54Sql =
    s"""SELECT 'by_type' AS grp, event_type, CAST(NULL AS INT) AS priority, count(*) AS n
       |FROM events GROUP BY event_type
       |UNION ALL
       |SELECT 'by_priority', CAST(NULL AS VARCHAR), $priorityOfSql, count(*)
       |FROM events GROUP BY 3
       |UNION ALL
       |SELECT 'total', CAST(NULL AS VARCHAR), CAST(NULL AS INT), count(*) FROM events""".stripMargin

  /** q55: pivot — event-type counts as columns per user bucket. */
  private def q55(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .withColumn("user_bucket", (col("user_id") % 10).cast("long"))
      .groupBy(col("user_bucket"))
      .pivot("event_type",
        Seq("click", "view", "signup", "purchase", "error"))
      .agg(count(lit(1)))
      .na.fill(0L)

  private val q55Sql =
    """SELECT user_id % 10 AS user_bucket,
      |  CAST(sum(CAST(event_type = 'click' AS BIGINT)) AS BIGINT) AS click,
      |  CAST(sum(CAST(event_type = 'view' AS BIGINT)) AS BIGINT) AS view,
      |  CAST(sum(CAST(event_type = 'signup' AS BIGINT)) AS BIGINT) AS signup,
      |  CAST(sum(CAST(event_type = 'purchase' AS BIGINT)) AS BIGINT) AS purchase,
      |  CAST(sum(CAST(event_type = 'error' AS BIGINT)) AS BIGINT) AS error
      |FROM events GROUP BY 1""".stripMargin

  /** q56: ntile quartiles by value within each event type (total order
    * via the event_id tiebreak keeps tile edges deterministic). */
  private def q56(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("value").asc, col("event_id").asc)
    Tables.events(s, d)
      .select(col("event_type"), col("event_id"), col("value"))
      .withColumn("quartile", ntile(4).over(w))
      .groupBy(col("event_type"), col("quartile"))
      .agg(count(lit(1)).as("n"), round(Q.davg(col("value")), 6).as("avg_v"))
  }

  private val q56Sql =
    s"""SELECT event_type, quartile, count(*) AS n,
       |  round(${Q.davgSql("value")}, 6) AS avg_v
       |FROM (
       |  SELECT event_type, value,
       |    ntile(4) OVER (PARTITION BY event_type
       |      ORDER BY value, event_id) AS quartile
       |  FROM events)
       |GROUP BY event_type, quartile""".stripMargin

  /** q57: calendar bucketing — weekly order revenue (date_trunc week
    * starts Monday on both engines). */
  private def q57(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(date_format(date_trunc("week", col("o_orderdate")),
        "yyyy-MM-dd").as("week_start"))
      .agg(count(lit(1)).as("n_orders"),
        Q.dsum(col("o_totalprice")).as("revenue"))

  private val q57Sql =
    s"""SELECT strftime(date_trunc('week', o_orderdate), '%Y-%m-%d') AS week_start,
       |  count(*) AS n_orders, ${Q.dsumSql("o_totalprice")} AS revenue
       |FROM orders GROUP BY 1""".stripMargin

  /** q58: string-function kit over part names — case mapping, padding,
    * substring, edit distance (F28/F30 string family + engine
    * extensions). */
  private def q58(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d).select(
      col("p_partkey"),
      upper(col("p_brand")).as("brand_upper"),
      lower(col("p_type")).as("type_lower"),
      lpad(col("p_partkey").cast("string"), 10, "0").as("key_padded"),
      substring(col("p_name"), 1, 12).as("name_prefix"),
      length(col("p_name")).as("name_len"),
      levenshtein(col("p_brand"), col("p_type")).as("brand_type_dist"))

  private val q58Sql =
    """SELECT p_partkey, upper(p_brand) AS brand_upper,
      |  lower(p_type) AS type_lower,
      |  lpad(CAST(p_partkey AS VARCHAR), 10, '0') AS key_padded,
      |  substr(p_name, 1, 12) AS name_prefix,
      |  length(p_name) AS name_len,
      |  levenshtein(p_brand, p_type) AS brand_type_dist
      |FROM part""".stripMargin

  /** q59: left-semi join — customers with at least one urgent order,
    * counted per market segment (EXISTS pushdown shape; the semi join
    * shuffles only keys, never multiplies rows). */
  private def q59(s: SparkSession, d: String): DataFrame = {
    val urgent = Tables.orders(s, d)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey"))
    Tables.customer(s, d)
      .join(urgent, col("c_custkey") === col("o_custkey"), "left_semi")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_with_urgent"))
  }

  private val q59Sql =
    """SELECT c_mktsegment, count(*) AS n_with_urgent
      |FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders
      |              WHERE o_custkey = c_custkey
      |                AND o_orderpriority = '1-URGENT')
      |GROUP BY c_mktsegment""".stripMargin

  /** q60: left-anti join — customers with no URGENT order, per nation
    * (NOT EXISTS shape; anti against all orders is empty on this data,
    * so the predicate keeps the declaration non-trivial). */
  private def q60(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(Tables.orders(s, d)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_no_urgent"))

  private val q60Sql =
    """SELECT c_nationkey, count(*) AS n_no_urgent
      |FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey
      |                    AND o_orderpriority = '1-URGENT')
      |GROUP BY c_nationkey""".stripMargin

  /** q61: scalar subquery — parts priced above the global average
    * retail price, per brand (average via exact decimal sum on both
    * engines so the comparison threshold is bit-identical). The scalar
    * is a broadcast 1-row cross join (the q13/q108 pattern, proved
    * maxRows=1 by the plan guard) — never a driver-side action. */
  private def q61(s: SparkSession, d: String): DataFrame = {
    val avgPrice = Tables.part(s, d)
      .agg((sum(col("p_retailprice").cast("decimal(18,2)")).cast("double") /
        count(lit(1))).as("avg_price"))
    Tables.part(s, d)
      .crossJoin(broadcast(avgPrice))
      .filter(col("p_retailprice") > col("avg_price"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_above_avg"),
        Q.dsum(col("p_retailprice")).as("sum_price"))
  }

  private val q61Sql =
    s"""SELECT p_brand, count(*) AS n_above_avg,
       |  ${Q.dsumSql("p_retailprice")} AS sum_price
       |FROM part
       |WHERE p_retailprice > (
       |  SELECT CAST(sum(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) / count(*)
       |  FROM part)
       |GROUP BY p_brand""".stripMargin

  /** q63: statistical aggregate surface — Pearson correlation, population
    * covariance and stddev of value vs day (A8's regr_slope family; the
    * exact-decimal OLS variant is q18). Both engines accumulate in
    * double; outputs are normalized/rounded so summation-order noise
    * (~1e-15) cannot flip the 6-dp rounding. */
  private def q63(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(col("event_type"), expr("ts div 86400000000000").as("day"),
        col("value"))
      .groupBy(col("event_type"))
      .agg(
        round(corr(col("value"), col("day").cast("double")), 6).as("corr_vd"),
        round(covar_pop(col("value"), col("day").cast("double")), 4)
          .as("covar_vd"),
        round(stddev_pop(col("value")), 6).as("sd_value"))

  private val q63Sql =
    """SELECT event_type,
      |  round(corr(value, CAST(day AS DOUBLE)), 6) AS corr_vd,
      |  round(covar_pop(value, CAST(day AS DOUBLE)), 4) AS covar_vd,
      |  round(stddev_pop(value), 6) AS sd_value
      |FROM (SELECT event_type, epoch_ns(ts) // 86400000000000 AS day, value
      |      FROM events)
      |GROUP BY event_type""".stripMargin

  /** q64: rank-distribution windows — percent_rank and cume_dist over a
    * total order (value, event_id), summarized per decile so the output
    * stays compact. */
  private def q64(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("value").asc, col("event_id").asc)
    Tables.events(s, d)
      .select(col("event_type"), col("event_id"), col("value"))
      .withColumn("pr", percent_rank().over(w))
      .withColumn("cd", cume_dist().over(w))
      .withColumn("decile", floor(col("pr") * 10).cast("int"))
      .groupBy(col("event_type"), col("decile"))
      .agg(count(lit(1)).as("n"), round(max(col("cd")), 6).as("max_cume"))
  }

  private val q64Sql =
    """SELECT event_type, decile, count(*) AS n,
      |  round(max(cd), 6) AS max_cume
      |FROM (
      |  SELECT event_type,
      |    CAST(floor(percent_rank() OVER w * 10) AS INT) AS decile,
      |    cume_dist() OVER w AS cd
      |  FROM events
      |  WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id))
      |GROUP BY event_type, decile""".stripMargin

  /** q65: higher-order array function surface over embeddings —
    * filter/exists/transform/aggregate compose without UDFs. */
  private def q65(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d).select(
      col("vec_id"),
      expr("size(filter(embedding, x -> x > CAST(0.0 AS FLOAT)))")
        .as("n_positive"),
      expr("exists(embedding, x -> abs(CAST(x AS DOUBLE)) > 0.45)")
        .cast("int").as("has_large"),
      round(expr(
        "aggregate(zip_with(embedding, sequence(0, size(embedding) - 1), " +
          "(x, i) -> CAST(x AS DOUBLE) * CASE WHEN i % 2 = 0 THEN 1.0 ELSE -1.0 END), " +
          "CAST(0.0 AS DOUBLE), (acc, y) -> acc + y)"), 6)
        .as("alternating_sum"))

  private val q65Sql =
    """SELECT vec_id,
      |  len(list_filter(embedding, x -> x > 0.0)) AS n_positive,
      |  CAST(len(list_filter(embedding, x -> abs(CAST(x AS DOUBLE)) > 0.45)) > 0 AS INT) AS has_large,
      |  round(list_reduce(
      |    [CAST(embedding[i] AS DOUBLE)
      |       * (CASE WHEN (i - 1) % 2 = 0 THEN 1.0 ELSE -1.0 END)
      |     for i in range(1, len(embedding) + 1)],
      |    (a, b) -> a + b), 6) AS alternating_sum
      |FROM embeddings""".stripMargin

  /** q67: union of the four per-priority streams (SURVEY §2.8 — the
    * reference reads one job off ANY of 4 Redis streams; here four
    * filtered sources union back into one flow, preserving totals). */
  private def q67(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .withColumn("priority", priorityOf(col("event_type")))
    val streams = (0 to 3).map(p => ev.filter(col("priority") === p))
    streams.reduce(_ unionAll _)
      .groupBy(col("priority"))
      .agg(count(lit(1)).as("n"), Q.dsum(col("value")).as("total_value"))
  }

  private val q67Sql =
    s"""SELECT priority, count(*) AS n, ${Q.dsumSql("value")} AS total_value
       |FROM (
       |  SELECT * FROM (SELECT *, $priorityOfSql AS priority FROM events) WHERE priority = 0
       |  UNION ALL SELECT * FROM (SELECT *, $priorityOfSql AS priority FROM events) WHERE priority = 1
       |  UNION ALL SELECT * FROM (SELECT *, $priorityOfSql AS priority FROM events) WHERE priority = 2
       |  UNION ALL SELECT * FROM (SELECT *, $priorityOfSql AS priority FROM events) WHERE priority = 3)
       |GROUP BY priority""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q63_statistical_aggs", q63, Some(q63Sql)),
    QueryDef("q64_rank_distribution", q64, Some(q64Sql)),
    QueryDef("q65_array_hof", q65, Some(q65Sql)),
    QueryDef("q67_union_priority_streams", q67, Some(q67Sql)),
    QueryDef("q59_semi_join", q59, Some(q59Sql)),
    QueryDef("q60_anti_join", q60, Some(q60Sql)),
    QueryDef("q61_scalar_subquery", q61, Some(q61Sql)),
    QueryDef("q54_grouping_sets", q54, Some(q54Sql)),
    QueryDef("q55_pivot", q55, Some(q55Sql)),
    QueryDef("q56_ntile_quartiles", q56, Some(q56Sql)),
    QueryDef("q57_weekly_revenue", q57, Some(q57Sql)),
    QueryDef("q58_string_kit", q58, Some(q58Sql)))
}
