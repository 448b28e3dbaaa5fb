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
      |  sum(CAST(event_type = 'click' AS BIGINT)) AS click,
      |  sum(CAST(event_type = 'view' AS BIGINT)) AS view,
      |  sum(CAST(event_type = 'signup' AS BIGINT)) AS signup,
      |  sum(CAST(event_type = 'purchase' AS BIGINT)) AS purchase,
      |  sum(CAST(event_type = 'error' AS BIGINT)) AS error
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
    * engines so the comparison threshold is bit-identical). */
  private def q61(s: SparkSession, d: String): DataFrame = {
    val avgPrice = Tables.part(s, d)
      .agg((sum(col("p_retailprice").cast("decimal(18,2)")).cast("double") /
        count(lit(1))).as("a"))
      .head().getDouble(0)
    Tables.part(s, d)
      .filter(col("p_retailprice") > avgPrice)
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

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q59_semi_join", q59, Some(q59Sql)),
    QueryDef("q60_anti_join", q60, Some(q60Sql)),
    QueryDef("q61_scalar_subquery", q61, Some(q61Sql)),
    QueryDef("q54_grouping_sets", q54, Some(q54Sql)),
    QueryDef("q55_pivot", q55, Some(q55Sql)),
    QueryDef("q56_ntile_quartiles", q56, Some(q56Sql)),
    QueryDef("q57_weekly_revenue", q57, Some(q57Sql)),
    QueryDef("q58_string_kit", q58, Some(q58Sql)))
}
