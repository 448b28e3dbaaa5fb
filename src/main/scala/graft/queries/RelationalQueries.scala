package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Relational core surface (SURVEY.md §2.3/§2.4/§2.5/§2.8): projections,
  * filters, equi-joins, grouped/rolled-up aggregation, set ops, window
  * top-k, exact percentiles, and the job↔result time-range correlation
  * (J1). Declared over the TPC-H-ish testdata.
  *
  * Scale notes (100 TB): every query here groups/joins on high-cardinality
  * keys AFTER filtering (filters and required columns push down to the
  * parquet scan); small dimensions (region/nation/customer/supplier) are
  * explicitly `broadcast()` so the only shuffles are on the fact tables;
  * money sums accumulate in DECIMAL so results are shuffle-order-independent.
  */
object RelationalQueries {

  /** q01: TPC-H Q1-shape pricing summary (reference analogs A1/A2 —
    * grouped multi-aggregate rollups; `src/ocr/service.py:216-255`). */
  private def q01(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(to_date(col("l_shipdate")) <= lit("2000-09-02"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).cast("double").as("sum_qty"),
        Q.dsum(col("l_extendedprice")).as("sum_base_price"),
        Q.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4)
          .as("sum_disc_price"),
        Q.davg(col("l_quantity")).as("avg_qty"),
        Q.davg(col("l_extendedprice")).as("avg_price"),
        Q.davg(col("l_discount"), 2).as("avg_disc"),
        count(lit(1)).as("count_order"))

  private val q01Sql =
    s"""SELECT l_returnflag, l_linestatus,
       |  CAST(sum(l_quantity) AS DOUBLE) AS sum_qty,
       |  ${Q.dsumSql("l_extendedprice")} AS sum_base_price,
       |  ${Q.dsumSql("l_extendedprice * (1.0 - l_discount)", 4)} AS sum_disc_price,
       |  ${Q.davgSql("l_quantity")} AS avg_qty,
       |  ${Q.davgSql("l_extendedprice")} AS avg_price,
       |  ${Q.davgSql("l_discount", 2)} AS avg_disc,
       |  count(*) AS count_order
       |FROM lineitem
       |WHERE CAST(l_shipdate AS DATE) <= DATE '2000-09-02'
       |GROUP BY l_returnflag, l_linestatus""".stripMargin

  /** q02: TPC-H Q3-shape top-revenue orders — 3-way equi-join + grouped
    * revenue + deterministic top-10 (reference J1 keyed correlation +
    * B6 ordered dequeue). Revenue accumulates in DECIMAL, so the ORDER BY
    * is on bit-identical doubles in both engines. */
  private def q02(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
    val o = Tables.orders(s, d)
      .filter(to_date(col("o_orderdate")) < lit("1998-03-15"))
    val l = Tables.lineitem(s, d)
      .filter(to_date(col("l_shipdate")) > lit("1998-03-15"))
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .groupBy(col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"))
      .agg(Q.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4)
        .as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey").asc)
      .limit(10)
  }

  private val q02Sql =
    s"""SELECT o_orderkey,
      |  strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
      |  ${Q.dsumSql("l_extendedprice * (1.0 - l_discount)", 4)} AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND CAST(o_orderdate AS DATE) < DATE '1998-03-15'
      |  AND CAST(l_shipdate AS DATE) > DATE '1998-03-15'
      |GROUP BY o_orderkey, strftime(o_orderdate, '%Y-%m-%d')
      |ORDER BY revenue DESC, o_orderkey
      |LIMIT 10""".stripMargin

  /** q03: TPC-H Q5-shape local-supplier revenue by nation — 6-way join
    * with broadcast dimensions; the fact-side shuffle is only on the
    * orderkey/suppkey equi-join keys. */
  private def q03(s: SparkSession, d: String): DataFrame = {
    val r = Tables.region(s, d).filter(col("r_name") === "ASIA")
    val n = Tables.nation(s, d)
    val c = Tables.customer(s, d)
    val sup = Tables.supplier(s, d)
    val o = Tables.orders(s, d)
      .filter(to_date(col("o_orderdate")) >= lit("1996-01-01") &&
        to_date(col("o_orderdate")) < lit("1998-01-01"))
    val l = Tables.lineitem(s, d)
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(broadcast(sup), l("l_suppkey") === sup("s_suppkey"))
      .join(broadcast(c),
        o("o_custkey") === c("c_custkey") &&
          sup("s_nationkey") === c("c_nationkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(Q.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4)
        .as("revenue"))
  }

  private val q03Sql =
    s"""SELECT n_name,
      |  ${Q.dsumSql("l_extendedprice * (1.0 - l_discount)", 4)} AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN customer ON o_custkey = c_custkey AND s_nationkey = c_nationkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |  AND CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
      |  AND CAST(o_orderdate AS DATE) < DATE '1998-01-01'
      |GROUP BY n_name""".stripMargin

  /** q04: ROLLUP over the event stream (engine extension per SURVEY §2.5:
    * distinct/rollup/cube are absent in the reference; declared here). */
  private def q04(s: SparkSession, d: String): DataFrame = {
    import graft.functions.CoreFunctions
    Tables.events(s, d)
      .withColumn("priority", CoreFunctions.priorityOf(col("event_type")))
      .rollup(col("event_type"), col("priority"))
      .agg(count(lit(1)).as("n"), Q.dsum(col("value")).as("total_value"))
  }

  private val q04Sql =
    s"""SELECT event_type,
       |  ${graft.functions.CoreFunctions.priorityOfSql} AS priority,
       |  count(*) AS n, ${Q.dsumSql("value")} AS total_value
       |FROM events
       |GROUP BY ROLLUP(event_type,
       |  ${graft.functions.CoreFunctions.priorityOfSql})""".stripMargin

  /** q05: CUBE over lineitem status flags. */
  private def q05(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity")).cast("double").as("sum_qty"))

  private val q05Sql =
    """SELECT l_returnflag, l_linestatus, count(*) AS n,
      |  CAST(sum(l_quantity) AS DOUBLE) AS sum_qty
      |FROM lineitem
      |GROUP BY CUBE(l_returnflag, l_linestatus)""".stripMargin

  /** q06: set operations (SURVEY §2.8 — engine surface): customers with a
    * big order vs customers with negative balance, tagged 3-way. */
  private def q06(s: SparkSession, d: String): DataFrame = {
    val a = Tables.orders(s, d).filter(col("o_totalprice") > 300000.0)
      .select(col("o_custkey").as("custkey")).distinct()
    val b = Tables.customer(s, d).filter(col("c_acctbal") < 0.0)
      .select(col("c_custkey").as("custkey")).distinct()
    a.except(b).withColumn("tag", lit("only_big_order"))
      .unionAll(a.intersect(b).withColumn("tag", lit("both")))
      .unionAll(b.except(a).withColumn("tag", lit("only_neg_bal")))
  }

  private val q06Sql =
    """WITH a AS (SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_totalprice > 300000.0),
      |     b AS (SELECT DISTINCT c_custkey AS custkey FROM customer WHERE c_acctbal < 0.0)
      |SELECT custkey, 'only_big_order' AS tag FROM (SELECT * FROM a EXCEPT SELECT * FROM b)
      |UNION ALL
      |SELECT custkey, 'both' AS tag FROM (SELECT * FROM a INTERSECT SELECT * FROM b)
      |UNION ALL
      |SELECT custkey, 'only_neg_bal' AS tag FROM (SELECT * FROM b EXCEPT SELECT * FROM a)""".stripMargin

  /** q07: exact distinct counts per group (SURVEY §2.5 engine extension;
    * the approx/HLL variant is bench-only — approx sketches are not
    * oracle-comparable). */
  private def q07(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_suppkey")).as("n_supp"),
        countDistinct(col("l_partkey")).as("n_part"),
        count(lit(1)).as("n"))

  private val q07Sql =
    """SELECT l_returnflag, count(DISTINCT l_suppkey) AS n_supp,
      |  count(DISTINCT l_partkey) AS n_part, count(*) AS n
      |FROM lineitem GROUP BY l_returnflag""".stripMargin

  /** q08: per-group top-k via window rank (reference B8 largest-contour
    * top-1 / B10 last-N generalization). */
  private def q08(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val totals = Tables.events(s, d)
      .groupBy(col("event_type"), col("user_id"))
      .agg(Q.dsum(col("value")).as("total_value"))
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("total_value").desc, col("user_id").asc)
    totals.withColumn("rk", row_number().over(w)).filter(col("rk") <= 3)
  }

  private val q08Sql =
    s"""SELECT * FROM (
       |  SELECT event_type, user_id, total_value,
       |    row_number() OVER (PARTITION BY event_type
       |      ORDER BY total_value DESC, user_id) AS rk
       |  FROM (SELECT event_type, user_id, ${Q.dsumSql("value")} AS total_value
       |        FROM events GROUP BY event_type, user_id))
       |WHERE rk <= 3""".stripMargin

  /** q09: exact percentile stats (reference A14 benchmark percentiles /
    * B9 median angle — `benchmarks/run_benchmarks.py:582-611`). Uses the
    * exact interpolated percentile on both engines. */
  private def q09(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(col("event_type"))
      .agg(
        round(Q.davg(col("value")), 6).as("mean_v"),
        round(expr("percentile(value, 0.5)"), 6).as("p50"),
        round(expr("percentile(value, 0.95)"), 6).as("p95"),
        round(expr("percentile(value, 0.99)"), 6).as("p99"),
        count(lit(1)).as("n"))

  private val q09Sql =
    s"""SELECT event_type, round(${Q.davgSql("value")}, 6) AS mean_v,
       |  round(quantile_cont(value, 0.5), 6) AS p50,
       |  round(quantile_cont(value, 0.95), 6) AS p95,
       |  round(quantile_cont(value, 0.99), 6) AS p99,
       |  count(*) AS n
       |FROM events GROUP BY event_type""".stripMargin

  /** q10: request↔result correlation on a key with a time-range bound —
    * the batch form of reference J1 (`redis_queue.py:329-344`: enqueue
    * then poll result within timeout). signup=request, purchase=result,
    * 7-day window. At scale this is a range join after an equi-join on
    * the key, so it shuffles only on user_id. */
  private def q10(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val req = ev.filter(col("event_type") === "signup")
      .select(col("user_id"), Q.us.as("t_req"))
    val res = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("r_user"), Q.us.as("t_res"))
    req.join(res, req("user_id") === res("r_user") &&
        res("t_res") >= req("t_req") &&
        res("t_res") <= req("t_req") + lit(604800000000L))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_matched"),
        min(col("t_res") - col("t_req")).as("min_latency_us"))
  }

  private val q10Sql =
    s"""SELECT r.user_id, count(*) AS n_matched,
       |  min(s.t_res - r.t_req) AS min_latency_us
       |FROM (SELECT user_id, ${Q.usSql} AS t_req FROM events WHERE event_type = 'signup') r
       |JOIN (SELECT user_id, ${Q.usSql} AS t_res FROM events WHERE event_type = 'purchase') s
       |  ON r.user_id = s.user_id
       | AND s.t_res >= r.t_req AND s.t_res <= r.t_req + 604800000000
       |GROUP BY r.user_id""".stripMargin

  /** q48: salted two-phase aggregation — the explicit skew-mitigation
    * pattern for low-cardinality hot keys (5 event types × 100k rows
    * would hash to 5 reducers; salting spreads the partial aggregation
    * across 16× the parallelism, and the merge combines 80 tiny rows).
    * DECIMAL partials make the two-phase sum bit-equal to the direct
    * oracle sum regardless of how rows landed in salt buckets. */
  private def q48(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .withColumn("salt", (col("event_id") % 16).cast("int"))
      .groupBy(col("event_type"), col("salt"))
      .agg(sum(col("value").cast("decimal(18,2)")).as("part_sum"),
        count(lit(1)).as("part_n"))
      .groupBy(col("event_type"))
      .agg(sum(col("part_sum")).cast("double").as("total_value"),
        sum(col("part_n")).as("n"))

  private val q48Sql =
    s"""SELECT event_type, ${Q.dsumSql("value")} AS total_value,
       |  count(*) AS n
       |FROM events GROUP BY event_type""".stripMargin

  /** q68: TPC-H Q6 shape — tight selective filter straight to one
    * aggregated number (the pushdown showcase: three range predicates
    * reach the scan, one map-side partial sum, one exchange of a single
    * row). */
  private def q68(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(to_date(col("l_shipdate")) >= lit("1996-01-01") &&
        to_date(col("l_shipdate")) < lit("1997-01-01") &&
        col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
        col("l_quantity") < 24.0)
      .agg(sum((col("l_extendedprice") * col("l_discount"))
        .cast("decimal(18,4)")).cast("double").as("revenue"),
        count(lit(1)).as("n"))

  private val q68Sql =
    """SELECT CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
      |  count(*) AS n
      |FROM lineitem
      |WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
      |  AND CAST(l_shipdate AS DATE) < DATE '1997-01-01'
      |  AND l_discount >= 0.05 AND l_discount <= 0.07
      |  AND l_quantity < 24.0""".stripMargin

  /** q69: TPC-H Q12 shape — conditional counts per class (high/low
    * priority line split via CASE aggregation). */
  private def q69(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .withColumn("bucket", (col("l_quantity") >= 25.0).cast("int"))
      .groupBy(col("bucket"))
      .agg(
        sum((col("o_orderpriority").isin("1-URGENT", "2-HIGH")).cast("long"))
          .as("high_count"),
        sum((!col("o_orderpriority").isin("1-URGENT", "2-HIGH")).cast("long"))
          .as("low_count"))

  private val q69Sql =
    """SELECT CAST(l_quantity >= 25.0 AS INT) AS bucket,
      |  CAST(sum(CAST(o_orderpriority IN ('1-URGENT','2-HIGH') AS BIGINT)) AS BIGINT) AS high_count,
      |  CAST(sum(CAST(o_orderpriority NOT IN ('1-URGENT','2-HIGH') AS BIGINT)) AS BIGINT) AS low_count
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY 1""".stripMargin

  /** q70: TPC-H Q14 shape — conditional revenue share (promo = small
    * parts), exact decimal numerator/denominator before the one double
    * division. */
  private def q70(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .join(broadcast(Tables.part(s, d)), col("l_partkey") === col("p_partkey"))
      .agg(
        (sum(when(col("p_size") <= 10,
          (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .cast("decimal(18,4)")).otherwise(lit(0).cast("decimal(18,4)")))
          .cast("double") * 100.0 /
          sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .cast("decimal(18,4)")).cast("double")).as("promo_share_pct"))
      .select(round(col("promo_share_pct"), 6).as("promo_share_pct"))

  private val q70Sql =
    """SELECT round(
      |  CAST(sum(CASE WHEN p_size <= 10
      |    THEN CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))
      |    ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) * 100.0
      |  / CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE),
      |  6) AS promo_share_pct
      |FROM lineitem JOIN part ON l_partkey = p_partkey""".stripMargin

  /** q90: TPC-H Q10 shape — top-20 customers by revenue from RETURNED
    * items: fact-side filter pushes to the scan, nation broadcasts, and
    * the top-20 is a deterministic (revenue DESC, custkey) order over
    * the small aggregated result. */
  private def q90(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d).filter(col("l_returnflag") === "R")
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, d)),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("n_name"))
      .agg(Q.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4)
        .as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey").asc)
      .limit(20)

  private val q90Sql =
    s"""SELECT c_custkey, n_name, revenue FROM (
       |  SELECT c_custkey, n_name,
       |    ${Q.dsumSql("l_extendedprice * (1.0 - l_discount)", 4)} AS revenue
       |  FROM lineitem
       |  JOIN orders ON l_orderkey = o_orderkey
       |  JOIN customer ON o_custkey = c_custkey
       |  JOIN nation ON c_nationkey = n_nationkey
       |  WHERE l_returnflag = 'R'
       |  GROUP BY 1, 2)
       |ORDER BY revenue DESC, c_custkey
       |LIMIT 20""".stripMargin

  /** q91: TPC-H Q7 shape — shipping volume between distinct
    * supplier/customer nation pairs by ship year. Two broadcast copies
    * of nation; the only fact-path shuffles are the equi-joins on the
    * order/customer keys and the final group-by. */
  private def q91(s: SparkSession, d: String): DataFrame = {
    val n1 = Tables.nation(s, d)
      .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
    val n2 = Tables.nation(s, d)
      .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.supplier(s, d)),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
      .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("l_year"))
      .agg(Q.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4)
        .as("revenue"),
        count(lit(1)).as("n_lines"))
  }

  private val q91Sql =
    s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       |  year(l_shipdate) AS l_year,
       |  ${Q.dsumSql("l_extendedprice * (1.0 - l_discount)", 4)} AS revenue,
       |  count(*) AS n_lines
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |JOIN supplier ON l_suppkey = s_suppkey
       |JOIN nation n1 ON s_nationkey = n1.n_nationkey
       |JOIN nation n2 ON c_nationkey = n2.n_nationkey
       |WHERE n1.n_name <> n2.n_name
       |GROUP BY 1, 2, 3""".stripMargin

  /** q92: TPC-H Q13 shape — customer order-count distribution: LEFT
    * join so zero-order customers survive, count per customer, then the
    * histogram of counts. Two shuffles (custkey, then the tiny count
    * key). */
  private def q92(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(Tables.orders(s, d),
        col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))

  private val q92Sql =
    """SELECT c_count, count(*) AS custdist
      |FROM (
      |  SELECT c_custkey, count(o_orderkey) AS c_count
      |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      |  GROUP BY 1)
      |GROUP BY 1""".stripMargin

  /** q96: TPC-H Q4 shape — orders with AT LEAST ONE lineitem shipped
    * more than 30 days after the order date, counted by priority
    * (EXISTS → left-semi join with a correlated date-arithmetic
    * predicate; the testdata has no commit/receipt dates, so "late" is
    * ship-lag — same operator shape). */
  private def q96(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d).as("o")
      .join(Tables.lineitem(s, d).as("l"),
        col("l.l_orderkey") === col("o.o_orderkey") &&
          col("l.l_shipdate") >
            col("o.o_orderdate") + expr("INTERVAL 30 DAY"),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_late_orders"))

  private val q96Sql =
    """SELECT o_orderpriority, count(*) AS n_late_orders
      |FROM orders o
      |WHERE EXISTS (
      |  SELECT 1 FROM lineitem l
      |  WHERE l.l_orderkey = o.o_orderkey
      |    AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY)
      |GROUP BY 1""".stripMargin

  /** q98: TPC-H Q8 shape — each supplier nation's share of ASIA-customer
    * revenue per order year: fact joins + broadcast dims, then a
    * share-of-total window over the (year, nation) aggregate. The share
    * divides two integer-cents sums, so the doubles are
    * engine-identical. */
  private def q98(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val n1 = Tables.nation(s, d)
      .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
    val custSide = Tables.customer(s, d)
      .join(broadcast(Tables.nation(s, d)),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d).filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("c_custkey"))
    val base = Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(custSide, col("o_custkey") === col("c_custkey"), "left_semi")
      .join(broadcast(Tables.supplier(s, d)),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
      .groupBy(year(col("o_orderdate")).as("o_year"), col("supp_nation"))
      .agg(sum(round(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
        * 10000).cast("long")).as("rev_u"))
    base
      .withColumn("year_u",
        sum(col("rev_u")).over(Window.partitionBy(col("o_year"))))
      .select(col("o_year"), col("supp_nation"),
        (col("rev_u").cast("double") / 10000.0).as("revenue"),
        round(col("rev_u").cast("double") / col("year_u").cast("double"), 6)
          .as("share"))
  }

  private val q98Sql =
    """SELECT o_year, supp_nation,
      |  CAST(rev_u AS DOUBLE) / 10000.0 AS revenue,
      |  round(CAST(rev_u AS DOUBLE) / CAST(year_u AS DOUBLE), 6) AS share
      |FROM (
      |  SELECT o_year, supp_nation, rev_u,
      |    CAST(sum(rev_u) OVER (PARTITION BY o_year) AS BIGINT) AS year_u
      |  FROM (
      |    SELECT year(o_orderdate) AS o_year, n1.n_name AS supp_nation,
      |      CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 10000.0)
      |        AS BIGINT)) AS BIGINT) AS rev_u
      |    FROM lineitem
      |    JOIN orders ON l_orderkey = o_orderkey
      |    JOIN supplier ON l_suppkey = s_suppkey
      |    JOIN nation n1 ON s_nationkey = n1.n_nationkey
      |    WHERE o_custkey IN (
      |      SELECT c_custkey FROM customer
      |      JOIN nation ON c_nationkey = n_nationkey
      |      JOIN region ON n_regionkey = r_regionkey
      |      WHERE r_name = 'ASIA')
      |    GROUP BY 1, 2))""".stripMargin

  /** q105: TPC-H Q17 shape — revenue lost to small-quantity orders of
    * one brand's parts: lineitems below 20% of their part's average
    * quantity. The correlated `avg` subquery becomes a WINDOW over the
    * part key on the brand-pruned fact slice: broadcast the filtered
    * part list into the scan, then ONE shuffle (l_partkey) computes the
    * per-part average and filters in the same pass — no groupBy+rejoin
    * round-trip. Quantities are integral doubles, so the window average
    * is exact on both engines and the 0.2·avg comparison cannot flip. */
  private def q105(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    Tables.lineitem(s, d)
      .join(broadcast(Tables.part(s, d)
        .filter(col("p_brand") === "Brand#4").select(col("p_partkey"))),
        col("l_partkey") === col("p_partkey"))
      .withColumn("avg_qty",
        avg(col("l_quantity")).over(Window.partitionBy(col("l_partkey"))))
      .filter(col("l_quantity") < lit(0.2) * col("avg_qty"))
      .agg(round(Q.dsum(col("l_extendedprice")) / 7.0, 2).as("avg_yearly"))
  }

  private val q105Sql =
    s"""SELECT round(${dsumBody("l_extendedprice")} / 7.0, 2) AS avg_yearly
       |FROM (
       |  SELECT l_extendedprice, l_quantity,
       |    avg(l_quantity) OVER (PARTITION BY l_partkey) AS avg_qty
       |  FROM lineitem
       |  JOIN (SELECT p_partkey FROM part WHERE p_brand = 'Brand#4') p
       |    ON l_partkey = p_partkey)
       |WHERE l_quantity < 0.2 * avg_qty""".stripMargin

  /** q106: TPC-H Q18 shape — large-volume orders (total quantity over
    * 250) with their customers, biggest first. The HAVING aggregate is
    * one hash shuffle on the order key; orders/customer attach by
    * equi-join; the global top-100 runs as TakeOrderedAndProject
    * (per-partition heaps, no full sort). (o_totalprice, o_orderkey) is
    * a total order, so the limit is deterministic. */
  private def q106(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity")).as("total_qty"))
      .filter(col("total_qty") > 250.0)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        col("o_orderdate"), col("o_totalprice"), col("total_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(100)

  private val q106Sql =
    """SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
      |  total_qty
      |FROM (
      |  SELECT l_orderkey, sum(l_quantity) AS total_qty
      |  FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > 250)
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |ORDER BY o_totalprice DESC, o_orderkey
      |LIMIT 100""".stripMargin

  /** q107: TPC-H Q21 shape — suppliers who single-handedly held up
    * multi-supplier orders: the supplier shipped late (ship-lag > 30
    * days, the q96 convention) and NO other supplier in the same order
    * did.
    *
    * The textbook form is EXISTS (another supplier in the order) + NOT
    * EXISTS (another LATE supplier) — two correlated self-joins over
    * lineitem (the semi/anti operators themselves are demonstrated by
    * q59/q60/q96). Here both quantifiers collapse into per-order
    * counts: ONE lineitem⋈orders pass reduces to distinct (order,
    * supplier) pairs with a max'd lateness flag, and a window over the
    * SAME order key (no extra exchange — the pair aggregate already
    * hash-partitions on a superset prefix) derives supplier count and
    * late-supplier count. "This supplier late, >1 supplier, exactly 1
    * late supplier" is then a row filter. vs the semi/anti form: half
    * the lineitem scans, two fewer shuffled joins — measured ~1.6×
    * faster warm at sf0.1, and the saved scan is the dominant cost at
    * 100 TB. */
  private def q107(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byOrder = Window.partitionBy(col("l_orderkey"))
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_suppkey"),
        (col("l_shipdate") >
          col("o_orderdate") + expr("INTERVAL 30 DAY")).cast("long")
          .as("late"))
      .groupBy(col("l_orderkey"), col("l_suppkey"))
      .agg(max(col("late")).as("late"))
      .withColumn("n_supps", count(lit(1)).over(byOrder))
      .withColumn("n_late", sum(col("late")).over(byOrder))
      .filter(col("late") === 1 && col("n_supps") > 1 && col("n_late") === 1)
      .groupBy(col("l_suppkey"))
      .agg(count(lit(1)).as("numwait"))
      .join(broadcast(Tables.supplier(s, d)
        .select(col("s_suppkey"), col("s_name"))),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_name"), col("numwait"))
      .orderBy(col("numwait").desc, col("s_name").asc)
      .limit(20)
  }

  private val q107Sql =
    """WITH late AS (
      |  SELECT DISTINCT l_orderkey, l_suppkey
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  WHERE l_shipdate > o_orderdate + INTERVAL 30 DAY),
      |multi AS (
      |  SELECT l_orderkey FROM lineitem
      |  GROUP BY 1 HAVING count(DISTINCT l_suppkey) > 1)
      |SELECT s_name, count(*) AS numwait
      |FROM late l1
      |JOIN multi USING (l_orderkey)
      |JOIN supplier ON l1.l_suppkey = s_suppkey
      |WHERE NOT EXISTS (
      |  SELECT 1 FROM late l2
      |  WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
      |GROUP BY 1
      |ORDER BY numwait DESC, s_name
      |LIMIT 20""".stripMargin

  /** q108: TPC-H Q22 shape — well-funded dormant customers per market
    * segment: balance above the positive-balance average (exact
    * integer-cents average → the threshold comparison is engine-
    * identical) and no orders since 2001-01-01. The scalar average is a
    * broadcast 1-row cross join (the q13 pattern — the plan guard
    * proves the build side is maxRows=1); the NOT EXISTS is a left-anti
    * against the date-pruned order keys. */
  private def q108(s: SparkSession, d: String): DataFrame = {
    val avgBal = Tables.customer(s, d)
      .filter(col("c_acctbal") > 0.0)
      .agg(Q.davg(col("c_acctbal")).as("avg_bal"))
    Tables.customer(s, d)
      .crossJoin(broadcast(avgBal))
      .filter(col("c_acctbal") > col("avg_bal"))
      .join(Tables.orders(s, d)
        .filter(expr("o_orderdate >= TIMESTAMP '2001-01-01 00:00:00'"))
        .select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("numcust"),
        round(Q.dsum(col("c_acctbal")), 2).as("totacctbal"))
  }

  private val q108Sql =
    s"""SELECT c_mktsegment, count(*) AS numcust,
       |  round(${dsumBody("c_acctbal")}, 2) AS totacctbal
       |FROM customer
       |WHERE c_acctbal > (
       |  SELECT ${Q.davgSql("c_acctbal")} FROM customer WHERE c_acctbal > 0)
       |  AND NOT EXISTS (
       |    SELECT 1 FROM orders
       |    WHERE o_custkey = c_custkey
       |      AND o_orderdate >= TIMESTAMP '2001-01-01 00:00:00')
       |GROUP BY 1""".stripMargin

  private def dsumBody(e: String): String = Q.dsumSql(e)

  /** q118: TPC-H Q9 shape — per-nation, per-year profit on one product
    * family ('rod' parts), with supply cost synthesized as
    * 0.6·p_retailprice (the testdata has no partsupp table). Plan:
    * lineitem⋈part joins on the part key with NO broadcast hint — part
    * is fact-scale at 100 TB, so the planner must stay free to pick a
    * shuffle join there (at test SF its stats fit and it broadcasts,
    * which is the right call at that size) — while supplier and nation
    * are explicit broadcasts; the (nation, year) aggregate then reduces
    * the joined fact once. Profit accumulates in integer 10⁻⁴-units so
    * the grouped sums are shuffle-order-independent. */
  private def q118(s: SparkSession, d: String): DataFrame = {
    val p = Tables.part(s, d)
      .filter(col("p_name").contains("rod"))
      .select(col("p_partkey"), col("p_retailprice"))
    Tables.lineitem(s, d)
      .join(p, col("l_partkey") === col("p_partkey"))
      .join(broadcast(Tables.supplier(s, d)
        .select(col("s_suppkey"), col("s_nationkey"))),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(s, d)),
        col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"),
        year(col("l_shipdate")).as("o_year"))
      .agg(Q.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
        - lit(0.6) * col("p_retailprice") * col("l_quantity"), 4)
        .as("sum_profit"))
  }

  private val q118Sql =
    s"""SELECT n_name AS nation, year(l_shipdate) AS o_year,
       |  ${Q.dsumSql("l_extendedprice * (1.0 - l_discount) - 0.6 * p_retailprice * l_quantity", 4)} AS sum_profit
       |FROM lineitem
       |JOIN part ON l_partkey = p_partkey
       |JOIN supplier ON l_suppkey = s_suppkey
       |JOIN nation ON s_nationkey = n_nationkey
       |WHERE p_name LIKE '%rod%'
       |GROUP BY 1, 2""".stripMargin

  /** q119: TPC-H Q2 shape — for each STANDARD mid-size part, the
    * best-funded ASIA supplier who has actually shipped it (the
    * correlated "min ps_supplycost" subquery re-expressed as an arg-max,
    * acctbal standing in for supply cost — no partsupp table). Plan: ONE
    * distinct over (partkey, suppkey) pairs is the only fact shuffle; the
    * filtered supplier⋈nation⋈region side broadcasts onto it, and the
    * arg-max per part is a struct max — a regular aggregate with map-side
    * partials, NOT a row_number window (which would force a second sort).
    * The tiebreak (max acctbal, then MIN suppkey) is encoded in the
    * struct order via the negated key. */
  private def q119(s: SparkSession, d: String): DataFrame = {
    val asiaSupp = Tables.supplier(s, d)
      .join(broadcast(Tables.nation(s, d)),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d).filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("s_suppkey"), col("s_acctbal"), col("s_name"),
        col("n_name"))
    val best = Tables.lineitem(s, d)
      .select(col("l_partkey"), col("l_suppkey"))
      .distinct()
      .join(broadcast(asiaSupp), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("l_partkey"))
      .agg(max(struct(col("s_acctbal").as("bal"),
        (-col("s_suppkey")).as("negkey"), col("s_name").as("nm"),
        col("n_name").as("nn"))).as("best"))
    best
      .join(broadcast(Tables.part(s, d)
        .filter(col("p_type") === "STANDARD" &&
          col("p_size").between(10, 20))),
        col("l_partkey") === col("p_partkey"))
      .select(col("p_partkey"), col("p_name"),
        col("best.nm").as("best_supp"),
        round(col("best.bal"), 2).as("best_acctbal"),
        col("best.nn").as("supp_nation"))
      .orderBy(col("best_acctbal").desc, col("p_partkey").asc)
      .limit(100)
  }

  private val q119Sql =
    """WITH pairs AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
      |cand AS (
      |  SELECT l_partkey, s_acctbal, s_name, n_name,
      |    row_number() OVER (PARTITION BY l_partkey
      |      ORDER BY s_acctbal DESC, s_suppkey) AS rn
      |  FROM pairs
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation ON s_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey
      |  WHERE r_name = 'ASIA')
      |SELECT p_partkey, p_name, s_name AS best_supp,
      |  round(s_acctbal, 2) AS best_acctbal, n_name AS supp_nation
      |FROM cand JOIN part ON l_partkey = p_partkey
      |WHERE rn = 1 AND p_type = 'STANDARD' AND p_size BETWEEN 10 AND 20
      |ORDER BY best_acctbal DESC, p_partkey
      |LIMIT 100""".stripMargin

  /** q120: TPC-H Q15 shape — the top supplier(s) by Q1-1997 revenue. The
    * "revenue = (SELECT max(revenue))" correlation is the scalar-
    * broadcast pattern (q13/q108): the 1-row max crosses back via
    * broadcast (plan-guard-provable), and the equality compares integer
    * 10⁻⁴-unit revenues — exact, so ties surface identically on both
    * engines (a double-equality here would be a correctness trap). */
  private def q120(s: SparkSession, d: String): DataFrame = {
    val rev = Tables.lineitem(s, d)
      .filter(to_date(col("l_shipdate")) >= lit("1997-01-01") &&
        to_date(col("l_shipdate")) < lit("1997-04-01"))
      .groupBy(col("l_suppkey"))
      .agg(sum(round(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
        * 10000).cast("long")).as("rev_u"))
    rev
      .crossJoin(broadcast(rev.agg(max(col("rev_u")).as("max_u"))))
      .filter(col("rev_u") === col("max_u"))
      .join(broadcast(Tables.supplier(s, d)
        .select(col("s_suppkey"), col("s_name"))),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        (col("rev_u").cast("double") / 10000.0).as("total_revenue"))
      .orderBy(col("s_suppkey"))
  }

  private val q120Sql =
    """WITH rev AS (
      |  SELECT l_suppkey,
      |    CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 10000.0)
      |      AS BIGINT)) AS BIGINT) AS rev_u
      |  FROM lineitem
      |  WHERE CAST(l_shipdate AS DATE) >= DATE '1997-01-01'
      |    AND CAST(l_shipdate AS DATE) < DATE '1997-04-01'
      |  GROUP BY 1)
      |SELECT s_suppkey, s_name, CAST(rev_u AS DOUBLE) / 10000.0 AS total_revenue
      |FROM rev JOIN supplier ON l_suppkey = s_suppkey
      |WHERE rev_u = (SELECT max(rev_u) FROM rev)
      |ORDER BY s_suppkey""".stripMargin

  /** q121: TPC-H Q16 shape — how many distinct suppliers can ship each
    * surviving (brand, type, size) part profile, excluding one brand, one
    * type family, and every supplier from AFRICA (the "customer
    * complaints" NOT IN, re-expressed as a broadcast anti-join on a
    * dimension subquery — no partsupp table, so shipped (part, supplier)
    * pairs stand in for partsupp). The distinct-count shuffles once on
    * the profile key after the pair distinct; both distincts combine
    * map-side. */
  private def q121(s: SparkSession, d: String): DataFrame = {
    val africaSupp = Tables.supplier(s, d)
      .join(broadcast(Tables.nation(s, d)),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d)
        .filter(col("r_name") === "AFRICA")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("s_suppkey"))
    Tables.lineitem(s, d)
      .select(col("l_partkey"), col("l_suppkey"))
      .distinct()
      .join(broadcast(africaSupp),
        col("l_suppkey") === col("s_suppkey"), "left_anti")
      .join(Tables.part(s, d)
        .filter(col("p_brand") =!= "Brand#13" && col("p_type") =!= "PROMO" &&
          col("p_size").isin(1, 9, 19, 29, 39, 49)),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand").asc,
        col("p_type").asc, col("p_size").asc)
  }

  private val q121Sql =
    """SELECT p_brand, p_type, p_size,
      |  count(DISTINCT l_suppkey) AS supplier_cnt
      |FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
      |JOIN part ON l_partkey = p_partkey
      |WHERE p_brand <> 'Brand#13' AND p_type <> 'PROMO'
      |  AND p_size IN (1, 9, 19, 29, 39, 49)
      |  AND l_suppkey NOT IN (
      |    SELECT s_suppkey FROM supplier
      |    JOIN nation ON s_nationkey = n_nationkey
      |    JOIN region ON n_regionkey = r_regionkey
      |    WHERE r_name = 'AFRICA')
      |GROUP BY 1, 2, 3
      |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin

  /** q122: TPC-H Q19 shape — revenue from three disjunctive
    * (brand × size × quantity) channels. The OR-of-ANDs can't be a join
    * key, but its COMMON conjuncts factor out: the lineitem scan keeps
    * only 1 ≤ quantity ≤ 35 rows and the part side only the three brands
    * with size ≤ 30 — both reach the parquet scans as pushed filters —
    * so the join carries a fraction of each table and the full
    * disjunction evaluates post-join, codegen'd, on the survivors. */
  private def q122(s: SparkSession, d: String): DataFrame = {
    val p = Tables.part(s, d)
      .filter(col("p_brand").isin("Brand#1", "Brand#2", "Brand#3") &&
        col("p_size").between(1, 30))
      .select(col("p_partkey"), col("p_brand"), col("p_size"))
    def channel(brand: String, sizeHi: Int, qLo: Int, qHi: Int) =
      col("p_brand") === brand && col("p_size").between(1, sizeHi) &&
        col("l_quantity").between(qLo, qHi)
    Tables.lineitem(s, d)
      .filter(col("l_quantity").between(1, 35))
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .filter(channel("Brand#1", 10, 1, 15) ||
        channel("Brand#2", 20, 10, 25) ||
        channel("Brand#3", 30, 20, 35))
      .agg(Q.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4)
        .as("revenue"))
  }

  private val q122Sql =
    s"""SELECT ${Q.dsumSql("l_extendedprice * (1.0 - l_discount)", 4)} AS revenue
       |FROM lineitem JOIN part ON l_partkey = p_partkey
       |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10
       |    AND l_quantity BETWEEN 1 AND 15)
       |  OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 20
       |    AND l_quantity BETWEEN 10 AND 25)
       |  OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 30
       |    AND l_quantity BETWEEN 20 AND 35)""".stripMargin

  /** q123: TPC-H Q20 shape — dominant suppliers of blue parts in 1997:
    * suppliers whose shipped quantity of a part exceeds half that part's
    * total (the availqty > ½·sum(qty) threshold re-expressed without
    * partsupp). Plan: the 1997 blue-part lineitem slice aggregates ONCE
    * to (part, supplier) quantities; the per-part total is a window sum
    * over the part key on that SAME aggregate (the q107 trick — one
    * extra part-key exchange, never a self-join that would duplicate
    * the fact scan), and the integer-quantity comparison
    * 2·supp > total is exact. Survivor supplier keys then semi-join
    * the supplier dimension. */
  private def q123(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val blue = Tables.part(s, d)
      .filter(col("p_name").startsWith("blue"))
      .select(col("p_partkey"))
    Tables.lineitem(s, d)
      .filter(to_date(col("l_shipdate")) >= lit("1997-01-01") &&
        to_date(col("l_shipdate")) < lit("1998-01-01"))
      .join(broadcast(blue), col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(col("l_quantity").cast("long")).as("supp_qty"))
      .withColumn("total_qty",
        sum(col("supp_qty")).over(Window.partitionBy(col("l_partkey"))))
      .filter(col("supp_qty") * 2 > col("total_qty"))
      .select(col("l_suppkey"))
      .distinct()
      .join(broadcast(Tables.supplier(s, d)),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(s, d)),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_name"), col("n_name"))
      .orderBy(col("s_name"))
  }

  private val q123Sql =
    """WITH per AS (
      |  SELECT l_partkey, l_suppkey,
      |    sum(CAST(l_quantity AS BIGINT)) AS supp_qty
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  WHERE p_name LIKE 'blue%'
      |    AND CAST(l_shipdate AS DATE) >= DATE '1997-01-01'
      |    AND CAST(l_shipdate AS DATE) < DATE '1998-01-01'
      |  GROUP BY 1, 2),
      |tot AS (
      |  SELECT l_partkey, sum(supp_qty) AS total_qty FROM per GROUP BY 1)
      |SELECT DISTINCT s_name, n_name
      |FROM per
      |JOIN tot USING (l_partkey)
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |WHERE supp_qty * 2 > total_qty
      |ORDER BY s_name""".stripMargin

  /** q140: TPC-H Q11 shape — parts carrying a significant share of
    * total shipped value (> 0.1% of the global total; partsupp's stock
    * value re-expressed as shipped `extendedprice` value). The
    * correlated "sum(...) * fraction" subquery is the 1-row broadcast
    * scalar again, but as a RELATIVE threshold this time: a part is
    * significant when its value exceeds 1.5× the mean part value, and
    * the comparison cross-multiplies in integer cents
    * (2·value·n > 3·total) instead of dividing — exact on both engines,
    * no double fraction, and scale-free where Q11's fixed 0.1% gate
    * degenerates as the part count grows. One lineitem pass feeds the
    * per-part aggregate; the global (total, count) re-aggregates THAT
    * (partials of partials — never a second fact scan). At scales where
    * 2·value·n could overflow int64 (≳10¹⁹ cent·part products), the
    * same plan runs with DECIMAL partials — the knob, not the shape. */
  private def q140(s: SparkSession, d: String): DataFrame = {
    val perPart = Tables.lineitem(s, d)
      .groupBy(col("l_partkey"))
      .agg(sum(round(col("l_extendedprice") * 100).cast("long"))
        .as("value_c"))
    val total = perPart
      .agg(sum(col("value_c")).as("total_c"), count(lit(1)).as("n_parts"))
    perPart.crossJoin(broadcast(total))
      .filter(col("value_c") * 2 * col("n_parts") > col("total_c") * 3)
      .select(col("l_partkey"),
        (col("value_c").cast("double") / 100.0).as("part_value"))
      .orderBy(col("part_value").desc, col("l_partkey").asc)
      .limit(100)
  }

  private val q140Sql =
    """WITH per AS (
      |  SELECT l_partkey,
      |    CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
      |      AS value_c
      |  FROM lineitem GROUP BY 1),
      |tot AS (
      |  SELECT CAST(sum(value_c) AS BIGINT) AS total_c,
      |    count(*) AS n_parts
      |  FROM per)
      |SELECT l_partkey, CAST(value_c AS DOUBLE) / 100.0 AS part_value
      |FROM per, tot
      |WHERE value_c * 2 * n_parts > total_c * 3
      |ORDER BY part_value DESC, l_partkey
      |LIMIT 100""".stripMargin

  /** q141: top-N-plus-OTHER rollup — the reporting classic: revenue per
    * customer nation, the top 5 nations kept by name and everything
    * else collapsed into one 'OTHER' row, with exact shares. The
    * regroup happens ON THE AGGREGATE (25 nation rows), so the fact
    * table is scanned and reduced exactly once; the top-5 pick is
    * TakeOrderedAndProject (each executor keeps a local top-5 — never
    * a single-partition window sort), membership comes back as a
    * broadcast flag join, and the grand total rides the 1-row
    * broadcast scalar (the q13 pattern). Ranking is a deterministic
    * (revenue, name) order over integer cents. */
  private def q141(s: SparkSession, d: String): DataFrame = {
    val perNation = Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(s, d)
        .select(col("c_custkey"), col("c_nationkey"))),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, d)),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(sum(round(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
        * 10000).cast("long")).as("rev_u"))
    val top5 = perNation
      .orderBy(col("rev_u").desc, col("n_name").asc).limit(5)
      .select(col("n_name").as("top_name"))
    val total = perNation.agg(sum(col("rev_u")).as("total_u"))
    perNation
      .join(broadcast(top5), col("n_name") === col("top_name"), "left")
      .withColumn("bucket",
        when(col("top_name").isNotNull, col("n_name")).otherwise(lit("OTHER")))
      .groupBy(col("bucket"))
      .agg(sum(col("rev_u")).as("rev_u"), count(lit(1)).as("n_nations"))
      .crossJoin(broadcast(total))
      .select(col("bucket"), col("n_nations"),
        (col("rev_u").cast("double") / 10000.0).as("revenue"),
        round(col("rev_u").cast("double") / col("total_u").cast("double"), 6)
          .as("share"))
  }

  private val q141Sql =
    """WITH per AS (
      |  SELECT n_name,
      |    CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 10000.0)
      |      AS BIGINT)) AS BIGINT) AS rev_u
      |  FROM lineitem
      |  JOIN orders ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey
      |  GROUP BY 1),
      |top5 AS (
      |  SELECT n_name FROM per ORDER BY rev_u DESC, n_name LIMIT 5),
      |buckets AS (
      |  SELECT CASE WHEN t.n_name IS NOT NULL THEN per.n_name
      |    ELSE 'OTHER' END AS bucket,
      |    CAST(sum(rev_u) AS BIGINT) AS rev_u, count(*) AS n_nations
      |  FROM per LEFT JOIN top5 t ON per.n_name = t.n_name
      |  GROUP BY 1)
      |SELECT bucket, n_nations,
      |  CAST(rev_u AS DOUBLE) / 10000.0 AS revenue,
      |  round(CAST(rev_u AS DOUBLE)
      |    / CAST((SELECT sum(rev_u) FROM per) AS DOUBLE), 6) AS share
      |FROM buckets""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q141_topn_plus_other", q141, Some(q141Sql)),
    QueryDef("q140_significant_parts", q140, Some(q140Sql)),
    QueryDef("q118_product_profit", q118, Some(q118Sql)),
    QueryDef("q119_best_supplier_per_part", q119, Some(q119Sql)),
    QueryDef("q120_top_supplier", q120, Some(q120Sql)),
    QueryDef("q121_supplier_profile_counts", q121, Some(q121Sql)),
    QueryDef("q122_disjunctive_revenue", q122, Some(q122Sql)),
    QueryDef("q123_dominant_suppliers", q123, Some(q123Sql)),
    QueryDef("q105_small_qty_revenue", q105, Some(q105Sql)),
    QueryDef("q106_large_volume_orders", q106, Some(q106Sql)),
    QueryDef("q107_waiting_suppliers", q107, Some(q107Sql)),
    QueryDef("q108_dormant_customers", q108, Some(q108Sql)),
    QueryDef("q98_market_share", q98, Some(q98Sql)),
    QueryDef("q96_late_orders", q96, Some(q96Sql)),
    QueryDef("q92_custdist", q92, Some(q92Sql)),
    QueryDef("q90_returned_items", q90, Some(q90Sql)),
    QueryDef("q91_volume_shipping", q91, Some(q91Sql)),
    QueryDef("q68_selective_filter_agg", q68, Some(q68Sql)),
    QueryDef("q69_conditional_counts", q69, Some(q69Sql)),
    QueryDef("q70_promo_share", q70, Some(q70Sql)),
    QueryDef("q48_salted_agg", q48, Some(q48Sql)),
    QueryDef("q01_pricing_summary", q01, Some(q01Sql)),
    QueryDef("q02_top_orders", q02, Some(q02Sql)),
    QueryDef("q03_region_revenue", q03, Some(q03Sql)),
    QueryDef("q04_rollup_events", q04, Some(q04Sql)),
    QueryDef("q05_cube_lineitem", q05, Some(q05Sql)),
    QueryDef("q06_set_ops", q06, Some(q06Sql)),
    QueryDef("q07_distinct_counts", q07, Some(q07Sql)),
    QueryDef("q08_topk_users", q08, Some(q08Sql)),
    QueryDef("q09_percentiles", q09, Some(q09Sql)),
    QueryDef("q10_request_result_join", q10, Some(q10Sql)))
}
