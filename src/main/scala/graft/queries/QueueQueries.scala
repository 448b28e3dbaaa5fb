package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.CoreFunctions._

/** Priority-queue semantics re-expressed relationally (SURVEY.md §2.1 S7,
  * §2.7 B1-B6, §2.10 X3/X4, §2.2 K3): the reference's 4-level Redis
  * Streams queue becomes a priority column + deterministic ordering;
  * retry/demotion/DLQ become pure column math over the job table.
  *
  * The event stream stands in for the job stream: `priorityOf(event_type)`
  * is the priority class, `ts` the enqueue time.
  */
object QueueQueries {

  private val gapCase =
    "CASE priority WHEN 3 THEN 300000 WHEN 2 THEN 1000000 " +
      "WHEN 1 THEN 2000000 ELSE 5000000 END"

  /** q11: strict priority dequeue order with EDF tiebreak — the batch
    * analog of `redis_queue.py:157-224` (scan priorities 3→0) + B2
    * earliest-deadline-first. Deterministic: (priority desc, deadline
    * asc, event_id) is a total order.
    *
    * Scale: the top-100 comes from orderBy().limit() —
    * TakeOrderedAndProject keeps a 100-row heap PER PARTITION and
    * merges on the driver (no global sort); the rank window then runs
    * over only the 100 survivors. A row_number() over a global window
    * here would single-partition-sort the whole table. */
  private def q11(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val jobs = Tables.events(s, d)
      .withColumn("priority", priorityOf(col("event_type")))
      .withColumn("enq_us", Q.us)
      .withColumn("deadline_us", col("enq_us") + expr(gapCase))
    val w = Window.orderBy(col("priority").desc, col("deadline_us").asc,
      col("event_id").asc)
    jobs.select(col("event_id"), col("priority"), col("deadline_us"))
      .orderBy(col("priority").desc, col("deadline_us").asc,
        col("event_id").asc)
      .limit(100)
      .withColumn("dequeue_rank", row_number().over(w))
  }

  private val q11Sql =
    s"""SELECT event_id, priority, deadline_us,
       |  row_number() OVER (ORDER BY priority DESC, deadline_us, event_id) AS dequeue_rank
       |FROM (SELECT event_id, priority, ${Q.usSql} + ($gapCase) AS deadline_us
       |      FROM (SELECT event_id, ts, $priorityOfSql AS priority FROM events))
       |QUALIFY dequeue_rank <= 100""".stripMargin

  /** q12: retry with priority demotion, exponential backoff, and DLQ
    * routing — reference X3 (`redis_queue.py:278-303`) + X4/K3
    * (`redis_consumer.go:257-298`). Pure per-row column math. */
  private def q12(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .withColumn("priority", priorityOf(col("event_type")))
      .withColumn("retry_count", (col("event_id") % 5).cast("int"))
      .select(
        col("event_id"), col("priority"), col("retry_count"),
        demote(col("priority")).as("demoted_priority"),
        backoffSeconds(col("retry_count")).cast("long").as("backoff_s"),
        (col("retry_count") >= 3).cast("int").as("to_dlq"))

  private val q12Sql =
    s"""SELECT event_id, $priorityOfSql AS priority,
       |  CAST(event_id % 5 AS INT) AS retry_count,
       |  greatest(0, $priorityOfSql - 1) AS demoted_priority,
       |  CAST((event_id % 5) * (event_id % 5) AS BIGINT) AS backoff_s,
       |  CAST(event_id % 5 >= 3 AS INT) AS to_dlq
       |FROM events""".stripMargin

  /** q13: queue-depth rollup per priority + share of total — reference A5
    * (`redis_queue.py:346-362`, Σ XLEN across the 4 streams). The total
    * is a broadcast scalar join, not a global window: an unpartitioned
    * window would funnel every row through one task, while the
    * broadcast keeps the share computation fully parallel at any
    * scale. */
  private def q13(s: SparkSession, d: String): DataFrame = {
    val depths = Tables.events(s, d)
      .withColumn("priority", priorityOf(col("event_type")))
      .groupBy(col("priority")).agg(count(lit(1)).as("depth"))
    val total = depths.agg(sum(col("depth")).as("total"))
    depths.crossJoin(broadcast(total))
      .withColumn("share_bp", expr("(10000L * depth) div total"))
      .drop("total")
  }

  private val q13Sql =
    s"""SELECT priority, depth,
       |  CAST((10000 * depth) // sum(depth) OVER () AS BIGINT) AS share_bp
       |FROM (SELECT $priorityOfSql AS priority, count(*) AS depth
       |      FROM events GROUP BY 1)""".stripMargin

  /** q22: dynamic batch assembly — size-bucketing (B3/B4) + EDF order
    * (B2) + max-batch-size 16 (B1, `src/config.py:109`): batch id =
    * position within (priority, bucket) in deadline order, div 16. */
  private def q22(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val jobs = Tables.events(s, d)
      .withColumn("priority", priorityOf(col("event_type")))
      .withColumn("bucket",
        lengthBucket(col("value"), Seq(50L, 100L, 200L, 400L)))
      .withColumn("enq_us", Q.us)
      .withColumn("deadline_us", col("enq_us") + expr(gapCase))
    val w = Window.partitionBy(col("priority"), col("bucket"))
      .orderBy(col("deadline_us").asc, col("event_id").asc)
    // floor() before the cast: Spark's double→long cast truncates but
    // DuckDB's rounds, so both sides floor explicitly.
    jobs.withColumn("pos", row_number().over(w) - 1)
      .withColumn("batch_id", floor(col("pos") / 16.0).cast("long"))
      .groupBy(col("priority"), col("bucket"), col("batch_id"))
      .agg(count(lit(1)).as("batch_n"),
        min(col("deadline_us")).as("min_deadline_us"),
        max(col("deadline_us")).as("max_deadline_us"))
  }

  private val q22Sql =
    s"""SELECT priority, bucket, batch_id, count(*) AS batch_n,
       |  min(deadline_us) AS min_deadline_us,
       |  max(deadline_us) AS max_deadline_us
       |FROM (
       |  SELECT priority, bucket,
       |    CAST(floor((row_number() OVER (PARTITION BY priority, bucket
       |          ORDER BY deadline_us, event_id) - 1) / 16.0) AS BIGINT) AS batch_id,
       |    deadline_us, event_id
       |  FROM (SELECT event_id, priority,
       |          ${lengthBucketSql("value", Seq(50L, 100L, 200L, 400L))} AS bucket,
       |          ${Q.usSql} + ($gapCase) AS deadline_us
       |        FROM (SELECT event_id, value, ts,
       |                $priorityOfSql AS priority FROM events)))
       |GROUP BY priority, bucket, batch_id""".stripMargin

  /** q50: consumer-lag rollup — reference A6 (XPENDING per priority
    * stream, `redis_queue.py:364-380`): count and oldest age of
    * un-acked deliveries (ack simulated by a deterministic id rule).
    * The stream-max timestamp is a broadcast scalar join (q13 pattern),
    * not a driver-side `.head()` — one job instead of two, and no
    * collect-then-re-embed round trip. */
  private def q50(s: SparkSession, d: String): DataFrame = {
    val jobs = Tables.events(s, d)
      .withColumn("priority", priorityOf(col("event_type")))
      .withColumn("t_us", Q.us)
      .withColumn("acked", col("event_id") % 7 =!= 0)
    val maxTs = jobs.agg(max(col("t_us")).as("max_t_us"))
    jobs.filter(!col("acked"))
      .groupBy(col("priority"))
      .agg(count(lit(1)).as("pending"),
        min(col("t_us")).as("min_pending_us"))
      .crossJoin(broadcast(maxTs))
      .select(col("priority"), col("pending"),
        (col("max_t_us") - col("min_pending_us"))
          .as("oldest_pending_age_us"))
  }

  private val q50Sql =
    s"""SELECT priority, count(*) AS pending,
       |  (SELECT max(${Q.usSql}) FROM events) - min(t_us) AS oldest_pending_age_us
       |FROM (SELECT $priorityOfSql AS priority, ${Q.usSql} AS t_us, event_id
       |      FROM events)
       |WHERE event_id % 7 = 0
       |GROUP BY priority""".stripMargin

  /** q51: benchmark statistics rollup — reference A14 RPS/error-rate
    * (`run_benchmarks.py:582-611`): per day, requests/sec over the
    * observed span and the error share. */
  private def q51(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(expr("ts div 86400000000000").as("day"), col("event_type"),
        Q.us.as("t_us"))
      .groupBy(col("day"))
      .agg(count(lit(1)).as("n"),
        sum((col("event_type") === "error").cast("long")).as("n_errors"),
        (max(col("t_us")) - min(col("t_us"))).as("span_us"))
      .filter(col("span_us") > 0)
      .select(col("day"), col("n"), col("n_errors"),
        expr("(1000000000L * n) div span_us").as("rps_x1000"),
        expr("(10000L * n_errors) div n").as("error_bp"))

  private val q51Sql =
    s"""SELECT day, n, n_errors,
       |  (1000000000 * n) // span_us AS rps_x1000,
       |  (10000 * n_errors) // n AS error_bp
       |FROM (
       |  SELECT epoch_ns(ts) // 86400000000000 AS day, count(*) AS n,
       |    CAST(sum(CAST(event_type = 'error' AS BIGINT)) AS BIGINT) AS n_errors,
       |    max(${Q.usSql}) - min(${Q.usSql}) AS span_us
       |  FROM events GROUP BY 1)
       |WHERE span_us > 0""".stripMargin

  /** q52: sliding windows with overlap — the batch analog of the
    * reference's 320 ms / 170 ms advance overlap retention (W4,
    * `stt_worker.py:481-504`), scaled to 320 s windows sliding 170 s.
    * Uses Spark's native window(); the oracle enumerates the ≤2
    * epoch-aligned candidate windows per event. */
  private def q52(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(col("event_type"), timestamp_micros(Q.us).as("event_time"))
      .groupBy(window(col("event_time"), "320 seconds", "170 seconds"),
        col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("event_type"),
        unix_micros(col("window.start")).as("win_start_us"), col("n"))

  private val q52Sql =
    s"""SELECT event_type, win_start_us, count(*) AS n
       |FROM (
       |  SELECT event_type, t_us,
       |    unnest([((t_us // 170000000) - k) * 170000000
       |            for k in [0, 1]]) AS win_start_us
       |  FROM (SELECT event_type, ${Q.usSql} AS t_us FROM events))
       |WHERE win_start_us >= 0 AND t_us >= win_start_us
       |  AND t_us < win_start_us + 320000000
       |GROUP BY event_type, win_start_us""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q11_priority_dequeue", q11, Some(q11Sql)),
    QueryDef("q12_retry_demote_dlq", q12, Some(q12Sql)),
    QueryDef("q13_queue_depth", q13, Some(q13Sql)),
    QueryDef("q22_edf_batches", q22, Some(q22Sql)),
    QueryDef("q50_consumer_lag", q50, Some(q50Sql)),
    QueryDef("q51_bench_stats", q51, Some(q51Sql)),
    QueryDef("q52_sliding_windows", q52, Some(q52Sql)))
}
