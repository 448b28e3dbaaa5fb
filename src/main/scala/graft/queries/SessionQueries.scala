package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.CoreFunctions._

/** Session windows, ordered assembly, and the autoscaler's analytics —
  * batch (gaps-and-islands) forms of SURVEY.md §2.6 W1-W9 and §2.5
  * A1/A7-A13, declared over the event stream. The streaming forms live in
  * `graft.streaming` (flatMapGroupsWithState) and are verified in
  * ScalaTest; these batch forms are the DuckDB-oracle surface with the
  * same semantics.
  *
  * Scale: everything here is a single shuffle on the session/group key
  * followed by window functions inside the partition — the pattern that
  * survives 1000 executors (no driver-side loops, no collect).
  */
object SessionQueries {

  private val gapUs = 1800000000L // 30-minute session gap

  /** Shared sessionization: user-keyed gaps-and-islands over event time
    * (reference W3 VAD-gap endpointing + W5 idle timeout, batch analog).
    * One window pass: session breaks where the gap exceeds `gapUs`. */
  private def sessionized(s: SparkSession, d: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("t_us").asc, col("event_id").asc)
    Tables.events(s, d)
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"), Q.us.as("t_us"))
      .withColumn("prev_us", lag(col("t_us"), 1).over(byUser))
      .withColumn("is_new",
        (col("prev_us").isNull ||
          (col("t_us") - col("prev_us")) > gapUs).cast("long"))
      .withColumn("session_seq",
        sum(col("is_new")).over(byUser
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  private val sessionizedSql =
    s"""SELECT event_id, user_id, event_type, value, t_us,
       |  CAST(sum(is_new) OVER (PARTITION BY user_id
       |    ORDER BY t_us, event_id
       |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
       |FROM (
       |  SELECT *, CAST(prev_us IS NULL OR t_us - prev_us > $gapUs AS BIGINT) AS is_new
       |  FROM (
       |    SELECT event_id, user_id, event_type, value, ${Q.usSql} AS t_us,
       |      lag(${Q.usSql}) OVER (PARTITION BY user_id
       |        ORDER BY ${Q.usSql}, event_id) AS prev_us
       |    FROM events))""".stripMargin

  /** q14: session summaries — count/start/end/duration per (user,
    * session) (reference A4 end-of-stream stats,
    * `src/stt/service.py:239-255`). */
  private def q14(s: SparkSession, d: String): DataFrame =
    sessionized(s, d)
      .groupBy(col("user_id"), col("session_seq"))
      .agg(count(lit(1)).as("n_events"),
        min(col("t_us")).as("start_us"),
        max(col("t_us")).as("end_us"),
        (max(col("t_us")) - min(col("t_us"))).as("duration_us"))

  private val q14Sql =
    s"""SELECT user_id, session_seq, count(*) AS n_events,
       |  min(t_us) AS start_us, max(t_us) AS end_us,
       |  max(t_us) - min(t_us) AS duration_us
       |FROM ($sessionizedSql)
       |GROUP BY user_id, session_seq""".stripMargin

  /** q15: ordered transcript assembly + confidence — reference A1
    * (`src/stt/service.py:133-160`): concatenate per-session texts in
    * event-time order, average the clamped confidence. The event type
    * stands in for the segment text; value/600 clamped to [0,1] for the
    * logprob-confidence analog (F27). Uses Spark 4's native ordered
    * `listagg ... WITHIN GROUP` rather than
    * collect_list+array_sort+transform — one declarative agg, no
    * intermediate struct arrays (measured ~1.5× faster steady-state on
    * the flagship path). Order keys (t_us, event_id) are unique per
    * group, so the result is deterministic. */
  private def q15(s: SparkSession, d: String): DataFrame =
    sessionized(s, d)
      .groupBy(col("user_id"), col("session_seq"))
      .agg(
        expr("listagg(event_type, ' ') WITHIN GROUP (ORDER BY t_us, event_id)")
          .as("transcript"),
        round(avg(clamp(col("value") / 600.0, lit(0.0), lit(1.0))), 6)
          .as("avg_confidence"),
        count(lit(1)).as("n_segments"))

  private val q15Sql =
    s"""SELECT user_id, session_seq,
       |  string_agg(event_type, ' ' ORDER BY t_us, event_id) AS transcript,
       |  round(avg(least(greatest(value / 600.0, 0.0), 1.0)), 6) AS avg_confidence,
       |  count(*) AS n_segments
       |FROM ($sessionizedSql)
       |GROUP BY user_id, session_seq""".stripMargin

  /** q16: silence-island detection — reference P9/W9
    * (`audio_processor.py:280-337`): low-energy runs of length ≥ 3 as
    * gaps-and-islands over the ordered stream (value < 20 ≈ RMS below
    * threshold). */
  private def q16(s: SparkSession, d: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("t_us").asc, col("event_id").asc)
    Tables.events(s, d)
      .select(col("event_id"), col("user_id"), col("value"), Q.us.as("t_us"))
      .withColumn("silent", col("value") < 20.0)
      .withColumn("started",
        (col("silent") && !coalesce(lag(col("silent"), 1).over(byUser),
          lit(false))).cast("long"))
      .withColumn("island",
        sum(col("started")).over(byUser
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .filter(col("silent"))
      .groupBy(col("user_id"), col("island"))
      .agg(count(lit(1)).as("n_silent"),
        min(col("t_us")).as("start_us"),
        max(col("t_us")).as("end_us"))
      .filter(col("n_silent") >= 3)
  }

  private val q16Sql =
    s"""SELECT user_id, island, count(*) AS n_silent,
       |  min(t_us) AS start_us, max(t_us) AS end_us
       |FROM (
       |  SELECT user_id, t_us, silent,
       |    CAST(sum(started) OVER (PARTITION BY user_id ORDER BY t_us, event_id
       |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS island
       |  FROM (
       |    SELECT *, CAST(silent AND NOT coalesce(
       |        lag(silent) OVER (PARTITION BY user_id ORDER BY t_us, event_id),
       |        false) AS BIGINT) AS started
       |    FROM (SELECT event_id, user_id, value < 20.0 AS silent,
       |            ${Q.usSql} AS t_us FROM events)))
       |WHERE silent
       |GROUP BY user_id, island
       |HAVING count(*) >= 3""".stripMargin

  /** q17: arrival-rate estimation from consecutive samples — reference A7
    * (`controller.py:411-428`): Δvalue/Δt via lag(). */
  private def q17(s: SparkSession, d: String): DataFrame = {
    val byType = Window.partitionBy(col("event_type"))
      .orderBy(col("t_us").asc, col("event_id").asc)
    Tables.events(s, d)
      .select(col("event_id"), col("event_type"), col("value"),
        Q.us.as("t_us"))
      .withColumn("dv", col("value") - lag(col("value"), 1).over(byType))
      .withColumn("dt_us", col("t_us") - lag(col("t_us"), 1).over(byType))
      .filter(col("dt_us") > 0)
      .select(col("event_id"), col("event_type"),
        round(col("dv") / (col("dt_us").cast("double") / 1000000.0), 6)
          .as("rate_per_s"))
  }

  private val q17Sql =
    s"""SELECT event_id, event_type,
       |  round(dv / (CAST(dt_us AS DOUBLE) / 1000000.0), 6) AS rate_per_s
       |FROM (
       |  SELECT event_id, event_type,
       |    value - lag(value) OVER w AS dv,
       |    t_us - lag(t_us) OVER w AS dt_us
       |  FROM (SELECT event_id, event_type, value, ${Q.usSql} AS t_us FROM events)
       |  WINDOW w AS (PARTITION BY event_type ORDER BY t_us, event_id))
       |WHERE dt_us > 0""".stripMargin

  /** q18: linear-regression trend — reference A8 (`controller.py:346-380`
    * OLS slope of rate vs time). Computed as the closed-form OLS slope
    * from EXACT integer/decimal sums (day index is integral, value is
    * 2 dp), so both engines produce bit-identical doubles — no reliance
    * on regr_slope's summation order. */
  private def q18(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(col("event_type"), expr("ts div 86400000000000").as("day"),
        col("value"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("day")).as("sx"),
        sum(col("value").cast("decimal(18,2)")).as("sy"),
        sum(col("day") * col("day")).as("sxx"),
        sum((col("day").cast("decimal(18,0)") *
          col("value").cast("decimal(18,2)")).cast("decimal(28,2)"))
          .as("sxy"))
      .select(col("event_type"), col("n"),
        round(
          (col("n") * col("sxy").cast("double") -
            col("sx").cast("double") * col("sy").cast("double")) /
            (col("n") * col("sxx").cast("double") -
              col("sx").cast("double") * col("sx").cast("double")),
          10).as("slope_per_day"))

  private val q18Sql =
    """SELECT event_type, n,
      |  round((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
      |    / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)),
      |    10) AS slope_per_day
      |FROM (
      |  SELECT event_type, count(*) AS n, sum(day) AS sx,
      |    sum(CAST(value AS DECIMAL(18,2))) AS sy,
      |    sum(day * day) AS sxx,
      |    sum(CAST(CAST(day AS DECIMAL(18,0)) * CAST(value AS DECIMAL(18,2)) AS DECIMAL(28,2))) AS sxy
      |  FROM (SELECT event_type, epoch_ns(ts) // 86400000000000 AS day, value
      |        FROM events)
      |  GROUP BY event_type)""".stripMargin

  /** q19: PID controller over the daily error series — reference A9
    * (`controller.py:67-109`): e = setpoint − daily mean; I = Σe·dt
    * (dt = 1 day, cumulative window sum); D = Δe/dt; out = 2.0·e +
    * 0.1·I + 0.05·D. Daily means come from exact decimal sums, so the
    * cumulative double sums are identical on both engines. */
  private def q19(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.events(s, d)
      .select(col("event_type"), expr("ts div 86400000000000").as("day"),
        col("value"))
      .groupBy(col("event_type"), col("day"))
      .agg(Q.davg(col("value")).as("daily_mean"))
    val byDay = Window.partitionBy(col("event_type")).orderBy(col("day").asc)
    daily
      .withColumn("e", lit(50.0) - col("daily_mean"))
      .withColumn("integral",
        sum(col("e")).over(byDay
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("derivative",
        coalesce(col("e") - lag(col("e"), 1).over(byDay), lit(0.0)))
      .select(col("event_type"), col("day"),
        round(col("e"), 6).as("error"),
        round(lit(2.0) * col("e") + lit(0.1) * col("integral") +
          lit(0.05) * col("derivative"), 6).as("pid_out"))
  }

  private val q19Sql =
    s"""SELECT event_type, day, round(e, 6) AS error,
       |  round(2.0 * e + 0.1 * integral + 0.05 * derivative, 6) AS pid_out
       |FROM (
       |  SELECT event_type, day, e,
       |    sum(e) OVER (PARTITION BY event_type ORDER BY day
       |      ROWS UNBOUNDED PRECEDING) AS integral,
       |    coalesce(e - lag(e) OVER (PARTITION BY event_type ORDER BY day), 0.0) AS derivative
       |  FROM (
       |    SELECT event_type, day, 50.0 - daily_mean AS e
       |    FROM (SELECT event_type, epoch_ns(ts) // 86400000000000 AS day,
       |            ${Q.davgSql("value")} AS daily_mean
       |          FROM events GROUP BY 1, 2)))""".stripMargin

  /** q20: full autoscale decision — capacity model (A10), predictive
    * next-count extrapolation (A8 applied), weighted blend with the
    * reference's int() truncation + clamp to [1,10] (A11), and the
    * multiplicative decision confidence (A12). Service rate 2 jobs/s,
    * target utilization 0.7 (`controller.py:131-135,179`). */
  private def q20(s: SparkSession, d: String): DataFrame = {
    val byDay = Window.partitionBy(col("event_type")).orderBy(col("day").asc)
    val daily = Tables.events(s, d)
      .select(col("event_type"), expr("ts div 86400000000000").as("day"))
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("n"))
    daily
      .withColumn("rate", col("n").cast("double") / 86400.0)
      .withColumn("cap_target",
        capacityTarget(col("rate"), 0.7, 2.0).cast("double"))
      .withColumn("pid_target", col("cap_target"))
      .withColumn("n_next",
        greatest(lit(0L), col("n") * 2 - coalesce(lag(col("n"), 1)
          .over(byDay), col("n"))))
      .withColumn("pred_target",
        ceil(col("n_next").cast("double") / 86400.0 / 0.7 / 2.0)
          .cast("double"))
      .withColumn("target",
        blendTarget(col("cap_target"), col("pid_target"),
          col("pred_target"), 1, 10).cast("long"))
      .withColumn("confidence", round(
        lit(1.0) *
          when(col("n") === 0, 0.5).otherwise(1.0) *
          when(abs(col("pred_target") - col("cap_target")) <= 1.0, 1.0)
            .otherwise(0.8), 6))
      .select(col("event_type"), col("day"), col("n"), col("target"),
        col("confidence"))
  }

  private val q20Sql =
    """SELECT event_type, day, n,
      |  CAST(least(greatest(floor(
      |    0.4 * cap_target + 0.3 * cap_target + 0.3 * pred_target),
      |    1.0), 10.0) AS BIGINT) AS target,
      |  CAST(round(1.0 * (CASE WHEN n = 0 THEN 0.5 ELSE 1.0 END)
      |    * (CASE WHEN abs(pred_target - cap_target) <= 1.0 THEN 1.0 ELSE 0.8 END),
      |    6) AS DOUBLE) AS confidence
      |FROM (
      |  SELECT event_type, day, n,
      |    ceil(CAST(n AS DOUBLE) / 86400.0 / 0.7 / 2.0) AS cap_target,
      |    ceil(CAST(greatest(0, n * 2 - coalesce(
      |      lag(n) OVER (PARTITION BY event_type ORDER BY day), n)) AS DOUBLE)
      |      / 86400.0 / 0.7 / 2.0) AS pred_target
      |  FROM (SELECT event_type, epoch_ns(ts) // 86400000000000 AS day,
      |          count(*) AS n
      |        FROM events GROUP BY 1, 2))""".stripMargin

  /** q21: staged degradation levels from utilization — reference X2
    * (`backpressure.py:171-247`): hourly utilization vs the type's peak,
    * mapped to level 0-3. */
  private def q21(s: SparkSession, d: String): DataFrame = {
    val byType = Window.partitionBy(col("event_type"))
    Tables.events(s, d)
      .select(col("event_type"), expr("ts div 3600000000000").as("hour"))
      .groupBy(col("event_type"), col("hour"))
      .agg(count(lit(1)).as("n"))
      .withColumn("util",
        col("n").cast("double") / max(col("n")).over(byType))
      .select(col("event_type"), col("hour"), col("n"),
        round(col("util"), 6).as("util"),
        degradationLevel(col("util")).as("level"))
  }

  private val q21Sql =
    """SELECT event_type, hour, n, round(util, 6) AS util,
      |  CASE WHEN util < 0.7 THEN 0 WHEN util < 0.8 THEN 1
      |       WHEN util < 0.9 THEN 2 ELSE 3 END AS level
      |FROM (
      |  SELECT event_type, hour, n,
      |    CAST(n AS DOUBLE) / max(n) OVER (PARTITION BY event_type) AS util
      |  FROM (SELECT event_type, epoch_ns(ts) // 3600000000000 AS hour,
      |          count(*) AS n
      |        FROM events GROUP BY 1, 2))""".stripMargin

  /** q49: the same session semantics via Spark's BUILT-IN
    * `session_window` (dynamic-gap session windows merge exactly like
    * the gaps-and-islands rule) — declared alongside the manual q14 to
    * show the operator both ways; the oracle derives end = max + gap
    * from the islands. In streaming this operator works unchanged with
    * a watermark. */
  private def q49(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(col("user_id"), col("event_id"),
        timestamp_micros(Q.us).as("event_time"))
      .groupBy(session_window(col("event_time"), "30 minutes"),
        col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        unix_micros(col("session_window.start")).as("start_us"),
        unix_micros(col("session_window.end")).as("end_us"),
        col("n_events"))

  /** q49 oracle boundary: Spark's session_window merges INCLUSIVELY —
    * an event at exactly prev + gap still extends the session (each
    * event's window is [t, t+gap] and touching windows merge), which is
    * precisely the manual islands rule `t - prev > gap` keeps-together
    * convention. Verified by SessionBoundarySpec (an exact-gap pair
    * yields ONE session under both forms), so the oracle derives from
    * the same sessionized islands as q14/q15. */
  private val q49Sql =
    s"""SELECT user_id, min(t_us) AS start_us,
       |  max(t_us) + $gapUs AS end_us, count(*) AS n_events
       |FROM ($sessionizedSql)
       |GROUP BY user_id, session_seq""".stripMargin

  /** q93: sessionized conversion funnel — click → signup-after-click →
    * purchase-after-signup within one session, with strict event-time
    * ordering between stages (min qualifying time per stage, each stage
    * anchored on the previous stage's time). The cascade is three
    * STACKED window minimums over the same (user, session) partitioning
    * — each stage's anchor is the previous window's output, so the
    * whole funnel is ONE shuffle (the earlier join-per-stage form
    * shuffled the event table three times and re-joined it twice; this
    * plan is Exchange → Window×3 → partial agg, and survives any
    * session-count scale because no stage ever re-reads the events). */
  private def q93(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"), col("session_seq"))
    val staged = sessionized(s, d)
      .select(col("user_id"), col("session_seq"), col("event_type"),
        col("t_us"))
      .withColumn("tc",
        min(when(col("event_type") === "click", col("t_us"))).over(w))
      .withColumn("ts",
        min(when(col("event_type") === "signup" &&
          col("t_us") > col("tc"), col("t_us"))).over(w))
      .withColumn("tp",
        min(when(col("event_type") === "purchase" &&
          col("t_us") > col("ts"), col("t_us"))).over(w))
    staged
      .groupBy(col("user_id"), col("session_seq"))
      .agg(max(col("tc")).as("tc"), max(col("ts")).as("ts"),
        max(col("tp")).as("tp"))
      .agg(count(lit(1)).as("n_sessions"),
        count(col("tc")).as("n_click"),
        count(col("ts")).as("n_signup_after"),
        count(col("tp")).as("n_purchase_funnel"))
  }

  private val q93Sql =
    s"""WITH s0 AS ($sessionizedSql),
       |base AS (
       |  SELECT user_id, session_seq,
       |    min(CASE WHEN event_type = 'click' THEN t_us END) AS tc
       |  FROM s0 GROUP BY 1, 2),
       |j1 AS (
       |  SELECT user_id, session_seq, tc,
       |    min(CASE WHEN event_type = 'signup' AND t_us > tc
       |        THEN t_us END) AS ts
       |  FROM s0 JOIN base USING (user_id, session_seq)
       |  GROUP BY 1, 2, 3),
       |j2 AS (
       |  SELECT user_id, session_seq, tc, ts,
       |    min(CASE WHEN event_type = 'purchase' AND t_us > ts
       |        THEN t_us END) AS tp
       |  FROM s0 JOIN j1 USING (user_id, session_seq)
       |  GROUP BY 1, 2, 3, 4)
       |SELECT count(*) AS n_sessions, count(tc) AS n_click,
       |  count(ts) AS n_signup_after, count(tp) AS n_purchase_funnel
       |FROM j2""".stripMargin

  /** q97: time-RANGE window frame — rolling 1-hour sum per event type
    * (the moving-window monitor every rate/limit pipeline runs; A13
    * metrics-history analog with a value sum). RANGE frames include
    * ALL timestamp peers, so the frame contents are deterministic under
    * ties; summing integer cents keeps the arithmetic exact and
    * order-free. */
  private def q97(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("event_type")).orderBy(col("t_us"))
      .rangeBetween(-3600000000L, 0)
    Tables.events(s, d)
      .select(col("event_id"), col("event_type"), col("value"),
        Q.us.as("t_us"))
      .withColumn("cents", round(col("value") * 100).cast("long"))
      .withColumn("rolling_1h_cents", sum(col("cents")).over(w))
      .select(col("event_id"), col("event_type"), col("rolling_1h_cents"))
  }

  private val q97Sql =
    s"""SELECT event_id, event_type,
       |  CAST(sum(cents) OVER (PARTITION BY event_type ORDER BY t_us
       |    RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
       |    AS BIGINT) AS rolling_1h_cents
       |FROM (SELECT event_id, event_type, ${Q.usSql} AS t_us,
       |        CAST(round(value * 100) AS BIGINT) AS cents
       |      FROM events)""".stripMargin

  /** q111: SCD2 validity intervals — each user's event-type runs become
    * slowly-changing-dimension rows [valid_from, valid_to) with the
    * current interval open (NULL valid_to): the change-data-capture
    * derivation every warehouse runs over a mutation stream. Value-
    * change islands (is_new fires on type CHANGE, not time gap) + one
    * lead() over the interval starts. Two window passes and the final
    * aggregate all share the user-key partitioning — ONE shuffle total,
    * then a tiny lead() pass over the interval rows. */
  private def q111(s: SparkSession, d: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("t_us").asc, col("event_id").asc)
    val runs = Tables.events(s, d)
      .select(col("event_id"), col("user_id"), col("event_type"),
        Q.us.as("t_us"))
      .withColumn("changed",
        (lag(col("event_type"), 1).over(byUser).isNull ||
          lag(col("event_type"), 1).over(byUser) =!= col("event_type"))
          .cast("long"))
      .withColumn("run_seq", sum(col("changed")).over(byUser
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("run_seq"))
      .agg(min(col("event_type")).as("event_type"), // constant within a run
        min(col("t_us")).as("valid_from_us"),
        count(lit(1)).as("n_events"))
    runs.withColumn("valid_to_us",
        lead(col("valid_from_us"), 1).over(Window.partitionBy(col("user_id"))
          .orderBy(col("valid_from_us").asc)))
      .select(col("user_id"), col("run_seq"), col("event_type"),
        col("valid_from_us"), col("valid_to_us"), col("n_events"))
  }

  private val q111Sql =
    s"""SELECT user_id, run_seq, event_type, valid_from_us,
       |  lead(valid_from_us) OVER (PARTITION BY user_id
       |    ORDER BY valid_from_us) AS valid_to_us,
       |  n_events
       |FROM (
       |  SELECT user_id, run_seq,
       |    min(event_type) AS event_type,
       |    min(t_us) AS valid_from_us,
       |    count(*) AS n_events
       |  FROM (
       |    SELECT user_id, event_id, event_type, t_us,
       |      CAST(sum(changed) OVER (PARTITION BY user_id
       |        ORDER BY t_us, event_id
       |        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS run_seq
       |    FROM (
       |      SELECT *, CAST(prev_type IS NULL OR prev_type <> event_type
       |        AS BIGINT) AS changed
       |      FROM (
       |        SELECT user_id, event_id, event_type, ${Q.usSql} AS t_us,
       |          lag(event_type) OVER (PARTITION BY user_id
       |            ORDER BY ${Q.usSql}, event_id) AS prev_type
       |        FROM events)))
       |  GROUP BY 1, 2)""".stripMargin

  /** q112: weekly cohort retention — users grouped by first-seen week,
    * counted in each later week they return: the activation/retention
    * matrix of product analytics. All time math is integer epoch-weeks
    * (`t_us div week`), so there is no timezone/date-function parity
    * trap. One shuffle on user_id derives the cohort (min over the
    * user partition); the distinct (user, week) reduction and the
    * final (cohort, offset) count are hash-keyed aggregates. */
  private def q112(s: SparkSession, d: String): DataFrame = {
    val weekUs = 7L * 86400L * 1000000L
    val byUser = Window.partitionBy(col("user_id"))
    Tables.events(s, d)
      // integral `div` twice: double division would risk one-off week
      // bins at exact boundaries vs the oracle's integer division
      .select(col("user_id"), expr(s"(ts div 1000) div $weekUs").as("week"))
      .withColumn("cohort_week", min(col("week")).over(byUser))
      .select(col("user_id"), col("cohort_week"),
        (col("week") - col("cohort_week")).as("week_offset"))
      .distinct()
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  private val q112Sql = {
    val weekUs = 7L * 86400L * 1000000L
    s"""SELECT cohort_week, week_offset, count(*) AS n_users
       |FROM (
       |  SELECT DISTINCT user_id, cohort_week, week - cohort_week AS week_offset
       |  FROM (
       |    SELECT user_id, week,
       |      min(week) OVER (PARTITION BY user_id) AS cohort_week
       |    FROM (
       |      SELECT user_id, ${Q.usSql} // $weekUs AS week
       |      FROM events)))
       |GROUP BY 1, 2""".stripMargin
  }

  /** q128: hourly gap-fill with forward fill — the time-grid
    * regularization every metrics/feature pipeline runs before joining
    * irregular event streams to fixed-cadence data: each user's span
    * expands to a dense hourly grid (integer epoch-hours — no date-
    * function parity traps) and missing hours carry the last observed
    * value forward. The last-in-hour pick is an arg-max STRUCT
    * aggregate ((t_us, event_id) order — deterministic under
    * duplicates); grid generation is sequence()+explode off the per-user
    * bounds (rows ∝ users × span, never a calendar cross join); the
    * fill is last(ignoreNulls) over the user partition. Everything
    * shares the user-key shuffle. */
  private def q128(s: SparkSession, d: String): DataFrame = {
    val hourUs = 3600L * 1000000L
    val ev = Tables.events(s, d)
      .select(col("event_id"), col("user_id"), col("value"),
        Q.us.as("t_us"), expr(s"(ts div 1000) div $hourUs").as("hr"))
    val hourly = ev.groupBy(col("user_id"), col("hr"))
      .agg(max(struct(col("t_us"), col("event_id"), col("value")))
        .as("last"))
      .select(col("user_id"), col("hr"), col("last.value").as("v"))
    ev.groupBy(col("user_id"))
      .agg(min(col("hr")).as("h0"), max(col("hr")).as("h1"))
      .select(col("user_id"),
        explode(sequence(col("h0"), col("h1"))).as("hr"))
      .join(hourly, Seq("user_id", "hr"), "left")
      .select(col("user_id"), col("hr"),
        last(col("v"), ignoreNulls = true)
          .over(Window.partitionBy(col("user_id")).orderBy(col("hr").asc))
          .as("filled_value"),
        col("v").isNotNull.as("is_observed"))
  }

  private val q128Sql = {
    val hourUs = 3600L * 1000000L
    s"""WITH ev AS (
       |  SELECT event_id, user_id, value, ${Q.usSql} AS t_us,
       |    ${Q.usSql} // $hourUs AS hr
       |  FROM events),
       |hourly AS (
       |  SELECT user_id, hr, value AS v FROM (
       |    SELECT user_id, hr, value,
       |      row_number() OVER (PARTITION BY user_id, hr
       |        ORDER BY t_us DESC, event_id DESC) AS rn
       |    FROM ev) WHERE rn = 1),
       |grid AS (
       |  SELECT user_id, unnest(range(h0, h1 + 1)) AS hr
       |  FROM (SELECT user_id, min(hr) AS h0, max(hr) AS h1
       |        FROM ev GROUP BY 1))
       |SELECT g.user_id, g.hr,
       |  last_value(h.v IGNORE NULLS) OVER (PARTITION BY g.user_id
       |    ORDER BY g.hr ROWS UNBOUNDED PRECEDING) AS filled_value,
       |  h.v IS NOT NULL AS is_observed
       |FROM grid g LEFT JOIN hourly h
       |  ON g.user_id = h.user_id AND g.hr = h.hr""".stripMargin
  }

  /** q129: event-transition matrix — per-user consecutive event-type
    * pairs reduced to global (from, to) counts and row-normalized
    * transition probabilities: the first-order Markov view behind
    * next-event prediction and funnel-anomaly checks. One user-key
    * shuffle for the lead(), one tiny (from, to) aggregate, and the
    * row normalization divides two exact longs per row (engine-
    * identical doubles, rounded at 6). */
  private def q129(s: SparkSession, d: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("t_us").asc, col("event_id").asc)
    Tables.events(s, d)
      .select(col("event_id"), col("user_id"), col("event_type"),
        Q.us.as("t_us"))
      .withColumn("to_type", lead(col("event_type"), 1).over(byUser))
      .filter(col("to_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("p_bp",
        expr("(10000 * n) div sum(n) over (partition by from_type)"))
  }

  private val q129Sql =
    s"""SELECT from_type, to_type, n,
       |  CAST((10000 * n) // sum(n) OVER (PARTITION BY from_type)
       |    AS BIGINT) AS p_bp
       |FROM (
       |  SELECT event_type AS from_type, to_type, count(*) AS n
       |  FROM (
       |    SELECT user_id, event_type,
       |      lead(event_type) OVER (PARTITION BY user_id
       |        ORDER BY ${Q.usSql}, event_id) AS to_type
       |    FROM events)
       |  WHERE to_type IS NOT NULL
       |  GROUP BY 1, 2)""".stripMargin

  /** q131: robust outlier detection via median absolute deviation — the
    * anomaly screen that survives the heavy tails that break z-scores:
    * per event type, median, MAD, and how many events sit beyond the
    * 3×MAD fence. Exact interpolated percentiles on BOTH engines (the
    * q09 `percentile` ↔ `quantile_cont` parity); the deviation and the
    * 3×MAD fence are the same IEEE ops on identical doubles. MAD is
    * inherently two-pass (the second percentile needs the first); each
    * pass is one type-keyed aggregate with the tiny per-type medians
    * broadcast back — events shuffle only on event_type, and at 100 TB
    * each pass is one scan + one 5-row broadcast. */
  private def q131(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).select(col("event_type"), col("value"))
    val med = ev.groupBy(col("event_type"))
      .agg(expr("percentile(value, 0.5)").as("med"))
    val dev = ev.join(broadcast(med), "event_type")
      .withColumn("dev", abs(col("value") - col("med")))
    val stats = dev.groupBy(col("event_type"))
      .agg(min(col("med")).as("median_v"),
        expr("percentile(dev, 0.5)").as("mad"))
    dev.join(broadcast(stats), "event_type")
      .groupBy(col("event_type"))
      .agg(round(min(col("median_v")), 6).as("median_v"),
        round(min(col("mad")), 6).as("mad"),
        count(lit(1)).as("n"),
        sum((col("dev") > lit(3.0) * col("mad")).cast("long"))
          .as("n_outliers"))
  }

  private val q131Sql =
    """WITH med AS (
      |  SELECT event_type, quantile_cont(value, 0.5) AS med
      |  FROM events GROUP BY 1),
      |dev AS (
      |  SELECT e.event_type, m.med, abs(e.value - m.med) AS dev
      |  FROM events e JOIN med m USING (event_type)),
      |stats AS (
      |  SELECT event_type, min(med) AS median_v,
      |    quantile_cont(dev, 0.5) AS mad
      |  FROM dev GROUP BY 1)
      |SELECT d.event_type, round(min(s.median_v), 6) AS median_v,
      |  round(min(s.mad), 6) AS mad, count(*) AS n,
      |  CAST(sum(CAST(d.dev > 3.0 * s.mad AS BIGINT)) AS BIGINT)
      |    AS n_outliers
      |FROM dev d JOIN stats s USING (event_type)
      |GROUP BY 1""".stripMargin

  /** q137: DAU + rolling 7-day WAU — the distinct-users-over-a-sliding-
    * window metric that a RANGE window can't express (COUNT DISTINCT
    * isn't frame-able): the corpus reduces to distinct (user, day)
    * pairs ONCE, each pair then covers the 7 report days it can count
    * toward (a bounded ×7 explode of the already-tiny pair set — never
    * of the events), pairs dedupe, and a day-keyed count finishes. All
    * time math is integer epoch-days; report days are the days that
    * actually have activity (inner join with DAU). */
  private def q137(s: SparkSession, d: String): DataFrame = {
    val dayUs = 86400L * 1000000L
    val ud = Tables.events(s, d)
      .select(col("user_id"), expr(s"(ts div 1000) div $dayUs").as("day"))
      .distinct()
    val dau = ud.groupBy(col("day")).agg(count(lit(1)).as("dau"))
    val wau = ud
      .select(col("user_id"),
        explode(sequence(col("day"), col("day") + 6)).as("rday"))
      .distinct()
      .groupBy(col("rday")).agg(count(lit(1)).as("wau"))
    dau.join(wau, col("day") === col("rday"))
      .select(col("day"), col("dau"), col("wau"))
  }

  private val q137Sql = {
    val dayUs = 86400L * 1000000L
    s"""WITH ud AS (
       |  SELECT DISTINCT user_id, ${Q.usSql} // $dayUs AS day
       |  FROM events),
       |dau AS (SELECT day, count(*) AS dau FROM ud GROUP BY 1),
       |wau AS (
       |  SELECT rday, count(*) AS wau FROM (
       |    SELECT DISTINCT user_id, unnest(range(day, day + 7)) AS rday
       |    FROM ud)
       |  GROUP BY 1)
       |SELECT day, dau, wau
       |FROM dau JOIN wau ON day = rday""".stripMargin
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q137_rolling_wau", q137, Some(q137Sql)),
    QueryDef("q131_mad_outliers", q131, Some(q131Sql)),
    QueryDef("q128_hourly_gap_fill", q128, Some(q128Sql)),
    QueryDef("q129_transition_matrix", q129, Some(q129Sql)),
    QueryDef("q111_scd2_intervals", q111, Some(q111Sql)),
    QueryDef("q112_cohort_retention", q112, Some(q112Sql)),
    QueryDef("q97_range_window", q97, Some(q97Sql)),
    QueryDef("q93_session_funnel", q93, Some(q93Sql)),
    QueryDef("q49_session_window_builtin", q49, Some(q49Sql)),
    QueryDef("q14_sessionize", q14, Some(q14Sql)),
    QueryDef("q15_transcript_assembly", q15, Some(q15Sql)),
    QueryDef("q16_silence_islands", q16, Some(q16Sql)),
    QueryDef("q17_arrival_rate", q17, Some(q17Sql)),
    QueryDef("q18_trend_slope", q18, Some(q18Sql)),
    QueryDef("q19_pid_controller", q19, Some(q19Sql)),
    QueryDef("q20_autoscale_target", q20, Some(q20Sql)),
    QueryDef("q21_degradation_levels", q21, Some(q21Sql)))
}
