package graft

import org.apache.spark.sql.functions._

/** Boundary-value convention for the two sessionization forms (probed
  * after ADVICE round 2 flagged the ambiguity): an event arriving
  * EXACTLY gap after its predecessor stays in the SAME session under
  * BOTH forms —
  *
  *   - manual gaps-and-islands (q14/q15): `t - prev > gap` → same
  *   - Spark built-in session_window (q49): each event's window is
  *     [t, t+gap] and touching windows MERGE (inclusive), so the
  *     exact-gap event also extends the session
  *
  * One microsecond beyond the gap splits under both. This pins the
  * agreement so q49's oracle can share q14's islands derivation and a
  * testdata change landing an exact-gap pair cannot flip parity. */
class SessionBoundarySpec extends SparkSpec {

  private val gapUs = 1800000000L // 30 min

  private def islandsCount(rows: Seq[(Long, Long, Long)]): Long = {
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"t_us")
    rows.toDF("event_id", "user_id", "t_us")
      .withColumn("prev", lag($"t_us", 1).over(w))
      .withColumn("is_new",
        ($"prev".isNull || ($"t_us" - $"prev") > gapUs).cast("long"))
      .agg(sum($"is_new")).as[Long].head()
  }

  private def sessionWindowCount(rows: Seq[(Long, Long, Long)]): Long = {
    import spark.implicits._
    rows.toDF("event_id", "user_id", "t_us")
      .select($"user_id", timestamp_micros($"t_us").as("event_time"))
      .groupBy(session_window($"event_time", "30 minutes"), $"user_id")
      .count()
      .count()
  }

  test("exact-gap event stays in the session under BOTH forms") {
    val t0 = 1700000000000000L
    val exact = Seq((1L, 7L, t0), (2L, 7L, t0 + gapUs))
    assert(islandsCount(exact) == 1L, "islands must keep the exact-gap event")
    assert(sessionWindowCount(exact) == 1L,
      "session_window merges inclusively at exactly prev + gap")
  }

  test("one microsecond past the gap splits under BOTH forms") {
    val t0 = 1700000000000000L
    val beyond = Seq((1L, 7L, t0), (2L, 7L, t0 + gapUs + 1L))
    assert(islandsCount(beyond) == 2L)
    assert(sessionWindowCount(beyond) == 2L)
  }
}
