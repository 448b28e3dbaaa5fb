package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** The BUILT-IN session_window operator in an actual streaming query
  * with a watermark (the q49 batch form's streaming counterpart —
  * SURVEY.md A4/W5): sessions stay open while in-gap events arrive,
  * close when the watermark passes end + gap, and late events beyond
  * the watermark are dropped. This is the "unchanged in streaming"
  * claim of q49 made executable. */
class SessionWindowStreamingSpec extends SparkSpec {

  test("session_window closes on watermark passage and merges in-gap events") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val input = MemoryStream[(String, Timestamp)]
    val sessions = input.toDS().toDF("user", "ts")
      .withWatermark("ts", "10 seconds")
      .groupBy(session_window(col("ts"), "30 seconds"), col("user"))
      .agg(count(lit(1)).as("n"))
      .select(col("user"), col("n"),
        col("session_window.start").as("start"),
        col("session_window.end").as("end"))
    val query = sessions.writeStream
      .format("memory").queryName("sessions")
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      def t(s: Long) = new Timestamp(1700000000000L + s * 1000L)
      // two in-gap events 20 s apart -> one session [0, 50)
      input.addData(("u", t(0)), ("u", t(20)))
      query.processAllAvailable()
      // nothing closes until the watermark passes session end
      assert(spark.table("sessions").count() == 0)
      // an event far ahead advances the watermark past 50 s
      input.addData(("u", t(120)))
      query.processAllAvailable()
      input.addData(("u", t(240))) // push watermark past 150 too
      query.processAllAvailable()
      val closed = spark.table("sessions")
        .as[(String, Long, Timestamp, Timestamp)].collect().sortBy(_._3.getTime)
      assert(closed.length >= 1, "first session should have closed")
      val first = closed.head
      assert(first._2 == 2L, s"merged session should hold both events: $first")
      assert(first._4.getTime - first._3.getTime == 50000L,
        s"session span = last event + gap: $first")
    } finally query.stop()
  }
}
