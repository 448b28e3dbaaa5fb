package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.model.AudioChunk
import graft.streaming.{SessionLogic, SessionProcessor}

/** W5 via EventTimeTimeout: an idle session finalizes when the
  * WATERMARK (driven by other sessions' progress) passes its idle gap —
  * no wall clock involved, so replays emit identically. */
class SessionEventTimeSpec extends SparkSpec {

  test("idle session flushes as END_OF_UTTERANCE when the watermark passes") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val input = MemoryStream[AudioChunk]
    // offsetMs doubles as epoch-ms event time for watermarking
    val withTime = input.toDS()
      .withColumn("event_time",
        timestamp_millis(col("offsetMs") + col("durationMs")))
      .withWatermark("event_time", "0 seconds")
      .as[AudioChunk]
    val events = SessionProcessor.attachEventTime(withTime,
      SessionLogic.Config(), idleGapMs = 10000L)

    val q = events.writeStream.format("memory").queryName("et_transcripts")
      .outputMode("append").start()
    try {
      def chunk(sid: String, off: Long, dur: Long) =
        AudioChunk(sid, Array.fill(dur.toInt * 2)(100.toByte), off, dur, isFinal = false)

      // session a buffers 200 ms (below every trigger), then goes idle
      input.addData(chunk("a", 0, 200))
      q.processAllAvailable()
      assert(spark.table("et_transcripts").count() == 0)

      // session b arrives 60 s later -> watermark jumps past a's idle gap
      input.addData(chunk("b", 60000, 200))
      q.processAllAvailable()
      // timeout fires on the NEXT batch after the watermark advances
      input.addData(chunk("b", 61000, 100))
      q.processAllAvailable()

      val out = spark.table("et_transcripts")
        .as[graft.model.TranscriptEvent].collect()
      val aFinal = out.filter(e => e.sessionId == "a")
      assert(aFinal.length == 1)
      assert(aFinal.head.eventType == "END_OF_UTTERANCE")
    } finally q.stop()
  }
}
