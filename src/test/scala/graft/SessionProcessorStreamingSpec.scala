package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import graft.model.AudioChunk
import graft.streaming.{SessionLogic, SessionProcessor}

/** End-to-end Structured Streaming run of the sessionizer: state carries
  * across micro-batches (the buffer built in batch 1 triggers in batch
  * 2), mirroring the reference's streaming STT flow (SURVEY.md §3.1). */
class SessionProcessorStreamingSpec extends SparkSpec {

  test("state carries across micro-batches and emits on the size trigger") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val input = MemoryStream[AudioChunk]
    // timeoutMs=0 (NoTimeout): with ProcessingTimeTimeout the query keeps
    // scheduling timeout-check batches and processAllAvailable never
    // quiesces; idle finalization is covered by SessionLogicSpec.
    val events = SessionProcessor.attach(input.toDS(),
      SessionLogic.Config(), timeoutMs = 0L)
    val query = events.writeStream
      .format("memory")
      .queryName("transcripts")
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      def chunk(sid: String, off: Long, dur: Long, fin: Boolean = false) =
        AudioChunk(sid, Array.fill(dur.toInt * 2)(100.toByte), off, dur, fin)

      // batch 1: 200 ms buffered — below the 320 ms trigger, no output
      input.addData(chunk("a", 0, 200))
      query.processAllAvailable()
      assert(spark.table("transcripts").count() == 0)

      // batch 2: +200 ms => 400 ms buffered — PARTIAL emitted
      input.addData(chunk("a", 200, 200))
      query.processAllAvailable()
      val afterB2 = spark.table("transcripts").as[graft.model.TranscriptEvent]
        .collect()
      assert(afterB2.length == 1)
      assert(afterB2.head.eventType == "PARTIAL")
      assert(afterB2.head.sessionId == "a")

      // batch 3: second session interleaves; final chunk flushes session a
      input.addData(chunk("b", 0, 400), chunk("a", 400, 100, fin = true))
      query.processAllAvailable()
      val all = spark.table("transcripts").as[graft.model.TranscriptEvent]
        .collect()
      assert(all.count(_.sessionId == "b") == 1)
      val aFinal = all.filter(e => e.sessionId == "a" && e.eventType == "FINAL")
      assert(aFinal.length == 1)
    } finally query.stop()
  }
}
