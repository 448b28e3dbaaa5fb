package graft

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.model.{AudioChunk, TranscriptEvent}
import graft.streaming.SessionProcessor

/** Replay determinism of the custom stateful operator: the SAME chunk
  * stream produces the SAME transcript events whether it arrives as one
  * batch or split across micro-batches with state carried in between.
  * This is the property that makes checkpoint recovery and task retry
  * safe at scale (the reference's Redis path can duplicate partials on
  * redelivery — SURVEY.md §7 hard parts (a)). */
class StreamingBatchParitySpec extends SparkSpec {

  private def canon(evts: Seq[TranscriptEvent]): Seq[String] =
    evts.map(e => s"${e.sessionId}|${e.eventType}|${e.text}|" +
        f"${e.confidence}%.6f|${e.resultOffsetMs}|${e.isPartial}")
      .sorted

  test("batch run == two-micro-batch streaming run on real events") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // the q45 chunk construction over sf0.001 events
    val byUser = Window.partitionBy(col("user_id"))
    val chunks = graft.Tables.events(spark, sf0001)
      .withColumn("t_us", expr("ts div 1000"))
      .withColumn("base_us", min(col("t_us")).over(byUser))
      .select(
        col("user_id").cast("string").as("sessionId"),
        encode(coalesce(col("props"), lit("")), "UTF-8").as("content"),
        ((col("t_us") - col("base_us")) / 1000L).cast("long").as("offsetMs"),
        lit(50L).as("durationMs"),
        lit(false).as("isFinal"))
      .as[AudioChunk](Encoders.product[AudioChunk])
      .collect()
      .sortBy(c => (c.sessionId, c.offsetMs))

    // batch: everything at once
    val batchOut = SessionProcessor.attach(
      spark.createDataset(chunks.toIndexedSeq)(Encoders.product[AudioChunk]),
      timeoutMs = 0L).collect()

    // streaming: split each session's chunks at its median offset —
    // batch boundaries respect per-session offset order
    val medians = chunks.groupBy(_.sessionId).map { case (sid, cs) =>
      sid -> cs(cs.length / 2).offsetMs
    }
    val (first, second) = chunks.partition(c => c.offsetMs < medians(c.sessionId))
    val input = MemoryStream[AudioChunk]
    val query = SessionProcessor.attach(input.toDS(), timeoutMs = 0L)
      .writeStream.format("memory").queryName("parity_out")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      input.addData(first.toIndexedSeq)
      query.processAllAvailable()
      input.addData(second.toIndexedSeq)
      query.processAllAvailable()
      val streamOut = spark.table("parity_out").as[TranscriptEvent].collect()
      assert(batchOut.nonEmpty, "expected some transcript events")
      assert(canon(streamOut.toIndexedSeq) == canon(batchOut.toIndexedSeq),
        s"stream (${streamOut.length}) != batch (${batchOut.length})")
    } finally query.stop()
  }
}
