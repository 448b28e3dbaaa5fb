package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.model.AudioChunk
import graft.streaming.{SessionLogic, SessionProcessor}

/** Checkpoint recovery: the session state built before a stop is
  * restored from the state store on restart — the buffered-but-not-
  * triggered audio from run 1 fires the size trigger with run 2's
  * chunk, and run 1's committed batches are not re-emitted (the
  * exactly-once property the reference's redeliverable queue lacks;
  * PLANS.md "Streaming"). */
class CheckpointRecoverySpec extends SparkSpec {

  test("session buffer survives a query restart from checkpoint") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val base = java.nio.file.Files.createTempDirectory("ckpt").toString
    val ckpt = s"$base/checkpoint"
    val out = s"$base/out"
    val input = MemoryStream[AudioChunk]
    def events = SessionProcessor.attach(input.toDS(),
      SessionLogic.Config(), timeoutMs = 0L)
    def chunk(off: Long, dur: Long) =
      AudioChunk("s", Array.fill(dur.toInt * 2)(100.toByte), off, dur,
        isFinal = false)
    def startQuery() = events.writeStream.format("parquet")
      .option("checkpointLocation", ckpt).option("path", out)
      .outputMode("append").start()

    // run 1: buffer 200 ms (below the 320 ms trigger) and stop
    val q1 = startQuery()
    try {
      input.addData(chunk(0, 200))
      q1.processAllAvailable()
    } finally q1.stop()
    assert(spark.read.parquet(out).count() == 0)

    // run 2: same checkpoint, same source; +200 ms crosses the trigger.
    // If state had been lost, 200 ms alone would emit nothing.
    val q2 = startQuery()
    try {
      input.addData(chunk(200, 200))
      q2.processAllAvailable()
    } finally q2.stop()

    val rows = spark.read.parquet(out)
      .as[graft.model.TranscriptEvent].collect()
    assert(rows.length == 1, s"expected exactly one event, got ${rows.toSeq}")
    assert(rows.head.eventType == "PARTIAL")
    // the emitted segment starts at the RUN-1 offset: state was restored
    assert(rows.head.resultOffsetMs == 0L)
  }
}
