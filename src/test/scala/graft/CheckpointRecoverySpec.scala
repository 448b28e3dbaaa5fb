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

  test("dedup state survives a restart: pre-stop fingerprints stay dropped") {
    import graft.streaming.StreamingDedup
    import graft.streaming.StreamingDedup.Doc
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val base = java.nio.file.Files.createTempDirectory("ckpt_dd").toString
    val ckpt = s"$base/checkpoint"
    val out = s"$base/out"
    val input = MemoryStream[Doc]
    def startQuery() = StreamingDedup.attach(input.toDS(), "10 minutes")
      .writeStream.format("parquet")
      .option("checkpointLocation", ckpt).option("path", out)
      .outputMode("append").start()

    // Two file-sink/watermark subtleties this test works around: the
    // visible output can lag one micro-batch behind the last addData
    // (the engine plans an initial/trailing batch around the test
    // thread's appends) — so each run ends with a throwaway flush doc
    // and assertions name only the docs of interest — and an event at
    // t=0 ties the INITIAL watermark (boundary-dropped as late once an
    // empty batch has run), so all timestamps sit well above zero.
    // run 1: admit "alpha", then stop
    val q1 = startQuery()
    try {
      input.addData(Doc(1, 600000L, "alpha"))
      q1.processAllAvailable()
      input.addData(Doc(90, 630000L, "flush-one"))
      q1.processAllAvailable()
    } finally q1.stop()
    val run1 = spark.read.parquet(out)
      .select("doc_id").as[Long].collect().toSet
    assert(run1.contains(1L), s"alpha must be admitted in run 1, got $run1")

    // run 2: same checkpoint — "alpha" must STILL be dropped (the state
    // store restored the fingerprint; losing it would re-admit and
    // break the exactly-one-per-horizon guarantee), fresh content flows.
    val q2 = startQuery()
    try {
      input.addData(Doc(2, 660000L, "alpha"), Doc(3, 660000L, "beta"))
      q2.processAllAvailable()
      input.addData(Doc(91, 690000L, "flush-two"))
      q2.processAllAvailable()
    } finally q2.stop()

    val ids = spark.read.parquet(out)
      .select("doc_id").as[Long].collect().toSet
    assert(ids.contains(3L), s"fresh content must flow after restart: $ids")
    assert(!ids.contains(2L),
      s"run-1 fingerprint must survive the restart (alpha re-admitted): $ids")
  }
}
