package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import graft.model.{AudioChunk, TranscriptEvent}
import graft.streaming.{SessionProcessor, StreamingDedup, StreamingNearDup}

/** The streaming trio under the RocksDB state store provider — the
  * production choice at 100 TB state (VERDICT r7 #6). A `newSession()`
  * carries the provider conf so the shared suite session stays on the
  * default provider; rocksdbjni ships with Spark's jars. Also pins the
  * state-GROWTH bound under sustained load (watermark eviction keeps
  * dedup state at horizon-size, not corpus-size) and the one-slot-per-
  * docId redelivery rule in the near-dup band state (ADVICE r7). */
class RocksDbStreamingSpec extends SparkSpec {

  private lazy val rocks = {
    val s = spark.newSession()
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    s
  }

  test("sessionizer emits on the size trigger under RocksDB state") {
    implicit val sqlCtx = rocks.sqlContext
    import rocks.implicits._
    val input = MemoryStream[AudioChunk]
    val query = SessionProcessor.attach(input.toDS(), timeoutMs = 0L).toDF()
      .writeStream.format("memory").queryName("rocks_sessions")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      // two 160 ms chunks: below the 320 ms trigger — state carries
      input.addData(AudioChunk("s1", Array.fill(2560)(40.toByte), 0L, 160L, false))
      query.processAllAvailable()
      assert(rocks.table("rocks_sessions").count() == 0)
      input.addData(AudioChunk("s1", Array.fill(2560)(40.toByte), 160L, 160L, false))
      query.processAllAvailable()
      val evs = rocks.table("rocks_sessions").as[TranscriptEvent].collect()
      assert(evs.nonEmpty, "320 ms buffered must trigger an emission")
      assert(evs.forall(_.sessionId == "s1"))
    } finally query.stop()
  }

  test("dedup state stays horizon-bounded under sustained load (RocksDB)") {
    implicit val sqlCtx = rocks.sqlContext
    import rocks.implicits._
    val input = MemoryStream[StreamingDedup.Doc]
    val query = StreamingDedup.attach(input.toDS(), horizon = "30 seconds")
      .writeStream.format("memory").queryName("rocks_dedup")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      val batches = 6
      val perBatch = 100
      for (b <- 0 until batches) {
        // every batch: fresh fingerprints, event time advancing 60 s —
        // far past the 30 s horizon, so prior batches must evict.
        // +1 s base: a row at event-time 0 ties Spark's initial
        // watermark (0) and is dropped as late, by design
        val t0 = b * 60000L + 1000L
        input.addData((0 until perBatch).map(i =>
          StreamingDedup.Doc(b * 1000L + i, t0 + i, s"doc-$b-$i")): _*)
        query.processAllAvailable()
      }
      val total = rocks.table("rocks_dedup").count()
      assert(total == (batches * perBatch).toLong,
        s"all distinct docs admitted, got $total")
      val stateRows = Option(query.lastProgress).toSeq
        .flatMap(_.stateOperators.toSeq).map(_.numRowsTotal).sum
      // corpus is 600 fingerprints; horizon-bounded state must hold at
      // most ~2 batches' worth (current + not-yet-evicted frontier)
      assert(stateRows > 0 && stateRows <= 2L * perBatch,
        s"state rows $stateRows not horizon-bounded (600 total fed)")
    } finally query.stop()
  }

  test("event-time sessionizer: watermark timeout finalizes under RocksDB") {
    implicit val sqlCtx = rocks.sqlContext
    import rocks.implicits._
    import org.apache.spark.sql.functions.{col, timestamp_millis}
    val input = MemoryStream[AudioChunk]
    val withTime = input.toDS()
      .withColumn("event_time",
        timestamp_millis(col("offsetMs") + col("durationMs")))
      .withWatermark("event_time", "0 seconds")
      .as[AudioChunk]
    val q = SessionProcessor.attachEventTime(withTime,
        graft.streaming.SessionLogic.Config(), idleGapMs = 10000L)
      .writeStream.format("memory").queryName("rocks_et")
      .outputMode("append").start()
    try {
      def chunk(sid: String, off: Long, dur: Long) =
        AudioChunk(sid, Array.fill(dur.toInt * 2)(100.toByte), off, dur,
          isFinal = false)
      input.addData(chunk("a", 0, 200)) // buffers, below every trigger
      q.processAllAvailable()
      assert(rocks.table("rocks_et").count() == 0)
      input.addData(chunk("b", 60000, 200)) // watermark jumps past a's gap
      q.processAllAvailable()
      input.addData(chunk("b", 61000, 100)) // timeout fires next batch
      q.processAllAvailable()
      val aOut = rocks.table("rocks_et").as[TranscriptEvent].collect()
        .filter(_.sessionId == "a")
      assert(aOut.length == 1 && aOut.head.eventType == "END_OF_UTTERANCE",
        s"event-time finalization under RocksDB: ${aOut.toSeq}")
    } finally q.stop()
  }

  test("RocksDB checkpoint recovery: session buffer survives a restart") {
    implicit val sqlCtx = rocks.sqlContext
    import rocks.implicits._
    val base = java.nio.file.Files.createTempDirectory("rocks_ckpt").toString
    val input = MemoryStream[AudioChunk]
    def chunk(off: Long, dur: Long) =
      AudioChunk("s", Array.fill(dur.toInt * 2)(100.toByte), off, dur,
        isFinal = false)
    def startQuery() = SessionProcessor.attach(input.toDS(), timeoutMs = 0L)
      .writeStream.format("parquet")
      .option("checkpointLocation", s"$base/ckpt")
      .option("path", s"$base/out").outputMode("append").start()
    // run 1: 200 ms buffered (below the 320 ms trigger), then stop —
    // the not-yet-emitted buffer lives only in RocksDB state
    val q1 = startQuery()
    try {
      input.addData(chunk(0, 200)); q1.processAllAvailable()
    } finally q1.stop()
    assert(rocks.read.parquet(s"$base/out").count() == 0)
    // run 2: restart from the SAME checkpoint/provider; +200 ms crosses
    // the trigger only if run 1's buffer was restored from RocksDB
    val q2 = startQuery()
    try {
      input.addData(chunk(200, 200)); q2.processAllAvailable()
    } finally q2.stop()
    val rows = rocks.read.parquet(s"$base/out")
      .as[TranscriptEvent].collect()
    assert(rows.length == 1 && rows.head.resultOffsetMs == 0L,
      s"RocksDB state not restored: ${rows.toSeq}")
  }

  test("near-dup band state: redelivery holds ONE slot, matches dedup to 2 bands") {
    implicit val sqlCtx = rocks.sqlContext
    import rocks.implicits._
    val base =
      "the quick brown fox jumps over the lazy dog near the old river bank"
    val input = MemoryStream[StreamingNearDup.Doc]
    val query = StreamingNearDup.attach(input.toDS())
      .writeStream.format("memory").queryName("rocks_neardup")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      input.addData(StreamingNearDup.Doc(1, base))
      query.processAllAvailable()
      // redelivery of the same doc (at-least-once upstream)
      input.addData(StreamingNearDup.Doc(1, base))
      query.processAllAvailable()
      input.addData(StreamingNearDup.Doc(3, base))
      query.processAllAvailable()
      val rows = rocks.table("rocks_neardup")
        .as[StreamingNearDup.DupPair].collect()
      // doc1's redelivery must not match its own stale copy
      assert(rows.forall(p => !(p.docId == 1 && p.matchId == 1)),
        s"self-match on redelivery: ${rows.toList}")
      val vs3 = rows.filter(_.docId == 3)
      assert(vs3.nonEmpty && vs3.forall(_.matchId == 1))
      // one state slot per docId: at most one pair per band (2 bands),
      // not one per redelivered copy
      assert(vs3.length <= 2,
        s"redelivered doc occupied multiple slots: ${vs3.toList}")
    } finally query.stop()
  }
}
