package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.inference.{Inferencer, SurrogateInferencer}
import graft.model.{AudioChunk, TranscriptEvent}

/** Streaming session windows with overlap carryover and partial emission —
  * the one genuinely custom stateful operator (SURVEY.md §2.6 W1-W8, §7
  * step 5). Semantics from the reference's Python worker path:
  *
  *  - W1 session buffer: per-session sample buffer + activity tracking
  *    (`src/workers/stt_worker.py:433-467`)
  *  - W2 chunk-size trigger: process once ≥ 320 ms buffered
  *    (`stt_worker.py:469-473`, `src/config.py:121`)
  *  - W3 VAD endpoint: speech seen and ≥ 300 ms trailing silence
  *    (`stt_worker.py:475-479`, `config.py:123`)
  *  - W4 overlap retention: emit len−150 ms, keep 150 ms in the buffer
  *    (`stt_worker.py:481-504`, `config.py:122`)
  *  - W5 session TTL: finalize sessions idle > timeout via
  *    GroupStateTimeout (`stt_worker.py:419-430`)
  *  - W6 final flush: is_final emits the whole remainder and drops state
  *    (`stt_worker.py:396-417`)
  *  - W7/W8 partial vs final emission with a 150 ms event-time debounce
  *    (`stt_worker.py:332-356`, `config.py:124`)
  *
  * The core is a pure function ([[SessionLogic.step]]) so unit tests
  * drive it without a streaming query; [[SessionProcessor.attach]] wires
  * it into `flatMapGroupsWithState`. Event-time (offsetMs) drives every
  * trigger — processing time never enters the math, so replays and
  * checkpoint recovery are deterministic (the reference can duplicate
  * partials on redelivery; we key results by (session, offset) like its
  * `{session_id}_{offset_ms}` result keys, `stt_worker.py:297-300`).
  */
object SessionLogic {

  /** LINEAR16: 2 bytes/sample; the reference buffers 16 samples/ms
    * (16 kHz). All buffer arithmetic is in milliseconds of audio. */
  final case class Config(
      chunkMs: Long = 320L,
      overlapMs: Long = 150L,
      vadSilenceMs: Long = 300L,
      partialIntervalMs: Long = 150L,
      silenceRmsThreshold: Double = 10.0)

  /** One buffered chunk's bytes pinned to its own time span — byte
    * positions map to time per-chunk, so variable-rate content (chunk
    * byte length not proportional to durationMs) still splits at exact
    * positions instead of drifting with a global bytes/ms estimate. */
  final case class Seg(startMs: Long, durMs: Long, bytes: Vector[Byte]) {
    def endMs: Long = startMs + durMs
  }

  /** Carried per-session state. `segs` holds the not-yet-emitted chunks
    * (including the overlap carried back), `bufferStartMs` the buffer
    * origin on the session's time axis, `lastPartialMs` the debounce
    * clock. */
  final case class State(
      segs: Vector[Seg],
      bufferStartMs: Long,
      silenceMs: Long,
      speechSeen: Boolean,
      lastPartialMs: Long,
      nEmitted: Int) {
    def buffer: Vector[Byte] = segs.flatMap(_.bytes)
    def bufferMs: Long = segs.map(_.durMs).sum
  }

  val empty: State = State(Vector.empty, 0L, 0L, false, Long.MinValue, 0)

  /** Split buffered segments at time `t`: bytes strictly before `t` /
    * segments from `t` on. A segment straddling `t` splits at the byte
    * proportional to `t` WITHIN that segment (exact at chunk
    * boundaries; proportional only inside one chunk). */
  private def splitAt(segs: Vector[Seg], t: Long)
      : (Vector[Byte], Vector[Seg]) = {
    val emitted = Vector.newBuilder[Byte]
    val kept = Vector.newBuilder[Seg]
    segs.foreach { s =>
      if (s.endMs <= t) emitted ++= s.bytes
      else if (s.startMs >= t) kept += s
      else {
        val n = (s.bytes.length.toLong * (t - s.startMs) / s.durMs).toInt
        emitted ++= s.bytes.take(n)
        kept += Seg(t, s.endMs - t, s.bytes.drop(n))
      }
    }
    (emitted.result(), kept.result())
  }

  def rms(bytes: Array[Byte]): Double =
    if (bytes.isEmpty) 0.0
    else math.sqrt(bytes.map(b => (b & 0xff).toDouble * (b & 0xff)).sum /
      bytes.length)

  /** Process one ordered slice of a session's chunks. Returns the new
    * state and the emitted events. Pure — no wall clock, no I/O. */
  def step(
      sessionId: String,
      chunks: Seq[AudioChunk],
      state: State,
      cfg: Config = Config(),
      inferencer: Inferencer = SurrogateInferencer)
      : (State, Seq[TranscriptEvent]) = {
    var st = state
    val out = Seq.newBuilder[TranscriptEvent]

    def emit(upToMs: Long, isFinal: Boolean): Unit = {
      // W4: emit [bufferStartMs, upToMs), retain the trailing overlap.
      val emitMs = upToMs - st.bufferStartMs
      if (emitMs > 0 && st.segs.nonEmpty) {
        // W8: a debounced partial neither emits NOR advances the buffer —
        // the audio keeps accumulating and is transcribed by the next
        // allowed emission (the reference delays processing, it never
        // drops the segment; `stt_worker.py:332-356` + partial interval).
        val debounced = !isFinal &&
          st.lastPartialMs != Long.MinValue &&
          upToMs - st.lastPartialMs < cfg.partialIntervalMs
        if (debounced) return
        val (segBytes, _) = splitAt(st.segs, upToMs)
        val (text, conf) = inferencer.transcribe(segBytes.toArray)
        out += TranscriptEvent(
          sessionId = sessionId,
          eventType = if (isFinal) "FINAL" else "PARTIAL",
          text = text,
          confidence = conf,
          resultOffsetMs = st.bufferStartMs,
          isPartial = !isFinal)
        st = st.copy(lastPartialMs = upToMs, nEmitted = st.nEmitted + 1)
        val keepFromMs = if (isFinal) upToMs
          else math.max(st.bufferStartMs, upToMs - cfg.overlapMs)
        val keptSegs = if (isFinal) Vector.empty[Seg]
          else splitAt(st.segs, keepFromMs)._2
        st = st.copy(segs = keptSegs, bufferStartMs = keepFromMs)
      }
    }

    chunks.sortBy(c => (c.offsetMs, c.durationMs)).foreach { c =>
      // W1: append; establish the time base from the first chunk.
      if (st.segs.isEmpty)
        st = st.copy(bufferStartMs = c.offsetMs)
      st = st.copy(segs =
        st.segs :+ Seg(c.offsetMs, c.durationMs, c.content.toVector))
      // VAD bookkeeping (P7 energy VAD, `stt_worker.py:522-536`).
      if (rms(c.content) < cfg.silenceRmsThreshold)
        st = st.copy(silenceMs = st.silenceMs + c.durationMs)
      else
        st = st.copy(silenceMs = 0L, speechSeen = true)
      val endMs = c.offsetMs + c.durationMs
      if (c.isFinal) {
        // W6: flush everything, state resets.
        emit(endMs, isFinal = true)
        st = empty.copy(bufferStartMs = endMs)
      } else if (st.bufferMs >= cfg.chunkMs) {
        // W2: size trigger.
        emit(endMs, isFinal = false)
      } else if (st.speechSeen && st.silenceMs >= cfg.vadSilenceMs) {
        // W3: VAD endpoint — emit through the start of the silence run.
        emit(endMs - st.silenceMs, isFinal = false)
        st = st.copy(speechSeen = false)
      }
    }
    (st, out.result())
  }

  /** W5: timeout finalization — flush whatever remains. */
  def finalize(sessionId: String, state: State,
      inferencer: Inferencer = SurrogateInferencer): Seq[TranscriptEvent] =
    if (state.buffer.isEmpty) Seq.empty
    else {
      val (text, conf) = inferencer.transcribe(state.buffer.toArray)
      Seq(TranscriptEvent(sessionId, "END_OF_UTTERANCE", text, conf,
        state.bufferStartMs, isPartial = false))
    }
}

object SessionProcessor {

  /** Event-time variant of W5: sessions finalize when the WATERMARK
    * passes lastChunkEnd + idleGapMs — fully deterministic under
    * checkpoint replay (processing-time timeouts depend on the wall
    * clock; at 100 TB with task retries that nondeterminism leaks
    * duplicate END_OF_UTTERANCE events; this form cannot).
    *
    * `chunks` must already carry a watermark on an event-time column
    * derived from `offsetMs` (see SessionEventTimeSpec). */
  def attachEventTime(
      chunks: Dataset[AudioChunk],
      cfg: SessionLogic.Config = SessionLogic.Config(),
      idleGapMs: Long = 300000L): Dataset[TranscriptEvent] = {
    implicit val stateEnc = Encoders.kryo[SessionLogic.State]
    implicit val outEnc = Encoders.product[TranscriptEvent]
    chunks.groupByKey(_.sessionId)(Encoders.STRING)
      .flatMapGroupsWithState[SessionLogic.State, TranscriptEvent](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (sid, it, gs: GroupState[SessionLogic.State]) =>
          if (gs.hasTimedOut) {
            val events = SessionLogic.finalize(sid,
              gs.getOption.getOrElse(SessionLogic.empty))
            gs.remove()
            events.iterator
          } else {
            val batch = it.toSeq
            val (next, events) = SessionLogic.step(sid, batch,
              gs.getOption.getOrElse(SessionLogic.empty), cfg)
            gs.update(next)
            val lastEndMs = batch.map(c => c.offsetMs + c.durationMs).max
            gs.setTimeoutTimestamp(lastEndMs + idleGapMs)
            events.iterator
          }
      }
  }

  /** Wire the session logic into a (streaming or batch) Dataset. With a
    * streaming source use OutputMode.Append/Update and a checkpoint; the
    * state store carries [[SessionLogic.State]] across micro-batches.
    *
    * `timeoutMs > 0` enables the reference's 300 s idle finalization
    * (W5) via ProcessingTimeTimeout — note that with it enabled the
    * query keeps scheduling batches to check timeouts, so tests that
    * wait for quiescence (processAllAvailable) should pass 0. */
  def attach(
      chunks: Dataset[AudioChunk],
      cfg: SessionLogic.Config = SessionLogic.Config(),
      timeoutMs: Long = 300000L): Dataset[TranscriptEvent] = {
    implicit val stateEnc = Encoders.kryo[SessionLogic.State]
    implicit val outEnc = Encoders.product[TranscriptEvent]
    val timeoutConf =
      if (timeoutMs > 0) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    chunks.groupByKey(_.sessionId)(Encoders.STRING)
      .flatMapGroupsWithState[SessionLogic.State, TranscriptEvent](
        OutputMode.Append(), timeoutConf) {
        case (sid, it, gs: GroupState[SessionLogic.State]) =>
          if (gs.hasTimedOut) {
            val events = SessionLogic.finalize(sid,
              gs.getOption.getOrElse(SessionLogic.empty))
            gs.remove()
            events.iterator
          } else {
            val (next, events) = SessionLogic.step(sid, it.toSeq,
              gs.getOption.getOrElse(SessionLogic.empty), cfg)
            gs.update(next)
            if (timeoutMs > 0) gs.setTimeoutDuration(timeoutMs)
            events.iterator
          }
      }
  }
}
