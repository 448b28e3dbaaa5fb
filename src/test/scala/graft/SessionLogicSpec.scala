package graft

import graft.model.AudioChunk
import graft.streaming.SessionLogic
import graft.streaming.SessionLogic.{Config, State}

/** Session-window semantics (SURVEY.md §2.6 W1-W8) against the pure
  * logic — chunk-size trigger, VAD endpoint, overlap conservation, final
  * flush, debounce, timeout finalization. */
class SessionLogicSpec extends SparkSpec {

  private val cfg = Config(chunkMs = 320, overlapMs = 150,
    vadSilenceMs = 300, partialIntervalMs = 150, silenceRmsThreshold = 10.0)

  private def loud(off: Long, dur: Long, isFinal: Boolean = false) =
    AudioChunk("s1", Array.fill(dur.toInt * 2)(100.toByte), off, dur, isFinal)
  private def quiet(off: Long, dur: Long) =
    AudioChunk("s1", Array.fill(dur.toInt * 2)(0.toByte), off, dur, isFinal = false)

  test("W2: no emission below the 320 ms buffer threshold") {
    val (st, out) = SessionLogic.step("s1", Seq(loud(0, 100)), SessionLogic.empty, cfg)
    assert(out.isEmpty)
    assert(st.bufferMs == 100)
  }

  test("W2+W4: size trigger emits and retains the overlap") {
    val chunks = Seq(loud(0, 160), loud(160, 160))
    val (st, out) = SessionLogic.step("s1", chunks, SessionLogic.empty, cfg)
    assert(out.size == 1)
    assert(out.head.eventType == "PARTIAL")
    assert(out.head.resultOffsetMs == 0)
    // 320 ms buffered, emitted through 320, retained overlap 150
    assert(st.bufferStartMs == 320 - cfg.overlapMs)
    assert(st.bufferMs == cfg.overlapMs)
  }

  test("W3: VAD endpoint after speech + 300 ms silence") {
    // total 310 ms buffered (below the 320 ms size trigger), trailing
    // silence run of 300 ms => VAD endpoint fires
    val chunks = Seq(loud(0, 10), quiet(10, 150), quiet(160, 150))
    val (st, out) = SessionLogic.step("s1", chunks, SessionLogic.empty, cfg)
    assert(out.size == 1)
    assert(out.head.eventType == "PARTIAL")
    // emitted through the start of the silence run; speech flag reset
    assert(st.speechSeen == false)
  }

  test("W6: is_final flushes the whole buffer and resets state") {
    val chunks = Seq(loud(0, 100), loud(100, 100, isFinal = true))
    val (st, out) = SessionLogic.step("s1", chunks, SessionLogic.empty, cfg)
    assert(out.size == 1)
    assert(out.head.eventType == "FINAL")
    assert(!out.head.isPartial)
    assert(st.buffer.isEmpty && st.bufferMs == 0)
  }

  test("W8: partial debounce suppresses rapid re-emission") {
    // two size triggers 60 ms apart: second is debounced (< 150 ms)
    val chunks = Seq(loud(0, 320), loud(320, 60), loud(380, 260))
    val (_, out) = SessionLogic.step("s1", chunks, SessionLogic.empty, cfg)
    val partials = out.filter(_.eventType == "PARTIAL")
    assert(partials.size >= 1)
    val times = partials.map(_.resultOffsetMs)
    assert(times == times.distinct)
  }

  test("chunk-order invariance within a step (reference appends blindly; we sort)") {
    val ordered = Seq(loud(0, 160), loud(160, 160), loud(320, 160))
    val shuffled = Seq(ordered(2), ordered(0), ordered(1))
    val a = SessionLogic.step("s1", ordered, SessionLogic.empty, cfg)
    val b = SessionLogic.step("s1", shuffled, SessionLogic.empty, cfg)
    assert(a._2.map(_.text) == b._2.map(_.text))
    assert(a._1 == b._1)
  }

  test("W5: timeout finalization flushes remainder as END_OF_UTTERANCE") {
    val (st, _) = SessionLogic.step("s1", Seq(loud(0, 100)), SessionLogic.empty, cfg)
    val events = SessionLogic.finalize("s1", st)
    assert(events.size == 1)
    assert(events.head.eventType == "END_OF_UTTERANCE")
    assert(SessionLogic.finalize("s1", SessionLogic.empty).isEmpty)
  }

  test("W8: debounced audio is retained, not dropped (final hears everything)") {
    // long debounce interval forces the second size trigger (at 640,
    // 320 ms after the first) onto the debounced path; its audio must
    // stay buffered and come out with the final flush
    val slowCfg = cfg.copy(partialIntervalMs = 400)
    val chunks = Seq(loud(0, 320), loud(320, 60), loud(380, 260),
      loud(640, 10, isFinal = true))
    val (st, out) = SessionLogic.step("s1", chunks, SessionLogic.empty, slowCfg)
    assert(st.bufferMs == 0)
    // surrogate text ends with the segment byte length
    val emitted = out.map(_.text.split("_").last.toLong).sum
    val totalBytes = chunks.map(_.content.length.toLong).sum
    // every byte is transcribed at least once (overlap re-emission can
    // only add); with the debounce-drop bug this sum falls short
    assert(emitted >= totalBytes,
      s"emitted $emitted < total $totalBytes: debounced segment was dropped")
  }

  test("deterministic surrogate inference (idempotent replay)") {
    val chunks = Seq(loud(0, 320), loud(320, 320))
    val a = SessionLogic.step("s1", chunks, SessionLogic.empty, cfg)
    val b = SessionLogic.step("s1", chunks, SessionLogic.empty, cfg)
    assert(a._2 == b._2)
  }
}
