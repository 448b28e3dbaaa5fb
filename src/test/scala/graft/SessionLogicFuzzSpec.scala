package graft

import graft.model.AudioChunk
import graft.streaming.SessionLogic
import graft.streaming.SessionLogic.Config

/** Seeded random-script invariants for the session state machine
  * (SURVEY.md §5 property strategy: overlap conservation, monotone
  * emission, state sanity under arbitrary chunk patterns). */
class SessionLogicFuzzSpec extends SparkSpec {

  private val cfg = Config()

  test("invariants hold across 200 random chunk scripts") {
    val rnd = new scala.util.Random(20260812L)
    for (script <- 1 to 200) {
      var off = 0L
      val n = 1 + rnd.nextInt(12)
      val chunks = (1 to n).map { i =>
        val dur = 10L + rnd.nextInt(400)
        val loudness = if (rnd.nextBoolean()) 100.toByte else 0.toByte
        val c = AudioChunk("s", Array.fill(dur.toInt * 2)(loudness), off, dur,
          isFinal = i == n && rnd.nextInt(3) == 0)
        off += dur
        c
      }
      // feed in random batch splits to exercise cross-step state carry
      var st = SessionLogic.empty
      var events = Vector.empty[graft.model.TranscriptEvent]
      var rest = chunks.toList
      while (rest.nonEmpty) {
        val take = 1 + rnd.nextInt(rest.length)
        val (batch, tail) = rest.splitAt(take)
        val (st2, out) = SessionLogic.step("s", batch, st, cfg)
        st = st2
        events ++= out
        rest = tail
      }
      // invariants
      assert(st.bufferMs >= 0, s"script $script: negative buffer")
      assert(st.silenceMs >= 0, s"script $script: negative silence")
      val offsets = events.map(_.resultOffsetMs)
      assert(offsets == offsets.sorted, s"script $script: non-monotone emission")
      assert(events.forall(e => e.confidence >= 0.0 && e.confidence <= 1.0),
        s"script $script: confidence out of range")
      val finals = events.filter(_.eventType == "FINAL")
      assert(finals.size <= 1, s"script $script: multiple finals")
      // a final chunk always resets the buffer
      if (chunks.last.isFinal) assert(st.bufferMs == 0,
        s"script $script: buffer kept after final")
    }
  }
}
