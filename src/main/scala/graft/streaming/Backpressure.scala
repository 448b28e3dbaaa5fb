package graft.streaming

/** Watermark backpressure with hysteresis + staged degradation — the
  * reference's flow-control policy math as pure, listener-pluggable
  * state machines (X1 `src/grpc_server/backpressure.py:22-168`, X2
  * `:171-247`; knobs `src/config.py:150-153`).
  *
  * In Spark the MECHANISM is built in (source rate limiting via
  * maxOffsetsPerTrigger + trigger backoff); these classes carry the
  * reference's POLICY — when to pause/resume admission and which
  * quality knobs to shed — and are driven from a
  * `StreamingQueryListener.onQueryProgress` (utilization =
  * processedRowsPerSecond vs capacity) or any other utilization signal.
  */
object Backpressure {

  /** X1: pause at util ≥ high, resume at util ≤ low (hysteresis band
    * between them; reference defaults 0.8 / 0.6). */
  final case class Hysteresis(
      high: Double = 0.8,
      low: Double = 0.6,
      paused: Boolean = false,
      nPauses: Long = 0L) {
    def observe(utilization: Double): Hysteresis =
      if (!paused && utilization >= high)
        copy(paused = true, nPauses = nPauses + 1)
      else if (paused && utilization <= low) copy(paused = false)
      else this
  }

  /** X2: degradation level 0-3 from utilization (reference thresholds
    * `backpressure.py:230-238`). */
  def level(utilization: Double): Int =
    if (utilization < 0.7) 0
    else if (utilization < 0.8) 1
    else if (utilization < 0.9) 2
    else 3

  /** Per-level service parameter overrides (reference
    * `backpressure.py:176-217`): partial-result interval stretches,
    * chunk grows, beam narrows, OCR resolution drops, layout skipped. */
  final case class SttParams(partialIntervalMs: Long, chunkMs: Long, beamSize: Int)
  final case class OcrParams(maxResolution: Int, skipLayout: Boolean)

  val sttByLevel: Map[Int, SttParams] = Map(
    0 -> SttParams(150L, 320L, 5),
    1 -> SttParams(300L, 480L, 3),
    2 -> SttParams(600L, 640L, 1),
    3 -> SttParams(1200L, 960L, 1))

  val ocrByLevel: Map[Int, OcrParams] = Map(
    0 -> OcrParams(4096, skipLayout = false),
    1 -> OcrParams(2048, skipLayout = false),
    2 -> OcrParams(1536, skipLayout = true),
    3 -> OcrParams(1024, skipLayout = true))
}
