package graft.inference

/** The inference seam (SURVEY.md §7 step 8): production would call an
  * external batch-inference service from `mapPartitions` (reference:
  * Whisper via `stt_worker.py:201-212`, Triton configs under `triton/`);
  * tests and the local engine use a deterministic surrogate, mirroring
  * the reference's own mocked models (`tests/conftest.py:168-200`).
  */
trait Inferencer extends Serializable {
  /** Transcribe an audio segment: (text, confidence in [0,1]). */
  def transcribe(samples: Array[Byte]): (String, Double)
}

/** Deterministic surrogate: text/confidence derive from a stable content
  * hash, so distributed retries and oracle checks reproduce exactly. */
object SurrogateInferencer extends Inferencer {
  override def transcribe(samples: Array[Byte]): (String, Double) = {
    var h = 2166136261L // FNV-1a 32-bit, stable across JVMs
    var i = 0
    while (i < samples.length) {
      h = ((h ^ (samples(i) & 0xffL)) * 16777619L) & 0xffffffffL
      i += 1
    }
    (s"seg_${h}_${samples.length}", (h % 1000L).toDouble / 1000.0)
  }
}
