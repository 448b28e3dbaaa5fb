package graft

import org.apache.spark.sql.functions._
import graft.functions.{AudioDsp, WavCodec}
import graft.streaming.EnvelopeValidation

class WavAndValidationSpec extends SparkSpec {

  test("F32/S8: WAV roundtrip and LINEAR16 normalization (reference sine fixture)") {
    // 440 Hz, 16 kHz, 1 s — the conftest fixture
    val samples = Array.tabulate(16000)(i =>
      (math.sin(2 * math.Pi * 440 * i / 16000.0) * 16384).toShort)
    val wav = WavCodec.encode(samples)
    assert(wav.length == 44 + 32000)
    assert(new String(wav.take(4), "US-ASCII") == "RIFF")
    val parsed = WavCodec.decode(wav)
    assert(parsed.sampleRate == 16000 && parsed.channels == 1)
    assert(parsed.samples.sameElements(samples))
    // decode path: int16/32768, in [-1, 1), peak ~0.5
    val f = WavCodec.decodeLinear16(wav.drop(44))
    assert(f.forall(v => v >= -1.0 && v < 1.0))
    assert(math.abs(f.map(math.abs).max - 0.5) < 0.01)
    // feeds the DSP chain end-to-end
    val feats = AudioDsp.extractFeatures(f)
    assert(feats.rms > 0.3)
  }

  test("malformed jobs reject, out-of-range priorities clamp (reference test_queue)") {
    import spark.implicits._
    val jobs = Seq(
      ("j1", "stt_chunk", 2), // fine
      ("j2", "stt_batch", 99), // priority clamps to 3
      ("j3", "ocr_single", -5), // clamps to 0
      ("", "stt_chunk", 1), // missing id -> reject
      ("j5", "mystery", 1) // unknown type -> reject
    ).toDF("job_id", "job_type", "priority")
    val v = EnvelopeValidation.validate(jobs)
    val acc = v.accepted.select("job_id", "priority").collect()
      .map(r => (r.getString(0), r.getInt(1))).toSet
    assert(acc == Set(("j1", 2), ("j2", 3), ("j3", 0)))
    val rej = v.rejected.select("job_id", "reject_reason").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(rej == Set(("", "missing_job_id"), ("j5", "unknown_job_type")))
    // conservation
    assert(v.accepted.count() + v.rejected.count() == jobs.count())
  }
}
