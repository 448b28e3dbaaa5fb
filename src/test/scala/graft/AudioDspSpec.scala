package graft

import graft.functions.AudioDsp

/** Property assertions mirroring the reference's preprocessing tests
  * (SURVEY.md §5: resample length, mono mean, AGC ratio reduction,
  * normalize-never-clips). */
class AudioDspSpec extends SparkSpec {

  test("F1 resample length scales with the rate ratio") {
    val x = Array.tabulate(16000)(i => math.sin(2 * math.Pi * 440 * i / 16000.0))
    val y = AudioDsp.resampleLinear(x, 16000, 8000)
    assert(math.abs(y.length - 8000) <= 1)
    val z = AudioDsp.resampleLinear(x, 16000, 16000)
    assert(z.length == x.length)
  }

  test("F1 resample preserves a constant signal exactly") {
    val x = Array.fill(1000)(0.25)
    val y = AudioDsp.resampleLinear(x, 16000, 7350)
    assert(y.forall(v => math.abs(v - 0.25) < 1e-12))
  }

  test("F2 to_mono averages channels") {
    val stereo = Array(1.0, 0.0, 0.5, 0.5, -1.0, 1.0)
    val mono = AudioDsp.toMono(stereo, 2)
    assert(mono.toSeq == Seq(0.5, 0.5, 0.0))
  }

  test("F6 AGC reduces the loud/quiet amplitude ratio") {
    val quiet = Array.fill(2000)(0.05)
    val loud = Array.fill(2000)(0.9)
    val x = quiet ++ loud
    val y = AudioDsp.applyAgc(x)
    val ratioBefore = 0.9 / 0.05
    val qOut = y.take(2000).map(math.abs).max
    val lOut = y.drop(2000).map(math.abs).sum / 2000
    val ratioAfter = lOut / math.max(qOut, 1e-9)
    assert(ratioAfter < ratioBefore)
  }

  test("F6 AGC output never clips beyond [-1, 1]") {
    val x = Array.tabulate(4096)(i => math.sin(i * 0.1) * 2.0)
    val y = AudioDsp.applyAgc(x)
    assert(y.forall(v => v >= -1.0 && v <= 1.0))
  }
}
