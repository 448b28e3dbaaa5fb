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

  test("F5 high-pass attenuates DC, passes 1 kHz") {
    val n = 8000
    val dc = Array.fill(n)(0.8)
    val tone = Array.tabulate(n)(i => math.sin(2 * math.Pi * 1000 * i / 16000.0))
    def rmsTail(a: Array[Double]) = {
      val t = a.drop(n / 2); math.sqrt(t.map(v => v * v).sum / t.length)
    }
    assert(rmsTail(AudioDsp.highPass(dc)) < 0.01)
    assert(rmsTail(AudioDsp.highPass(tone)) > 0.6)
  }

  test("F9 split-on-silence: placement and length conservation") {
    val fs = 16000
    def sine(sec: Double) = Array.tabulate((fs * sec).toInt)(
      i => 0.5 * math.sin(2 * math.Pi * 440 * i / fs.toDouble))
    def silence(sec: Double) = Array.fill((fs * sec).toInt)(0.0)
    val x = sine(1.0) ++ silence(1.0) ++ sine(1.0)
    val segs = AudioDsp.splitOnSilence(x, frameLen = 400,
      threshold = 0.01, minSilenceFrames = 4)
    assert(segs.length == 2)
    // reference property: each kept segment is within a frame of 1 s
    assert(segs.forall(s => math.abs(s.length - fs) <= 800))
    // conservation: kept + dropped == total
    assert(segs.map(_.length).sum + fs <= x.length)
    assert(segs.map(_.length).sum >= x.length - fs - 800)
  }

  test("F4 denoise: noise floor removed, signal polarity preserved") {
    val rnd = new scala.util.Random(7)
    val noise = Array.fill(16000)(0.005 * (rnd.nextDouble() * 2 - 1))
    val signal = Array.tabulate(16000)(i => 0.5 * math.sin(2 * math.Pi * 440 * i / 16000.0))
    val x = noise ++ signal.zip(Array.fill(16000)(0.0)).map(_._1)
    val y = AudioDsp.denoiseSubtract(x)
    def rms(a: Array[Double]) = math.sqrt(a.map(v => v * v).sum / a.length)
    // noise region shrinks by ~beta while signal survives
    assert(rms(y.take(16000)) < 0.2 * rms(x.take(16000)))
    assert(rms(y.drop(16000)) > 0.8 * rms(x.drop(16000)))
  }

  test("F7 frame VAD: 30 ms frames with padded last frame") {
    val fs = 16000
    val loud = Array.fill(fs / 2)(0.5)
    val quiet = Array.fill(fs / 2)(0.0)
    val flags = AudioDsp.vadFlags(loud ++ quiet)
    val frameLen = fs * 30 / 1000
    val expected = (loud.length + quiet.length + frameLen - 1) / frameLen
    assert(flags.length == expected)
    assert(flags.take(loud.length / frameLen).forall(identity))
    assert(!flags.last)
  }

  test("F10 features: silence vs tone are separable") {
    val fs = 16000
    val tone = Array.tabulate(fs)(i => 0.5 * math.sin(2 * math.Pi * 2000 * i / fs.toDouble))
    val quiet = Array.fill(fs)(0.0)
    val ft = AudioDsp.extractFeatures(tone)
    val fq = AudioDsp.extractFeatures(quiet)
    assert(ft.rms > 0.3 && fq.rms == 0.0)
    assert(ft.zcr > 0.1)
    assert(ft.centroidHz > 500.0)
  }
}
