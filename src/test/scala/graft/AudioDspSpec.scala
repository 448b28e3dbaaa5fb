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

  test("F4 spectral denoise: noise suppressed, signal band kept, guards intact") {
    // deterministic "noise" (LCG-ish rational) + a strong period-8
    // tone after the noise-estimation quarter
    def noise(i: Int): Double = ((i * 31 + 17) % 97) / 97.0 - 0.5
    val n = 512
    val x = Array.tabulate(n) { i =>
      val tone = if (i >= n / 4) math.sin(2 * math.Pi * i / 8.0) else 0.0
      0.9 * tone + 0.2 * noise(i)
    }
    val y = AudioDsp.denoiseSpectral(x)
    assert(y.length == n)
    // the noise-only leading quarter is strongly attenuated
    def energy(a: Array[Double], from: Int, until: Int): Double =
      (from until until).map(i => a(i) * a(i)).sum
    val headIn = energy(x, 8, n / 4) // skip the zero-weight window edge
    val headOut = energy(y, 8, n / 4)
    assert(headOut < 0.35 * headIn,
      s"noise not suppressed: $headOut vs $headIn")
    // the tone region keeps most of its energy (alpha-oversubtraction
    // costs some, but the tone bin is far above the noise floor)
    val toneIn = energy(x, n / 2, n - 8)
    val toneOut = energy(y, n / 2, n - 8)
    assert(toneOut > 0.5 * toneIn, s"signal destroyed: $toneOut vs $toneIn")
    // reference guard: too short for denoising -> returned unchanged
    val short = Array.tabulate(200)(i => noise(i))
    assert(AudioDsp.denoiseSpectral(short).toSeq == short.toSeq)
    // silence in, silence out
    assert(AudioDsp.denoiseSpectral(new Array[Double](256)).forall(_ == 0.0))
  }

  test("F4 spectral denoise: off-grid tail passes through, not zeroed") {
    // n = 300: frames = (300-64)/16+1 = 15, coverage ends at 14*16+64 =
    // 288 — samples 288..299 are never windowed into any frame and must
    // come back unchanged (they used to be silently zeroed).
    def noise(i: Int): Double = ((i * 31 + 17) % 97) / 97.0 - 0.5
    val n = 300
    val x = Array.tabulate(n)(i =>
      (if (i >= n / 4) 0.8 * math.sin(2 * math.Pi * i / 8.0) else 0.0)
        + 0.2 * noise(i))
    val y = AudioDsp.denoiseSpectral(x)
    assert(y.length == n)
    val covered = ((n - 64) / 16) * 16 + 64
    assert(covered == 288)
    (covered until n).foreach { i =>
      assert(y(i) == x(i), s"tail sample $i not passed through")
    }
    // and the covered region is still actually denoised (not pass-through)
    assert((64 until covered).exists(i => y(i) != x(i)))
    // frame-aligned input (n % grid == 0) has no pass-through region:
    // identical to the pre-fix kernel, so the q159 oracle is unaffected
    val aligned = Array.tabulate(256)(i => x(i))
    assert(AudioDsp.denoiseSpectral(aligned).length == 256)
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

  test("F5 filtfilt: zero-phase (peak not delayed) and DC fully removed") {
    import AudioDsp.Spectral.{FsHz => _}
    val fs = 16000.0
    // DC + a 1 kHz burst centered at sample 512
    val n = 1024
    val x = Array.tabulate(n) { i =>
      0.7 + (if (math.abs(i - 512) < 64)
        0.3 * math.sin(2 * math.Pi * 1000 * i / fs) else 0.0)
    }
    val y = AudioDsp.highPassFiltFilt(x, 80.0, fs)
    // DC gone: mean of the steady region ~0 (single-pass biquad leaves
    // a decaying transient; filtfilt kills it from both ends)
    val steady = y.slice(200, 440)
    assert(math.abs(steady.sum / steady.length) < 1e-3)
    // zero-phase: the burst's energy centroid stays centered (a causal
    // order-4 filter would delay it by several samples)
    def centroid(v: Array[Double], a: Int, b: Int): Double = {
      var num = 0.0; var den = 0.0
      for (i <- a until b) { num += i * v(i) * v(i); den += v(i) * v(i) }
      num / den
    }
    val cIn = centroid(x.map(_ - 0.7), 448, 576)
    val cOut = centroid(y, 448, 576)
    assert(math.abs(cIn - cOut) < 1.0, s"phase shift: $cIn vs $cOut")
  }

  test("F10 spectral: MFCC/bandwidth/rolloff track signal structure") {
    import AudioDsp.Spectral
    // pure tone near bin 8 (125 Hz at fs=1000, N=64): rolloff low,
    // bandwidth narrow; white-ish alternation: rolloff high
    val tone = Array.tabulate(Spectral.N)(i =>
      math.sin(2 * math.Pi * 8 * i / Spectral.N))
    val alt = Array.tabulate(Spectral.N)(i => if (i % 2 == 0) 1.0 else -1.0)
    val fTone = AudioDsp.spectralFeatures(tone)
    val fAlt = AudioDsp.spectralFeatures(alt)
    assert(math.abs(fTone.centroidHz - 125.0) < 5.0)
    assert(fTone.bandwidthHz < 30.0)
    assert(fTone.rolloffHz <= 187.5 && fAlt.rolloffHz === 500.0)
    assert(fAlt.centroidHz > 450.0)
    assert(fTone.mfcc.length == Spectral.NMfcc)
    // loudness moves mfcc0 (log-energy axis) up
    val loud = tone.map(_ * 10.0)
    assert(AudioDsp.spectralFeatures(loud).mfcc(0) > fTone.mfcc(0))
  }

  test("F11 preprocess chain: stereo 44.1k -> mono 16k, leveled, DC-free") {
    val srcRate = 44100
    // 2 s stereo: first second near-silent (the denoiser's noise
    // estimation window), second second a quiet 150 Hz tone on a small
    // DC offset. (The envelope denoiser treats a STEADY signal in its
    // estimation window as noise — unlike the reference's spectral
    // estimator — so the fixture gives it a genuine silent lead-in.)
    val n = 2 * srcRate
    val x = new Array[Double](n * 2)
    for (i <- srcRate until n) {
      val v = 0.02 + 0.05 * math.sin(2 * math.Pi * 150 * i / srcRate)
      x(2 * i) = v; x(2 * i + 1) = v
    }
    val y = AudioDsp.preprocess(x, srcRate, channels = 2)
    // resampled to 16k mono
    assert(math.abs(y.length - n.toLong * 16000 / srcRate) <= 1)
    // output bounded by the AGC limiter
    assert(y.forall(v => v >= -1.0 && v <= 1.0))
    // steady tone region: central part of the second half
    val steady = y.slice(y.length * 5 / 8, y.length * 7 / 8)
    // DC removed by the zero-phase high-pass
    assert(math.abs(steady.sum / steady.length) < 0.02,
      s"residual DC: ${steady.sum / steady.length}")
    // the quiet tone was brought up toward the AGC target
    val rms = math.sqrt(steady.map(v => v * v).sum / steady.length)
    assert(rms > 0.05, s"level not raised: $rms")
  }

  test("P8 WebRTC-shaped VAD: voiced passes, noise rejected, agg ordering") {
    val fs = 16000.0
    // voiced: strong low-ZCR 200 Hz tone; noise: weak high-ZCR alternation
    val voiced = Array.tabulate(480)(i => 0.5 * math.sin(2 * math.Pi * 200 * i / fs))
    val fricative = Array.tabulate(480)(i => 0.05 * (if (i % 2 == 0) 1.0 else -1.0))
    val loudNoise = Array.tabulate(480)(i => 0.9 * (if (i % 2 == 0) 1.0 else -1.0))
    assert(AudioDsp.vadFrames(voiced, fs).forall(identity))
    assert(!AudioDsp.vadFrames(fricative, fs).exists(identity))
    // loud-override: high ZCR but way above the energy bar still passes
    assert(AudioDsp.vadFrames(loudNoise, fs).forall(identity))
    // monotone in aggressiveness: stricter modes accept a subset
    val marginal = Array.tabulate(480)(i => 0.035 * math.sin(2 * math.Pi * 200 * i / fs))
    val accepts = (0 to 3).map(a =>
      AudioDsp.vadFrames(marginal, fs, aggressiveness = a).count(identity))
    assert(accepts == accepts.sorted.reverse, s"not monotone: $accepts")
  }

  test("F10 tempo/beats: periodic onset train recovers its lag") {
    // impulse train with period 8 → energy flux spikes every 8 samples;
    // autocorrelation over lags 6..16 must peak at 8 (bpm = 960/8 = 120)
    val x = Array.tabulate(64)(i => if (i % 8 == 0) 1.0 else 0.0)
    val t = AudioDsp.tempoBeats(x)
    assert(t.lagFrames == 8, s"lag: ${t.lagFrames}")
    assert(math.abs(t.bpm - 120.0) < 1e-9)
    // 7 rising edges above the mean (the i=0 impulse has no predecessor)
    assert(t.beats == 7L, s"beats: ${t.beats}")
    // constant signal: zero envelope everywhere → smallest lag, no beats
    val flat = Array.fill(64)(0.25)
    val tf = AudioDsp.tempoBeats(flat)
    assert(tf.lagFrames == 6 && tf.beats == 0L && tf.strength == 0.0)
    // too short → zeroed result
    assert(AudioDsp.tempoBeats(Array.fill(10)(1.0)).lagFrames == 0)
  }
}
