package graft.functions

/** Pure-Scala DSP kernels for the per-record audio transforms that are
  * inherently sequential (per-sample recurrences) and therefore run
  * inside `mapPartitions`/typed operators rather than as column
  * expressions (SURVEY.md §2.9 F1/F2/F6). Deterministic surrogates of
  * the reference's librosa/scipy paths:
  *
  *  - F1 `resample`: linear interpolation (`audio_processor.py:70-82`)
  *  - F2 `to_mono`: channel mean (`audio_processor.py:84-91`)
  *  - F6 `apply_agc`: attack 0.1 / release 0.9 smoothing, gain clamped
  *    to [0.1, 10] (`audio_processor.py:182-215`)
  */
object AudioDsp {

  /** F1: linear-interpolation resample srcRate → dstRate. */
  def resampleLinear(x: Array[Double], srcRate: Int, dstRate: Int): Array[Double] = {
    if (srcRate == dstRate || x.length == 0) return x.clone()
    val outLen = math.max(1, math.round(x.length.toLong * dstRate / srcRate.toDouble).toInt)
    val out = new Array[Double](outLen)
    val step = (x.length - 1).toDouble / math.max(1, outLen - 1)
    var i = 0
    while (i < outLen) {
      val pos = i * step
      val i0 = math.min(x.length - 1, pos.toInt)
      val i1 = math.min(x.length - 1, i0 + 1)
      val frac = pos - i0
      out(i) = x(i0) * (1.0 - frac) + x(i1) * frac
      i += 1
    }
    out
  }

  /** F2: interleaved multi-channel → mono mean. */
  def toMono(interleaved: Array[Double], channels: Int): Array[Double] = {
    require(channels > 0)
    if (channels == 1) return interleaved.clone()
    val n = interleaved.length / channels
    val out = new Array[Double](n)
    var i = 0
    while (i < n) {
      var s = 0.0
      var c = 0
      while (c < channels) { s += interleaved(i * channels + c); c += 1 }
      out(i) = s / channels
      i += 1
    }
    out
  }

  /** F5: high-pass filter — deterministic fixed-coefficient biquad
    * (Butterworth-style 2nd order at fc/fs; the reference's 4th-order
    * scipy filtfilt is surrogate'd by one causal pass, mirroring its
    * "attenuate DC/rumble" contract; `audio_processor.py:159-180`). */
  def highPass(x: Array[Double], fcHz: Double = 80.0,
      fsHz: Double = 16000.0): Array[Double] = {
    val k = math.tan(math.Pi * fcHz / fsHz)
    val q = math.sqrt(2.0) / 2.0
    val norm = 1.0 / (1.0 + k / q + k * k)
    val b0 = norm
    val b1 = -2.0 * norm
    val b2 = norm
    val a1 = 2.0 * (k * k - 1.0) * norm
    val a2 = (1.0 - k / q + k * k) * norm
    val out = new Array[Double](x.length)
    var x1 = 0.0; var x2 = 0.0; var y1 = 0.0; var y2 = 0.0
    var i = 0
    while (i < x.length) {
      val y = b0 * x(i) + b1 * x1 + b2 * x2 - a1 * y1 - a2 * y2
      x2 = x1; x1 = x(i); y2 = y1; y1 = y
      out(i) = y
      i += 1
    }
    out
  }

  /** F8/F9: silence detection + split — frame RMS below threshold for at
    * least `minSilenceFrames` consecutive frames splits the signal;
    * returns the loud segments (reference `audio_processor.py:280-382`).
    * Segment boundaries are frame-aligned; total kept+dropped length
    * equals the input length (conservation, tested). */
  def splitOnSilence(x: Array[Double], frameLen: Int = 400,
      threshold: Double = 0.01, minSilenceFrames: Int = 2)
      : Seq[Array[Double]] = {
    if (x.isEmpty) return Seq.empty
    val nFrames = (x.length + frameLen - 1) / frameLen
    val silent = Array.tabulate(nFrames) { f =>
      val a = f * frameLen
      val b = math.min(x.length, a + frameLen)
      var s = 0.0
      var i = a
      while (i < b) { s += x(i) * x(i); i += 1 }
      math.sqrt(s / (b - a)) < threshold
    }
    // frames belonging to a silence run of >= minSilenceFrames drop
    val drop = new Array[Boolean](nFrames)
    var f = 0
    while (f < nFrames) {
      if (silent(f)) {
        var g = f
        while (g < nFrames && silent(g)) g += 1
        if (g - f >= minSilenceFrames) { var h = f; while (h < g) { drop(h) = true; h += 1 } }
        f = g
      } else f += 1
    }
    val segs = Seq.newBuilder[Array[Double]]
    var start = -1
    f = 0
    while (f <= nFrames) {
      val keep = f < nFrames && !drop(f)
      if (keep && start < 0) start = f
      if (!keep && start >= 0) {
        segs += x.slice(start * frameLen, math.min(x.length, f * frameLen))
        start = -1
      }
      f += 1
    }
    segs.result()
  }

  /** F10: basic frame features — RMS, zero-crossing rate, and spectral
    * centroid via Goertzel probes at a fixed frequency grid
    * (deterministic surrogate of the MFCC/librosa stack,
    * `audio_processor.py:384-420`). */
  final case class Features(rms: Double, zcr: Double, centroidHz: Double)

  def extractFeatures(x: Array[Double], fsHz: Double = 16000.0): Features = {
    if (x.isEmpty) return Features(0.0, 0.0, 0.0)
    var energy = 0.0
    var crossings = 0
    var i = 0
    while (i < x.length) {
      energy += x(i) * x(i)
      if (i > 0 && ((x(i) >= 0) != (x(i - 1) >= 0))) crossings += 1
      i += 1
    }
    val rmsV = math.sqrt(energy / x.length)
    val zcrV = crossings.toDouble / x.length
    // Goertzel power at 16 log-spaced probe frequencies
    val probes = Array.tabulate(16)(k => 100.0 * math.pow(1.35, k))
      .filter(_ < fsHz / 2)
    var num = 0.0
    var den = 0.0
    for (fHz <- probes) {
      val w = 2.0 * math.Pi * fHz / fsHz
      val coeff = 2.0 * math.cos(w)
      var s0 = 0.0; var s1 = 0.0; var s2 = 0.0
      var j = 0
      while (j < x.length) {
        s0 = x(j) + coeff * s1 - s2
        s2 = s1; s1 = s0
        j += 1
      }
      val p = s1 * s1 + s2 * s2 - coeff * s1 * s2
      num += fHz * p
      den += p
    }
    Features(rmsV, zcrV, if (den > 0) num / den else 0.0)
  }

  /** F4 (surrogate): noise suppression by envelope subtraction — noise
    * floor estimated from the first `noiseSec` (like the reference's
    * first-0.5 s STFT estimate), over-subtraction α = 2.0, spectral
    * floor β = 0.01 (`audio_processor.py:116-157`). Works on the
    * amplitude envelope instead of STFT bins — deterministic, no FFT
    * dependency; the same α/β contract. */
  def denoiseSubtract(x: Array[Double], fsHz: Double = 16000.0,
      noiseSec: Double = 0.5, alpha: Double = 2.0,
      beta: Double = 0.01): Array[Double] = {
    if (x.isEmpty) return x.clone()
    val n0 = math.max(1, math.min(x.length, (fsHz * noiseSec).toInt))
    var noise = 0.0
    var i = 0
    while (i < n0) { noise += math.abs(x(i)); i += 1 }
    noise /= n0
    val out = new Array[Double](x.length)
    i = 0
    while (i < x.length) {
      val mag = math.abs(x(i))
      val cleaned = math.max(beta * mag, mag - alpha * noise)
      out(i) = if (x(i) >= 0) cleaned else -cleaned
      i += 1
    }
    out
  }

  /** F7: frame VAD — 30 ms frames, last frame zero-padded like the
    * reference (`audio_processor.py:217-278`); energy decision per
    * frame (the WebRTC classifier surrogate, same frame contract). */
  def vadFlags(x: Array[Double], fsHz: Double = 16000.0,
      frameMs: Int = 30, threshold: Double = 0.01): Array[Boolean] = {
    val frameLen = math.max(1, (fsHz * frameMs / 1000.0).toInt)
    val nFrames = (x.length + frameLen - 1) / frameLen
    Array.tabulate(nFrames) { f =>
      val a = f * frameLen
      val b = math.min(x.length, a + frameLen)
      var s = 0.0
      var i = a
      while (i < b) { s += x(i) * x(i); i += 1 }
      // zero-padding the last frame = dividing by the FULL frame length
      math.sqrt(s / frameLen) >= threshold
    }
  }

  /** F6: automatic gain control — per-sample envelope follower with
    * attack/release smoothing; gain bounded to [0.1, 10]. */
  def applyAgc(x: Array[Double], targetLevel: Double = 0.5,
      attack: Double = 0.1, release: Double = 0.9): Array[Double] = {
    val out = new Array[Double](x.length)
    var gain = 1.0
    var i = 0
    while (i < x.length) {
      val level = math.abs(x(i))
      val desired = if (level > 1e-9) targetLevel / level else gain
      val alpha = if (desired < gain) attack else release
      gain = gain + alpha * (desired - gain)
      gain = math.max(0.1, math.min(10.0, gain))
      out(i) = math.max(-1.0, math.min(1.0, x(i) * gain))
      i += 1
    }
    out
  }

  /** F6 trace form: same recurrence, but returns (final gain, number of
    * samples the limiter clipped) — the summary the oracle-checked q83
    * compares (the math is +, *, /, abs, min/max only: IEEE-exact and
    * engine-identical, unlike transcendental kernels). */
  def agcTrace(x: Array[Double], targetLevel: Double = 0.5,
      attack: Double = 0.1, release: Double = 0.9): (Double, Long) = {
    var gain = 1.0
    var nClip = 0L
    var i = 0
    while (i < x.length) {
      val level = math.abs(x(i))
      val desired = if (level > 1e-9) targetLevel / level else gain
      val alpha = if (desired < gain) attack else release
      gain = gain + alpha * (desired - gain)
      gain = math.max(0.1, math.min(10.0, gain))
      if (math.abs(x(i) * gain) > 1.0) nClip += 1L
      i += 1
    }
    (gain, nClip)
  }
}
