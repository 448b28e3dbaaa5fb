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
}
