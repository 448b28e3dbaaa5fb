package graft.functions

import java.nio.{ByteBuffer, ByteOrder}

/** Minimal RIFF/WAV plumbing for LINEAR16 PCM — the reference's test
  * fixture builds this 44-byte header by hand (F32,
  * `tests/conftest.py:107-146`) and its decode path divides int16 by
  * 32768 (S8, `src/workers/stt_worker.py:381-394`,
  * `src/stt/service.py:257-285`). */
object WavCodec {

  /** 44-byte canonical PCM header + payload. */
  def encode(samples: Array[Short], sampleRate: Int = 16000,
      channels: Short = 1): Array[Byte] = {
    val dataLen = samples.length * 2
    val buf = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
    buf.put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
    buf.putShort(1) // PCM
    buf.putShort(channels)
    buf.putInt(sampleRate)
    buf.putInt(sampleRate * channels * 2) // byte rate
    buf.putShort((channels * 2).toShort) // block align
    buf.putShort(16) // bits per sample
    buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(buf.putShort)
    buf.array()
  }

  final case class Wav(sampleRate: Int, channels: Int, samples: Array[Short])

  /** Parse the canonical header layout (fails loudly on anything else —
    * fixtures only, like the reference's). */
  def decode(bytes: Array[Byte]): Wav = {
    require(bytes.length >= 44, "truncated WAV")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val riff = new Array[Byte](4); buf.get(riff)
    require(new String(riff, "US-ASCII") == "RIFF", "not RIFF")
    buf.getInt() // chunk size
    val wave = new Array[Byte](4); buf.get(wave)
    require(new String(wave, "US-ASCII") == "WAVE", "not WAVE")
    val fmt = new Array[Byte](4); buf.get(fmt)
    require(new String(fmt, "US-ASCII") == "fmt ", "missing fmt chunk")
    require(buf.getInt() == 16, "non-PCM fmt size")
    require(buf.getShort() == 1, "not PCM")
    val channels = buf.getShort().toInt
    val rate = buf.getInt()
    buf.getInt(); buf.getShort(); buf.getShort()
    val data = new Array[Byte](4); buf.get(data)
    require(new String(data, "US-ASCII") == "data", "missing data chunk")
    val dataLen = buf.getInt()
    val n = math.min(dataLen, bytes.length - 44) / 2
    val samples = new Array[Short](n)
    var i = 0
    while (i < n) { samples(i) = buf.getShort(); i += 1 }
    Wav(rate, channels, samples)
  }

  /** S8: LINEAR16 → normalized float64 in [-1, 1) (int16 / 32768). */
  def decodeLinear16(pcm: Array[Byte]): Array[Double] = {
    val buf = ByteBuffer.wrap(pcm).order(ByteOrder.LITTLE_ENDIAN)
    val out = new Array[Double](pcm.length / 2)
    var i = 0
    while (i < out.length) { out(i) = buf.getShort() / 32768.0; i += 1 }
    out
  }
}
