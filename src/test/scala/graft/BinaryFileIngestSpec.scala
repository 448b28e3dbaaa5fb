package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import graft.functions.WavCodec

/** S5/S10 upload-ingest path end-to-end on the BUILT-IN binaryFile
  * source (reference: REST multipart upload `src/api/main.py:146-194`,
  * URL document source `src/workers/ocr_worker.py:296-300`): a
  * directory of WAV uploads → `spark.read.format("binaryFile")` →
  * size-cap predicate (P4) → LINEAR16 decode (S8) → per-file RMS/VAD
  * metrics. The same code reads an object store path on a cluster —
  * binaryFile is partition-parallel and prunes with pathGlobFilter. */
class BinaryFileIngestSpec extends SparkSpec {

  test("WAV uploads ingest, size-filter, and decode to expected RMS") {
    val dir = Files.createTempDirectory("graft_uploads")
    // one loud sine, one silence, one oversized reject
    def sine(n: Int, amp: Double): Array[Short] =
      Array.tabulate(n)(i => (math.sin(2 * math.Pi * 440 * i / 16000.0) * amp * 32767).toShort)
    Files.write(Paths.get(dir.toString, "loud.wav"),
      WavCodec.encode(sine(16000, 0.8)))
    Files.write(Paths.get(dir.toString, "silent.wav"),
      WavCodec.encode(Array.fill[Short](16000)(0)))
    Files.write(Paths.get(dir.toString, "huge.wav"),
      WavCodec.encode(sine(80000, 0.1)))

    val sizeCapBytes = 100000L // P4 analog (reference: 100 MB)
    val uploads = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.wav")
      .load(dir.toString)
      .filter(col("length") <= sizeCapBytes)

    import spark.implicits._
    val decoded = uploads
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .map { case (path, bytes) =>
        val wav = WavCodec.decode(bytes)
        val samples = wav.samples.map(_ / 32768.0)
        val rms = math.sqrt(samples.map(s => s * s).sum / math.max(1, samples.length))
        (path.split('/').last, wav.sampleRate, samples.length, rms)
      }
      .toDF("file", "rate", "n_samples", "rms")
      .collect()
      .map(r => r.getString(0) -> r)
      .toMap

    assert(decoded.size == 2, s"size cap should drop huge.wav: ${decoded.keys}")
    assert(decoded("loud.wav").getInt(1) == 16000)
    assert(decoded("loud.wav").getInt(2) == 16000)
    assert(decoded("loud.wav").getDouble(3) > 0.5) // ~0.8/sqrt(2)
    assert(decoded("silent.wav").getDouble(3) == 0.0)
  }
}
