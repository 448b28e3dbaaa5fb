package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (driver north star): image/audio/video
  * payloads ride as opaque BINARY columns with typed metadata; decode /
  * feature-extraction runs batched behind `mapPartitions` (the Scala
  * analog of a pandas-batch UDF), one decoder init per partition —
  * exactly how a real codec/model handle would be scoped on a 1000-
  * executor cluster.
  *
  * The decode itself is a clearly-marked STUB (this container has no
  * image/audio codecs): [[StubDecoder]] produces deterministic
  * pseudo-features from the bytes. The Spark-side contract — schema,
  * batch shape, partition scoping, null passthrough — is real and
  * tested (MultimodalSpec).
  *
  * Reference analog: image decode + preprocess + feature extraction
  * (`src/ocr/service.py:447-464`, `src/preprocessing/image_processor.py`,
  * `src/preprocessing/audio_processor.py:384-420`).
  */
object Multimodal {

  /** A payload row: opaque bytes + declared modality/format metadata. */
  final case class Payload(
      id: Long,
      modality: String, // "image" | "audio" | "video"
      format: String, // e.g. "png", "wav" — from the ingest path
      content: Array[Byte])

  /** Extracted features: fixed schema regardless of modality. */
  final case class Features(
      id: Long,
      modality: String,
      byteLength: Long,
      width: Int, // image/video: pixels; audio: samples per channel
      height: Int, // image/video: pixels; audio: channels
      nFrames: Int, // video/audio frames sampled; 1 for stills
      contentHash: Long,
      embedding: Array[Float]) // 8-dim stub feature vector

  /** Decoder contract: one instance per partition (heavy init amortized
    * across the partition's rows, like a codec context or model). */
  trait Decoder extends Serializable {
    def decode(p: Payload): Features
  }

  /** STUB: deterministic pseudo-decode. A real deployment swaps this for
    * a JNI/codec-backed decoder; nothing else changes. */
  final class StubDecoder extends Decoder {
    override def decode(p: Payload): Features = {
      var h = 2166136261L
      var i = 0
      while (i < p.content.length) {
        h = ((h ^ (p.content(i) & 0xffL)) * 16777619L) & 0xffffffffL
        i += 1
      }
      val w = 1 + (h % 4096L).toInt
      val ht = 1 + ((h >> 12) % 4096L).toInt
      val frames = p.modality match {
        case "video" => 1 + (h % 16L).toInt
        case "audio" => 1 + (h % 512L).toInt
        case _ => 1
      }
      val emb = Array.tabulate(8) { k =>
        (((h >> (k * 4)) & 0xffL).toFloat / 255.0f) - 0.5f
      }
      Features(p.id, p.modality, p.content.length.toLong, w, ht, frames, h, emb)
    }
  }

  /** Batched decode: partition-scoped decoder init, streaming iterator
    * (no partition materialization). */
  def decodeAll(payloads: Dataset[Payload],
      mkDecoder: () => Decoder = () => new StubDecoder): Dataset[Features] = {
    implicit val enc = Encoders.product[Features]
    payloads.mapPartitions { it =>
      val decoder = mkDecoder() // once per partition
      it.map(decoder.decode)
    }
  }

  /** Documents table → payload rows (text bytes standing in for media
    * payloads on the synthetic corpus). */
  def payloadsFromDocuments(spark: SparkSession, dir: String): Dataset[Payload] = {
    implicit val enc = Encoders.product[Payload]
    graft.Tables.documents(spark, dir)
      .select(col("doc_id").as("id"),
        when(col("doc_id") % 3 === 0, "image")
          .when(col("doc_id") % 3 === 1, "audio")
          .otherwise("video").as("modality"),
        lit("stub").as("format"),
        encode(col("text"), "UTF-8").as("content"))
      .as[Payload]
  }

  /** DataFrame surface used by SparkEntry (rows-only check: the stubbed
    * decode is not SQL-expressible, by design). The embedding array is
    * surfaced as a CSV string — the rows-only checker loads this into
    * pandas and sorts it, which requires every column to be scalar. */
  def featuresQuery(spark: SparkSession, dir: String): DataFrame =
    decodeAll(payloadsFromDocuments(spark, dir)).toDF()
      .withColumn("embedding",
        array_join(transform(col("embedding"),
          e => format_number(e.cast("double"), 5)), ","))
}
