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
  * Image decode is REAL: [[ImageIODecoder]] decodes PNG / BMP / GIF /
  * JPEG / TIFF payloads with pure-JDK `javax.imageio` (via
  * [[graft.functions.ImageCodec]]) — real width/height, a hash and an
  * 8-bin intensity-histogram embedding over the DECODED pixels. VIDEO
  * decode is real for GIF containers (round 16, mirroring the r9
  * image graduation): [[ImageIODecoder.frames]] decodes every frame
  * through the JDK's multi-frame reader, features aggregate over the
  * true frame planes, and [[sampleFrames]] emits real decoded frames
  * re-encoded as PNG payloads. Audio rides the existing
  * [[graft.functions.WavCodec]] elsewhere; only non-JDK codecs (mp4
  * etc.) fall back to [[StubDecoder]]'s deterministic pseudo-features.
  * The Spark-side contract — schema, batch shape, partition scoping,
  * null passthrough — is identical either way and tested
  * (MultimodalSpec).
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
    /** The payload's decoded frame planes, when this decoder has a
      * REAL multi-frame path for it (GIF video on the JDK decoder);
      * None routes [[sampleFrames]] to the stub byte-slice path. */
    def frames(p: Payload): Option[Seq[graft.functions.ImageOps.Gray]] = None
  }

  /** STUB: deterministic pseudo-decode — the fallback for modalities
    * with no in-JDK codec (video) and for undecodable bytes. Image
    * decode is real ([[ImageIODecoder]]); a production deployment swaps
    * this residue for a JNI/codec-backed decoder, nothing else changes. */
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

  /** REAL image decode on pure-JDK ImageIO (S9, `ocr/service.py:447-464`).
    * Decodable image bytes yield true dimensions, a FNV hash of the
    * DECODED gray plane (not the container bytes — two encodings of the
    * same image hash identically), and an 8-bin intensity-histogram
    * embedding (each bin's pixel fraction, centered at 0). Undecodable
    * bytes and non-image modalities fall back to the stub so the
    * pipeline never throws on a bad payload (reference returns None and
    * routes to DLQ on cv2.imdecode failure). */
  final class ImageIODecoder extends Decoder {
    private val stub = new StubDecoder

    private def featuresOf(p: Payload,
        planes: Seq[graft.functions.ImageOps.Gray]): Features = {
      var h = 2166136261L
      val hist = new Array[Int](8)
      var n = 0L
      planes.foreach { g =>
        var i = 0
        while (i < g.px.length) {
          val v = g.px(i) & 0xff
          h = ((h ^ v) * 16777619L) & 0xffffffffL
          hist(v >> 5) += 1
          i += 1
        }
        n += g.px.length
      }
      val emb = Array.tabulate(8)(k => hist(k) / math.max(1L, n).toFloat - 0.5f)
      Features(p.id, p.modality, p.content.length.toLong,
        planes.head.w, planes.head.h, planes.length, h, emb)
    }

    /** REAL multi-frame path: GIF-container video through the JDK's
      * frame-by-frame reader — the video analog of the r9 image
      * graduation (SURVEY §2.12 S9); other video codecs stay behind
      * the stub seam (no codecs in a pure JDK). */
    override def frames(p: Payload)
        : Option[Seq[graft.functions.ImageOps.Gray]] =
      if (p.modality != "video" ||
        graft.functions.ImageCodec.sniffFormat(p.content) != "gif") None
      else Some(graft.functions.ImageCodec.decodeFrames(p.content))
        .filter(_.nonEmpty)

    override def decode(p: Payload): Features =
      if (p.modality == "image")
        graft.functions.ImageCodec.decode(p.content) match {
          case None => stub.decode(p)
          case Some(g) => featuresOf(p, Seq(g))
        }
      else frames(p) match {
        case Some(fs) => featuresOf(p, fs)
        case None => stub.decode(p)
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

  /** One sampled frame from a (video/audio) payload. */
  final case class Frame(
      id: Long,
      frameIdx: Int,
      offsetMs: Long,
      content: Array[Byte])

  /** Frame sampling: 1 payload → ≤ `n` frame rows, evenly spaced on the
    * stub decoder's frame axis (reference analog: frame extraction
    * before OCR/vision inference). The 1→N shape is a flatMap — rows
    * explode inside the partition, no shuffle; a real decoder swaps in
    * behind the same signature. The stub slices the payload bytes
    * deterministically so downstream tests have stable content. */
  def sampleFrames(payloads: Dataset[Payload], n: Int,
      mkDecoder: () => Decoder = () => new StubDecoder): Dataset[Frame] = {
    implicit val enc = Encoders.product[Frame]
    payloads.mapPartitions { it =>
      val decoder = mkDecoder()
      val frameMs = 40L // 25 fps timebase
      it.flatMap { p =>
        decoder.frames(p) match {
          case Some(planes) =>
            // REAL path (GIF video on ImageIODecoder): evenly-spaced
            // decoded frames, each re-encoded as a PNG payload — the
            // sampled rows are themselves consumable by the image leg
            // (decode → fingerprint → dedup)
            val take = math.min(n, planes.length)
            (0 until take).iterator.map { k =>
              val idx =
                if (take == 1) 0 else k * (planes.length - 1) / (take - 1)
              Frame(p.id, idx, idx * frameMs,
                graft.functions.ImageCodec.encode(planes(idx), "png"))
            }
          case None =>
            val f = decoder.decode(p)
            val take = math.min(n, f.nFrames)
            (0 until take).iterator.map { k =>
              val idx = if (take == 1) 0 else k * (f.nFrames - 1) / (take - 1)
              val sliceLen =
                math.max(1, p.content.length / math.max(1, f.nFrames))
              val start =
                math.max(0, math.min(p.content.length - 1, idx * sliceLen))
              Frame(p.id, idx, idx * frameMs, p.content.slice(start,
                math.min(p.content.length, start + sliceLen)))
            }
        }
      }
    }
  }

  /** Resize: metadata-transforming payload op (reference F18 adjust_dpi
    * / preprocess resize). The stub records the target dims and scale
    * factor; content passes through opaquely (a codec-backed impl would
    * re-encode). Pure per-row projection — stays in one codegen stage
    * around the mapPartitions seam. */
  final case class Resized(
      id: Long,
      modality: String,
      srcWidth: Int,
      srcHeight: Int,
      dstWidth: Int,
      dstHeight: Int,
      scale: Double,
      content: Array[Byte])

  def resizeStub(payloads: Dataset[Payload], dstW: Int, dstH: Int,
      mkDecoder: () => Decoder = () => new StubDecoder): Dataset[Resized] = {
    implicit val enc = Encoders.product[Resized]
    payloads.mapPartitions { it =>
      val decoder = mkDecoder()
      it.map { p =>
        val f = decoder.decode(p)
        val scale = math.min(dstW.toDouble / f.width, dstH.toDouble / f.height)
        Resized(p.id, p.modality, f.width, f.height, dstW, dstH,
          math.round(scale * 1e6) / 1e6, p.content)
      }
    }
  }

  /** REAL image resize (F18): decode via ImageIO, ASPECT-PRESERVING
    * fit inside the (dstW, dstH) box — one uniform scale on both axes,
    * like the reference's fx=fy adjust_dpi resize — via the integer
    * half-pixel-center NN kernel, re-encode as PNG. The emitted
    * dstWidth/dstHeight are the ACTUAL output dims (≤ the box), so the
    * reported `scale` is the scale that was really applied on both
    * axes. Undecodable payloads pass through with src dims 0×0 and
    * content untouched (DLQ-style passthrough, never a throw
    * mid-partition). Same per-partition batching seam as decodeAll. */
  def resizeImages(payloads: Dataset[Payload], dstW: Int, dstH: Int)
      : Dataset[Resized] = {
    implicit val enc = Encoders.product[Resized]
    payloads.mapPartitions { it =>
      it.map { p =>
        graft.functions.ImageCodec.decode(p.content) match {
          case Some(g) =>
            val scale = math.min(dstW.toDouble / g.w, dstH.toDouble / g.h)
            val outW = math.max(1, math.floor(g.w * scale + 0.5).toInt)
            val outH = math.max(1, math.floor(g.h * scale + 0.5).toInt)
            val r = graft.functions.ImageOps.resizeNN(g, outW, outH)
            Resized(p.id, p.modality, g.w, g.h, outW, outH,
              math.round(scale * 1e6) / 1e6,
              graft.functions.ImageCodec.encode(r, "png"))
          case None =>
            Resized(p.id, p.modality, 0, 0, dstW, dstH, 0.0, p.content)
        }
      }
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
