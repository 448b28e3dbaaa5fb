package graft

import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal

class MultimodalSpec extends SparkSpec {

  test("stub decode is deterministic and schema-stable across partitions") {
    val a = Multimodal.featuresQuery(spark, sf0001).orderBy("id").collect()
    val b = Multimodal.featuresQuery(spark, sf0001).repartition(7)
      .orderBy("id").collect()
    assert(a.length == b.length && a.length > 0)
    // same rows regardless of partitioning (decoder is partition-scoped
    // but content-deterministic)
    assert(a.map(_.getLong(0)).sameElements(b.sortBy(_.getLong(0)).map(_.getLong(0))))
    val fa = Multimodal.featuresQuery(spark, sf0001)
    assert(fa.schema.fieldNames.toSeq ==
      Seq("id", "modality", "byteLength", "width", "height", "nFrames",
        "contentHash", "embedding"))
  }

  test("byte length survives the decode (payload integrity)") {
    val f = Multimodal.featuresQuery(spark, sf0001)
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id").as("id"), length(col("text")).cast("long").as("n"))
    val joined = f.join(docs, "id")
    assert(joined.filter(col("byteLength") =!= col("n")).count() == 0)
  }

  test("frame sampling: bounded count, ordered offsets, stable content") {
    val payloads = Multimodal.payloadsFromDocuments(spark, sf0001)
    val frames = Multimodal.sampleFrames(payloads, 4).collect()
    assert(frames.nonEmpty)
    // ≤ 4 frames per payload, frameIdx strictly increasing per id
    val byId = frames.groupBy(_.id)
    assert(byId.values.forall(_.length <= 4))
    for (fs <- byId.values) {
      val idxs = fs.sortBy(_.frameIdx).map(_.frameIdx).toSeq
      assert(idxs == idxs.distinct.sorted, s"non-monotonic frames: $idxs")
      assert(fs.forall(f => f.offsetMs == f.frameIdx * 40L))
    }
    // deterministic across re-runs and partitioning
    val again = Multimodal.sampleFrames(payloads.repartition(7), 4).collect()
    assert(again.map(f => (f.id, f.frameIdx, f.content.toSeq)).toSet ==
      frames.map(f => (f.id, f.frameIdx, f.content.toSeq)).toSet)
  }

  test("resize stub: aspect-preserving scale against stub dims") {
    val payloads = Multimodal.payloadsFromDocuments(spark, sf0001)
    val resized = Multimodal.resizeStub(payloads, 640, 480).collect()
    assert(resized.nonEmpty)
    for (r <- resized) {
      assert(r.dstWidth == 640 && r.dstHeight == 480)
      val expected = math.min(640.0 / r.srcWidth, 480.0 / r.srcHeight)
      assert(math.abs(r.scale - expected) < 1e-5)
      assert(r.content.nonEmpty) // opaque passthrough
    }
  }

  test("GIF video decodes for REAL: features and frames over true planes") {
    import spark.implicits._
    import graft.functions.{ImageCodec, ImageOps}
    // two 3-frame "videos": moving-gradient planes, full-size frames
    def plane(seed: Int, j: Int): ImageOps.Gray =
      ImageOps.Gray(32, 16, Array.tabulate(512) { i =>
        (40 + ((i % 32 + j * 2 + seed) % 8) * 25).toByte
      })
    val vids = Seq(
      Multimodal.Payload(1L, "video", "gif",
        ImageCodec.encodeGifFrames((0 until 3).map(plane(0, _)))),
      Multimodal.Payload(2L, "video", "gif",
        ImageCodec.encodeGifFrames((0 until 3).map(plane(5, _)))),
      // an mp4-ish payload stays on the stub seam
      Multimodal.Payload(3L, "video", "mp4", Array[Byte](1, 2, 3, 4)))
    val ds = spark.createDataset(vids)
    val feats = Multimodal.decodeAll(ds, () => new Multimodal.ImageIODecoder)
      .collect().map(f => f.id -> f).toMap
    // real frame counts and dimensions for the GIF videos
    assert(feats(1L).nFrames == 3 && feats(1L).width == 32 &&
      feats(1L).height == 16, s"${feats(1L)}")
    assert(feats(2L).nFrames == 3)
    // content-addressed: the two distinct videos hash differently
    assert(feats(1L).contentHash != feats(2L).contentHash)
    // the stub fallback still covers the non-JDK codec
    assert(feats(3L).nFrames == 1 + (feats(3L).contentHash % 16L).toInt)

    // sampleFrames rides the REAL path: decoded frames re-encoded as
    // PNG — and each sampled frame decodes back to the ORIGINAL plane
    val frames = Multimodal
      .sampleFrames(ds.filter(col("id") === 1L), 3,
        () => new Multimodal.ImageIODecoder)
      .collect().sortBy(_.frameIdx)
    assert(frames.map(_.frameIdx).toSeq == Seq(0, 1, 2))
    for (f <- frames) {
      val g = ImageCodec.decode(f.content).get
      assert(g.px.sameElements(plane(0, f.frameIdx).px),
        s"frame ${f.frameIdx} did not round-trip the container")
    }
  }

  test("embedding stub is 8-dim and bounded") {
    // typed surface: real array
    import spark.implicits._
    val typed = Multimodal.decodeAll(
      Multimodal.payloadsFromDocuments(spark, sf0001)).toDF()
    assert(typed.filter(size(col("embedding")) =!= 8).count() == 0)
    assert(typed.filter(exists(col("embedding"),
      x => abs(x) > 0.5001)).count() == 0)
    // DataFrame surface: CSV string (scalar-only for the rows checker)
    val f = Multimodal.featuresQuery(spark, sf0001)
    assert(f.schema("embedding").dataType.typeName == "string")
    assert(f.filter(size(split(col("embedding"), ",")) =!= 8).count() == 0)
  }
}
