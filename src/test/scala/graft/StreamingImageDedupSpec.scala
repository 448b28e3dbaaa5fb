package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.functions.{ImageCodec, ImageOps}
import graft.functions.ImageOps.Gray
import graft.streaming.StreamingImageDedup
import graft.streaming.StreamingImageDedup.{DupPair, Img}

/** Streaming image-dedup gate: a later near-identical image matches the
  * earlier one on arrival (cross-batch, block-keyed state), each pair
  * emits exactly once (first-matching-block), far images never match,
  * and undecodable bytes are ignored. Fixtures are REAL encoded PNG/BMP
  * bytes whose expected Hamming distances the test derives from the
  * same public kernels — nothing hand-pinned. */
class StreamingImageDedupSpec extends SparkSpec {

  // a 32×16 gradient plane with strictly increasing cell sums, so every
  // dHash comparison is decisive (no ties to blur the flip math)
  private def basePlane: Array[Byte] =
    Array.tabulate(512) { i =>
      val x = i % 32; val y = i / 32
      (40 + (x / 4) * 25 + (y / 2) * 3).toByte
    }

  /** Brighten one 4×2 cell block by `delta` per pixel. */
  private def bumpCell(px: Array[Byte], c: Int, delta: Int): Array[Byte] = {
    val out = px.clone()
    val x0 = (c % 8) * 4; val y0 = (c / 8) * 2
    for (dy <- 0 until 2; dx <- 0 until 4) {
      val i = (y0 + dy) * 32 + x0 + dx
      out(i) = math.min(255, (out(i) & 0xff) + delta).toByte
    }
    out
  }

  private def png(px: Array[Byte]): Array[Byte] =
    ImageCodec.encode(Gray(32, 16, px), "png")
  private def hd(a: Array[Byte], b: Array[Byte]): Int =
    java.lang.Long.bitCount(
      StreamingImageDedup.hash(a).get ^ StreamingImageDedup.hash(b).get)

  test("near-identical arrival matches across batches; one emission per pair") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val base = png(basePlane)
    // flipping cell 20 hard enough flips its two neighbor comparisons
    val near = png(bumpCell(basePlane, 20, 120))
    // on the increasing gradient each isolated bump flips exactly ONE
    // comparison (the bumped cell now exceeds its right neighbor), so
    // five spaced bumps put the image safely outside the hd ≤ 3 ball
    val far = png(bumpCell(bumpCell(bumpCell(bumpCell(bumpCell(
      basePlane, 5, 120), 15, 120), 25, 120), 35, 120), 45, 120))
    val nearHd = hd(base, near)
    assert(nearHd >= 1 && nearHd <= 3, s"fixture drifted: near hd=$nearHd")
    assert(hd(base, far) > 3, s"fixture drifted: far hd=${hd(base, far)}")

    val input = MemoryStream[Img]
    val query = StreamingImageDedup.attach(input.toDS())
      .writeStream.format("memory").queryName("imgdup_out")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      input.addData(Img(1, base), Img(2, far))
      query.processAllAvailable()
      assert(spark.table("imgdup_out").count() == 0,
        "nothing may match before a duplicate arrives")

      input.addData(Img(3, near))
      query.processAllAvailable()
      val pairs = spark.table("imgdup_out").as[DupPair].collect()
      assert(pairs.toSeq == Seq(DupPair(3, 1, nearHd)),
        s"exactly one emission for (3,1) expected, got ${pairs.toList}")
    } finally query.stop()
  }

  test("exact dup (identical bytes, hd=0) emits once despite 4 shared blocks") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val base = png(basePlane)
    val input = MemoryStream[Img]
    val query = StreamingImageDedup.attach(input.toDS())
      .writeStream.format("memory").queryName("imgdup_exact")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      input.addData(Img(10, base), Img(11, base))
      query.processAllAvailable()
      val pairs = spark.table("imgdup_exact").as[DupPair].collect()
      assert(pairs.toSeq == Seq(DupPair(11, 10, 0)),
        s"first-matching-block must collapse the 4 block hits: ${pairs.toList}")
    } finally query.stop()
  }

  test("undecodable bytes are ignored; BMP and PNG encodings of one plane match") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    assert(StreamingImageDedup.hash("not an image".getBytes).isEmpty)

    val input = MemoryStream[Img]
    val query = StreamingImageDedup.attach(input.toDS())
      .writeStream.format("memory").queryName("imgdup_fmt")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      input.addData(Img(20, "garbage".getBytes), Img(21, png(basePlane)))
      query.processAllAvailable()
      assert(spark.table("imgdup_fmt").count() == 0)

      // the SAME plane through a different container must still dup:
      // the fingerprint is content-addressed, not byte-addressed
      input.addData(
        Img(22, ImageCodec.encode(Gray(32, 16, basePlane), "bmp")))
      query.processAllAvailable()
      val pairs = spark.table("imgdup_fmt").as[DupPair].collect()
      assert(pairs.toSeq == Seq(DupPair(22, 21, 0)), s"${pairs.toList}")
    } finally query.stop()
  }
}
