package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.functions.{ImageCodec, ImageOps}
import graft.functions.ImageOps.Gray
import graft.operators.WidePhash
import graft.streaming.StreamingImageDedup
import graft.streaming.StreamingImageDedup.{DupPair, Img}

/** Streaming image-dedup gate at PRODUCTION WIDTH: a later
  * near-identical image matches the earlier one on arrival
  * (cross-batch, 21-bit-block-keyed state — the same
  * [[WidePhash.block]] split as the batch join), emission is
  * AT-LEAST-ONCE per shared band (≤ 12 per pair), far images never
  * match, undecodable bytes are ignored, and — the ADVICE r15 case —
  * a pair is still found after per-band eviction as long as ONE
  * shared band retains the earlier image. Fixtures are REAL encoded
  * PNG/BMP bytes whose expected Hamming distances the test derives
  * from the same public kernels — nothing hand-pinned. */
class StreamingImageDedupSpec extends SparkSpec {

  // a 32×16 gradient plane with non-decreasing cell sums, so bump
  // effects on the wide hash are local and derivable
  private def basePlane: Array[Byte] =
    Array.tabulate(512) { i =>
      val x = i % 32; val y = i / 32
      (40 + (x / 4) * 25 + (y / 2) * 3).toByte
    }

  /** Brighten one 4×2 cell block (8×8-grid coordinates) by `delta`
    * per pixel, clamped. */
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
  private def wh(px: Array[Byte]): Array[Long] =
    StreamingImageDedup.hash(png(px)).get
  private def hd(a: Array[Byte], b: Array[Byte]): Int =
    WidePhash.hd(wh(a), wh(b))

  private def distinctPairs(table: String): Set[(Long, Long, Int)] = {
    import spark.implicits._
    spark.table(table).as[DupPair].collect()
      .map(p => (p.imgId, p.matchId, p.hd)).toSet
  }

  private def maxMultiplicity(table: String): Long = {
    import spark.implicits._
    val all = spark.table(table).as[DupPair].collect()
    if (all.isEmpty) 0L
    else all.groupBy(identity).values.map(_.length.toLong).max
  }

  test("near-identical arrival matches across batches; far never matches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val base = png(basePlane)
    // one bumped 8×8 cell flips a couple of wide comparisons
    val near = png(bumpCell(basePlane, 20, 120))
    // twelve spaced bumps put the image outside the hd ≤ 11 ball
    val farPx = Seq(5, 15, 25, 35, 45, 2, 12, 22, 32, 42, 52, 62)
      .foldLeft(basePlane)((p, c) => bumpCell(p, c, 120))
    val far = png(farPx)
    val nearHd = hd(basePlane, bumpCell(basePlane, 20, 120))
    assert(nearHd >= 1 && nearHd <= WidePhash.HdMax,
      s"fixture drifted: near hd=$nearHd")
    assert(hd(basePlane, farPx) > WidePhash.HdMax,
      s"fixture drifted: far hd=${hd(basePlane, farPx)}")

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
      assert(distinctPairs("imgdup_out") == Set((3L, 1L, nearHd)),
        s"pair set: ${distinctPairs("imgdup_out")}")
      // at-least-once is bounded by the band count
      assert(maxMultiplicity("imgdup_out") <= WidePhash.Blocks)
    } finally query.stop()
  }

  test("exact dup (identical bytes, hd=0) emits, bounded by 12 shared bands") {
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
      assert(distinctPairs("imgdup_exact") == Set((11L, 10L, 0)))
      val n = spark.table("imgdup_exact").count()
      assert(n >= 1 && n <= WidePhash.Blocks,
        s"identical hashes share all 12 bands; got $n emissions")
    } finally query.stop()
  }

  test("per-band eviction no longer loses a pair another band still holds") {
    // THE ADVICE r15 scenario: under round 15's first-matching-block
    // rule, a pair sharing block 0 could ONLY emit at band 0 — so once
    // the earlier image was evicted from band 0's bounded state the
    // pair was permanently missed even though 10 other bands still
    // held both entries. With at-least-once emission the pair surfaces
    // at any surviving shared band.
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val a = basePlane
    // bumps confined to the bottom rows: the evictor shares blocks
    // 0..10 with `a` (it evicts `a` from those bands at maxPerBand=1)
    // but differs at block 11, where `a` survives
    val evictor = Seq(50, 52, 54, 56, 58, 60, 62, 49, 51, 53, 55, 57, 59, 61)
      .foldLeft(basePlane)((p, c) => bumpCell(p, c, 120))
    val (ha, he) = (wh(a), wh(evictor))
    val shared = (0 until WidePhash.Blocks)
      .filter(k => WidePhash.block(ha, k) == WidePhash.block(he, k))
    assert(shared.contains(0) && shared.size < WidePhash.Blocks,
      s"fixture drifted: shared blocks $shared")
    val evictHd = WidePhash.hd(ha, he)

    val input = MemoryStream[Img]
    val query = StreamingImageDedup.attach(input.toDS(), maxPerBand = 1)
      .writeStream.format("memory").queryName("imgdup_evict")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      input.addData(Img(1, png(a)))
      query.processAllAvailable()
      input.addData(Img(2, png(evictor)))
      query.processAllAvailable()
      // the evictor displaced img 1 from every shared band (state
      // holds the newest entry per band at maxPerBand = 1); img 3 — an
      // exact copy of img 1 — must still find it via a non-shared band
      input.addData(Img(3, png(a)))
      query.processAllAvailable()
      val pairs = distinctPairs("imgdup_evict")
      assert(pairs.contains((3L, 1L, 0)),
        s"evicted-band pair lost — the ADVICE r15 recall bug is back: $pairs")
      // and nothing beyond the expected relation appears
      val legal = Set((3L, 1L, 0)) ++
        (if (evictHd <= WidePhash.HdMax)
          Set((2L, 1L, evictHd), (3L, 2L, evictHd)) else Set.empty)
      assert(pairs.subsetOf(legal), s"unexpected pairs: ${pairs -- legal}")
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
      assert(distinctPairs("imgdup_fmt") == Set((22L, 21L, 0)))
    } finally query.stop()
  }
}
