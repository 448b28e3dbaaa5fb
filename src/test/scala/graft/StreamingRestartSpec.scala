package graft

import scala.collection.mutable
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.functions.{ImageCodec, WavCodec}
import graft.functions.ImageOps.Gray
import graft.operators.WidePhash
import graft.streaming.{StreamingAudioDedup, StreamingDecontam,
  StreamingImageDedup, StreamingNearDup}
import graft.streaming.StreamingNearDup.{Doc, DupPair}

/** Kill-and-resume coverage for the streaming gates — the
  * CheckpointRecoverySpec contract extended to StreamingNearDup and
  * StreamingDecontam (round 10/11) and the perceptual image/audio
  * gates (VERDICT r16 #4): stop mid-stream, restart from the same
  * checkpoint, and assert no lost pairs and no emissions beyond each
  * gate's documented semantics (exactly-once for the band-pair gates,
  * at-least-once-per-shared-band for the perceptual gates). */
class StreamingRestartSpec extends SparkSpec {

  private val base =
    "the quick brown fox jumps over the lazy dog near the old river bank"
  private val nearDup =
    "the quick brown fox jumps over the lazy dog near the old river bend"
  private val unrelated =
    "completely different content about spark plans and shuffle exchanges"

  test("near-dup band state survives a restart: post-restart arrival matches pre-stop doc") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val dir = java.nio.file.Files.createTempDirectory("ckpt_nd").toString
    val input = MemoryStream[Doc]
    def startQuery() = StreamingNearDup.attach(input.toDS())
      .writeStream.format("parquet")
      .option("checkpointLocation", s"$dir/ckpt").option("path", s"$dir/out")
      .outputMode("append").start()

    // run 1: seed the band state, no matches yet, stop
    val q1 = startQuery()
    try {
      input.addData(Doc(1, base), Doc(2, unrelated))
      q1.processAllAvailable()
    } finally q1.stop()
    assert(spark.read.parquet(s"$dir/out").count() == 0,
      "nothing may match before a duplicate arrives")

    // run 2: same checkpoint — the near-dup of run 1's doc must match
    // (band state restored), and run 1's (empty) output must not grow
    // duplicates
    val q2 = startQuery()
    try {
      input.addData(Doc(3, nearDup))
      q2.processAllAvailable()
    } finally q2.stop()

    val pairs = spark.read.parquet(s"$dir/out").as[DupPair].collect()
    assert(pairs.nonEmpty,
      "run-1 band state must survive the restart and match the arrival")
    assert(pairs.map(p => (p.docId, p.matchId)).distinct.toSeq == Seq((3L, 1L)),
      s"only (3 matches 1) expected, got ${pairs.toList}")
    // identical signatures collide on BOTH bands, so the operator's
    // per-band contract emits the pair exactly twice — a restart replay
    // would show more
    assert(pairs.length == 2,
      s"expected the 2 per-band emissions and no restart replays: ${pairs.toList}")
  }

  test("image gate band state survives a restart; no replay beyond at-least-once") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val px = Array.tabulate(512) { i =>
      val x = i % 32; val y = i / 32
      (40 + (x / 4) * 25 + (y / 2) * 3).toByte
    }
    val png = ImageCodec.encode(Gray(32, 16, px), "png")
    val dir = java.nio.file.Files.createTempDirectory("ckpt_img").toString
    val input = MemoryStream[StreamingImageDedup.Img]
    def startQuery() = StreamingImageDedup.attach(input.toDS())
      .writeStream.format("parquet")
      .option("checkpointLocation", s"$dir/ckpt").option("path", s"$dir/out")
      .outputMode("append").start()

    // run 1: seed the 12 band states with image 1, stop mid-stream
    val q1 = startQuery()
    try {
      input.addData(StreamingImageDedup.Img(1, png))
      q1.processAllAvailable()
    } finally q1.stop()
    assert(spark.read.parquet(s"$dir/out").count() == 0)

    // run 2: same checkpoint — an exact copy must find image 1 via the
    // RESTORED band state, and run 1's committed (empty) batch must
    // not replay
    val q2 = startQuery()
    try {
      input.addData(StreamingImageDedup.Img(2, png))
      q2.processAllAvailable()
    } finally q2.stop()
    val pairs = spark.read.parquet(s"$dir/out")
      .as[StreamingImageDedup.DupPair].collect()
    assert(pairs.nonEmpty,
      "run-1 band state must survive the restart and match the arrival")
    assert(pairs.map(p => (p.imgId, p.matchId, p.hd)).distinct.toSeq ==
      Seq((2L, 1L, 0)), s"got ${pairs.toList}")
    // at-least-once per SHARED band, never more: identical hashes
    // share all 12 bands, so 1..12 emissions are legal, 13+ is a
    // restart replay
    assert(pairs.length >= 1 && pairs.length <= WidePhash.Blocks,
      s"beyond at-least-once-per-band: ${pairs.length} emissions")
  }

  test("audio gate band state survives a restart; no replay beyond at-least-once") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val samples = Array.tabulate(256) { i =>
      ((((i * 37 + 11) % 97) / 97.0 - 0.5) * 8192).toInt.toShort
    }
    val bytes = WavCodec.encode(samples)
    val blocks = graft.operators.PerceptualDedupIndex.AudioLayout.blocks
    val dir = java.nio.file.Files.createTempDirectory("ckpt_aud").toString
    val input = MemoryStream[StreamingAudioDedup.Clip]
    def startQuery() = StreamingAudioDedup.attach(input.toDS())
      .writeStream.format("parquet")
      .option("checkpointLocation", s"$dir/ckpt").option("path", s"$dir/out")
      .outputMode("append").start()

    val q1 = startQuery()
    try {
      input.addData(StreamingAudioDedup.Clip(1, bytes))
      q1.processAllAvailable()
    } finally q1.stop()
    assert(spark.read.parquet(s"$dir/out").count() == 0)

    val q2 = startQuery()
    try {
      input.addData(StreamingAudioDedup.Clip(2, bytes))
      q2.processAllAvailable()
    } finally q2.stop()
    val pairs = spark.read.parquet(s"$dir/out")
      .as[StreamingAudioDedup.DupPair].collect()
    assert(pairs.nonEmpty,
      "run-1 band state must survive the restart and match the arrival")
    assert(pairs.map(p => (p.clipId, p.matchId, p.hd)).distinct.toSeq ==
      Seq((2L, 1L, 0)), s"got ${pairs.toList}")
    assert(pairs.length >= 1 && pairs.length <= blocks,
      s"beyond at-least-once-per-band: ${pairs.length} emissions")
  }

  test("decontam gate resumes from checkpoint: committed batches not re-run, no doc lost") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val dir = java.nio.file.Files.createTempDirectory("ckpt_dc").toString
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("source"), col("text"))
      .as[(Long, String, String)].collect()
    val evalGrams = StreamingDecontam.evalGramSet(
      Tables.documents(spark, sf0001).filter(col("source") === "src0"))
    val (b1, b2) = docs.filter(_._2 != "src0").splitAt(100)

    // every verdict ever emitted, tagged with the run that emitted it
    val emitted = mutable.Buffer.empty[(Int, Long)]
    val input = MemoryStream[(Long, String, String)]
    def startQuery(run: Int) = StreamingDecontam.start(
      input.toDF().toDF("doc_id", "source", "text"), evalGrams,
      checkpointDir = Some(s"$dir/ckpt")) { (verdictDf, _) =>
      val ids = verdictDf.select("doc_id").collect().map(_.getLong(0))
      emitted.synchronized { emitted ++= ids.map(run -> _) }
    }

    val q1 = startQuery(1)
    try {
      input.addData(b1.toIndexedSeq)
      q1.processAllAvailable()
    } finally q1.stop()
    assert(emitted.map(_._2).toSet == b1.map(_._1).toSet,
      "run 1 must emit exactly its batch's verdicts")

    val q2 = startQuery(2)
    try {
      input.addData(b2.toIndexedSeq)
      q2.processAllAvailable()
    } finally q2.stop()

    val run2 = emitted.filter(_._1 == 2).map(_._2)
    // no lost verdicts: every doc of batch 2 is emitted after restart
    assert(run2.toSet == b2.map(_._1).toSet,
      s"run 2 must emit exactly batch 2's verdicts, got ${run2.size}")
    // no duplicate verdicts: run 1's committed batch is not re-run, and
    // no doc is ever emitted twice across the restart
    assert(emitted.map(_._2).distinct.length == emitted.length,
      "a committed batch was re-emitted across the restart")
    assert(emitted.map(_._2).toSet == (b1 ++ b2).map(_._1).toSet)
  }
}
