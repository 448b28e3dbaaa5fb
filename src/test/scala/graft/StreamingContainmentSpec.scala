package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.StreamingContainment
import graft.streaming.StreamingContainment.{ContainPair, Doc}

/** Streaming containment gate: the probe kernel is bit-identical to the
  * batch q168 constants, a quote-and-extend pair is surfaced on the
  * contained doc's arrival at ANY asymmetry (where banding collapses),
  * the containment estimate is ≈1 for true containment, unrelated docs
  * never surface, per-shingle state is df-capped, and shingle state
  * survives kill-and-resume. */
class StreamingContainmentSpec extends SparkSpec {

  // deterministic synthetic corpus: distinct words so trigram sets are
  // clean; quote = the first 12 words of container
  private def wordsOf(seed: Int, n: Int): String =
    (0 until n).map(i => s"w${seed}x$i").mkString(" ")

  test("hash32 / trigram kernel matches the batch engine expressions") {
    graft.expressions.OptimizerBarrier.register(spark)
    import spark.implicits._
    val texts = Seq("alpha beta gamma delta", "one two three")
    val df = texts.toDF("text")
      .withColumn("w", split(col("text"), " "))
      .select(
        expr("transform(w, x -> cast(conv(substring(md5(x), 1, 8), 16, 10) " +
          "as bigint))").as("wh"),
        expr("array_distinct(transform(sequence(0, size(w) - 3), " +
          "j -> cast(conv(substring(md5(concat(w[j], ' ', w[j+1], ' ', " +
          "w[j+2])), 1, 8), 16, 10) as bigint)))").as("th"))
      .collect()
    texts.zip(df).foreach { case (t, r) =>
      val words = t.split(' ')
      assert(words.map(StreamingContainment.hash32).toSeq ==
        r.getSeq[Long](0), s"word hash mismatch for '$t'")
      assert(StreamingContainment.triHashes(words).toSeq ==
        r.getSeq[Long](1), s"trigram hash mismatch for '$t'")
    }
  }

  test("quote-and-extend pair surfaces on arrival even at 8x asymmetry") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val quote = wordsOf(1, 12)
    val container = quote + " " + wordsOf(2, 84) // 8x the quote's length
    val unrelated = wordsOf(3, 24)

    val input = MemoryStream[Doc]
    val query = StreamingContainment.attach(input.toDS())
      .writeStream.format("memory").queryName("contain_out")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      input.addData(Doc(1, container), Doc(2, unrelated))
      query.processAllAvailable()
      assert(spark.table("contain_out").count() == 0,
        "nothing should surface before the contained doc arrives")

      input.addData(Doc(3, quote))
      query.processAllAvailable()
      val pairs = spark.table("contain_out").as[ContainPair].collect()
      assert(pairs.nonEmpty,
        "the contained arrival must probe-hit its container")
      assert(pairs.map(p => (p.docId, p.matchId)).distinct.toSeq ==
        Seq((3L, 1L)), s"only (3 contains-in 1) expected: ${pairs.toList}")
      // Ĉ = Ĵ(na+nb)/((1+Ĵ)min) is 1.0 in expectation for true
      // containment; with 8 perms it is coarse, so assert a loose floor
      assert(pairs.exists(_.estContainment >= 0.5),
        s"estimate too low for a fully-contained quote: ${pairs.toList}")
    } finally query.stop()
  }

  test("estimator is ~1 for exact duplicates and pairs emit per probing key only") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val base = wordsOf(5, 24)
    val input = MemoryStream[Doc]
    val query = StreamingContainment.attach(input.toDS())
      .writeStream.format("memory").queryName("contain_dup")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      input.addData(Doc(10, base))
      query.processAllAvailable()
      input.addData(Doc(11, base))
      query.processAllAvailable()
      val pairs = spark.table("contain_dup").as[ContainPair].collect()
      assert(pairs.nonEmpty && pairs.forall(p =>
          p.docId == 11 && p.matchId == 10 && p.estContainment == 1.0),
        s"${pairs.toList}")
      // identical docs share all 4 argmin probes → at most 4 emissions
      assert(pairs.length <= 4, s"more emissions than probe keys: ${pairs.length}")
    } finally query.stop()
  }

  test("df-cap evicts oldest entries per shingle key") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val base = wordsOf(7, 24)
    val input = MemoryStream[Doc]
    val query = StreamingContainment.attach(input.toDS(), maxPerShingle = 2)
      .writeStream.format("memory").queryName("contain_cap")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      input.addData(Doc(20, base), Doc(21, base), Doc(22, base))
      query.processAllAvailable()
      input.addData(Doc(23, base))
      query.processAllAvailable()
      val matchesOf23 = spark.table("contain_cap").as[ContainPair].collect()
        .filter(_.docId == 23).map(_.matchId).toSet
      assert(matchesOf23 == Set(21L, 22L),
        s"evicted doc 20 must not match; got $matchesOf23")
    } finally query.stop()
  }

  test("shingle state survives a restart") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val quote = wordsOf(8, 12)
    val container = quote + " " + wordsOf(9, 36)
    val dir = java.nio.file.Files.createTempDirectory("ckpt_ct").toString
    val input = MemoryStream[Doc]
    def startQuery() = StreamingContainment.attach(input.toDS())
      .writeStream.format("parquet")
      .option("checkpointLocation", s"$dir/ckpt").option("path", s"$dir/out")
      .outputMode("append").start()

    val q1 = startQuery()
    try {
      input.addData(Doc(1, container))
      q1.processAllAvailable()
    } finally q1.stop()
    assert(spark.read.parquet(s"$dir/out").count() == 0)

    val q2 = startQuery()
    try {
      input.addData(Doc(2, quote))
      q2.processAllAvailable()
    } finally q2.stop()
    val pairs = spark.read.parquet(s"$dir/out").as[ContainPair].collect()
    assert(pairs.map(p => (p.docId, p.matchId)).distinct.toSeq ==
      Seq((2L, 1L)), s"restored state must surface the pair: ${pairs.toList}")
  }
}
