package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.StreamingNearDup
import graft.streaming.StreamingNearDup.{Doc, DupPair}

/** Streaming near-dup gate: a near-identical later arrival matches the
  * earlier doc (cross-batch, via band-keyed state), unrelated docs never
  * match, same-batch dups match in docId order, and per-band state stays
  * bounded. */
class StreamingNearDupSpec extends SparkSpec {

  private val base =
    "the quick brown fox jumps over the lazy dog near the old river bank"
  private val nearDup =
    "the quick brown fox jumps over the lazy dog near the old river bend"
  private val unrelated =
    "completely different content about spark plans and shuffle exchanges"

  test("near-identical arrival matches the earlier doc across batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val input = MemoryStream[Doc]
    val query = StreamingNearDup.attach(input.toDS())
      .writeStream.format("memory").queryName("neardup_out")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      input.addData(Doc(1, base), Doc(2, unrelated))
      query.processAllAvailable()
      assert(spark.table("neardup_out").count() == 0,
        "nothing should match before a duplicate arrives")

      input.addData(Doc(3, nearDup))
      query.processAllAvailable()
      val pairs = spark.table("neardup_out").as[DupPair].collect()
      assert(pairs.nonEmpty, "the near-dup must be detected on arrival")
      assert(pairs.forall(p => p.docId == 3 && p.matchId == 1),
        s"only (3 matches 1) expected, got ${pairs.toList}")
      assert(pairs.forall(_.estJaccard >= 0.5), s"${pairs.toList}")
    } finally query.stop()
  }

  test("same-batch duplicates match in docId order; exact dup scores 1.0") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val input = MemoryStream[Doc]
    val query = StreamingNearDup.attach(input.toDS())
      .writeStream.format("memory").queryName("neardup_same")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      input.addData(Doc(10, base), Doc(11, base), Doc(12, unrelated))
      query.processAllAvailable()
      val pairs = spark.table("neardup_same").as[DupPair].collect()
        .map(p => (p.docId, p.matchId, p.estJaccard)).distinct
      assert(pairs.toSet == Set((11L, 10L, 1.0)),
        s"the later docId must match the earlier one, got ${pairs.toList}")
    } finally query.stop()
  }

  test("the TTL variant still detects and registers timeouts") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val input = MemoryStream[Doc]
    // A long TTL: behavior must be identical to NoTimeout within the
    // spec's horizon (the timeout wiring itself — hasTimedOut branch,
    // setTimeoutDuration — is the code under test; firing a
    // processing-time timeout deterministically isn't). NOTE: with
    // ProcessingTimeTimeout registered the engine re-plans timeout
    // batches forever, so processAllAvailable() never observes a
    // quiescent stream — poll the sink with a deadline instead.
    val query = StreamingNearDup.attach(input.toDS(), stateTtlMs = 3600000L)
      .writeStream.format("memory").queryName("neardup_ttl")
      .outputMode("append").trigger(Trigger.ProcessingTime(100)).start()
    try {
      input.addData(Doc(30, base), Doc(31, nearDup))
      val deadline = System.currentTimeMillis() + 60000
      var pairs = Array.empty[DupPair]
      while (pairs.isEmpty && System.currentTimeMillis() < deadline) {
        Thread.sleep(200)
        pairs = spark.table("neardup_ttl").as[DupPair].collect()
      }
      assert(pairs.nonEmpty, "no pair within the 60 s deadline")
      assert(pairs.forall(p => p.docId == 31 && p.matchId == 30),
        s"${pairs.toList}")
    } finally query.stop()
  }

  test("per-band state is bounded by maxPerBand") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val input = MemoryStream[Doc]
    // cap of 2: after docs 20,21,22 (identical → same bands), doc 20
    // must have been evicted, so a 4th copy matches only 22 and 21.
    val query = StreamingNearDup.attach(input.toDS(), maxPerBand = 2)
      .writeStream.format("memory").queryName("neardup_cap")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      input.addData(Doc(20, base), Doc(21, base), Doc(22, base))
      query.processAllAvailable()
      input.addData(Doc(23, base))
      query.processAllAvailable()
      val matchesOf23 = spark.table("neardup_cap").as[DupPair].collect()
        .filter(_.docId == 23).map(_.matchId).toSet
      assert(matchesOf23 == Set(21L, 22L),
        s"evicted doc 20 must not match; got $matchesOf23")
    } finally query.stop()
  }
}
