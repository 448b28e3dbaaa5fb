package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.StreamingDedup
import graft.streaming.StreamingDedup.Doc

/** Ingest-time streaming dedup: same-batch and cross-batch duplicates
  * within the horizon are dropped, distinct content always passes, and a
  * fingerprint is RE-admitted after the watermark evicts its state row —
  * the bounded-state trade that makes the operator viable at 100 TB. */
class StreamingDedupSpec extends SparkSpec {

  private val M = 60L * 1000 // one minute in millis

  test("dedups within the horizon, re-admits after watermark eviction") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val input = MemoryStream[Doc]
    val query = StreamingDedup.attach(input.toDS(), "10 minutes")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      // batch 1: duplicate inside one batch + a distinct doc
      input.addData(
        Doc(1, 0 * M, "alpha"), Doc(2, 1 * M, "alpha"), Doc(3, 2 * M, "beta"))
      query.processAllAvailable()
      // batch 2: duplicate across batches, still inside the horizon
      input.addData(Doc(4, 5 * M, "alpha"), Doc(5, 5 * M, "gamma"))
      query.processAllAvailable()
      // batch 3: advance event time so the watermark (max - 10 min)
      // passes alpha's state expiry and evicts it
      input.addData(Doc(6, 31 * M, "delta"))
      query.processAllAvailable()
      // batch 4: same content re-admitted after eviction
      input.addData(Doc(7, 32 * M, "alpha"))
      query.processAllAvailable()

      val kept = spark.table("dedup_out")
        .select("doc_id").as[Long].collect().toSet
      // Same-batch duplicates keep exactly ONE row, but WHICH of the two
      // is engine-chosen (no intra-batch order guarantee) — assert the
      // guarantee, not an accident of partitioning.
      assert(kept.intersect(Set(1L, 2L)).size == 1,
        s"exactly one of the same-batch duplicates must survive: $kept")
      assert(kept - 1L - 2L == Set(3L, 5L, 6L, 7L),
        s"expected within-horizon drops + post-eviction re-admit, got $kept")
    } finally query.stop()
  }

  test("distinct fingerprints are never dropped") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val input = MemoryStream[Doc]
    val query = StreamingDedup.attach(input.toDS())
      .writeStream.format("memory").queryName("dedup_distinct")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      input.addData((1 to 20).map(i => Doc(i, i * 1000L, s"doc-$i")): _*)
      query.processAllAvailable()
      assert(spark.table("dedup_distinct").count() == 20)
    } finally query.stop()
  }
}
