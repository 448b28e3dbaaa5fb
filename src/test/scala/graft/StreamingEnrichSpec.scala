package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.StreamingEnrich
import graft.streaming.StreamingEnrich.{Enriched, Tick}

/** Streaming as-of enrichment: latest-at-or-before semantics within a
  * batch (metric at the same timestamp wins), state carry across
  * micro-batches, and no-metric keys answered as absent. */
class StreamingEnrichSpec extends SparkSpec {

  test("requests read the latest metric at-or-before; state crosses batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val input = MemoryStream[Tick]
    val query = StreamingEnrich.attach(input.toDS())
      .writeStream.format("memory").queryName("enriched")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      def metric(k: Long, t: Long, v: Double) = Tick(k, t, isReq = false, v, -1L)
      def req(k: Long, t: Long, id: Long) = Tick(k, t, isReq = true, 0.0, id)

      // batch 1: metric then request (also a same-timestamp pair)
      input.addData(metric(1, 10, 5.0), req(1, 15, 100),
        metric(1, 20, 6.0), req(1, 20, 101), // same ts: metric first
        req(2, 5, 200)) // key with no metric
      query.processAllAvailable()
      // batch 2: request answered from CARRIED state; newer metric later
      input.addData(req(1, 30, 102), metric(1, 40, 9.0), req(1, 41, 103))
      query.processAllAvailable()

      val out = spark.table("enriched").as[Enriched].collect()
        .map(e => e.reqId -> e).toMap
      assert(out(100).hasValue && out(100).asofValue == 5.0)
      assert(out(101).hasValue && out(101).asofValue == 6.0,
        s"same-timestamp metric must win: ${out(101)}")
      assert(!out(200).hasValue)
      assert(out(102).hasValue && out(102).asofValue == 6.0,
        s"state must carry across batches: ${out(102)}")
      assert(out(103).hasValue && out(103).asofValue == 9.0)
    } finally query.stop()
  }

  test("duplicate-timestamp metrics resolve to max(value), any arrival order") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val input = MemoryStream[Tick]
    val query = StreamingEnrich.attach(input.toDS())
      .writeStream.format("memory").queryName("enriched_ties")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      // key 1: larger value arrives FIRST; key 2: larger value LAST.
      // Both must answer with the max — q42's same-(key,t) dedup rule.
      input.addData(
        Tick(1, 10, isReq = false, 9.0, -1), Tick(1, 10, isReq = false, 3.0, -1),
        Tick(1, 10, isReq = true, 0.0, 100),
        Tick(2, 10, isReq = false, 3.0, -1), Tick(2, 10, isReq = false, 9.0, -1),
        Tick(2, 10, isReq = true, 0.0, 200))
      query.processAllAvailable()
      val out = spark.table("enriched_ties").as[Enriched].collect()
        .map(e => e.reqId -> e).toMap
      assert(out(100).asofValue == 9.0, s"max must win: ${out(100)}")
      assert(out(200).asofValue == 9.0, s"max must win: ${out(200)}")
    } finally query.stop()
  }
}
