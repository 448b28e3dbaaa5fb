package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.RequestResultJoin
import graft.streaming.RequestResultJoin.{Request, Result}

/** J1 streaming form via the RequestResultJoin operator: on-time match
  * within the poll-timeout window, outside-window and unmatched results
  * never correlate, a would-have-matched result arriving behind the
  * watermark is dropped, and the range condition bounds join state. */
class StreamJoinSpec extends SparkSpec {

  test("request/result streams correlate on job_id within the timeout window") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val reqs = MemoryStream[Request]
    val ress = MemoryStream[Result]
    val q = RequestResultJoin.attach(reqs.toDS(), ress.toDS())
      .writeStream.format("memory").queryName("corr")
      .outputMode("append").start()
    try {
      val base = 1700000000000L
      reqs.addData(Request("j1", base), Request("j2", base + 1000))
      ress.addData(Result("j1", base + 5000, "ok")) // within window
      q.processAllAvailable()
      ress.addData(Result("j2", base + 40000, "slow")) // 39 s: outside
      ress.addData(Result("jX", base + 2000, "orphan")) // no request
      q.processAllAvailable()
      val rows = spark.table("corr").collect()
      assert(rows.map(_.getString(0)).toSet == Set("j1"))
      // latency is computed from the matched pair
      assert(rows.head.getLong(4) == 5000L)
    } finally q.stop()
  }

  test("timeout variant: unmatched requests emit TIMEOUT after the window closes") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val reqs = MemoryStream[Request]
    val ress = MemoryStream[Result]
    val q = RequestResultJoin.attachWithTimeouts(reqs.toDS(), ress.toDS())
      .writeStream.format("memory").queryName("corr_to")
      .outputMode("append").start()
    try {
      val base = 1700000000000L
      // j1 answered inside the poll window; j2 never answered
      reqs.addData(Request("j1", base), Request("j2", base + 1000))
      ress.addData(Result("j1", base + 5000, "ok"))
      q.processAllAvailable()
      // before the watermark passes j2's window end, NO timeout row may
      // exist — a poll that could still succeed must not fail early
      val early = spark.table("corr_to").collect()
      assert(!early.exists(_.getString(5) == "TIMEOUT"),
        s"premature timeout: ${early.mkString(";")}")
      // both watermarks jump past base+31s+delay → j2's window is closed
      reqs.addData(Request("j9", base + 120000))
      ress.addData(Result("j9", base + 121000, "late-era"))
      q.processAllAvailable()
      reqs.addData(Request("j10", base + 130000)) // one more batch: outer rows flush
      q.processAllAvailable()
      val rows = spark.table("corr_to").collect()
      val byJob = rows.map(r => r.getString(0) -> r.getString(5)).toMap
      assert(byJob("j1") == "COMPLETED")
      assert(byJob("j2") == "TIMEOUT", s"rows: ${rows.mkString(";")}")
      val j2 = rows.find(_.getString(0) == "j2").get
      assert(j2.isNullAt(2) && j2.isNullAt(3) && j2.isNullAt(4),
        "TIMEOUT row must carry null result fields")
      // exactly once: one row per job, no duplicate timeout emission
      assert(rows.map(_.getString(0)).groupBy(identity).forall(_._2.length == 1))
      assert(byJob("j9") == "COMPLETED")
    } finally q.stop()
  }

  test("late results drop behind the watermark and join state evicts") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val reqs = MemoryStream[Request]
    val ress = MemoryStream[Result]
    val q = RequestResultJoin.attach(reqs.toDS(), ress.toDS())
      .writeStream.format("memory").queryName("corr_late")
      .outputMode("append").start()
    try {
      val base = 1700000000000L
      // j1 matched on time; j2's request left waiting
      reqs.addData(Request("j1", base), Request("j2", base + 1000))
      ress.addData(Result("j1", base + 5000, "ok"))
      q.processAllAvailable()
      // both watermarks jump ~2 minutes ahead (reference: queue moves on)
      reqs.addData(Request("j9", base + 120000))
      ress.addData(Result("j9r", base + 120000, "x"))
      q.processAllAvailable()
      // a would-have-matched result for j2 arrives LATE: its event time
      // (base+20 s) sits far behind the ~base+110 s result watermark —
      // dropped before the join, the reference's poll-timeout expiry
      ress.addData(Result("j2", base + 20000, "too-late"))
      q.processAllAvailable()
      val matched = spark.table("corr_late").collect()
        .map(_.getString(0)).toSet
      assert(matched == Set("j1"), s"late j2 must not match, got $matched")
      // eviction: the range condition bounds how long each side is
      // retained; after the watermark jump the join state must not be
      // holding every row ever fed (4 reqs + 4 results fed; j1/j2-era
      // state is evictable). One more batch lets eviction run.
      reqs.addData(Request("j10", base + 130000))
      q.processAllAvailable()
      val stateRows = Option(q.lastProgress).toSeq
        .flatMap(_.stateOperators.toSeq).map(_.numRowsTotal).sum
      assert(stateRows > 0 && stateRows < 8,
        s"join state did not evict: $stateRows rows retained")
    } finally q.stop()
  }
}
