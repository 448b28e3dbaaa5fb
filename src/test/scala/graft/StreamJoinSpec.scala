package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** J1 streaming form: request↔result correlation as a watermarked
  * stream-stream inner join on job_id with a time-range bound —
  * the Structured Streaming realization of the reference's
  * enqueue-then-poll-with-timeout (`redis_queue.py:329-344`). */
class StreamJoinSpec extends SparkSpec {

  test("request/result streams correlate on job_id within the timeout window") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val reqs = MemoryStream[(String, Long)] // (job_id, epoch_ms)
    val ress = MemoryStream[(String, Long)]

    val reqDf = reqs.toDS().toDF("job_id", "t_ms")
      .withColumn("req_time", timestamp_millis(col("t_ms")))
      .withWatermark("req_time", "10 seconds")
    val resDf = ress.toDS().toDF("r_job_id", "r_ms")
      .withColumn("res_time", timestamp_millis(col("r_ms")))
      .withWatermark("res_time", "10 seconds")

    // result must arrive within 30 s after its request (reference
    // wait_for_result timeout)
    val joined = reqDf.join(resDf,
      col("job_id") === col("r_job_id") &&
        col("res_time") >= col("req_time") &&
        col("res_time") <= col("req_time") + expr("interval 30 seconds"))
      .select(col("job_id"), col("t_ms"), col("r_ms"))

    val q = joined.writeStream.format("memory").queryName("corr")
      .outputMode("append").start()
    try {
      val base = 1700000000000L
      reqs.addData(("j1", base), ("j2", base + 1000))
      ress.addData(("j1", base + 5000)) // within window
      q.processAllAvailable()
      ress.addData(("j2", base + 40000)) // 39 s later: outside window
      ress.addData(("jX", base + 2000)) // no matching request
      q.processAllAvailable()
      val rows = spark.table("corr").collect()
      assert(rows.map(_.getString(0)).toSet == Set("j1"))
    } finally q.stop()
  }

  test("late results drop behind the watermark and join state evicts") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val reqs = MemoryStream[(String, Long)]
    val ress = MemoryStream[(String, Long)]

    val reqDf = reqs.toDS().toDF("job_id", "t_ms")
      .withColumn("req_time", timestamp_millis(col("t_ms")))
      .withWatermark("req_time", "10 seconds")
    val resDf = ress.toDS().toDF("r_job_id", "r_ms")
      .withColumn("res_time", timestamp_millis(col("r_ms")))
      .withWatermark("res_time", "10 seconds")
    val joined = reqDf.join(resDf,
      col("job_id") === col("r_job_id") &&
        col("res_time") >= col("req_time") &&
        col("res_time") <= col("req_time") + expr("interval 30 seconds"))
      .select(col("job_id"), col("t_ms"), col("r_ms"))

    val q = joined.writeStream.format("memory").queryName("corr_late")
      .outputMode("append").start()
    try {
      val base = 1700000000000L
      // j1 matched on time; j2's request left waiting
      reqs.addData(("j1", base), ("j2", base + 1000))
      ress.addData(("j1", base + 5000))
      q.processAllAvailable()
      // both watermarks jump ~2 minutes ahead (reference: queue moves on)
      reqs.addData(("j9", base + 120000))
      ress.addData(("j9r", base + 120000))
      q.processAllAvailable()
      // a would-have-matched result for j2 arrives LATE: its event time
      // (base+20 s) sits far behind the ~base+110 s result watermark —
      // dropped before the join, the reference's poll-timeout expiry
      ress.addData(("j2", base + 20000))
      q.processAllAvailable()
      val matched = spark.table("corr_late").collect().map(_.getString(0)).toSet
      assert(matched == Set("j1"), s"late j2 must not match, got $matched")
      // eviction: the range condition bounds how long each side is
      // retained; after the watermark jump the join state must not be
      // holding every row ever fed (4 reqs + 4 results fed; j1/j2-era
      // state is evictable). One more batch lets eviction run.
      reqs.addData(("j10", base + 130000))
      q.processAllAvailable()
      val stateRows = Option(q.lastProgress).toSeq
        .flatMap(_.stateOperators.toSeq).map(_.numRowsTotal).sum
      assert(stateRows > 0 && stateRows < 8,
        s"join state did not evict: $stateRows rows retained")
    } finally q.stop()
  }
}
