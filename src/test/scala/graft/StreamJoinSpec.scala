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
}
