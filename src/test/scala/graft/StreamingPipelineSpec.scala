package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.{QueueRouter, ResultStore}

/** End-to-end micro-batch pipeline: streaming jobs → foreachBatch →
  * QueueRouter split → ResultStore keyed upsert + DLQ side output —
  * the reference's worker loop (§3.1 steps 5-12) as one streaming
  * query. Also covers W11: watermarked tumbling-window counts. */
class StreamingPipelineSpec extends SparkSpec {

  test("foreachBatch routes results to the keyed store and failures to the DLQ") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val dir = java.nio.file.Files.createTempDirectory("pipe").toString
    val resultsPath = s"$dir/results"
    val dlqPath = s"$dir/dlq"

    val jobs = MemoryStream[(String, Int, Int, Boolean, Long)]
    val q = jobs.toDS()
      .toDF("job_id", "priority", "retry_count", "succeeded", "stored_at_us")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val routed = QueueRouter.route(batch)
        ResultStore.append(routed.results, resultsPath)
        if (!routed.deadLetters.isEmpty)
          routed.deadLetters.write.mode("append").parquet(dlqPath)
        ()
      }
      .start()
    try {
      jobs.addData(
        ("j1", 3, 0, true, 1000L),
        ("j2", 2, 1, false, 1000L), // retriable
        ("j3", 1, 3, false, 1000L)) // exhausted -> DLQ
      q.processAllAvailable()
      // second batch: j1 result superseded
      jobs.addData(("j1", 3, 0, true, 2000L))
      q.processAllAvailable()

      val latest = ResultStore.latest(spark, resultsPath)
      val j1 = latest.filter(col("job_id") === "j1").collect()
      assert(j1.length == 1 && j1.head.getAs[Long]("stored_at_us") == 2000L)
      assert(latest.count() == 1) // only j1 succeeded
      val dlq = spark.read.parquet(dlqPath)
      assert(dlq.select("job_id").collect().map(_.getString(0)).toSet == Set("j3"))
    } finally q.stop()
  }

  test("streaming exact dedup with watermarked state cleanup") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val ev = MemoryStream[(String, Long)] // (job_id, epoch_ms)
    val deduped = ev.toDS().toDF("job_id", "t_ms")
      .withColumn("event_time", timestamp_millis(col("t_ms")))
      .withWatermark("event_time", "1 minute")
      .dropDuplicatesWithinWatermark("job_id")

    val q = deduped.writeStream.format("memory").queryName("dedup")
      .outputMode("append").start()
    try {
      val base = 1700000000000L
      ev.addData(("a", base), ("a", base + 100), ("b", base + 200))
      q.processAllAvailable()
      ev.addData(("a", base + 300)) // still within the watermark window
      q.processAllAvailable()
      val ids = spark.table("dedup").select("job_id")
        .collect().map(_.getString(0)).toSeq
      assert(ids.sorted == Seq("a", "b"))
    } finally q.stop()
  }

  test("watermarked tumbling-window counts (W11 event-time analytics)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val ev = MemoryStream[(String, Long)] // (type, epoch_ms)
    val counts = ev.toDS().toDF("event_type", "t_ms")
      .withColumn("event_time", timestamp_millis(col("t_ms")))
      .withWatermark("event_time", "1 minute")
      .groupBy(window(col("event_time"), "1 minute"), col("event_type"))
      .count()

    val q = counts.writeStream.format("memory").queryName("wincounts")
      .outputMode("update").start()
    try {
      val base = 1700000000000L // aligned enough for 1-min windows
      ev.addData(("click", base), ("click", base + 1000),
        ("view", base + 2000), ("click", base + 61000))
      q.processAllAvailable()
      val rows = spark.table("wincounts")
        .select(col("event_type"), col("count")).collect()
        .map(r => (r.getString(0), r.getLong(1))).toSet
      assert(rows.contains(("click", 2L)) || rows.contains(("click", 3L)))
      assert(rows.exists(_._1 == "view"))
    } finally q.stop()
  }
}
