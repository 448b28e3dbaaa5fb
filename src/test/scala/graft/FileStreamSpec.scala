package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.ResultStore

/** File-based streaming ingestion (the growing-table path: S5/S10
  * analog) — readStream over a parquet directory with AvailableNow,
  * aggregated counts must equal the batch answer. Plus the K2
  * poll-wait loop against the result store. */
class FileStreamSpec extends SparkSpec {

  test("parquet directory streams with AvailableNow and matches batch counts") {
    val dir = java.nio.file.Files.createTempDirectory("fstream").toString
    val src = s"$dir/events"
    spark.read.parquet(s"$sf0001/events.parquet")
      .write.mode("overwrite").parquet(src)

    val schema = spark.read.parquet(src).schema
    val counts = spark.readStream.schema(schema).parquet(src)
      .groupBy(col("event_type")).count()

    val q = counts.writeStream.format("memory").queryName("fs_counts")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    try q.awaitTermination(120000L) finally q.stop()

    val streamed = spark.table("fs_counts").collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    val batch = spark.read.parquet(src).groupBy(col("event_type")).count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(streamed == batch)
  }

  test("K2 waitFor: returns None on timeout, then finds a stored result") {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("rswait").toString + "/r"
    // nothing there yet: short timeout expires
    assert(ResultStore.waitFor(spark, path, "j9", timeoutMs = 300L,
      pollMs = 50L).isEmpty)
    ResultStore.append(Seq(("j9", System.currentTimeMillis() * 1000L, "done"))
      .toDF("job_id", "stored_at_us", "payload"), path)
    val r = ResultStore.waitFor(spark, path, "j9", timeoutMs = 5000L,
      pollMs = 50L)
    assert(r.exists(_.getAs[String]("payload") == "done"))
  }
}
