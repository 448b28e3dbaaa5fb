package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** X1 backpressure, the built-in half (SURVEY.md §2.10): source-side
  * rate limiting via maxFilesPerTrigger bounds each micro-batch's
  * intake — the engine analog of the reference's admission control
  * (`backpressure.py:22-168`); the hysteresis POLICY half is
  * Backpressure.Hysteresis (FlowControlSpec). */
class RateLimitSpec extends SparkSpec {

  test("maxFilesPerTrigger bounds per-batch rows; nothing is lost") {
    val dir = java.nio.file.Files.createTempDirectory("ratelim").toString
    val src = s"$dir/in"
    // 8 single-file chunks of distinct sizes
    val sizes = Seq(100, 200, 50, 300, 150, 250, 75, 125)
    sizes.zipWithIndex.foreach { case (n, i) =>
      spark.range(n).withColumn("chunk", lit(i))
        .coalesce(1).write.mode("append").parquet(src)
    }
    val schema = spark.read.parquet(src).schema
    val counts = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(src)
      .groupBy(col("chunk")).count()
    val q = counts.writeStream.format("memory").queryName("rl_counts")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    try q.awaitTermination(120000L) finally q.stop()

    // conservation: every chunk fully ingested
    val got = spark.table("rl_counts").collect()
      .map(r => (r.getInt(0), r.getLong(1))).toMap
    assert(got == sizes.zipWithIndex.map { case (n, i) => i -> n.toLong }.toMap)
    // admission control: multiple micro-batches, each ≤ max single-file rows
    val prog = q.recentProgress
    val batchRows = prog.map(_.numInputRows).filter(_ > 0)
    assert(batchRows.length > 1,
      s"expected several bounded micro-batches, got ${batchRows.mkString(",")}")
    assert(batchRows.forall(_ <= sizes.max.toLong),
      s"a batch exceeded the per-trigger bound: ${batchRows.mkString(",")}")
  }
}
