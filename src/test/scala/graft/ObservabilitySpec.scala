package graft

import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._

/** K6: pipeline metrics via the observe() API — counters/gauges at any
  * stage without a second pass over the data (the engine analog of the
  * reference's Prometheus counters, `redis_queue.py:16-30`). */
class ObservabilitySpec extends SparkSpec {

  test("observe() collects stage metrics in one pass") {
    val obs = Observation("queue_metrics")
    val df = spark.read.parquet(s"$sf0001/events.parquet")
      .observe(obs,
        count(lit(1)).as("jobs_seen"),
        sum((col("event_type") === "error").cast("long")).as("errors"),
        max(col("value")).as("max_value"))
      .filter(col("value") > 100.0)
    val kept = df.count()
    val m = obs.get
    assert(m("jobs_seen").asInstanceOf[Long] == 1000L)
    assert(m("errors").asInstanceOf[Long] > 0L)
    // observation sees pre-filter traffic; the query result is filtered
    assert(kept < 1000L)
  }
}
