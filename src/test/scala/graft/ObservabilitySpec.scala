package graft

import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._
import graft.observability.{Metrics, MetricsRegistry, SparkMetricsBridge}

/** K6/X7: pipeline metrics — the observe() one-pass API, the
  * MetricsRegistry (labeled counters/gauges/histograms with Prometheus
  * text exposition, the engine analog of the reference's instruments in
  * `redis_queue.py:16-30` / `stt_worker.py:21-28` / `server.py:20-38`),
  * and the SparkMetricsBridge listeners that feed it from batch actions
  * and streaming progress events. */
class ObservabilitySpec extends SparkSpec {

  /** Listener callbacks are asynchronous (driver listener bus): poll. */
  private def eventually(clue: => String = "", timeoutMs: Long = 10000L)(
      cond: => Boolean): Unit = {
    val deadline = System.currentTimeMillis() + timeoutMs
    while (!cond && System.currentTimeMillis() < deadline) Thread.sleep(50)
    assert(cond, clue)
  }

  test("registry: counters, gauges, histograms, Prometheus exposition") {
    val r = new MetricsRegistry
    r.counterInc("queue_operations_total",
      "operation" -> "enqueue", "status" -> "success")
    r.counterAdd("queue_operations_total", 2L,
      "operation" -> "enqueue", "status" -> "success")
    r.gaugeSet("queue_depth", 7.0, "queue_name" -> "stt", "priority" -> "2")
    r.histogramObserve("queue_latency_seconds", 0.03, "operation" -> "dequeue")
    r.histogramObserve("queue_latency_seconds", 0.3, "operation" -> "dequeue")
    assert(r.counterValue("queue_operations_total",
      "operation" -> "enqueue", "status" -> "success") == 3L)
    // label order must not matter
    assert(r.counterValue("queue_operations_total",
      "status" -> "success", "operation" -> "enqueue") == 3L)
    assert(r.gaugeValue("queue_depth",
      "queue_name" -> "stt", "priority" -> "2").contains(7.0))
    assert(r.histogramCount("queue_latency_seconds",
      "operation" -> "dequeue") == 2L)
    assert(math.abs(r.histogramSum("queue_latency_seconds",
      "operation" -> "dequeue") - 0.33) < 1e-9)
    val text = r.scrape()
    assert(text.contains(
      """queue_operations_total{operation="enqueue",status="success"} 3"""))
    assert(text.contains("""queue_depth{priority="2",queue_name="stt"} 7"""))
    // cumulative buckets: the 0.03 sample lands in le=0.05 and every
    // larger bucket; le=+Inf carries both samples
    assert(text.contains(
      """queue_latency_seconds_bucket{operation="dequeue",le="0.05"} 1"""))
    assert(text.contains(
      """queue_latency_seconds_bucket{operation="dequeue",le="+Inf"} 2"""))
    assert(text.contains(
      """queue_latency_seconds_count{operation="dequeue"} 2"""))
  }

  test("bridge: batch observeStage rows land as stage counters") {
    SparkMetricsBridge.install(spark)
    val before = Metrics.registry.counterValue("pipeline_rows_total",
      "stage" -> "obs_spec_probe")
    val df = SparkMetricsBridge.observeStage(
      spark.read.parquet(s"$sf0001/events.parquet"), "obs_spec_probe",
      sum((col("event_type") === "error").cast("long")).as("errors"))
    df.write.format("noop").mode("overwrite").save()
    eventually(s"rows=${Metrics.registry.counterValue("pipeline_rows_total",
        "stage" -> "obs_spec_probe")} before=$before") {
      Metrics.registry.counterValue("pipeline_rows_total",
        "stage" -> "obs_spec_probe") == before + 1000L
    }
    // separate poll: the rows and errors counters are two non-atomic
    // registry writes from the same listener callback
    eventually(Metrics.registry.scrape()) {
      Metrics.registry.counterValue("pipeline_errors_total",
        "stage" -> "obs_spec_probe") > 0L
    }
    // the action latency histogram saw this write (Spark reports the
    // DataFrameWriter entry point — here "overwrite" — as the funcName)
    eventually(Metrics.registry.scrape()) {
      Metrics.registry.histogramCount("query_duration_seconds",
        "action" -> "overwrite") > 0L
    }
  }

  test("bridge: streaming progress feeds counters/gauges/state rows") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    import graft.model.AudioChunk
    import graft.streaming.{SessionLogic, SessionProcessor}
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    SparkMetricsBridge.install(spark)
    val input = MemoryStream[AudioChunk]
    val events = SparkMetricsBridge.observeStage(
      SessionProcessor.attach(input.toDS(), SessionLogic.Config(),
        timeoutMs = 0L).toDF(), "obs_spec_stream")
    val query = events.writeStream
      .format("memory").queryName("obs_spec_stream_sink")
      .outputMode("append").trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      def chunk(off: Long) =
        AudioChunk("obs", Array.fill(400)(100.toByte), off, 200, false)
      input.addData(chunk(0))
      input.addData(chunk(200)) // crosses the 320 ms trigger → 1 emit
      query.processAllAvailable()
      val q = "obs_spec_stream_sink"
      eventually() {
        Metrics.registry.counterValue("stream_input_rows_total",
          "query" -> q) >= 2L &&
        Metrics.registry.counterValue("stream_batches_total",
          "query" -> q) >= 1L
      }
      // the sessionizer holds one session in state
      eventually() {
        Metrics.registry.gaugeValue("stream_state_rows", "query" -> q)
          .exists(_ >= 1.0)
      }
      // the observed stage rode the stream: >=1 transcript row counted
      eventually() {
        Metrics.registry.counterValue("pipeline_rows_total",
          "stage" -> "obs_spec_stream") >= 1L
      }
    } finally query.stop()
  }

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
