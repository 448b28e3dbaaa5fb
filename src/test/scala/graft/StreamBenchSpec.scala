package graft

/** The streaming-flagship measurement path: StreamBench must drive the
  * real sessionizer through a file-source stream under the RocksDB
  * state store and produce sane telemetry (every event counted once,
  * multiple genuine triggers, nonzero quantiles). Uses sf0.001 so the
  * spec stays in test-suite time budget. */
class StreamBenchSpec extends SparkSpec {

  test("stream bench: all events flow once, multi-trigger, RocksDB state") {
    val before = spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass")
    val r = StreamBench.run(spark, sf0001,
      workDir = "/tmp/graft_stream_bench_spec",
      stageFiles = 6, filesPerTrigger = 1)
    val nEvents = spark.read.parquet(s"$sf0001/events.parquet").count()
    assert(r.rows == nEvents, s"rows ${r.rows} != events $nEvents")
    assert(r.batches >= 3, s"expected multiple triggers, got ${r.batches}")
    assert(r.epsSustained > 0 && r.epsWall > 0)
    assert(r.p50Ms > 0 && r.p99Ms >= r.p50Ms)
    assert(r.triggerSumSec <= r.wallSec + 0.001)
    // run() opts into the production provider for its own query but
    // must RESTORE the caller's session conf on exit (leaking it would
    // silently change every later streaming spec in this JVM)
    assert(spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass") == before,
      "StreamBench leaked the state-store provider conf")
  }
}
