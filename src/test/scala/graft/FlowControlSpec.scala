package graft

import org.apache.spark.sql.functions._
import graft.streaming.{Backpressure, ResultStore}

class FlowControlSpec extends SparkSpec {

  test("X1 hysteresis: activate at 0.8, hold through the band, release at 0.6") {
    var h = Backpressure.Hysteresis()
    h = h.observe(0.75); assert(!h.paused)
    h = h.observe(0.85); assert(h.paused)
    h = h.observe(0.70); assert(h.paused) // inside the band: still paused
    h = h.observe(0.61); assert(h.paused)
    h = h.observe(0.60); assert(!h.paused) // <= low releases
    h = h.observe(0.79); assert(!h.paused) // below high: stays open
    assert(h.nPauses == 1)
  }

  test("X2 degradation levels and parameter shedding are monotone") {
    assert(Backpressure.level(0.5) == 0 && Backpressure.level(0.95) == 3)
    val stt = (0 to 3).map(Backpressure.sttByLevel)
    assert(stt.map(_.partialIntervalMs) == stt.map(_.partialIntervalMs).sorted)
    assert(stt.map(_.beamSize).reverse == stt.map(_.beamSize).sorted)
    val ocr = (0 to 3).map(Backpressure.ocrByLevel)
    assert(ocr.map(_.maxResolution).reverse == ocr.map(_.maxResolution).sorted)
  }

  test("K1/K2/K5 result store: last-write-wins, TTL expiry, sweep") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("rs").toString + "/results"
    val t0 = 1000000000L
    ResultStore.append(Seq(
      ("j1", t0, "v1"), ("j2", t0, "v2")).toDF("job_id", "stored_at_us", "payload"), dir)
    ResultStore.append(Seq(
      ("j1", t0 + 500L, "v1b")).toDF("job_id", "stored_at_us", "payload"), dir)

    // upsert semantics: latest j1 wins
    val j1 = ResultStore.get(spark, dir, "j1", nowUs = t0 + 1000L)
    assert(j1.exists(_.getAs[String]("payload") == "v1b"))

    // TTL: with now far in the future, both are expired
    val far = t0 + 3600L * 1000000L + 1000L
    assert(ResultStore.get(spark, dir, "j2", nowUs = far).isEmpty)

    // sweep keeps only live latest rows
    ResultStore.ttlSweep(spark, dir, nowUs = t0 + 1000L)
    val after = spark.read.parquet(dir)
    assert(after.count() == 2) // j1 latest + j2
    assert(after.filter(col("payload") === "v1").count() == 0)
  }

  test("K5 sweep recovers a crashed swap instead of deleting the only copy") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("rsc").toString
    val dir = base + "/results"
    val t0 = 1000000000L
    ResultStore.append(Seq(("j1", t0, "v1"), ("j2", t0 + 1L, "v2"))
      .toDF("job_id", "stored_at_us", "payload"), dir)

    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

    // Crash state A: park happened, promote didn't — live path gone,
    // parked holds the only (pre-sweep) copy, stage holds the compacted
    // one. The next sweep must restore, not delete.
    fs.rename(new org.apache.hadoop.fs.Path(dir),
      new org.apache.hadoop.fs.Path(dir + "_compact_old"))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(dir)))
    ResultStore.ttlSweep(spark, dir, nowUs = t0 + 1000L)
    val after = spark.read.parquet(dir)
    assert(after.count() == 2, "both rows must survive the crashed swap")

    // Crash state B: only a stage dir exists (park+delete done, promote
    // lost) — recover from stage.
    fs.rename(new org.apache.hadoop.fs.Path(dir),
      new org.apache.hadoop.fs.Path(dir + "_compact_stage"))
    ResultStore.ttlSweep(spark, dir, nowUs = t0 + 1000L)
    assert(spark.read.parquet(dir).count() == 2)
  }
}
