package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // q11 ranks the ≤100 survivors of a TakeOrderedAndProject with an
    // unpartitioned window — a gated exception (WinScanSpec) that is
    // scale-safe by construction, but WindowExec logs "No Partition
    // Defined" on every run and the repeated WARN makes bench tails look
    // scarier than they are. Silence that one category; anything else at
    // WARN still surfaces.
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window.WindowExec",
      org.apache.logging.log4j.Level.ERROR)
    // Warmup: initialize Hadoop FS, parquet footers, and codegen paths so
    // the first timed query isn't charged session startup.
    try {
      spark.read.parquet(s"$sfDir/lineitem.parquet").limit(1000)
        .write.format("noop").mode("overwrite").save()
      spark.range(1000000L).selectExpr("sum(id)").collect()
    } catch { case _: Throwable => () }
    // noop sink: forces full computation of every output column (count()
    // would let Catalyst prune the per-row work for select-only queries).
    // Two passes, report the min — steady-state cost, not first-run JIT.
    // A query that throws reports -1 (never a valid elapsed time) and is
    // listed in "failed" — a silent failure must not corrupt the totals.
    def timeAll(): Map[String, Double] =
      SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          name -> (System.nanoTime() - t0) / 1e9
        } catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          name -> -1.0
        }
      }.toMap
    val pass1 = timeAll()
    val pass2 = timeAll()
    // The flagship metric (q15 events/sec) gets a third timed pass so the
    // reported throughput is a min-of-3 — single-machine wobble (GC, JIT
    // recompiles, background load) moved the headline number ±20% between
    // rounds when it was min-of-2; an extra ~1 s pass of one query pins it.
    val flagshipExtra: Double =
      SparkEntry.queries.get("q15_transcript_assembly").map { fn =>
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        } catch { case _: Throwable => -1.0 }
      }.getOrElse(-1.0)
    val merged = pass1.map { case (k, v) =>
      val w = pass2(k)
      val base = if (v < 0 || w < 0) -1.0 else math.min(v, w)
      k -> (if (k == "q15_transcript_assembly" && base > 0 && flagshipExtra > 0)
        math.min(base, flagshipExtra) else base)
    }
    val (failed, results) = merged.partition(_._2 < 0)
    // 10 ms resolution per query: the driver captures only the LAST 2000
    // chars of output, and at 125+ queries a 3-decimal line would crowd
    // the window (r3-r6's WindowExec WARN spam actually pushed the JSON
    // out entirely — BENCH_r0{3..6}.json all record parsed:null).
    def fmt2(v: Double): String = "%.2f".format(v)
    // Driver captures only the last 2000 chars of output: keys shrink to
    // their unique qNN prefix so the whole JSON line fits that window
    // (full names are in SURVEY.md §2.12 / Verify output).
    def short(k: String): String = k.takeWhile(_ != '_')
    val qs = (results.toSeq.sortBy(_._1).map { case (k, v) =>
      s"\"" + short(k) + "\":" + fmt2(v) } ++
      failed.keys.toSeq.sorted.map(k => s"\"" + short(k) + "\":null"))
      .mkString("{", ",", "}")
    val failedArr = failed.keys.toSeq.sorted
      .map("\"" + short(_) + "\"").mkString("[", ",", "]")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    // flagship throughput: events/sec through the sessionize+transcript
    // path (q15), the reference's streaming STT shape (§3.1)
    val flagshipEps = try {
      val n = spark.read.parquet(s"$sfDir/events.parquet").count()
      results.get("q15_transcript_assembly")
        .filter(_ > 0).map(t => n / t).getOrElse(0.0)
    } catch { case _: Throwable => 0.0 }
    // STREAMING flagship (VERDICT r7 #2): the actual flatMapGroupsWithState
    // sessionizer under a file-source stream + RocksDB state store — not
    // the batch q15 proxy. Sustained events/s excludes stream startup;
    // p50/p99 are per-trigger latencies from the query's own telemetry.
    val stream = try StreamBench.run(spark, sfDir)
      catch { case e: Throwable =>
        System.err.println(s"[bench] stream bench failed: ${e.getMessage}")
        StreamBench.Result(0L, 0, 0.0, 0.0, 0.0, 0.0, 0L, 0L)
      }
    val sfName = new java.io.File(sfDir).getName
    val line = s"""{"metric":"total","value":${fmt2(total)},"unit":"sec","queries":$qs,"failed":$failedArr,"flagship_events_per_sec":${"%.0f".format(flagshipEps)},"stream_eps":${"%.0f".format(stream.epsSustained)},"stream_p50_ms":${stream.p50Ms},"stream_p99_ms":${stream.p99Ms},"stream_batches":${stream.batches},"sf":"$sfName"}"""
    // stdout is the driver's contract, but its capture window is the last
    // 2000 chars — persist the line to a file too so the number is always
    // recoverable even if future growth crowds the window (ADVICE r7).
    try java.nio.file.Files.writeString(
      java.nio.file.Path.of("target/bench_last.json"), line + "\n")
    catch { case _: Throwable => () }
    println(line)
    spark.stop()
  }
}
