package graft

/** Conservation invariants of the assembled flagship pipeline
  * (PipelineMain = SURVEY.md §3.1 end-to-end): no envelope is lost or
  * duplicated across the validate/route fan-out, and every pipeline
  * stage actually receives traffic. */
class PipelineMainSpec extends SparkSpec {

  test("end-to-end run conserves envelopes and exercises every route") {
    val out = java.nio.file.Files.createTempDirectory("graft_pipe").toString
    val s = PipelineMain.run(spark, sf0001, out)
    assert(s.events == 1000)
    assert(s.accepted + s.rejected == s.events,
      s"validation must partition the stream: $s")
    assert(s.results + s.retries + s.deadLetters == s.accepted,
      s"routing must partition accepted jobs: $s")
    assert(s.rejected > 0, s"malformed slice should be rejected: $s")
    assert(s.retries > 0, s"some failures should retry: $s")
    assert(s.deadLetters > 0, s"some failures should dead-letter: $s")
    assert(s.transcripts > 0 && s.sessions > 0, s"sessionizer emitted: $s")

    // correlation path: results exist for the 6/7 succeeding slice and
    // the %31 slice lands past the 30 s poll window — so correlated is
    // strictly between "most" and "all", and each jobId pairs at most
    // once (unique event ids)
    assert(s.correlated > (s.events * 7) / 10,
      s"correlator must match most requests: $s")
    assert(s.correlated < s.events,
      s"timed-out and failed jobs must not correlate: $s")
    import org.apache.spark.sql.functions.col
    val corr = spark.read.parquet(s"$out/correlated")
    val done = corr.filter(col("status") === "COMPLETED")
    assert(done.select("job_id").distinct().count() == s.correlated,
      "a job must correlate at most once")
    assert(done.filter(col("latency_ms").between(0, 30000)).count()
      == s.correlated,
      "every correlated latency sits inside the poll window")
    // timeout emission (J1, reference's failed-poll TIMEOUT response):
    // the never-answered %7 slice and the past-window %31 slice whose
    // poll window the watermark closed emit exactly one TIMEOUT row
    // with null result fields; no job is both completed and timed out
    val timedOut = corr.filter(col("status") === "TIMEOUT")
    assert(s.timedOut > 0, s"closed-window unanswered polls must time out: $s")
    assert(timedOut.filter(col("res_ms").isNotNull || col("payload").isNotNull
      || col("latency_ms").isNotNull).count() == 0,
      "TIMEOUT rows carry null result fields")
    assert(timedOut.join(done, "job_id").count() == 0,
      "a job cannot be both COMPLETED and TIMEOUT")
    assert(corr.groupBy("job_id").count()
      .filter(col("count") > 1).count() == 0,
      "exactly one emission per job")

    // retried envelopes were demoted and got a backoff
    val retries = spark.read.parquet(s"$out/retries")
    assert(retries.filter(org.apache.spark.sql.functions.col("backoff_s")
      .isNull).count() == 0)
  }
}
