package graft

import org.apache.spark.sql.functions._
import graft.streaming.QueueRouter

class QueueRouterSpec extends SparkSpec {

  private def jobs = {
    import spark.implicits._
    Seq(
      ("j1", 3, 0, true),   // success
      ("j2", 3, 0, false),  // fail, retries left -> demoted to 2, backoff 1
      ("j3", 0, 1, false),  // fail at floor priority -> stays 0, backoff 4
      ("j4", 1, 3, false)   // fail, exhausted -> DLQ
    ).toDF("job_id", "priority", "retry_count", "succeeded")
  }

  test("splits results / retries / dead letters like the reference queue") {
    val r = QueueRouter.route(jobs, maxRetries = 3)
    assert(r.results.select("job_id").as[String](spark.implicits.newStringEncoder)
      .collect().toSet == Set("j1"))
    val retries = r.retries.select("job_id", "priority", "retry_count", "backoff_s")
      .collect().map(x => (x.getString(0), x.getInt(1), x.getInt(2), x.getLong(3)))
      .toSet
    assert(retries == Set(("j2", 2, 1, 1L), ("j3", 0, 2, 4L)))
    assert(r.deadLetters.select("job_id")
      .collect().map(_.getString(0)).toSet == Set("j4"))
  }

  test("P11: delivery-specific fields are scrubbed before requeue") {
    import spark.implicits._
    val withDelivery = Seq(("j2", 3, 0, false, "m-1", "s:high", 12345L))
      .toDF("job_id", "priority", "retry_count", "succeeded",
        "message_id", "stream_key", "dequeued_at")
    val r = QueueRouter.route(withDelivery)
    val cols = r.retries.columns.toSet
    assert(!cols.contains("message_id") && !cols.contains("stream_key") &&
      !cols.contains("dequeued_at"))
    assert(cols.contains("job_id") && cols.contains("backoff_s"))
  }

  test("no row is lost or duplicated across the three routes") {
    val r = QueueRouter.route(jobs)
    val total = r.results.count() + r.retries.count() + r.deadLetters.count()
    assert(total == jobs.count())
  }
}
