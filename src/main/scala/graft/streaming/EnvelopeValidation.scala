package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Job-envelope validation — the error-handling surface the reference
  * unit-tests (`tests/unit/test_queue.py:183-222`: malformed jobs and
  * out-of-range priorities must not crash the queue):
  *
  *  - missing/empty job_id or unknown job type → rejected (no-retry
  *    nack, straight to the dead-letter side, like P2's unknown-type
  *    branch `stt_worker.py:115-137`);
  *  - out-of-range priority → clamped into [0, 3] (the reference
  *    defaults bad priorities to NORMAL; clamping preserves ordering
  *    intent while keeping the domain closed).
  */
object EnvelopeValidation {

  val KnownTypes = Seq("stt_chunk", "stt_batch", "ocr_single", "ocr_batch")

  final case class Validated(accepted: DataFrame, rejected: DataFrame)

  /** `jobs` must carry job_id, job_type, priority; passthrough others. */
  def validate(jobs: DataFrame): Validated = {
    val ok = col("job_id").isNotNull && length(col("job_id")) > 0 &&
      col("job_type").isin(KnownTypes: _*)
    Validated(
      accepted = jobs.filter(ok)
        .withColumn("priority",
          least(greatest(coalesce(col("priority"), lit(1)), lit(0)), lit(3))),
      rejected = jobs.filter(!coalesce(ok, lit(false)))
        .withColumn("reject_reason",
          when(col("job_id").isNull || length(col("job_id")) === 0,
            "missing_job_id").otherwise("unknown_job_type")))
  }
}
