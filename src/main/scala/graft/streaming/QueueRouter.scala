package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.CoreFunctions._

/** Queue reliability semantics as a `foreachBatch` router (SURVEY.md §7
  * step 6): each micro-batch of processed jobs splits into
  *
  *  - results   — succeeded rows, keyed upsert into the result table
  *                (reference K1, `redis_queue.py:305-314`);
  *  - retries   — failed rows with retries left: priority demoted one
  *                level (floor 0), retry_count+1, exponential backoff
  *                retry² s (X3 `redis_queue.py:278-303`,
  *                X4 `redis_consumer.go:257-273`);
  *  - deadLetters — failed rows with retries exhausted (K3,
  *                `redis_consumer.go:284-298`).
  *
  * Pure DataFrame → DataFrames, so the routing is unit-testable in batch
  * and reusable inside `writeStream.foreachBatch`.
  */
object QueueRouter {

  final case class Routed(results: DataFrame, retries: DataFrame,
      deadLetters: DataFrame)

  /** `jobs` must carry: job_id, priority (0-3), retry_count, succeeded
    * (boolean); other columns pass through. */
  def route(jobs: DataFrame, maxRetries: Int = 3): Routed = {
    val failed = jobs.filter(!col("succeeded"))
    Routed(
      results = jobs.filter(col("succeeded")),
      retries = failed.filter(col("retry_count") < maxRetries)
        // P11: scrub delivery-specific fields before requeue
        // (`redis_queue.py:286-289`); drop() is a no-op when absent.
        .drop("message_id", "stream_key", "dequeued_at")
        .withColumn("priority", demote(col("priority")))
        .withColumn("retry_count", col("retry_count") + 1)
        .withColumn("backoff_s",
          backoffSeconds(col("retry_count")).cast("long")),
      deadLetters = failed.filter(col("retry_count") >= maxRetries))
  }
}
