package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar column library (SURVEY.md §2.9) — pure `Column` expressions, so
  * every one of these stays inside whole-stage codegen (no UDFs on hot
  * paths).  Reference citations inline.
  */
object CoreFunctions {

  /** clamp(x, lo, hi). Reference: confidence clamp `src/stt/service.py:155`. */
  def clamp(x: Column, lo: Column, hi: Column): Column =
    least(greatest(x, lo), hi)

  /** Confidence from Whisper avg_logprob: clamp(1+p, 0, 1).
    * Reference: `src/stt/service.py:155` (F27). */
  def confidenceFromLogprob(p: Column): Column =
    clamp(lit(1.0) + p, lit(0.0), lit(1.0))

  /** Exponential backoff delay = retry² seconds.
    * Reference: `pkg/queue/redis_consumer.go:262` (F31). */
  def backoffSeconds(retry: Column): Column = retry * retry

  /** Priority demotion on retry: max(0, priority-1).
    * Reference: `src/queue/redis_queue.py:286-296` (X3). */
  def demote(priority: Column): Column = greatest(lit(0), priority - 1)

  /** Map the testdata's event_type to the reference's 4 priority classes
    * (low=0 normal=1 high=2 realtime=3; `src/queue/redis_queue.py:42-47`). */
  def priorityOf(eventType: Column): Column =
    when(eventType === "error", 3)
      .when(eventType === "purchase", 2)
      .when(eventType === "signup", 1)
      .otherwise(0)

  /** SQL fragment equivalent of [[priorityOf]] for the DuckDB oracle. */
  val priorityOfSql: String =
    "CASE event_type WHEN 'error' THEN 3 WHEN 'purchase' THEN 2 " +
      "WHEN 'signup' THEN 1 ELSE 0 END"

  /** Bucket a length into the reference's audio-length buckets
    * ([5120,10240,20480,40960], ∞ catch-all; `src/workers/stt_worker.py:359-379`,
    * B3).  Boundaries are inclusive-upper like the reference's `<=`. */
  def lengthBucket(len: Column, bounds: Seq[Long]): Column = {
    val base: Column = lit(bounds.length) // catch-all bucket
    bounds.zipWithIndex.reverse.foldLeft(base) { case (acc, (b, i)) =>
      when(len <= b, i).otherwise(acc)
    }
  }

  /** SQL fragment for [[lengthBucket]]. */
  def lengthBucketSql(lenExpr: String, bounds: Seq[Long]): String =
    "CASE " + bounds.zipWithIndex
      .map { case (b, i) => s"WHEN $lenExpr <= $b THEN $i" }
      .mkString(" ") + s" ELSE ${bounds.length} END"

  /** Bounding box (x, y, w, h) from 4 quad points.
    * Reference: `src/ocr/service.py:231-240` (A3). */
  def bboxX(xs: Seq[Column]): Column = least(xs: _*)
  def bboxY(ys: Seq[Column]): Column = least(ys: _*)
  def bboxW(xs: Seq[Column]): Column = greatest(xs: _*) - least(xs: _*)
  def bboxH(ys: Seq[Column]): Column = greatest(ys: _*) - least(ys: _*)

  /** Capacity-model worker target: ceil(rate / targetUtil / serviceRate),
    * reference `src/autoscaler/controller.py:314-328` (A10). */
  def capacityTarget(arrivalRate: Column, targetUtil: Double, serviceRate: Double): Column =
    ceil(arrivalRate / targetUtil / serviceRate)

  /** Weighted blend of the three autoscale signals + clamp to [min,max].
    * Reference combines with Python `int(...)` which TRUNCATES toward zero
    * (`src/autoscaler/controller.py:281-288`, A11); inputs are non-negative
    * so `floor` matches. */
  def blendTarget(cap: Column, pid: Column, pred: Column, minW: Int, maxW: Int): Column =
    clamp(floor(cap * 0.4 + pid * 0.3 + pred * 0.3),
      lit(minW.toDouble), lit(maxW.toDouble))

  /** Degradation level from utilization (<0.7→0, <0.8→1, <0.9→2, else 3).
    * Reference: `src/grpc_server/backpressure.py:230-238` (X2). */
  def degradationLevel(util: Column): Column =
    when(util < 0.7, 0).when(util < 0.8, 1).when(util < 0.9, 2).otherwise(3)

  /** Stable 32-bit token hash both engines can compute: first 8 hex chars
    * of md5 as a BIGINT.  Spark: conv(substr(md5(x),1,8),16,10)::long;
    * DuckDB: CAST('0x'||substr(md5(x),1,8) AS BIGINT). */
  def hash32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  def hash32Sql(e: String): String =
    s"CAST(('0x' || substr(md5($e),1,8)) AS BIGINT)"
}
