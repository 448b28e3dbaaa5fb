package graft.observability

import java.util.concurrent.ConcurrentHashMap
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.util.QueryExecutionListener

/** Wires the engine's dataflow into [[Metrics.registry]] without ever
  * running a second pass over the data:
  *
  *   - `observeStage(df, stage, …)` plants a `CollectMetrics` node in the
  *     plan (the `observe()` API): row counters and any caller-supplied
  *     aggregates are computed BY the query as it runs — the Spark-native
  *     replacement for the reference's per-operation counters sprinkled
  *     through `redis_queue.py` / `stt_worker.py`.
  *   - the [[QueryExecutionListener]] harvests those observed metrics on
  *     every batch action and records action latency histograms
  *     (`query_duration_seconds`, the reference's `queue_latency_seconds`
  *     analog) and failure counters.
  *   - the [[StreamingQueryListener]] turns every micro-batch progress
  *     event into throughput gauges, input-row counters, batch-duration
  *     histograms and state-store row gauges (the reference's
  *     `active_streams` / `queue_depth` heartbeat, `server.py:30-38`).
  *
  * Both listeners run on the DRIVER's listener bus — executors never
  * mutate metrics, so the bridge behaves identically on local[32] and a
  * 1000-executor cluster. Callbacks are asynchronous: tests poll. */
object SparkMetricsBridge {

  /** Observed-metric name prefix the listeners harvest. */
  private val ObsPrefix = "graft_"

  /** Attach a one-pass stage observation: always a row count, plus any
    * caller aggregates (sums of error flags, byte sizes, …). Works on
    * batch and streaming Datasets alike. */
  def observeStage(df: DataFrame, stage: String,
      extra: org.apache.spark.sql.Column*): DataFrame =
    df.observe(s"$ObsPrefix$stage", count(lit(1)).as("rows"), extra: _*)

  /** Record one observed-metric row into the registry: integral fields
    * become counter increments (per-run deltas), fractional fields become
    * gauges — matching Prometheus counter/gauge semantics. */
  private def record(obsName: String, row: Row): Unit = {
    val stage = obsName.stripPrefix(ObsPrefix)
    val schema = row.schema
    var i = 0
    while (i < row.length) {
      val field = schema(i).name
      if (!row.isNullAt(i)) row.get(i) match {
        case l: Long => Metrics.registry.counterAdd(
          s"pipeline_${field}_total", l, "stage" -> stage)
        case n: Int => Metrics.registry.counterAdd(
          s"pipeline_${field}_total", n.toLong, "stage" -> stage)
        case d: Double => Metrics.registry.gaugeSet(
          s"pipeline_$field", d, "stage" -> stage)
        case f: Float => Metrics.registry.gaugeSet(
          s"pipeline_$field", f.toDouble, "stage" -> stage)
        case _ => ()
      }
      i += 1
    }
  }

  private final class BatchListener extends QueryExecutionListener {
    override def onSuccess(funcName: String, qe: QueryExecution,
        durationNs: Long): Unit = {
      Metrics.registry.histogramObserve("query_duration_seconds",
        durationNs / 1e9, "action" -> funcName)
      qe.observedMetrics.foreach { case (name, row) =>
        if (name.startsWith(ObsPrefix)) record(name, row)
      }
    }
    override def onFailure(funcName: String, qe: QueryExecution,
        exception: Exception): Unit =
      Metrics.registry.counterInc("query_failures_total",
        "action" -> funcName)
  }

  private final class StreamListener extends StreamingQueryListener {
    import StreamingQueryListener._
    override def onQueryStarted(e: QueryStartedEvent): Unit =
      Metrics.registry.counterInc("stream_queries_started_total")
    override def onQueryProgress(e: QueryProgressEvent): Unit = {
      val p = e.progress
      val q = Option(p.name).getOrElse(p.id.toString)
      Metrics.registry.counterAdd("stream_input_rows_total",
        p.numInputRows, "query" -> q)
      Metrics.registry.counterInc("stream_batches_total", "query" -> q)
      Metrics.registry.gaugeSet("stream_input_rows_per_second",
        p.inputRowsPerSecond, "query" -> q)
      Metrics.registry.gaugeSet("stream_processed_rows_per_second",
        p.processedRowsPerSecond, "query" -> q)
      Metrics.registry.histogramObserve("stream_batch_duration_seconds",
        p.batchDuration / 1e3, "query" -> q)
      val stateRows = p.stateOperators.map(_.numRowsTotal).sum
      if (p.stateOperators.nonEmpty)
        Metrics.registry.gaugeSet("stream_state_rows",
          stateRows.toDouble, "query" -> q)
      p.observedMetrics.asScala.foreach { case (name, row) =>
        if (name.startsWith(ObsPrefix)) record(name, row)
      }
    }
    override def onQueryTerminated(e: QueryTerminatedEvent): Unit =
      Metrics.registry.counterInc("stream_queries_terminated_total",
        "had_exception" -> e.exception.isDefined.toString)
  }

  private val installed = ConcurrentHashMap.newKeySet[SparkSession]()

  /** Register both listeners once per session (idempotent). */
  def install(spark: SparkSession): Unit =
    if (installed.add(spark)) {
      spark.listenerManager.register(new BatchListener)
      spark.streams.addListener(new StreamListener)
    }
}
