package graft.observability

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.{AtomicLong, AtomicLongArray}
import scala.jdk.CollectionConverters._

/** K6/X7: the engine's metrics surface — labeled counters, gauges and
  * histograms with Prometheus text exposition, mirroring the reference's
  * per-stage instruments (`redis_queue.py:16-30` queue_operations /
  * queue_depth / queue_latency; `stt_worker.py:21-28`;
  * `backpressure.py:10-18`; `autoscaler/controller.py:17-35`).
  *
  * Design: a plain in-JVM registry — deliberately NOT a Spark
  * accumulator. Dataflow metrics (rows seen, errors, bytes) ride the
  * `observe()` API inside the query plan (one pass, no second job) and
  * land here via the listeners in [[SparkMetricsBridge]]; driver-side
  * control-plane events (batch durations, state sizes, backpressure
  * flips) are recorded directly. Executors never touch the registry, so
  * there is no distributed-mutation problem at any cluster size: every
  * value is either an observed-metric aggregate (computed by the query
  * itself) or a driver-local event count.
  *
  * Thread-safe; all mutators are lock-free (ConcurrentHashMap +
  * AtomicLong/AtomicLongArray). Doubles are stored as raw long bits. */
final class MetricsRegistry {

  /** Cumulative histogram buckets (Prometheus client defaults). */
  val defaultBuckets: Array[Double] =
    Array(0.005, 0.01, 0.025, 0.05, 0.1, 0.25, 0.5, 1.0, 2.5, 5.0, 10.0)

  private final case class Key(name: String, labels: Seq[(String, String)])

  private val counters = new ConcurrentHashMap[Key, AtomicLong]()
  private val gauges = new ConcurrentHashMap[Key, AtomicLong]()
  private final class Histo(val buckets: Array[Double]) {
    val counts = new AtomicLongArray(buckets.length + 1) // +Inf last
    val sumBits = new AtomicLong(java.lang.Double.doubleToLongBits(0.0))
    val n = new AtomicLong(0L)
    def observe(v: Double): Unit = {
      var i = 0
      while (i < buckets.length && v > buckets(i)) i += 1
      counts.incrementAndGet(i)
      n.incrementAndGet()
      var done = false
      while (!done) {
        val cur = sumBits.get()
        val next = java.lang.Double.doubleToLongBits(
          java.lang.Double.longBitsToDouble(cur) + v)
        done = sumBits.compareAndSet(cur, next)
      }
    }
  }
  private val histos = new ConcurrentHashMap[Key, Histo]()

  def counterInc(name: String, labels: (String, String)*): Unit =
    counterAdd(name, 1L, labels: _*)

  def counterAdd(name: String, delta: Long, labels: (String, String)*): Unit =
    counters.computeIfAbsent(Key(name, labels.sortBy(_._1)),
      _ => new AtomicLong(0L)).addAndGet(delta)

  def gaugeSet(name: String, v: Double, labels: (String, String)*): Unit =
    gauges.computeIfAbsent(Key(name, labels.sortBy(_._1)),
      _ => new AtomicLong(0L))
      .set(java.lang.Double.doubleToLongBits(v))

  def histogramObserve(name: String, v: Double,
      labels: (String, String)*): Unit =
    histos.computeIfAbsent(Key(name, labels.sortBy(_._1)),
      _ => new Histo(defaultBuckets)).observe(v)

  def counterValue(name: String, labels: (String, String)*): Long =
    Option(counters.get(Key(name, labels.sortBy(_._1))))
      .map(_.get()).getOrElse(0L)

  def gaugeValue(name: String, labels: (String, String)*): Option[Double] =
    Option(gauges.get(Key(name, labels.sortBy(_._1))))
      .map(a => java.lang.Double.longBitsToDouble(a.get()))

  def histogramCount(name: String, labels: (String, String)*): Long =
    Option(histos.get(Key(name, labels.sortBy(_._1))))
      .map(_.n.get()).getOrElse(0L)

  def histogramSum(name: String, labels: (String, String)*): Double =
    Option(histos.get(Key(name, labels.sortBy(_._1))))
      .map(h => java.lang.Double.longBitsToDouble(h.sumBits.get()))
      .getOrElse(0.0)

  private def fmtLabels(labels: Seq[(String, String)],
      extra: Seq[(String, String)] = Nil): String = {
    val all = labels ++ extra
    if (all.isEmpty) ""
    else all.map { case (k, v) =>
      s"""$k="${v.replace("\\", "\\\\").replace("\"", "\\\"")}""""
    }.mkString("{", ",", "}")
  }

  private def fmtD(v: Double): String =
    if (v == v.toLong.toDouble) v.toLong.toString else v.toString

  /** Prometheus text exposition format (stable output: sorted series). */
  def scrape(): String = {
    val sb = new StringBuilder
    for ((k, v) <- counters.asScala.toSeq.sortBy(k => (k._1.name, k._1.labels.toString)))
      sb.append(s"${k.name}${fmtLabels(k.labels)} ${v.get()}\n")
    for ((k, v) <- gauges.asScala.toSeq.sortBy(k => (k._1.name, k._1.labels.toString)))
      sb.append(s"${k.name}${fmtLabels(k.labels)} " +
        s"${fmtD(java.lang.Double.longBitsToDouble(v.get()))}\n")
    for ((k, h) <- histos.asScala.toSeq.sortBy(k => (k._1.name, k._1.labels.toString))) {
      var cum = 0L
      for (i <- h.buckets.indices) {
        cum += h.counts.get(i)
        sb.append(s"${k.name}_bucket${fmtLabels(k.labels,
          Seq("le" -> fmtD(h.buckets(i))))} $cum\n")
      }
      cum += h.counts.get(h.buckets.length)
      sb.append(s"${k.name}_bucket${fmtLabels(k.labels, Seq("le" -> "+Inf"))} $cum\n")
      sb.append(s"${k.name}_sum${fmtLabels(k.labels)} " +
        s"${fmtD(java.lang.Double.longBitsToDouble(h.sumBits.get()))}\n")
      sb.append(s"${k.name}_count${fmtLabels(k.labels)} ${h.n.get()}\n")
    }
    sb.result()
  }

  def reset(): Unit = { counters.clear(); gauges.clear(); histos.clear() }
}

object Metrics {
  /** Process-wide default registry (the reference's module-level
    * prometheus_client instruments are process-wide too). */
  val registry = new MetricsRegistry
}
