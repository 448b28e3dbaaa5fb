package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Order-sensitive transcript merge as a typed `Aggregator` (SURVEY.md
  * §2.11: the reference's A1 — concatenate segment texts in offset
  * order, average the clamped confidence; `src/stt/service.py:133-160`).
  *
  * The buffer keeps (offset, text, confidence) triples and only sorts
  * on `finish`, so partial (map-side) merges are order-insensitive and
  * the result is deterministic under any shuffle order — the typed
  * counterpart of the `array_sort(collect_list(struct(...)))` pattern
  * used by the SQL surface (q15).
  */
object TranscriptAggregator
    extends Aggregator[(Long, String, Double), Seq[(Long, String, Double)],
      (String, Double)] {

  override def zero: Seq[(Long, String, Double)] = Seq.empty

  override def reduce(b: Seq[(Long, String, Double)],
      a: (Long, String, Double)): Seq[(Long, String, Double)] = b :+ a

  override def merge(x: Seq[(Long, String, Double)],
      y: Seq[(Long, String, Double)]): Seq[(Long, String, Double)] = x ++ y

  override def finish(b: Seq[(Long, String, Double)]): (String, Double) = {
    if (b.isEmpty) return ("", 0.0)
    val sorted = b.sortBy(t => (t._1, t._2))
    val text = sorted.map(_._2).mkString(" ")
    val conf = sorted.map(t => math.max(0.0, math.min(1.0, t._3))).sum / b.size
    (text, conf)
  }

  override def bufferEncoder: Encoder[Seq[(Long, String, Double)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()

  override def outputEncoder: Encoder[(String, Double)] =
    Encoders.tuple(Encoders.STRING, Encoders.scalaDouble)
}
