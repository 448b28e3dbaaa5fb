package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-static eval-set decontamination — q166's audit as a LIVE gate
  * on an ingest stream: every arriving document is checked against the
  * STATIC held-out eval-gram set and flagged before it can enter a
  * training corpus. The eval side is a batch artifact by nature (a
  * fixed benchmark suite), so the join is the stream-static broadcast
  * shape Structured Streaming handles natively: no stream-side state,
  * no watermark, each micro-batch scans its own rows once against the
  * broadcast gram set.
  *
  * At 100 TB-scale ingest the properties carry: the eval-gram set is
  * benchmark-sized (broadcastable) and per-batch work is one pass over
  * the batch's grams plus a doc-key partial-combined aggregate — the
  * stream never shuffles against the eval set.
  */
object StreamingDecontam {

  /** Distinct rolling k-gram hashes of a static eval corpus
    * (`doc_id`, `text`); one column `h`. */
  def evalGramSet(evalDocs: DataFrame, k: Int = 13): DataFrame = {
    graft.expressions.TokenWindowHashes.register(evalDocs.sparkSession)
    evalDocs
      .select(explode(expr(s"token_window_hashes(split(text, ' '), $k)"))
        .as("h"))
      .distinct()
  }

  /** Attach the decontamination audit to a streaming `docs` frame
    * (`doc_id`, `source`, `text`): per document, total gram count,
    * eval-overlapping gram count, and the contaminated flag — the same
    * contract as batch q166. Aggregation groups by doc_id, so run the
    * sink in complete/update mode (documents are assumed to arrive
    * whole; a chunked-upload front would pre-assemble, reference-style,
    * before this gate). */
  def attach(docs: DataFrame, evalGrams: DataFrame,
      k: Int = 13): DataFrame = {
    graft.expressions.TokenWindowHashes.register(docs.sparkSession)
    docs
      .select(col("doc_id"), col("source"),
        explode_outer(expr(s"token_window_hashes(split(text, ' '), $k)"))
          .as("h"))
      .join(broadcast(evalGrams.withColumn("hit", lit(true))),
        Seq("h"), "left")
      .groupBy(col("doc_id"), col("source"))
      .agg(count(col("h")).as("n_grams"),
        sum(when(col("hit"), 1L).otherwise(0L)).as("n_contaminated"))
      .withColumn("contaminated", col("n_contaminated") >= 1)
  }
}
