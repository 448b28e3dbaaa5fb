package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{LongType, StructField, StructType}

import graft.operators.{AnnIvfIndex, InvertedTextIndex}

/** Ingest → serve, CLOSED: a `foreachBatch` gate that routes each
  * micro-batch of ADMITTED documents into the serving indexes — a doc
  * is searchable the moment its batch commits, the reference's
  * results-pollable-immediately-after-SETEX contract
  * (`redis_queue.py:305-314`) applied to the snapshot indexes instead
  * of a result cache. RefreshMain advances the indexes batch-wise at
  * refresh cadence; this gate advances them continuously from a
  * running ingest query.
  *
  * Per batch: [[InvertedTextIndex.append]] (postings + meta + any
  * deployed positional/forward companions advance in one cut) and,
  * for docs carrying an embedding, [[AnnIvfIndex.append]] (assigned
  * to the DEPLOYED quantizer, like every delta admit). Both appends
  * write into the existing bucket layouts — no rebuild, no shuffle of
  * the snapshot.
  *
  * Delivery semantics: Structured Streaming re-delivers a batch after
  * a failure, and table appends are not key-idempotent, so the gate
  * keeps a LEDGER table (`<textTable>_applied`: one batch_id row per
  * applied batch, written AFTER the appends). A re-delivered batch
  * whose id is already in the ledger is SKIPPED — so kill-and-resume
  * never double-indexes a committed batch (StreamingIndexFreshnessSpec
  * proves it). The residual window is a crash BETWEEN an append and
  * its ledger row: the batch replays and its rows double. That window
  * is detectable — [[reconcile]] compares ledger rows against the
  * index's meta slices, and the repair is the next snapshot rebuild
  * (the same answer every append-only index here gives to layout
  * drift). Exactly-once would need an atomic multi-table commit the
  * plain-parquet catalog doesn't have; the honest contract is
  * at-least-once with skip-on-redelivery plus a measured audit.
  *
  * At 100 TB: per-batch cost is the batch's own tokenization plus
  * bucketed appends (no snapshot data moves); the ledger probe is one
  * scan of a batch-count-sized single-column table. State-store rows:
  * ZERO — the gate is stateless streaming (the StreamingDecontam
  * discipline), all progress lives in the checkpoint + ledger. */
object StreamingIndexFreshness {

  def ledgerTable(textTable: String): String = textTable + "_applied"

  private val ledgerSchema =
    StructType(Seq(StructField("batch_id", LongType, nullable = false)))

  /** Ensure the ledger exists (idempotent; call once at gate setup so
    * the first batch's probe has a table to read). */
  def init(s: SparkSession, textTable: String): Unit = {
    val lt = ledgerTable(textTable)
    if (!s.catalog.tableExists(lt))
      s.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
        ledgerSchema).write.saveAsTable(lt)
  }

  /** Apply ONE micro-batch (`doc_id`, `text`[, `embedding`]) to the
    * indexes; returns false when the batch id is already in the ledger
    * (re-delivery → skip). Exposed for direct spec coverage of the
    * skip path. */
  def applyBatch(batch: DataFrame, batchId: Long, textTable: String,
      annTable: Option[String] = None): Boolean = {
    val s = batch.sparkSession
    val lt = ledgerTable(textTable)
    // an EMPTY batch (AvailableNow's closer, an idle trigger) advances
    // nothing: no meta slice, no ledger row — so reconcile()'s
    // slices-1 == applied invariant holds on both sides
    if (batch.isEmpty) return false
    val applied = s.catalog.tableExists(lt) &&
      !s.table(lt).filter(col("batch_id") === batchId).isEmpty
    if (applied) false
    else {
      InvertedTextIndex.append(batch.select(col("doc_id"), col("text")),
        textTable)
      annTable.foreach { at =>
        val vecs = batch.filter(col("embedding").isNotNull)
          .select(col("doc_id").as("vec_id"), col("embedding"))
        if (!vecs.isEmpty) AnnIvfIndex.append(vecs, at)
      }
      import scala.jdk.CollectionConverters._
      s.createDataFrame(
          Seq(org.apache.spark.sql.Row(batchId)).asJava, ledgerSchema)
        .write.mode("append").saveAsTable(lt)
      true
    }
  }

  /** Ledger-vs-meta audit: applied batch count, meta slices beyond the
    * base build, and the drift flag (nonzero only inside the
    * documented crash window — the rebuild trigger). The base build
    * contributes one meta slice, every applied batch one more. */
  def reconcile(s: SparkSession, textTable: String): DataFrame = {
    val applied = s.table(ledgerTable(textTable))
      .agg(count(lit(1)).as("n_applied"))
    s.table(textTable + "_meta").agg(count(lit(1)).as("n_meta_slices"))
      .crossJoin(broadcast(applied))
      .select(col("n_applied"), col("n_meta_slices"),
        (col("n_meta_slices") - 1L - col("n_applied")).as("slice_drift"),
        (col("n_meta_slices") - 1L =!= col("n_applied")).as("rebuild_due"))
  }

  /** Every table a batch may advance — refreshed in the OWNER session
    * after each applied batch. The micro-batch runs in Structured
    * Streaming's CLONED session, so its `saveAsTable` appends
    * invalidate the clone's relation cache, not the owner's: a serving
    * read that already cached the table's file listing would silently
    * keep answering from the pre-batch snapshot (the failure mode
    * StreamingIndexFreshnessSpec reproduces by searching between two
    * gate runs). Freshness IS this gate's contract, so it pays the
    * refresh. */
  private def refreshServing(owner: SparkSession, textTable: String,
      annTable: Option[String]): Unit =
    (Seq(textTable, textTable + "_meta", textTable + "_pos",
      textTable + "_fwd", ledgerTable(textTable)) ++ annTable.toSeq)
      .filter(owner.catalog.tableExists)
      .foreach(owner.catalog.refreshTable)

  /** Start the gate on a streaming `docs` frame. The stream carries
    * only ADMITTED docs (run it downstream of the dedup/decontam
    * gates), whole and batch-unique — InvertedTextIndex.append's
    * contract. */
  def start(docs: DataFrame, textTable: String,
      annTable: Option[String] = None,
      checkpointDir: Option[String] = None,
      queryName: String = "index-freshness-gate"): StreamingQuery = {
    val owner = docs.sparkSession
    init(owner, textTable)
    val writer = docs.writeStream
      .queryName(queryName)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, id: Long) =>
        if (applyBatch(batch, id, textTable, annTable))
          refreshServing(owner, textTable, annTable)
        ()
      }
    checkpointDir.foreach(d => writer.option("checkpointLocation", d))
    writer.start()
  }
}
