package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.queries.TextQueries

/** The PRODUCTION shape of q173's delta dedup: the corpus snapshot's
  * LSH band table is a MATERIALIZED index — built once when the
  * snapshot is cut, bucketed (and sorted) by the band key — so each
  * refresh batch pays only its own signature pass plus a join in which
  * the snapshot side is a pre-bucketed scan with NO exchange. q173
  * itself derives both sides from one scan (no persisted state between
  * oracle queries); this operator is the contract a real pipeline
  * runs, and DeltaDedupIndexSpec proves both halves: verdict-for-
  * verdict parity with q173 and the shuffle-free snapshot side in the
  * physical plan.
  *
  * The single join column `bkey = bidx·P + band` folds the (band
  * index, band value) pair into one long — band < P makes it
  * collision-free, and one key column is what lets `bucketBy` line up
  * with the join exactly. bidx rides along for the first-matching-band
  * rule (each qualifying pair verified exactly once, q29's rule).
  *
  * At 100 TB: the index is written once per snapshot (its size is
  * 2 rows/doc plus the hashed word sets), incoming batches are
  * refresh-cycle-bounded, and the only per-refresh snapshot cost is
  * the bucket-pruned scan the join performs — the corpus is never
  * re-signatured and never shuffled.
  */
object DeltaDedupIndex {

  /** Write the snapshot's band index as a bucketed+sorted table.
    * `docs` must have `doc_id` and `text`. */
  def build(docs: DataFrame, table: String, buckets: Int = 8): Unit =
    TextQueries.lshBandRows(docs.select(col("doc_id"), col("text")))
      .withColumn("bkey",
        col("bidx").cast("long") * TextQueries.P + col("band"))
      .select(col("bkey"), col("bidx"), col("doc_id"), col("band1"),
        col("wset"), col("nw"))
      .write.bucketBy(buckets, "bkey").sortBy("bkey")
      .mode("overwrite").saveAsTable(table)

  /** Admit an incoming batch (`doc_id`, `source`, `text`) against the
    * prebuilt index: q173's per-doc verdict frame (match count, first
    * snapshot match, best Jaccard, admitted). */
  def admit(newDocs: DataFrame, table: String): DataFrame = {
    val s = newDocs.sparkSession
    graft.expressions.SortedLongIntersectCount.register(s)
    graft.expressions.OptimizerBarrier.register(s)
    val inc = TextQueries.lshBandRows(
        newDocs.select(col("doc_id"), col("text")))
      .withColumn("bkey",
        col("bidx").cast("long") * TextQueries.P + col("band"))
      .select(col("bkey"), col("doc_id").as("doc_n"),
        col("band1").as("b1n"), col("wset").as("wn"), col("nw").as("nn"))
    val snap = s.table(table)
      .select(col("bkey"), col("bidx"), col("doc_id").as("doc_s"),
        col("band1").as("b1s"), col("wset").as("ws"), col("nw").as("ns"))
    val verdict = snap.join(inc, "bkey")
      .filter((col("bidx") === 1 || col("b1n") =!= col("b1s")) &&
        least(col("nn"), col("ns")) * 10 >=
          greatest(col("nn"), col("ns")) * 7)
      .withColumn("inter",
        expr("opt_barrier(sorted_long_intersect_count(wn, ws))"))
      .withColumn("jaccard", round(
        col("inter").cast("double") / (col("nn") + col("ns") - col("inter")),
        6))
      .filter(col("jaccard") >= 0.7)
      .groupBy(col("doc_n"))
      .agg(count(lit(1)).as("n_matches"),
        min(col("doc_s")).as("first_match"),
        max(col("jaccard")).as("max_jaccard"))
    newDocs.select(col("doc_id"), col("source"))
      .join(verdict.withColumnRenamed("doc_n", "doc_id"),
        Seq("doc_id"), "left")
      .select(col("doc_id"), col("source"),
        coalesce(col("n_matches"), lit(0L)).as("n_matches"),
        coalesce(col("first_match"), lit(-1L)).as("first_match"),
        coalesce(col("max_jaccard"), lit(0.0)).as("max_jaccard"),
        (coalesce(col("n_matches"), lit(0L)) === 0).as("admitted"))
  }
}
