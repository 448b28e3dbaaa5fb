package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The serving stack COMPOSED: q181's hybrid retrieval answered
  * entirely from the two materialized indexes — keyword ranks from
  * [[InvertedTextIndex.search]] (bucket-pruned postings) fused with
  * approximate semantic ranks from [[AnnIvfIndex.search]] (bucket-
  * pruned probed cells) by reciprocal rank in exact integer ppm
  * (q181's formula verbatim: `1000000 div (rrfK + rank)` per system,
  * 0 when absent).
  *
  * This is the production trade q181 itself documents: the oracle
  * query's semantic side is EXACT brute-force cosine (and includes the
  * self-hit), the serving side is IVF-probed (and excludes self by
  * AnnIvfIndex's contract) — so the fused ranks are not oracle-
  * identical by design; HybridRetrievalSpec pins instead that the
  * fusion arithmetic is exactly RRF over the two index outputs, and
  * that the plan touches both indexes pruned and never shuffles
  * either corpus.
  *
  * At 100 TB: both inputs are ≤|queries|·fuseDepth-row frames (each
  * produced from a pruned index scan with the corpus unshuffled); the
  * fusion join is workload-sized, so hybrid serving inherits the flat
  * per-query cost of its two legs. */
object HybridRetrieval {

  /** `queries`: (q_doc, text); `qVecs`: (q_doc, embedding). Output:
    * (q_doc, rk, doc_id, rrf_ppm, rk_kw, rk_sem) — q181's frame.
    * `excludeSelf` passes through to [[AnnIvfIndex.search]] (false for
    * known-item evaluation — q190's production-recall measurement). */
  def search(queries: DataFrame, qVecs: DataFrame, textTable: String,
      annTable: String, fuseDepth: Int = 20, k: Int = 5,
      rrfK: Int = 60, excludeSelf: Boolean = true): DataFrame = {
    val kw = InvertedTextIndex.search(queries, textTable, k = fuseDepth)
      .select(col("q_doc"), col("doc_id"), col("rk").as("rk_kw"))
    val sem = AnnIvfIndex.search(
        qVecs.select(col("q_doc").as("q_id"), col("embedding")),
        annTable, k = fuseDepth, excludeSelf = excludeSelf)
      .select(col("q_id").as("q_doc"), col("c_id").as("doc_id"),
        col("rk").as("rk_sem"))
    val w = Window.partitionBy(col("q_doc"))
      .orderBy(col("rrf_ppm").desc, col("doc_id").asc)
    kw.join(sem, Seq("q_doc", "doc_id"), "full_outer")
      .select(col("q_doc"), col("doc_id"),
        (coalesce(expr(s"1000000L div ($rrfK + rk_kw)"), lit(0L)) +
          coalesce(expr(s"1000000L div ($rrfK + rk_sem)"), lit(0L)))
          .as("rrf_ppm"),
        coalesce(col("rk_kw"), lit(0)).as("rk_kw"),
        coalesce(col("rk_sem"), lit(0)).as("rk_sem"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("q_doc"), col("rk"), col("doc_id"), col("rrf_ppm"),
        col("rk_kw"), col("rk_sem"))
  }
}
