package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{AnnIvfIndex, HybridRetrieval, InvertedTextIndex}
import graft.queries.RetrievalQueries

/** The SERVING story assembled end-to-end as ONE runnable job — what a
  * query front actually operates against a cut corpus, composed from
  * the production pieces the oracle queries pin individually:
  *
  *   snapshot cut
  *     ├─ keyword: InvertedTextIndex.build (postings + `_pos`, bucketed)
  *     └─ semantic: AnnIvfIndex.build     (cells + centroids, bucketed)
  *   per query batch (here: the q180 content-addressed workload)
  *     ├─ keyword top-k      (pruned postings scan)
  *     ├─ exact-phrase       (pruned positional scan, q183's algorithm)
  *     ├─ snippets           (q184's frame off the same `_pos` table)
  *     ├─ hybrid RRF         (both indexes fused, q181's integer ppm)
  *     └─ layout audits      (rebucket / hot-token / cell-skew triggers)
  *
  * Prints one JSON summary line (the PipelineMain contract): per-leg
  * answer counts and wall millis, index row counts, audit signals.
  * ServeMainSpec ties every count to the oracle query it serves.
  *
  * Usage: runMain graft.ServeMain [sfDir]
  */
object ServeMain {

  final case class Summary(nQueries: Long, postings: Long, positions: Long,
      annRows: Long, searchHits: Long, searchMs: Long, phraseHits: Long,
      phraseMs: Long, snippetRows: Long, snippetMs: Long, hybridRows: Long,
      hybridMs: Long, hotDfBp: Long, rebucketDue: Boolean,
      annImbalanceX100: Long, annRetrainDue: Boolean)

  private def timed(f: => Long): (Long, Long) = {
    val t0 = System.nanoTime()
    val n = f
    (n, (System.nanoTime() - t0) / 1000000L)
  }

  def run(spark: SparkSession, sfDir: String): Summary = {
    def cleanup(t: String): Unit = {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val p = java.nio.file.Paths.get("spark-warehouse", t)
      if (java.nio.file.Files.exists(p)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.deleteIfExists(_))
      }
    }
    val tables = Seq("serve_text_idx", "serve_text_idx_meta",
      "serve_text_idx_pos", "serve_ann_idx", "serve_ann_idx_cent")
    tables.foreach(cleanup)

    val docs = Tables.documents(spark, sfDir)
    val emb = Tables.embeddings(spark, sfDir)
    InvertedTextIndex.build(docs, "serve_text_idx", positional = true)
    AnnIvfIndex.build(
      emb.select(col("vec_id"), col("label").cast("long").as("cell"),
        col("embedding")),
      "serve_ann_idx")

    val qd = RetrievalQueries.queryDocs(spark, sfDir)
    val queries = qd.join(docs, col("q_doc") === col("doc_id"))
      .select(col("q_doc"), col("text"))
    val qVecs = qd.join(emb, col("q_doc") === col("vec_id"))
      .select(col("q_doc"), col("embedding"))
    val phrases = queries.select(col("q_doc"), expr(
      "array_join(slice(split(text, ' '), 3, 3), ' ')").as("phrase"))

    def count(df: DataFrame): Long = df.count()
    val (searchHits, searchMs) =
      timed(count(InvertedTextIndex.search(queries, "serve_text_idx")))
    val (phraseHits, phraseMs) =
      timed(count(InvertedTextIndex.phraseSearch(phrases, "serve_text_idx")))
    val (snippetRows, snippetMs) =
      timed(count(InvertedTextIndex.snippets(queries, docs, "serve_text_idx")))
    val (hybridRows, hybridMs) = timed(count(
      HybridRetrieval.search(queries, qVecs, "serve_text_idx",
        "serve_ann_idx")))

    val audit = InvertedTextIndex.layoutAudit(spark, "serve_text_idx")
      .collect().head
    val bal = AnnIvfIndex.balance(spark, "serve_ann_idx").collect().head

    val summary = Summary(
      nQueries = queries.count(),
      postings = spark.table("serve_text_idx").count(),
      positions = spark.table("serve_text_idx_pos").count(),
      annRows = spark.table("serve_ann_idx").count(),
      searchHits = searchHits, searchMs = searchMs,
      phraseHits = phraseHits, phraseMs = phraseMs,
      snippetRows = snippetRows, snippetMs = snippetMs,
      hybridRows = hybridRows, hybridMs = hybridMs,
      hotDfBp = audit.getAs[Long]("hot_df_bp"),
      rebucketDue = audit.getAs[Boolean]("rebucket_due"),
      annImbalanceX100 = bal.getAs[Long]("imbalance_x100"),
      annRetrainDue = bal.getAs[Boolean]("retrain_due"))
    tables.foreach(cleanup)
    summary
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val s = run(spark, sfDir)
    println(s"""{"n_queries":${s.nQueries},"postings":${s.postings},""" +
      s""""positions":${s.positions},"ann_rows":${s.annRows},""" +
      s""""search_hits":${s.searchHits},"search_ms":${s.searchMs},""" +
      s""""phrase_hits":${s.phraseHits},"phrase_ms":${s.phraseMs},""" +
      s""""snippet_rows":${s.snippetRows},"snippet_ms":${s.snippetMs},""" +
      s""""hybrid_rows":${s.hybridRows},"hybrid_ms":${s.hybridMs},""" +
      s""""hot_df_bp":${s.hotDfBp},"rebucket_due":${s.rebucketDue},""" +
      s""""ann_imbalance_x100":${s.annImbalanceX100},""" +
      s""""ann_retrain_due":${s.annRetrainDue}}""")
    spark.stop()
  }
}
