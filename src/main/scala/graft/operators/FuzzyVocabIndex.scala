package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.TableIdentifier
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.queries.RetrievalQueries

/** The PRODUCTION shape of q188's fuzzy "did you mean" matching: the
  * SymSpell deletion-neighborhood dictionary (Garbe's indexing — the
  * only per-word state a distance-1 suggester needs) MATERIALIZED as
  * two vocabulary-sized tables:
  *
  *   - `<t>_vocab` (w, df): per-build/append APPEND-ONLY document-
  *     frequency slices, bucketed+sorted by w. Docs partition across
  *     slices, so per-slice df contributions SUM exactly to the corpus
  *     df — readers aggregate by w (exchange-free under the bucketing)
  *     and [[append]] never read-modifies state (the InvertedTextIndex
  *     meta-table contract applied to the dictionary).
  *   - `<t>_keys` (k, w): the deletion-neighborhood pairs {w} ∪ del₁(w),
  *     bucketed+sorted by k, so a probe batch prunes to its own key
  *     lists. [[append]] re-emits pairs for slice words that were
  *     already indexed — harmless by construction, because the
  *     candidate join dedups (q_doc, probe, w) exactly like q188's
  *     `.distinct()` (a (probe, word) pair matching through several
  *     shared keys is one candidate either way).
  *
  * At 100 TB both tables are VOCABULARY-sized (Heaps-law sublinear in
  * the corpus), the probes collect once (workload-bounded, the
  * InvertedTextIndex serving-seam contract) to drive key-bucket
  * pruning, and the one corpus-sized job is [[build]]/[[append]]'s
  * word-df aggregation — one token shuffle with map-side combine.
  * FuzzyVocabIndexSpec pins result parity with q188, append ≡ rebuild,
  * and the pruned key scan. */
object FuzzyVocabIndex {

  private def vocabTable(table: String): String = table + "_vocab"

  private def keysTable(table: String): String = table + "_keys"

  /** Deletion-key rows stay small (two short strings); reuse the
    * ≤ ~2²⁰-rows-per-bucket sizing rule on the key count Σ(len(w)+1). */
  private def bucketsFor(nRows: Long): Int = {
    val target = (nRows + (1L << 20) - 1) >> 20
    math.max(8, Integer.highestOneBit(math.max(1, target - 1).toInt) * 2)
  }

  private def bucketCountOf(s: SparkSession, table: String): Int =
    s.sessionState.catalog.getTableMetadata(TableIdentifier(table))
      .bucketSpec.map(_.numBuckets)
      .getOrElse(throw new IllegalStateException(
        s"$table is not a bucketed index table"))

  /** (w, df): the slice's word → containing-doc count. */
  private def vocabRows(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .groupBy(col("w"))
      .agg(countDistinct(col("doc_id")).as("df"))

  private def keyRows(vocab: DataFrame): DataFrame =
    vocab.select(col("w"),
      explode(expr(RetrievalQueries.delKeysExpr("w"))).as("k"))

  /** Build the dictionary from a corpus (`doc_id`, `text`). One sizing
    * aggregate (vocab count + key count), then the two table writes —
    * the key table derives from the WRITTEN vocab table, so the corpus
    * is tokenized twice, never three times. */
  def build(docs: DataFrame, table: String, buckets: Int = 0): Unit = {
    val s = docs.sparkSession
    val vocab = vocabRows(docs)
    val sizes = vocab
      .agg(count(lit(1)).as("n_vocab"),
        sum(length(col("w")) + 1L).as("n_keys"))
      .collect().head
    val vb =
      if (buckets > 0) buckets else bucketsFor(sizes.getAs[Long]("n_vocab"))
    val kb =
      if (buckets > 0) buckets else bucketsFor(sizes.getAs[Long]("n_keys"))
    vocab.write.bucketBy(vb, "w").sortBy("w")
      .mode("overwrite").saveAsTable(vocabTable(table))
    keyRows(s.table(vocabTable(table)))
      .write.bucketBy(kb, "k").sortBy("k")
      .mode("overwrite").saveAsTable(keysTable(table))
  }

  /** Advance the dictionary WITHOUT a rebuild: the slice's (w, df)
    * rows append into `_vocab` (readers SUM by w) and its deletion
    * pairs into `_keys`. Same admitted-docs contract as
    * [[InvertedTextIndex.append]]: only docs new to the index, so
    * slice dfs add to exact corpus dfs. */
  def append(admittedDocs: DataFrame, table: String): Unit = {
    val s = admittedDocs.sparkSession
    val vocab = vocabRows(admittedDocs)
    vocab.write.bucketBy(bucketCountOf(s, vocabTable(table)), "w")
      .sortBy("w").mode("append").saveAsTable(vocabTable(table))
    keyRows(vocab)
      .write.bucketBy(bucketCountOf(s, keysTable(table)), "k")
      .sortBy("k").mode("append").saveAsTable(keysTable(table))
  }

  /** Layout audit — rows-per-bucket vs the sizing target on the key
    * table (the one that grows a deletion neighborhood per new word),
    * `rebucket_due` at 2× — the lifecycle trigger every graft index
    * carries. */
  def layoutAudit(s: SparkSession, table: String,
      targetRowsPerBucket: Long = 1L << 20): DataFrame = {
    val deployed = bucketCountOf(s, keysTable(table))
    s.table(keysTable(table)).agg(count(lit(1)).as("n_keys"))
      .select(col("n_keys"), lit(deployed.toLong).as("buckets"),
        expr(s"n_keys div ${deployed.toLong}L").as("rows_per_bucket"),
        lit(targetRowsPerBucket).as("target_rows_per_bucket"),
        (col("n_keys") > lit(2L * targetRowsPerBucket) * deployed)
          .as("rebucket_due"))
  }

  /** Pin bucketed scans ON for an eagerly-executed lookup stage:
    * Spark's DisableUnnecessaryBucketedScan drops bucketed reading for
    * a filter-only subplan (nothing downstream wants the
    * partitioning), which silently forfeits the BUCKET PRUNING the key
    * layout exists for — the In-filter would fall back to opening
    * every bucket file's footer. Scoped and restored, never leaked. */
  private def withBucketedScan[T](s: SparkSession)(f: => T): T = {
    val key = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    val prev = s.conf.getOption(key)
    s.conf.set(key, "false")
    try f finally prev match {
      case Some(v) => s.conf.set(key, v)
      case None => s.conf.unset(key)
    }
  }

  /** Fuzzy-match a probe batch (`q_doc`, `probe`) against the
    * dictionary — q188's frame (q_doc, probe, n_matches, best_word,
    * best_df, best_dist), row-for-row identical on q188's workload
    * (FuzzyVocabIndexSpec). Two driver-side steps, both workload- or
    * match-bounded: the probes' deletion keys (≤|probes|·(len+1) short
    * strings — they prune the key-table scan) and the key-join
    * survivors (the candidate pairs q188's own doc admits are the small
    * set the exact-distance verify runs on — they prune the vocab scan,
    * whose df aggregation is then exchange-free under the w
    * bucketing). Candidate volume caveat: VERY short probes
    * over-generate (a 1-char deletion key touches every 1-2 char
    * vocabulary word), so production probe batches should be
    * length-filtered upstream — q188's probes are each doc's RAREST
    * term, which is naturally long; SymSpell deployments impose the
    * same minimum-length rule. */
  def search(probes: DataFrame, table: String,
      maxInList: Int = 4096): DataFrame = {
    import scala.jdk.CollectionConverters._
    val s = probes.sparkSession
    val pkPlan = probes.select(col("q_doc"), col("probe"),
      explode(expr(RetrievalQueries.delKeysExpr("probe"))).as("k"))
    val pkRows = pkPlan.collect().toSeq
    val pkLocal = s.createDataFrame(pkRows.asJava, pkPlan.schema)
    val keyList = pkRows.map(_.getAs[String]("k")).distinct
    val matchedKeys =
      if (keyList.size <= maxInList)
        s.table(keysTable(table)).filter(col("k").isin(keyList: _*))
      else s.table(keysTable(table))
        .join(broadcast(pkLocal.select(col("k")).distinct()), Seq("k"),
          "left_semi")
    val candPlan = matchedKeys.join(broadcast(pkLocal), "k")
      .select(col("q_doc"), col("probe"), col("w")).distinct()
    val candRows = withBucketedScan(s)(candPlan.collect()).toSeq
    val candLocal = s.createDataFrame(candRows.asJava, candPlan.schema)
    val candWords = candRows.map(_.getAs[String]("w")).distinct
    val prunedVocab =
      if (candWords.size <= maxInList)
        s.table(vocabTable(table)).filter(col("w").isin(candWords: _*))
      else s.table(vocabTable(table))
        .join(broadcast(candLocal.select(col("w")).distinct()), Seq("w"),
          "left_semi")
    // per-word df = SUM over the append slices' contributions
    val dfw = prunedVocab.groupBy(col("w")).agg(sum(col("df")).as("df"))
    val cand = candLocal.join(dfw, "w")
      .withColumn("dist", levenshtein(col("probe"), col("w")).cast("long"))
      .filter(col("dist") <= 1)
    val bw = Window.partitionBy(col("q_doc"))
      .orderBy(col("df").desc, col("w").asc)
    cand.withColumn("brn", row_number().over(bw))
      .groupBy(col("q_doc"), col("probe"))
      .agg(count(lit(1)).as("n_matches"),
        max(when(col("brn") === 1, col("w"))).as("best_word"),
        max(when(col("brn") === 1, col("df"))).as("best_df"),
        max(when(col("brn") === 1, col("dist"))).as("best_dist"))
  }
}
