package graft

import org.apache.spark.sql.functions._

/** The end-to-end refresh cycle must agree with the one-shot oracle
  * queries it composes: admitted counts match q173/q176, the indexes
  * advance by exactly the admitted rows, and the manifest leg is
  * q177's. */
class RefreshMainSpec extends SparkSpec {

  test("refresh summary agrees with q173/q176 verdicts and the indexes advance by Δ") {
    val s = RefreshMain.run(spark, sf0001)

    val q173Admitted = SparkEntry.queries("q173_delta_dedup")(spark, sf0001)
      .filter(col("admitted")).count()
    val q176Admitted = SparkEntry.queries("q176_delta_semdedup")(spark, sf0001)
      .filter(col("admitted")).count()
    assert(s.textAdmitted == q173Admitted,
      s"text admitted ${s.textAdmitted} != q173 $q173Admitted")
    assert(s.semAdmitted == q176Admitted,
      s"sem admitted ${s.semAdmitted} != q176 $q176Admitted")

    // the text index holds 2 band rows/doc: snapshot + admitted
    val textSnapshotDocs = Tables.documents(spark, sf0001)
      .filter(col("doc_id") % 10 =!= 0).count()
    assert(s.textIndexRows == 2 * (textSnapshotDocs + s.textAdmitted),
      s"text index ${s.textIndexRows} != 2*($textSnapshotDocs+${s.textAdmitted})")
    // the sem index holds 1 cell row/vector: snapshot + admitted
    val semSnapshotVecs = Tables.embeddings(spark, sf0001)
      .filter(col("vec_id") % 4 =!= 0).count()
    assert(s.semIndexRows == semSnapshotVecs + s.semAdmitted,
      s"sem index ${s.semIndexRows} != $semSnapshotVecs+${s.semAdmitted}")

    // manifest leg is q177's (cells and shipped totals)
    val m = SparkEntry.queries("q177_refresh_manifest")(spark, sf0001)
    assert(s.manifestCells == m.count())
    val shipped = m.agg(coalesce(sum(col("n_shipped")), lit(0L)))
      .collect().head.getLong(0)
    assert(s.shippedDocs == shipped)

    // the lifecycle audit reports a sane occupancy and, at this scale
    // (grid sized for the full corpus, one 25% batch appended), no
    // rebuild due yet
    assert(s.semAvgOccX100 > 0)
    assert(!s.semRebuildDue,
      s"one refresh should not outgrow the grid 2x: $s")

    // the serving index advanced with the admitted docs: it covers the
    // snapshot plus exactly the admitted slice, and the post-append
    // probe (one query per source, top-5) answered in full
    val textSnapshotDocs2 = Tables.documents(spark, sf0001)
      .filter(col("doc_id") % 10 =!= 0).count()
    assert(s.searchDocs == textSnapshotDocs2 + s.textAdmitted,
      s"search index ${s.searchDocs} != $textSnapshotDocs2+${s.textAdmitted}")
    val nSources = Tables.documents(spark, sf0001)
      .select(col("source")).distinct().count()
    assert(s.searchHits == nSources * 5,
      s"probe returned ${s.searchHits} rows, expected ${nSources * 5}")
    // quoted-query serving: every query doc that is IN the refreshed
    // index (snapshot members always are) self-matches its own phrase,
    // so the phrase probe answers at least those queries and at most all
    val snapshotQueryDocs = graft.queries.RetrievalQueries
      .queryDocs(spark, sf0001)
      .filter(col("q_doc") % 10 =!= 0).count()
    assert(s.searchPhraseHits >= snapshotQueryDocs &&
        s.searchPhraseHits <= nSources,
      s"phrase probe answered ${s.searchPhraseHits} of $nSources " +
        s"(≥$snapshotQueryDocs expected): $s")
    assert(s.searchHotDfBp > 0 && s.searchHotDfBp <= 10000)
    assert(!s.searchRebucketDue,
      s"one refresh should not outgrow the postings layout 2x: $s")

    // the fuzzy dictionary advanced in the same cut: the did-you-mean
    // probe answers every query doc (each probe's source word is at
    // distance ≤1 and survives in the refreshed dictionary — this
    // corpus's vocabulary is shared across many docs)
    assert(s.fuzzyVocabWords > 0)
    val nQueryDocs = graft.queries.RetrievalQueries
      .queryDocs(spark, sf0001).count()
    assert(s.fuzzySuggestHits == nQueryDocs,
      s"fuzzy probe answered ${s.fuzzySuggestHits} of $nQueryDocs: $s")

    // the multimodal leg: the image fingerprint index advanced by the
    // admitted batch's DISTINCT fingerprints (13 rows each — 12 blocks
    // + 1 identity key), and the manifest totals are q217's
    val imgSig = graft.queries.PerceptualQueries
      .imageSignatures(spark, sf0001)
    assert(s.imgBatch == imgSig.filter(col("id") % 10 === 0).count())
    assert(s.imgAdmitted > 0 && s.imgAdmitted <= s.imgBatch)
    val snapFp = imgSig.filter(col("id") % 10 =!= 0)
      .select(col("l0"), col("l1"), col("l2"), col("l3")).distinct().count()
    // admitted fingerprints are distinct from the snapshot AND (per
    // the within-batch min-id grouping) from each other, so the index
    // row count is exactly 13 · (snapshot distinct + admitted distinct)
    assert(s.imgIndexRows % 13 == 0 && s.imgIndexRows >= 13 * snapFp,
      s"phash index rows ${s.imgIndexRows} (snapshot fp $snapFp): $s")
    val mm = SparkEntry.queries("q217_multimodal_manifest")(spark, sf0001)
    assert(s.mmCells == mm.count())
    val mmTot = mm.agg(
      coalesce(sum(col("n_raw")), lit(0L)),
      coalesce(sum(col("n_after_text")), lit(0L)),
      coalesce(sum(col("n_after_image")), lit(0L)),
      coalesce(sum(col("n_shipped")), lit(0L))).collect().head
    assert(s.mmRaw == mmTot.getLong(0) && s.mmAfterText == mmTot.getLong(1)
      && s.mmAfterImage == mmTot.getLong(2) && s.mmShipped == mmTot.getLong(3),
      s"multimodal manifest totals diverged from q217: $s vs $mmTot")
    // the funnel is monotone and every gate is live in the composition
    assert(s.mmRaw >= s.mmAfterText && s.mmAfterText >= s.mmAfterImage &&
      s.mmAfterImage >= s.mmShipped, s"non-monotone funnel: $s")
    assert(s.indexCatalogJson.contains("\"kind\":\"phash\""),
      s"phash index missing from the catalog: ${s.indexCatalogJson}")

    // the video leg: the clip batch is every odd vid (one planted
    // excerpt per doc); nearly all are REJECTED — each matches its own
    // source at offset +2 — with the stop-hash tail admitted; the
    // index holds the snapshot's 8 frames per even vid plus 6 per
    // admitted clip, and the catalog carries the vclip row
    val nVids = graft.queries.PerceptualQueries
      .videoFrameRows(spark, sf0001)
      .filter(col("vid") % 2 === 1).select("vid").distinct().count()
    assert(s.vclipBatch == nVids, s"clip batch ${s.vclipBatch} != $nVids")
    assert(s.vclipAdmitted < s.vclipBatch / 2,
      s"most planted clips must match their source: $s")
    assert(s.vclipIndexRows == 8 * s.vclipBatch + 6 * s.vclipAdmitted,
      s"vclip index rows ${s.vclipIndexRows}: $s")
    assert(s.indexCatalogJson.contains("\"kind\":\"vclip\""),
      s"vclip index missing from the catalog: ${s.indexCatalogJson}")

    // the selection-model leg: a real holdout baseline (above the ~50%
    // base rate), zero drift when audited on the same holdout it was
    // baselined on, and the catalog carries the selmodel row
    assert(s.selBaselineBp > 5000L && s.selDriftBp == 0L &&
      !s.selRetrainDue, s"selection audit off: $s")
    assert(s.indexCatalogJson.contains("\"kind\":\"selmodel\""),
      s"selmodel missing from the catalog: ${s.indexCatalogJson}")
  }
}
