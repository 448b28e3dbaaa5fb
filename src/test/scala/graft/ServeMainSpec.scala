package graft

import org.apache.spark.sql.functions._

/** The end-to-end serving cycle must answer exactly what the one-shot
  * oracle queries answer: every leg's count ties to its query, and the
  * index row counts tie to the corpus token structure. */
class ServeMainSpec extends SparkSpec {

  test("serve summary agrees with the oracle queries it serves") {
    val s = ServeMain.run(spark, sf0001)

    def rows(q: String): Long =
      SparkEntry.queries(q)(spark, sf0001).count()
    assert(s.searchHits == rows("q180_keyword_search"),
      s"search leg diverged: $s")
    assert(s.phraseHits == rows("q183_phrase_search"),
      s"phrase leg diverged: $s")
    assert(s.snippetRows == rows("q184_snippets"),
      s"snippet leg diverged: $s")
    // hybrid serving is IVF-probed (not the brute-force oracle), but
    // the frame contract holds: a full top-5 per query
    assert(s.hybridRows == s.nQueries * 5, s"hybrid leg diverged: $s")

    // index volumes tie to the corpus token structure
    val docs = Tables.documents(spark, sf0001)
    val toks = docs.select(explode(split(col("text"), " ")).as("w"),
      col("doc_id"))
    assert(s.positions == toks.count(), s"positions != token volume: $s")
    assert(s.postings == toks.distinct().count(),
      s"postings != distinct (doc, token) pairs: $s")
    assert(s.annRows == Tables.embeddings(spark, sf0001).count())

    // audits are sane at this scale
    assert(s.hotDfBp > 0 && s.hotDfBp <= 10000)
    assert(!s.rebucketDue && !s.annRetrainDue, s"fresh build flagged: $s")
  }
}
