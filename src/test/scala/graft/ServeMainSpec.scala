package graft

import org.apache.spark.sql.functions._

/** The end-to-end serving cycle must answer exactly what the one-shot
  * oracle queries answer: every leg's count ties to its query, the
  * index row counts tie to the corpus token structure, and every leg
  * carries its latency quantiles (the StreamBench discipline applied
  * to queries). */
class ServeMainSpec extends SparkSpec {

  test("serve summary agrees with the oracle queries it serves") {
    val s = ServeMain.run(spark, sf0001, reps = 3,
      concLevels = Seq(4, 16))

    def rows(q: String): Long =
      SparkEntry.queries(q)(spark, sf0001).count()
    assert(s.search.hits == rows("q180_keyword_search"),
      s"search leg diverged: $s")
    assert(s.phrase.hits == rows("q183_phrase_search"),
      s"phrase leg diverged: $s")
    assert(s.snippets.hits == rows("q184_snippets"),
      s"snippet leg diverged: $s")
    assert(s.prf.hits == rows("q185_prf_expansion"),
      s"PRF leg diverged: $s")
    assert(s.mmr.hits == rows("q186_mmr_diversify"),
      s"MMR leg diverged: $s")
    assert(s.fuzzy.hits == rows("q188_fuzzy_term_match"),
      s"fuzzy leg diverged: $s")
    // hybrid serving is IVF-probed (not the brute-force oracle), but
    // the frame contract holds: a full top-5 per query
    assert(s.hybrid.hits == s.nQueries * 5, s"hybrid leg diverged: $s")

    // every leg pins its latency quantiles: measured, ordered, and the
    // warm (prepared-plan) floor near or below the cold (re-plan)
    // median — planning + the leg's driver-side collects are what warm
    // skips. Tolerances (ADVICE r14): a prepared-plan rep can finish in
    // <1 ms (warm p50 truncates to 0 — legitimate, not unmeasured), and
    // GC/box load can push a sub-100 ms warm median past a cold median
    // without any code meaning — so warm ≤ cold holds with slack, and
    // strictly only where the medians are large enough to out-signal
    // scheduling noise.
    for (l <- Seq(s.search, s.phrase, s.snippets, s.hybrid, s.prf,
        s.mmr, s.fuzzy)) {
      assert(l.p50Ms > 0 && l.maxMs >= l.p50Ms,
        s"cold quantiles unmeasured or unordered: $l in $s")
      assert(l.warmP50Ms >= 0 && l.warmMaxMs >= l.warmP50Ms,
        s"warm quantiles unmeasured or unordered: $l in $s")
      assert(l.warmP50Ms <= l.p50Ms + math.max(50L, l.p50Ms / 2),
        s"warm median far above cold median: $l in $s")
    }

    // index volumes tie to the corpus token structure
    val docs = Tables.documents(spark, sf0001)
    val toks = docs.select(explode(split(col("text"), " ")).as("w"),
      col("doc_id"))
    assert(s.positions == toks.count(), s"positions != token volume: $s")
    assert(s.postings == toks.distinct().count(),
      s"postings != distinct (doc, token) pairs: $s")
    assert(s.fwdRows == docs.count(), s"fwd rows != docs: $s")
    assert(s.annRows == Tables.embeddings(spark, sf0001).count())
    assert(s.keyRows > 0)

    // audits are sane at this scale
    assert(s.hotDfBp > 0 && s.hotDfBp <= 10000)
    assert(!s.rebucketDue && !s.annRetrainDue, s"fresh build flagged: $s")

    // concurrency points: every requested level ran its full mixed
    // workload, throughput and quantiles are measured, and every leg
    // is represented (the ConcPoint contract BENCH/PLANS rows read)
    assert(s.concurrency.map(_.n) == Seq(4, 16), s"levels: ${s.concurrency}")
    val legNames = Set("search", "phrase", "snippet", "hybrid", "prf",
      "mmr", "fuzzy")
    for (c <- s.concurrency) {
      assert(c.requests == math.max(3 * c.n, 30), s"workload size: $c")
      assert(c.wallMs > 0 && c.qps > 0, s"unmeasured point: $c")
      assert(c.maxMs >= c.p50Ms && c.p50Ms >= 0, s"quantiles: $c")
      assert(c.legs.keySet == legNames, s"legs missing: ${c.legs.keySet}")
      for ((_, (p50, mx)) <- c.legs) assert(mx >= p50 && p50 >= 0)
    }
    // the JSON encoder is total over the measured points
    val js = ServeMain.concJson(s.concurrency)
    assert(js.startsWith("[{\"n\":4,") && js.contains("\"qps\":"), js)
  }
}
