package graft

/** q168's generator-level dedup claim, checked directly: the band path
  * owns pairs whose bands collide (first-matching-band rule) and the
  * probe path excludes exactly those via the band folds, so the union
  * must emit each qualifying pair exactly once. The DuckDB oracle
  * CANNOT catch a violation here — a duplicate emitted identically by
  * both engines still hash-matches — so this invariant needs its own
  * spec. */
class ContainmentDedupSpec extends SparkSpec {

  test("q168 emits each qualifying (doc_a, doc_b) pair exactly once") {
    val pairs = SparkEntry.queries("q168_containment_neardup")(spark, sf0001)
      .select("doc_a", "doc_b")
    val total = pairs.count()
    val distinct = pairs.distinct().count()
    assert(total == distinct,
      s"duplicate pair emissions: $total rows vs $distinct distinct pairs")
    assert(total > 0, "the corpus must exercise the operator")
  }
}
