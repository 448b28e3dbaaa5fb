package graft

import org.apache.spark.sql.functions._

/** Semantic pins for the data-selection family — properties the oracle
  * hash can't express as invariants: the classifier's holdout split
  * really generalizes above the majority-class baseline (not just
  * memorizes), DSIR's selected set really is enriched in rule-clean
  * docs, and the funnel's counts really are the per-doc frames'
  * rollup. */
class SelectionQueriesSpec extends SparkSpec {

  test("q200 classifier: internal consistency + train fit ≥ holdout fit") {
    val rows = SparkEntry.queries("q200_nb_quality_classifier")(spark, sf0001)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (bp, bn) = (r.getAs[Long]("bits_pos"), r.getAs[Long]("bits_neg"))
      assert(bp > 0 && bn > 0, s"unscored doc: $r")
      assert(r.getAs[Boolean]("pred") == (bp <= bn), s"pred != argmin: $r")
      assert(r.getAs[Boolean]("agree") ==
        (r.getAs[Boolean]("pred") == r.getAs[Boolean]("label")),
        s"agree flag inconsistent: $r")
      assert(Set("train", "holdout")(r.getAs[String]("split")))
    }
    def rate(split: String): Double = {
      val s = rows.filter(_.getAs[String]("split") == split)
      s.count(_.getAs[Boolean]("agree")).toDouble / s.length
    }
    // a fitted model fits its own training data at least as well as
    // unseen docs; equality would mean it learned nothing doc-specific
    assert(rate("train") > rate("holdout"),
      s"no train/holdout gap: train=${rate("train")} holdout=${rate("holdout")}")
  }

  test("q200 holdout beats the majority-class baseline (sf0.01 — real generalization)") {
    val hold = SparkEntry.queries("q200_nb_quality_classifier")(
      spark, "/root/testdata/sf0.01")
      .filter(col("split") === "holdout")
      .select(col("label"), col("agree")).collect()
    val n = hold.length
    val agree = hold.count(_.getAs[Boolean]("agree"))
    val nPos = hold.count(_.getAs[Boolean]("label"))
    val majority = math.max(nPos, n - nPos)
    // measured 170/250 agree vs 126/250 majority at sf0.01; the margin
    // is wide enough that any real regression (feature hash drift,
    // split drift, scoring bug) trips this before the oracle sees it
    assert(agree > majority,
      s"holdout accuracy $agree/$n does not beat majority $majority/$n")
  }

  test("q201 DSIR: selected == (w_hbits ≥ 0) and the selected set is rule-enriched") {
    val rows = SparkEntry.queries("q201_dsir_importance")(spark, sf0001)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("selected") == (r.getAs[Long]("w_hbits") >= 0L),
        s"selected != importance-ratio-≥-1: $r")
      assert(r.getAs[Long]("n_feats") > 0, s"featureless doc: $r")
    }
    val sel = rows.filter(_.getAs[Boolean]("selected"))
    assert(sel.nonEmpty, "DSIR selected nothing — degenerate threshold")
    assert(sel.length < rows.length, "DSIR selected everything — degenerate")
    val precision = sel.count(_.getAs[Boolean]("label")).toDouble / sel.length
    val base = rows.count(_.getAs[Boolean]("label")).toDouble / rows.length
    // measured 61/78 = 78% vs 50% base at sf0.001
    assert(precision > base,
      s"selected set not enriched: precision=$precision base=$base")
  }

  test("q203 model-gated funnel is monotone and every stage does real work") {
    val rows = SparkEntry.queries("q203_model_gated_corpus")(spark, sf0001)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val seq = Seq("n_raw", "n_line", "n_rules", "n_clf", "n_final")
        .map(r.getAs[Long])
      assert(seq == seq.sorted.reverse, s"funnel not monotone: $r")
      assert(r.getAs[Long]("chars_final") >= 0)
    }
    def tot(c: String): Long = rows.map(_.getAs[Long](c)).sum
    // each gate must reject SOMETHING corpus-wide on this corpus —
    // a stage that passes everything is a stage that isn't wired
    assert(tot("n_line") < tot("n_raw"), "line gate rejected nothing")
    assert(tot("n_rules") < tot("n_line"), "rule gate rejected nothing")
    assert(tot("n_final") < tot("n_clf") || tot("n_clf") < tot("n_rules"),
      "neither model gate rejected anything")
    assert(tot("n_final") > 0, "funnel shipped an empty corpus")
  }

  test("q204 full build: monotone, agrees with q199's shared stages, eval source never ships") {
    val rows = SparkEntry.queries("q204_full_corpus_build")(spark, sf0001)
      .collect().map(r => r.getAs[String]("source") -> r).toMap
    assert(rows.nonEmpty)
    rows.values.foreach { r =>
      val seq = Seq("n_raw", "n_line", "n_rules", "n_clf", "n_dsir",
        "n_dedup", "n_final").map(r.getAs[Long])
      assert(seq == seq.sorted.reverse, s"funnel not monotone: $r")
    }
    // the eval slice is the decontam reference — it never ships
    assert(rows("src0").getAs[Long]("n_final") == 0L &&
      rows("src0").getAs[Long]("chars_final") == 0L,
      s"eval source shipped: ${rows("src0")}")
    assert(rows.values.map(_.getAs[Long]("n_final")).sum > 0,
      "full build shipped an empty corpus")
    // the first three stages are DEFINITIONALLY q199's (same q198/q149
    // verdicts) — any drift is a composition bug, not a data change
    val q199r = SparkEntry.queries("q199_line_gated_corpus")(spark, sf0001)
      .collect().map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_raw"), r.getAs[Long]("n_line_pass"),
          r.getAs[Long]("n_quality"))).toMap
    rows.foreach { case (src, r) =>
      assert((r.getAs[Long]("n_raw"), r.getAs[Long]("n_line"),
        r.getAs[Long]("n_rules")) == q199r(src),
        s"shared stages diverged from q199 for $src")
    }
  }

  test("q205 calibration: keep rate rises with the confidence margin for both selectors") {
    val rows = SparkEntry.queries("q205_selection_calibration")(spark, sf0001)
      .collect()
    assert(rows.map(_.getAs[String]("method")).toSet == Set("clf", "dsir"))
    rows.foreach { r =>
      assert(r.getAs[Long]("keep_bp") ==
        10000L * r.getAs[Long]("n_keep") / r.getAs[Long]("n_docs"),
        s"keep_bp inconsistent: $r")
    }
    // the margin must carry real information: the aggregate keep rate
    // above the zero margin strictly exceeds the rate below it (the
    // per-bin curve is noisy at 500 docs; the split is not)
    for (m <- Seq("clf", "dsir")) {
      val mr = rows.filter(_.getAs[String]("method") == m)
      def rate(p: Long => Boolean): Double = {
        val s = mr.filter(r => p(r.getAs[Long]("bin_lo")))
        s.map(_.getAs[Long]("n_keep")).sum.toDouble /
          math.max(1L, s.map(_.getAs[Long]("n_docs")).sum)
      }
      assert(rate(_ >= 0L) > rate(_ < 0L),
        s"$m margin carries no information: ${mr.toSeq}")
    }
  }

  test("q202 funnel is exactly the per-doc frames' per-source rollup") {
    val funnel = SparkEntry.queries("q202_selection_funnel")(spark, sf0001)
      .collect().map(r => r.getAs[String]("source") -> r).toMap
    val dsir = SparkEntry.queries("q201_dsir_importance")(spark, sf0001)
      .collect()
    val pred = SparkEntry.queries("q200_nb_quality_classifier")(spark, sf0001)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("pred"))
      .toMap
    assert(funnel.nonEmpty)
    dsir.groupBy(_.getAs[String]("source")).foreach { case (src, docs) =>
      val f = funnel(src)
      val trip = docs.map { r =>
        (r.getAs[Boolean]("label"), pred(r.getAs[Long]("doc_id")),
          r.getAs[Boolean]("selected"))
      }
      assert(f.getAs[Long]("n_docs") == docs.length, s"n_docs of $src")
      assert(f.getAs[Long]("n_rules") == trip.count(_._1), s"n_rules of $src")
      assert(f.getAs[Long]("n_clf") == trip.count(_._2), s"n_clf of $src")
      assert(f.getAs[Long]("n_dsir") == trip.count(_._3), s"n_dsir of $src")
      assert(f.getAs[Long]("n_all") ==
        trip.count(t => t._1 && t._2 && t._3), s"n_all of $src")
      assert(f.getAs[Long]("n_any") ==
        trip.count(t => t._1 || t._2 || t._3), s"n_any of $src")
    }
  }
}
