package graft

/** Plan-quality regression guards (PLANS.md): these lock in the
  * properties that matter at 100 TB — filter/column pushdown to the
  * scan, broadcast dimension joins, and no accidental cartesian /
  * shuffle regressions when queries are edited. */
class PlanQualitySpec extends SparkSpec {

  private def planOf(q: String): String =
    SparkEntry.queries(q)(spark, sf0001)
      .queryExecution.executedPlan.toString

  test("q01 pushes the date filter and prunes to 6 columns") {
    val p = planOf("q01_pricing_summary")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThan(l_shipdate"),
      s"missing pushed filter:\n$p")
    // column pruning: the scan's projected column list must not include
    // any of the 5 unused lineitem columns
    val scanLine = p.linesIterator.find(_.contains("FileScan parquet")).get
    for (c <- Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_tax"))
      assert(!scanLine.contains(c), s"scan reads unused column $c:\n$scanLine")
  }

  test("q03 joins all five dimensions by broadcast") {
    val p = planOf("q03_region_revenue")
    assert("BroadcastHashJoin".r.findAllIn(p).size == 5, s"expected 5 broadcast joins:\n$p")
    assert(!p.contains("SortMergeJoin"), s"unexpected shuffle join:\n$p")
    // region filter reached its scan
    assert(p.contains("EqualTo(r_name,ASIA)"), s"region filter not pushed:\n$p")
  }

  test("q28 aggregates map-side (partial_min before the exchange)") {
    val p = planOf("q28_minhash_signatures")
    assert(p.contains("partial_min"), s"no map-side combine:\n$p")
  }

  test("q32 broadcasts the query vectors (no cartesian shuffle)") {
    val p = planOf("q32_knn_bruteforce")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"query side not broadcast:\n$p")
  }

  test("per-row column pipelines stay inside whole-stage codegen") {
    // q12 is pure per-row math over 6 outputs: the whole thing must be
    // one fused codegen stage over the scan (no interpreted expressions)
    val df = SparkEntry.queries("q12_retry_demote_dlq")(spark, sf0001)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("*(1)"), s"no codegen span (missing *(n) marker):\n$p")
  }

  test("the native intersect expression runs inside codegen") {
    graft.expressions.SortedLongIntersectCount.register(spark)
    // non-foldable input (literals would constant-fold to LocalTableScan)
    val df = spark.range(100)
      .selectExpr("sequence(0L, id % 10) AS a", "sequence(0L, 5L) AS b")
      .selectExpr("sorted_long_intersect_count(a, b) AS c")
    val total = df.agg(org.apache.spark.sql.functions.sum("c")).head().getLong(0)
    assert(total > 0)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("*(1)"), s"custom expr fell back (no *(n) marker):\n$p")
  }

  test("q11 top-100 does not materialize a global sort of all rows") {
    val p = planOf("q11_priority_dequeue")
    // row_number over a global window needs a single-partition sort, but
    // the filter rank<=100 must sit directly above it (no extra shuffle
    // after) — guard that the pattern stays window+filter
    assert(p.contains("RunningWindowFunction") || p.contains("Window"),
      s"expected window operator:\n$p")
  }

  test("q42 as-of join is union + ONE key shuffle, never a range join") {
    val p = planOf("q42_asof_join")
    assert(p.contains("Union"), s"expected union form:\n$p")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"as-of degenerated to a pairwise join:\n$p")
    // both event_type filters reached the scans
    assert(p.contains("EqualTo(event_type,view)") &&
      p.contains("EqualTo(event_type,click)"), s"filters not pushed:\n$p")
  }

  test("q73 interval join stays bucketized (no cartesian)") {
    val p = planOf("q73_interval_flag_join")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"interval join degenerated to a cross product:\n$p")
    assert(p.contains("Generate"), s"expected interval bucket explode:\n$p")
  }

  test("q148 re-rank broadcasts the candidates — the corpus never shuffle-joins") {
    val p = planOf("q148_ivfpq_rerank")
    // two-stage refine: both the finalist list and the query vectors
    // ride broadcasts onto the embeddings scan; a SortMergeJoin here
    // would mean the corpus shuffled for a <=3xqueries-row join
    assert(!p.contains("SortMergeJoin"), s"corpus shuffled for re-rank:\n$p")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2,
      s"candidates/queries not broadcast:\n$p")
  }

  test("q149 word stats combine map-side before the (doc, word) exchange") {
    val p = planOf("q149_quality_rules")
    assert(p.contains("partial_count"), s"no map-side combine:\n$p")
    // the doc-level stats join back by broadcast (tiny vs the corpus)
    assert(p.contains("BroadcastHashJoin"), s"stats join not broadcast:\n$p")
  }

  test("NO query plans a CartesianProduct; nested-loop only where intended") {
    // global guard over the whole declared surface: an accidental
    // cross product is the one plan shape that cannot survive 100 TB.
    // BroadcastNestedLoopJoin is allowed only for the ANN queries that
    // intentionally broadcast a tiny query-vector side, and for q175's
    // ground-truth pairing, whose build side is the FIXED 512-vector
    // sample (the q170 sampling contract: all-pairs exists only inside
    // a size-capped sample, so the nested loop is bounded at any
    // corpus size — and ground truth cannot use a blocking key, that
    // is the thing it measures).
    val nestedLoopAllowed =
      Set("q32_knn_bruteforce", "q33_ann_ivf_label", "q80_ann_recall",
        "q175_cellgrid_recall",
        // q181/q182's semantic side is q32's intentional shape: the
        // build side is the ~|sources| query vectors (one content-
        // addressed query doc per source), bounded at any corpus size.
        "q181_hybrid_rrf", "q182_retrieval_recall",
        // q197's brute-force ground truth broadcasts its FIXED
        // 50-vector query workload (the q175 sampling contract)
        "q197_ann_retrain_recall")
    // q78 runs an iterative fixpoint at construction time — planJudged
    // via its components; skip the expensive build here.
    import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
    for ((name, fn) <- SparkEntry.queries if name != "q78_dup_clusters") {
      val qe = fn(spark, sf0001).queryExecution
      val p = qe.executedPlan.toString
      assert(!p.contains("CartesianProduct"), s"$name plans a cartesian:\n$p")
      if (!nestedLoopAllowed(name)) {
        // a nested-loop join is tolerable only when its BUILD side is
        // provably a single row (crossJoin(broadcast(agg-without-
        // groupBy)) — the scalar-broadcast pattern used to avoid
        // unpartitioned windows); a 1-row broadcast side cannot blow up
        // at any scale, with or without a join condition (the optimizer
        // may push a filter INTO the cross join — e.g. q108's threshold
        // compare — which is then just a per-row predicate against one
        // broadcast row). Proved PER NODE on the physical plan: walk
        // each BroadcastNestedLoopJoinExec's build subtree through its
        // exchange/projection wrappers down to a global aggregate with
        // no grouping keys (≤ 1 output row by construction). A big×big
        // nested loop has a scan/join build side and fails the walk —
        // nothing to hide behind.
        PlanGuards.flatten(qe.executedPlan).collect {
          case b: BroadcastNestedLoopJoinExec => b
        }.foreach { b =>
          assert(PlanGuards.scalarSubtree(PlanGuards.buildSide(b)),
            s"$name plans a nested-loop join whose build side is not " +
              s"provably one row:\n$p")
        }
      }
    }
  }

  test("q75 contamination shuffles fingerprints, not documents") {
    val p = planOf("q75_contamination_pairs")
    // the self-join key is the 16-byte md5; text must not survive past
    // the fingerprint projection into any exchange
    val exchanges = p.linesIterator.filter(_.contains("Exchange")).toSeq
    assert(exchanges.nonEmpty)
    assert(!exchanges.exists(_.contains("text#")),
      s"raw text crossed an exchange:\n${exchanges.mkString("\n")}")
  }

  test("q31 candidates come from band keys, not per-source blocking") {
    import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, ShuffledHashJoinExec, SortMergeJoinExec}
    // round-5 advice class: a near-dup self-join equi-keyed on `source`
    // alone is quadratic within a source (one giant crawl kills it).
    // The banded layout joins on (source, band-index, minhash) — assert
    // the multi-key join exists and no equi-join blocks on source only.
    val qe = SparkEntry.queries("q31_trigram_jaccard")(spark, sf0001)
      .queryExecution
    val keySets = PlanGuards.flatten(qe.executedPlan).collect {
      case j: SortMergeJoinExec => j.leftKeys
      case j: ShuffledHashJoinExec => j.leftKeys
      case j: BroadcastHashJoinExec => j.leftKeys
    }
    assert(keySets.exists(_.size >= 3),
      s"banded (source, bidx, band) self-join missing: " +
        keySets.map(_.mkString(",")).mkString(" | "))
    assert(!keySets.exists(ks =>
      ks.size == 1 && ks.head.toString.contains("source")),
      "a join blocks on the skewable source key alone")
  }

  test("q122's factored disjunction bounds reach both parquet scans") {
    val p = planOf("q122_disjunctive_revenue")
    // the common envelopes (quantity 1..35, the three brands) must be
    // pushed — the OR-of-ANDs itself can't key a join, but its factored
    // conjuncts prune both scans before the join carries anything
    assert(p.contains("GreaterThanOrEqual(l_quantity,1.0)") &&
      p.contains("LessThanOrEqual(l_quantity,35.0)"),
      s"lineitem quantity envelope not pushed:\n$p")
    assert(p.contains("In(p_brand, [Brand#1,Brand#2,Brand#3])"),
      s"part brand envelope not pushed:\n$p")
  }

  test("q119's per-part arg-max is an aggregate, not a window sort") {
    // the correlated-min shape must stay a partial-aggregable struct
    // max: a row_number rewrite would force a per-part sort of every
    // (part, supplier) pair
    val p = planOf("q119_best_supplier_per_part")
    val beforeTopK = p.split("TakeOrderedAndProject").last
    assert(!beforeTopK.contains("RunningWindowFunction"),
      s"arg-max degenerated to a window:\n$p")
  }

  test("q123 scans lineitem once (window total, no self-join)") {
    val p = planOf("q123_dominant_suppliers")
    val factScans = p.linesIterator
      .filter(l => l.contains("FileScan parquet") && l.contains("lineitem"))
      .size
    assert(factScans == 1, s"expected 1 lineitem scan, got $factScans:\n$p")
  }

  test("q127's code lookup joins the broadcast distance table") {
    val p = planOf("q127_pq_adc_search")
    // the corpus side must join codes against a broadcast table — a
    // shuffle join here would move the (vec, subsp, code) encode for
    // every query batch
    assert(p.contains("BroadcastHashJoin"),
      s"ADC lookup not a broadcast join:\n$p")
  }
}
