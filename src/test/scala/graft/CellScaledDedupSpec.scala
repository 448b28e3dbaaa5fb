package graft

import org.apache.spark.sql.functions._

/** q172's cell machinery: the sign-LSH hyperplane matrix must be
  * usable as a blocking grid (balanced, plane-distinct — a degenerate
  * matrix would silently collapse cells and the within-cell pair join
  * would quietly become all-pairs), and the adaptive depth must land
  * on the contract 2^b = smallest power of two with 64·2^b ≥ n, with
  * the summary conserving every vector. */
class CellScaledDedupSpec extends SparkSpec {

  test("hyperplane matrix is balanced and plane-distinct") {
    val m = graft.queries.VectorQueries.planeSign
    assert(m.length == 16 && m.forall(_.length == 64))
    for ((row, j) <- m.zipWithIndex) {
      val pos = row.count(_ > 0)
      // splitmix-derived bits: ~Binomial(64, 1/2); beyond 16..48 would
      // mean a broken generator, not bad luck (p < 1e-4 per plane)
      assert(pos >= 16 && pos <= 48, s"plane $j unbalanced: $pos/64 positive")
      assert(row.forall(v => v == 1 || v == -1))
    }
    assert(m.map(_.toSeq).distinct.length == 16, "duplicate hyperplanes")
  }

  test("q172 adaptive depth and conservation at sf0.001") {
    val q = SparkEntry.queries("q172_cellscaled_semdedup")
    val out = q(spark, sf0001).collect()
    val nVecs = out.map(_.getAs[Long]("n_vecs")).sum
    assert(nVecs == 500L, s"expected all 500 vectors summarized, got $nVecs")
    // n = 500: 64*8 = 512 >= 500 > 256 — cap must be exactly 8 cells
    assert(out.forall(_.getAs[Long]("n_cells_cap") == 8L))
    out.foreach { r =>
      assert(r.getAs[Long]("n_dropped") + r.getAs[Long]("n_kept") ==
        r.getAs[Long]("n_vecs"))
    }
    // the synthetic corpus has near-dup structure; the grid must not be
    // so wrong that nothing clusters (q62 finds pairs at cos >= 0.3)
    assert(out.map(_.getAs[Long]("n_dropped")).sum > 0L,
      "cell-scaled dedup found zero duplicates — blocking grid broken?")
  }

  test("q173 delta verdicts are exactly the incoming slice, exactly once") {
    val q = SparkEntry.queries("q173_delta_dedup")
    val out = q(spark, sf0001)
    val ids = out.select("doc_id").collect().map(_.getLong(0))
    assert(ids.forall(_ % 10 == 0))
    assert(ids.length == ids.distinct.length, "duplicate per-doc verdicts")
    val nIncoming = Tables.documents(spark, sf0001)
      .filter(col("doc_id") % 10 === 0).count()
    assert(ids.length.toLong == nIncoming,
      s"${ids.length} verdicts for $nIncoming incoming docs")
    // a matched doc can never be admitted and vice versa
    out.collect().foreach { r =>
      assert(r.getAs[Boolean]("admitted") == (r.getAs[Long]("n_matches") == 0L))
      if (r.getAs[Long]("n_matches") == 0L) {
        assert(r.getAs[Long]("first_match") == -1L)
        assert(r.getAs[Double]("max_jaccard") == 0.0)
      } else assert(r.getAs[Double]("max_jaccard") >= 0.7)
    }
  }
}
