package graft

import org.apache.spark.sql.functions._

/** Smoke + known-value checks for the declared query surface at
  * sf0.001 (full oracle parity runs via graft.Verify + DuckDB). */
class QueriesSmokeSpec extends SparkSpec {

  test("every declared query with an oracle also parses and returns a schema") {
    // Construction (plan analysis) must succeed for every query.
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf0001)
      assert(df.schema.fields.nonEmpty, name)
    }
  }

  test("oracleSql covers every query — no rows-only ops remain") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    // q43 (the last rows-only holdout) now emits the exact distinct
    // count plus a deterministic bounded-error verdict on its HLL
    // estimate, so every declared query carries a full hash oracle.
    assert(o.subsetOf(q))
    assert((q -- o) == Set.empty, s"queries without oracle: ${q -- o}")
  }

  test("q43 sketch verdict: every group within the 15% band, exact is exact") {
    val df = SparkEntry.queries("q43_approx_distinct")(spark, sf0001)
    assert(df.filter(!col("hll_within_15pct")).count() == 0)
    val exact = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("exact_parts"))
    val mismatch = df.join(exact, "l_returnflag")
      .filter(col("n_parts_exact") =!= col("exact_parts"))
    assert(mismatch.count() == 0)
  }

  test("q45 streaming sessionizer emits transcripts in batch mode") {
    val df = SparkEntry.queries("q45_streaming_sessionize")(spark, sf0001)
    assert(df.count() > 0)
    assert(df.filter(!col("eventType").isin("PARTIAL", "FINAL",
      "END_OF_UTTERANCE")).count() == 0)
  }

  test("entry (flagship) returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("q13 queue depth partitions all events") {
    val depths = SparkEntry.queries("q13_queue_depth")(spark, sf0001)
    val total = depths.agg(sum("depth")).head().getLong(0)
    val events = spark.read.parquet(s"$sf0001/events.parquet").count()
    assert(total == events)
  }

  test("q14 sessions never split within the 30-minute gap") {
    val sess = SparkEntry.queries("q14_sessionize")(spark, sf0001)
    // durations are non-negative and n_events >= 1
    assert(sess.filter(col("duration_us") < 0).count() == 0)
    assert(sess.filter(col("n_events") < 1).count() == 0)
  }

  test("q32 knn returns exactly top-5 per query vector") {
    val knn = SparkEntry.queries("q32_knn_bruteforce")(spark, sf0001)
    val counts = knn.groupBy("q_id").count().collect()
    assert(counts.nonEmpty)
    assert(counts.forall(_.getLong(1) == 5L))
    // cosine within [-1, 1]
    assert(knn.filter(abs(col("cos_sim")) > 1.000001).count() == 0)
  }

  test("q30 simhash fits in 16 bits") {
    val sh = SparkEntry.queries("q30_simhash")(spark, sf0001)
    assert(sh.filter(col("simhash") < 0 || col("simhash") > 65535).count() == 0)
  }

  test("q132 count-min estimates never under-count (CMS soundness)") {
    val cms = SparkEntry.queries("q132_countmin_heavy_hitters")(spark, sf0001)
    assert(cms.count() == 20)
    assert(cms.filter(col("overestimate") < 0).count() == 0,
      "CMS min-over-rows must be >= the true count")
  }

  test("q126 PQ quantization error is non-negative (squared distance)") {
    val pq = SparkEntry.queries("q126_pq_encode")(spark, sf0001)
    // err = ||x_sub - c||^2: exact math is >= 0; allow the 1e-6 rounding
    assert(pq.filter(col("quant_err") < -1e-5).count() == 0)
  }

  test("q133 priority sample: k rows, estimator dominates the weight") {
    val ps = SparkEntry.queries("q133_priority_sample")(spark, sf0001)
    assert(ps.count() == 50)
    assert(ps.filter(col("est_weight") < col("weight")).count() == 0,
      "DLT estimator is max(w, tau) - never below the raw weight")
  }

  test("q130 IVFPQ returns top-3 per query from probed cells only") {
    val r = SparkEntry.queries("q130_ivfpq_search")(spark, sf0001)
    val counts = r.groupBy("q_id").count().collect()
    assert(counts.nonEmpty)
    assert(counts.forall(_.getLong(1) == 3L))
  }
}
