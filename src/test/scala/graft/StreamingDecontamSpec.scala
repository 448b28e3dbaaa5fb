package graft

import scala.collection.mutable
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.StreamingDecontam

/** The foreachBatch decontamination gate must agree with batch q166 on
  * the same corpus AND hold zero streaming state: the REAL sf0.001
  * documents stream in across two micro-batches against the static
  * src0 eval-gram set; the union of per-batch verdicts (each doc
  * arrives whole, so each appears in exactly one batch) must match the
  * batch query's, and the query must register no stateful operator —
  * the bounded-state contract that lets the gate run on an unbounded
  * 100 TB ingest stream. */
class StreamingDecontamSpec extends SparkSpec {

  test("foreachBatch gate reproduces batch q166 verdicts with zero stream state") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("source"), col("text"))
      .as[(Long, String, String)].collect()
    val evalSlice =
      Tables.documents(spark, sf0001).filter(col("source") === "src0")
    val evalGrams = StreamingDecontam.evalGramSet(evalSlice)
    val evalStrs = StreamingDecontam.evalStrSet(evalSlice)

    val verdicts =
      mutable.Map.empty[Long, (Long, Long, Boolean, Long, Boolean)]
    val batchIds = mutable.Set.empty[Long]
    val input = MemoryStream[(Long, String, String)]
    val query = StreamingDecontam.start(
      input.toDF().toDF("doc_id", "source", "text")
        .filter(col("source") =!= "src0"),
      evalGrams, evalStrs = Some(evalStrs)) { (verdictDf, id) =>
      verdicts.synchronized {
        batchIds += id
        verdictDf.select("doc_id", "n_grams", "n_contaminated",
            "contaminated", "n_confirmed", "confirmed")
          .collect()
          .foreach { r =>
            val docId = r.getLong(0)
            // docs arrive whole: a doc_id must never span two batches
            assert(!verdicts.contains(docId), s"doc $docId emitted twice")
            verdicts(docId) = (r.getLong(1), r.getLong(2), r.getBoolean(3),
              r.getLong(4), r.getBoolean(5))
          }
      }
    }
    try {
      val (b1, b2) = docs.splitAt(docs.length / 2)
      input.addData(b1.toIndexedSeq)
      query.processAllAvailable()
      input.addData(b2.toIndexedSeq)
      query.processAllAvailable()

      // bounded state: foreachBatch with batch-local agg registers no
      // stateful streaming operator, so state rows are zero forever
      val progresses = query.recentProgress
      assert(progresses.nonEmpty)
      progresses.foreach { p =>
        assert(p.stateOperators.isEmpty ||
          p.stateOperators.forall(_.numRowsTotal == 0),
          s"unexpected stream state: ${p.stateOperators.toSeq}")
      }
      assert(batchIds.size >= 2, s"expected >=2 micro-batches, got $batchIds")

      val batch = SparkEntry.queries("q166_decontamination")(spark, sf0001)
        .select("doc_id", "n_grams", "n_contaminated", "contaminated",
          "n_confirmed", "confirmed")
        .collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
          r.getBoolean(3), r.getLong(4), r.getBoolean(5)))
        .toMap
      assert(verdicts.size == batch.size,
        s"row counts differ: ${verdicts.size} vs ${batch.size}")
      assert(verdicts.toMap == batch)
      // the corpus genuinely exercises both verdicts
      assert(batch.values.exists(_._3) && batch.values.exists(!_._3))
    } finally query.stop()
  }
}
