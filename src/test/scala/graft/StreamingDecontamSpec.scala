package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.StreamingDecontam

/** Stream-static decontamination must agree with batch q166 on the same
  * corpus: the REAL sf0.001 documents stream in across two micro-batches
  * against the static src0 eval-gram set, and every per-doc verdict
  * (gram count, overlap count, flag) must match the batch query's. */
class StreamingDecontamSpec extends SparkSpec {

  test("two-micro-batch run reproduces batch q166 verdicts exactly") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("source"), col("text"))
      .as[(Long, String, String)].collect()
    val evalGrams = StreamingDecontam.evalGramSet(
      Tables.documents(spark, sf0001).filter(col("source") === "src0"))

    val input = MemoryStream[(Long, String, String)]
    val stream = StreamingDecontam.attach(
      input.toDF().toDF("doc_id", "source", "text")
        .filter(col("source") =!= "src0"),
      evalGrams)
    val query = stream.writeStream.format("memory").queryName("sdecon")
      .outputMode("complete").trigger(Trigger.ProcessingTime(0)).start()
    try {
      val (b1, b2) = docs.splitAt(docs.length / 2)
      input.addData(b1.toIndexedSeq)
      query.processAllAvailable()
      input.addData(b2.toIndexedSeq)
      query.processAllAvailable()

      val streamed = spark.table("sdecon")
        .select("doc_id", "n_grams", "n_contaminated", "contaminated")
        .collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(3)))
        .toMap
      val batch = SparkEntry.queries("q166_decontamination")(spark, sf0001)
        .select("doc_id", "n_grams", "n_contaminated", "contaminated")
        .collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(3)))
        .toMap
      assert(streamed.size == batch.size,
        s"row counts differ: ${streamed.size} vs ${batch.size}")
      assert(streamed == batch)
      // the corpus genuinely exercises both verdicts
      assert(batch.values.exists(_._3) && batch.values.exists(!_._3))
    } finally query.stop()
  }
}
