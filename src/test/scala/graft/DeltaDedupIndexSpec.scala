package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.{ShuffledHashJoinExec, SortMergeJoinExec}
import org.apache.spark.sql.functions._

import graft.operators.DeltaDedupIndex

/** The materialized snapshot index must be a pure layout change:
  * verdict-for-verdict identical to q173 (which derives both sides
  * from one scan), while the physical plan proves the production
  * claim — the snapshot side of the band join is a pre-bucketed scan
  * with no shuffle exchange. */
class DeltaDedupIndexSpec extends SparkSpec {

  private def cleanup(): Unit = {
    spark.sql("DROP TABLE IF EXISTS dedup_idx_t")
    val p = java.nio.file.Paths.get("spark-warehouse", "dedup_idx_t")
    if (java.nio.file.Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  test("bucketed snapshot index reproduces q173 verdicts with no snapshot-side shuffle") {
    cleanup()
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    // at sf0.001 the incoming side fits under the broadcast threshold,
    // which would hide the bucketed-join path this test proves
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val docs = Tables.documents(spark, sf0001)
      DeltaDedupIndex.build(docs.filter(col("doc_id") % 10 =!= 0),
        "dedup_idx_t")
      val out = DeltaDedupIndex.admit(
        docs.filter(col("doc_id") % 10 === 0)
          .select(col("doc_id"), col("source"), col("text")),
        "dedup_idx_t")

      // 1. verdict parity with the one-shot oracle query
      val viaIndex = out.collect().toSet
      val oneShot = SparkEntry.queries("q173_delta_dedup")(spark, sf0001)
        .collect().toSet
      assert(viaIndex == oneShot,
        s"index path diverged from q173: ${viaIndex.size} vs ${oneShot.size} rows")

      // 2. the band join's snapshot side is the bucketed scan, unshuffled
      // (PlanGuards.flatten descends through the AQE wrapper)
      def flatten(p: SparkPlan): Seq[SparkPlan] = PlanGuards.flatten(p)
      val plan = out.queryExecution.executedPlan
      val joins = flatten(plan).collect {
        case j: SortMergeJoinExec => j: SparkPlan
        case j: ShuffledHashJoinExec => j: SparkPlan
      }
      val bandJoin = joins.filter(_.toString.contains("dedup_idx_t"))
      assert(bandJoin.nonEmpty,
        s"no non-broadcast join over the index table in:\n$plan")
      val snapSides = bandJoin.head.children
        .filter(_.toString.contains("dedup_idx_t"))
      assert(snapSides.nonEmpty)
      snapSides.foreach { side =>
        val shuffles = flatten(side).collect {
          case e: ShuffleExchangeExec => e
        }
        assert(shuffles.isEmpty,
          s"snapshot side of the band join shuffles:\n$side")
      }
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      cleanup()
    }
  }
}
