package graft

import org.apache.spark.sql.functions._

/** AQE skew handling — the runtime mechanism PLANS.md leans on for
  * skewed keys (LSH mega-buckets, hot users): a 95%-single-key join
  * gets its oversized partition split by the adaptive planner. */
class SkewJoinSpec extends SparkSpec {

  test("AQE splits the skewed partition at runtime") {
    val prev = Map(
      "spark.sql.adaptive.skewJoin.enabled" ->
        spark.conf.get("spark.sql.adaptive.skewJoin.enabled"),
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" ->
        spark.conf.get("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes"),
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" ->
        spark.conf.get("spark.sql.adaptive.advisoryPartitionSizeInBytes"),
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" ->
        spark.conf.get("spark.sql.adaptive.skewJoin.skewedPartitionFactor"),
      "spark.sql.autoBroadcastJoinThreshold" ->
        spark.conf.get("spark.sql.autoBroadcastJoinThreshold"))
    try {
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      // local-scale thresholds so a few MB counts as "skewed"
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

      import spark.implicits._
      // 95% of the left side lands on key 0
      val left = spark.range(0, 200000L)
        .select(when(col("id") % 20 =!= 0, 0L).otherwise(col("id")).as("k"),
          concat(lit("padpadpadpadpadpadpadpad-"), col("id")).as("payload"))
      val right = spark.range(0, 2000L).select(col("id").as("k"),
        col("id").cast("string").as("rv"))
      val joined = left.join(right, "k")
      // execute THIS queryExecution (count() would plan separately and
      // leave this one un-finalized under AQE)
      val n = joined.collect().length
      assert(n > 0)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"expected AQE skew split in final plan:\n$finalPlan")
    } finally prev.foreach { case (k, v) => spark.conf.set(k, v) }
  }
}
