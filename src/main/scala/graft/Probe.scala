package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway environment probe (round-1 scaffolding). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val d = "/root/testdata/sf0.001"
    for (t <- Seq("events", "documents", "embeddings", "lineitem")) {
      val df = Tables.tbl(spark, d, t)
      println(s"== $t: ${df.count()} rows")
      df.printSchema()
    }
    val ev = Tables.events(spark, d)
    ev.select(col("ts"), (col("ts") / 1000L).cast("long").as("us")).show(3, false)
    // split-to-chars behavior
    spark.sql("SELECT split('abc','') AS chars, conv(substr(md5('tok'),1,8),16,10) AS h").show(false)
    spark.stop()
  }
}
