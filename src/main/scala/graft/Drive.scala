package graft

import org.apache.spark.sql.SparkSession

object Drive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val name = args(0)
    val sf = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val out = if (args.length > 2) args(2) else "/tmp/drive_out"
    val df = SparkEntry.queries(name)(spark, sf)
    df.show(50, truncate = false)
    df.write.mode("overwrite").parquet(s"$out/$name.parquet")
    java.nio.file.Files.writeString(
      java.nio.file.Path.of(s"$out/oracle.sql"),
      SparkEntry.oracleSql.getOrElse(name, ""))
    spark.stop()
  }
}
