package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated testdata tables (TESTDATA.md).
  *
  * Every query in [[SparkEntry.queries]] receives `(spark, sfDir)` and reads
  * only through these helpers, so filters/projections push down to the
  * parquet scan (Catalyst handles pruning; nothing is cached globally —
  * at 100 TB each query wants its own pruned scan, not a shared cache).
  */
object Tables {
  def tbl(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = tbl(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = tbl(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = tbl(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = tbl(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = tbl(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = tbl(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = tbl(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame    = tbl(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = tbl(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = tbl(s, d, "embeddings")
}
