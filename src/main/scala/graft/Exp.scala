package graft
// Scratch experiment for q15 variants — NOT part of the library surface;
// delete before end of round.
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

object Exp {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$d/lineitem.parquet").limit(1000)
      .write.format("noop").mode("overwrite").save()

    val gapUs = 1800000000L
    def sess(): DataFrame = {
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("t_us").asc, col("event_id").asc)
      Tables.events(spark, d)
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("value"), (col("ts") / 1000L).cast("long").as("t_us"))
        .withColumn("prev_us", lag(col("t_us"), 1).over(byUser))
        .withColumn("is_new",
          (col("prev_us").isNull ||
            (col("t_us") - col("prev_us")) > gapUs).cast("long"))
        .withColumn("session_seq",
          sum(col("is_new")).over(byUser
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    }

    def v0() = SparkEntry.queries("q15_transcript_assembly")(spark, d)
    def v1() = { // listagg within group (Spark 4 native ordered string agg)
      sess().groupBy(col("user_id"), col("session_seq"))
        .agg(expr("listagg(event_type, ' ') WITHIN GROUP (ORDER BY t_us, event_id)").as("transcript"),
          round(avg(least(greatest(col("value") / 600.0, lit(0.0)), lit(1.0))), 6).as("avg_confidence"),
          count(lit(1)).as("n_segments"))
    }
    def v2() = { // no array_sort (measures sort cost only; NOT order-safe)
      sess().groupBy(col("user_id"), col("session_seq"))
        .agg(array_join(collect_list(col("event_type")), " ").as("transcript"),
          round(avg(least(greatest(col("value") / 600.0, lit(0.0)), lit(1.0))), 6).as("avg_confidence"),
          count(lit(1)).as("n_segments"))
    }
    def v3() = { // sessionize only (baseline: window cost, no object agg)
      sess().groupBy(col("user_id"), col("session_seq"))
        .agg(count(lit(1)).as("n"))
    }
    def v4() = { // one combined window pass via struct trick? measure scan+exchange only
      Tables.events(spark, d).groupBy("user_id").agg(count(lit(1)).as("n"))
    }
    val variants = Seq("v0_current" -> (() => v0()), "v1_listagg" -> (() => v1()),
      "v2_nosort" -> (() => v2()), "v3_sessonly" -> (() => v3()),
      "v4_scanagg" -> (() => v4()))
    for ((n, f) <- variants; pass <- 1 to 3) {
      val t0 = System.nanoTime()
      f().write.format("noop").mode("overwrite").save()
      println(f"[exp] $n pass$pass ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
