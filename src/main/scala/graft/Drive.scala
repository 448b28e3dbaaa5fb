package graft
import org.apache.spark.sql.SparkSession

/** Profiling harness: time any declared query at an arbitrary scale
  * factor, two passes each (cold + warm), with optional plan dump.
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *     sbt "runMain graft.Drive q29_lsh_near_dup q31_trigram_jaccard"
  *   DRIVE_EXPLAIN=1 ... — additionally print each executed plan.
  *
  * Kept as a first-class dev tool (unlike Bench, it targets a chosen
  * subset and prints per-pass times, which is what plan iteration
  * needs). */
object Drive {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = args.toSeq match {
      case Nil => Seq("q29_lsh_near_dup", "q31_trigram_jaccard",
        "q78_dup_clusters", "q93_session_funnel")
      case xs => xs
    }
    // warmup
    spark.read.parquet(s"$sfDir/lineitem.parquet").limit(1000)
      .write.format("noop").mode("overwrite").save()
    for (n <- names; pass <- 1 to 2) {
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      println(f"[drive] $n pass$pass ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    if (sys.env.contains("DRIVE_EXPLAIN")) {
      for (n <- names) {
        println(s"==== $n ====")
        val df = SparkEntry.queries(n)(spark, sfDir)
        df.write.format("noop").mode("overwrite").save()
        println(df.queryExecution.executedPlan.toString.take(8000))
      }
    }
    spark.stop()
  }
}
