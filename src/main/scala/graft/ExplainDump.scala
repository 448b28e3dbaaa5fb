package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Reproducible plan evidence: dumps `.explain("formatted")` for every
  * declared query (or a comma-separated subset) to
  * `target/plans/<name>.txt` — the source of PLANS.md's excerpts, so
  * plan claims can be re-derived instead of trusted.
  *
  * Usage: runMain graft.ExplainDump [sfDir] [name,name,...]
  * CC-fixpoint queries (q78/q150/q151/q157) run their iterative build
  * during construction; they are included but cost a few seconds each.
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val only: Option[Set[String]] =
      if (args.length > 1) Some(args(1).split(",").toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val outDir = java.nio.file.Path.of("target/plans")
    java.nio.file.Files.createDirectories(outDir)
    var n = 0
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)
         if only.forall(_.contains(name))) {
      try {
        val plan = fn(spark, sfDir).queryExecution
          .explainString(ExplainMode.fromString("formatted"))
        java.nio.file.Files.writeString(outDir.resolve(s"$name.txt"), plan)
        n += 1
      } catch {
        case e: Exception =>
          System.err.println(s"[explain] $name failed: ${e.getMessage}")
      }
    }
    println(s"EXPLAINDUMP wrote $n plans to $outDir")
    spark.stop()
  }
}
