package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._

/** Optimization-round measurement harness (guide §1: measure first).
  *
  * Runs a comma-separated subset of the declared queries (arg 2; default
  * the full suite) against `SPARK_GRAFT_SF_DIR` with the exact Bench
  * session config and noop-sink methodology, and prints ONE line per
  * query with the empirical cost drivers the Spark UI would show:
  * wall seconds, job count, stage count, task count, shuffle read/write
  * bytes, and input bytes. Jobs launched during query CONSTRUCTION
  * (driver-coordinated fixpoints) are counted separately from the final
  * noop-sink action so the fixpoint tax is visible.
  *
  * Usage: runMain graft.ProfileMain [sfDir] [name,name,...] [passes]
  */
object ProfileMain {
  private class Acc extends SparkListener {
    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0L
    @volatile var shufRead = 0L
    @volatile var shufWrite = 0L
    @volatile var input = 0L
    override def onJobStart(j: SparkListenerJobStart): Unit = jobs += 1
    override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
      stages += 1
      tasks += s.stageInfo.numTasks
      val m = s.stageInfo.taskMetrics
      if (m != null) {
        shufRead += m.shuffleReadMetrics.totalBytesRead
        shufWrite += m.shuffleWriteMetrics.bytesWritten
        input += m.inputMetrics.bytesRead
      }
    }
    def snap: (Int, Int, Long, Long, Long, Long) =
      (jobs, stages, tasks, shufRead, shufWrite, input)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val only: Option[Set[String]] =
      if (args.length > 1 && args(1).nonEmpty) Some(args(1).split(",").toSet)
      else None
    val passes = if (args.length > 2) args(2).toInt else 1
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val acc = new Acc
    spark.sparkContext.addSparkListener(acc)
    // Warmup identical to Bench so JIT/footer costs don't land on query 1.
    spark.read.parquet(s"$sfDir/lineitem.parquet").limit(1000)
      .write.format("noop").mode("overwrite").save()
    spark.range(1000000L).selectExpr("sum(id)").collect()
    println("name\tsec\tjobs_build\tjobs_run\tstages\ttasks\tshuf_rd_mb\tshuf_wr_mb\tinput_mb")
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)
         if only.forall(_.contains(name))) {
      val best = (1 to passes).map { _ =>
        val (j0, s0, t0, r0, w0, i0) = acc.snap
        val tA = System.nanoTime()
        val df = fn(spark, sfDir)
        val (jB, _, _, _, _, _) = acc.snap
        df.write.format("noop").mode("overwrite").save()
        val sec = (System.nanoTime() - tA) / 1e9
        // listener events are async — give the bus a moment to drain
        Thread.sleep(300)
        val (j1, s1, t1, r1, w1, i1) = acc.snap
        (sec, jB - j0, j1 - jB, s1 - s0, t1 - t0,
          (r1 - r0) / 1e6, (w1 - w0) / 1e6, (i1 - i0) / 1e6)
      }.minBy(_._1)
      println(f"$name\t${best._1}%.2f\t${best._2}\t${best._3}\t${best._4}\t${best._5}\t${best._6}%.1f\t${best._7}%.1f\t${best._8}%.1f")
    }
    spark.stop()
  }
}
