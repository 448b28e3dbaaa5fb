package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator declared in SURVEY.md §2 with a batch-SQL-expressible
  * form appears here as a named query plus its DuckDB oracle SQL; the
  * genuinely streaming operators (session state with overlap carryover,
  * partial emission) live in `graft.streaming` and are verified by
  * ScalaTest instead.
  */
object SparkEntry {

  private val all: Seq[QueryDef] =
    RelationalQueries.defs ++ QueueQueries.defs ++ SessionQueries.defs ++
      TextQueries.defs ++ VectorQueries.defs ++ MediaQueries.defs ++
      OcrTreeQueries.defs ++ SqlSurfaceQueries.defs ++
      TrainingQueries.defs ++ OpsQueries.defs ++ RetrievalQueries.defs ++
      UrlQueries.defs ++ SelectionQueries.defs ++ PerceptualQueries.defs

  /** Flagship: sessionized ordered transcript assembly (reference §3.1
    * streaming STT path, batch form) on sf0.001.
    *
    * The caller's session may not carry the nanos-timestamp reader
    * config that events.parquet needs (Verify/Bench set it in their
    * builders; the driver's smoke session might not) — it's a runtime
    * SQLConf, so set it here defensively. */
  def entry(spark: SparkSession): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    queries("q15_transcript_assembly")(spark, "/root/testdata/sf0.001")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.flatMap(q => q.sql.map(sql => q.name -> sql)).toMap
}
