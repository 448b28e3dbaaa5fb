package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Nested OCR document tree (SURVEY.md §1.1: `OCRResult → TextBlock[] →
  * TextLine[] → Word[]`, reference `protos/stream_process.proto:242-317`;
  * J4 index join `proto:300-312`).
  *
  * q46 builds the REAL nested structure (arrays of structs of arrays —
  * 8 words/line, 4 lines/block) with higher-order functions, then
  * flattens it back with two `posexplode`s. The DuckDB oracle computes
  * the same rows from flat token ordinals — so the check proves the
  * nested construction+flatten round-trips exactly.
  *
  * q47 aggregates the tree A2-style (full text + word/char stats per
  * block, `src/ocr/service.py:216-255`).
  */
object OcrTreeQueries {

  private def nested(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .withColumn("w", split(col("text"), " "))
      .withColumn("blocks", expr(
        """transform(sequence(0, cast(ceil(size(w) / 32.0) as int) - 1), b ->
          |  struct(b as block_idx,
          |    filter(transform(sequence(0, 3), l ->
          |      struct(l as line_idx,
          |        slice(w, b * 32 + l * 8 + 1, 8) as words)),
          |      x -> size(x.words) > 0) as lines))""".stripMargin))
      .select(col("doc_id"), col("blocks"))

  /** q46: nested tree flatten — every word with its (block, line, pos)
    * coordinates. */
  private def q46(s: SparkSession, d: String): DataFrame =
    nested(s, d)
      .select(col("doc_id"), explode(col("blocks")).as("block"))
      .select(col("doc_id"), col("block.block_idx").as("block_idx"),
        explode(col("block.lines")).as("line"))
      .select(col("doc_id"), col("block_idx"),
        col("line.line_idx").as("line_idx"),
        posexplode(col("line.words")).as(Seq("word_pos", "word")))
      .select(col("doc_id"), col("block_idx").cast("long"),
        col("line_idx").cast("long"), col("word_pos").cast("long"),
        col("word"))

  private val q46Sql =
    """SELECT doc_id,
      |  (o - 1) // 32 AS block_idx,
      |  ((o - 1) // 8) % 4 AS line_idx,
      |  (o - 1) % 8 AS word_pos,
      |  w AS word
      |FROM (SELECT doc_id, unnest(str_split(text, ' ')) AS w,
      |        generate_subscripts(str_split(text, ' '), 1) AS o
      |      FROM documents)""".stripMargin

  /** q47: per-block A2 aggregation over the tree — ordered full text,
    * word count, char count. Native ordered `listagg ... WITHIN GROUP`
    * (Spark 4) instead of collect_list+array_sort: one declarative agg,
    * no intermediate struct arrays; (line_idx, word_pos) is unique per
    * block so the order is total and the result deterministic. */
  private def q47(s: SparkSession, d: String): DataFrame =
    q46(s, d)
      .groupBy(col("doc_id"), col("block_idx"))
      .agg(
        expr("listagg(word, ' ') WITHIN GROUP (ORDER BY line_idx, word_pos)")
          .as("block_text"),
        count(lit(1)).as("n_words"),
        sum(length(col("word"))).as("n_chars"))

  private val q47Sql =
    s"""SELECT doc_id, block_idx,
       |  string_agg(word, ' ' ORDER BY line_idx, word_pos) AS block_text,
       |  count(*) AS n_words, CAST(sum(length(word)) AS BIGINT) AS n_chars
       |FROM ($q46Sql)
       |GROUP BY doc_id, block_idx""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q46_ocr_tree_flatten", q46, Some(q46Sql)),
    QueryDef("q47_ocr_block_stats", q47, Some(q47Sql)))
}
