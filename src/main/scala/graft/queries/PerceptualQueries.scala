package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Perceptual IMAGE dedup — the multimodal half of the corpus-dedup
  * story. The engine already dedups text five ways (q27/q29/q30/q104/
  * q109) and embeddings two ways (q151/q126); a LAION/DataComp-style
  * multimodal build ALSO drops near-duplicate images before paying
  * for OCR/captioning, which the reference never does — every
  * submitted image is loaded and processed unconditionally
  * (`src/workers/ocr_worker.py:118-190`; no content hash anywhere in
  * its tree). This family closes that gap with the standard
  * perceptual-hash pipeline: downsample → difference hash (Krawetz
  * dHash) → banded Hamming-ball join (Manku WWW'07, the q104
  * machinery) → connected-component clusters (the q78 machinery).
  *
  * Image synthesis: the q88/q145 deterministic 32×16 plane from each
  * doc's text, round-tripped through the REAL JDK PNG encoder/decoder
  * ([[graft.functions.ImageCodec]]) so the measured path is
  * bytes → decode → fingerprint, exactly what a binary-column corpus
  * runs; 8-bit-gray PNG round-trip is the identity (pinned
  * adversarially by ImageCodecSpec), so the DuckDB oracle replays the
  * plane arithmetic bit-for-bit without a codec.
  *
  * Scale shape at 100 TB: the fingerprint is 8 bytes per image
  * regardless of image size — the dedup working set is ~1e9 longs per
  * PB of images, and the join is an EQUI-join on 16-bit hash blocks
  * (never all-pairs). The knobs are grid size and block width: a
  * production layout widens to a 16×16 grid (255-bit hash in four
  * 64-bit lanes) and ≥20-bit blocks so bucket population stays
  * bounded; the plan shape — explode(4) → shuffle on (block-idx,
  * block-value) → XOR+popcount verify — is fixed. AQE skew-join
  * handles residual hot buckets (e.g. the all-white-image hash).
  */
object PerceptualQueries {

  import MediaQueries.{W, H, planeSql, textPlane}

  /** doc → (dhash, ahash) through the real codec path: synthesize the
    * q88 plane, encode to actual PNG container bytes, decode back
    * through [[graft.functions.ImageCodec.decode]], fingerprint the
    * DECODED plane. Any decoder deviation breaks the oracle hash. */
  private val pHash = udf((text: String) => {
    val img = graft.functions.ImageOps.Gray(W, H, textPlane(text))
    val bytes = graft.functions.ImageCodec.encode(img, "png")
    val dec = graft.functions.ImageCodec.decode(bytes).get
    val cells = graft.functions.ImageOps.cellSums(dec, 8, 8)
    (graft.functions.ImageOps.dHash63(cells),
      graft.functions.ImageOps.aHash63(cells))
  })

  /** Shared signature frame: one scan, one UDF evaluation per doc. */
  private def sig(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .filter(length(col("text")) >= 1)
      .select(col("doc_id"), pHash(col("text")).as("t"))
      .select(col("doc_id"),
        col("t._1").as("dhash"), col("t._2").as("ahash"))

  /** q206: the fingerprints themselves — 63-bit dHash (row-major
    * neighbor gradient sign over an 8×8 block-sum grid) and 63-bit
    * aHash (cell vs frame mean, exact integer cross-multiplication).
    * Scan → UDF → no shuffle at all; the oracle rebuilds the plane,
    * the grid, and every comparison as DuckDB list comprehensions. */
  private def q206(s: SparkSession, d: String): DataFrame = sig(s, d)

  /** The oracle's cell grid: cell c (0..63) sums its 4×2 pixel block
    * of the q88 plane; j (0..7) walks the block row-major. */
  private val cellsSql =
    s"""list_transform(range(0, 64), c ->
       |  list_reduce(list_transform(range(0, 8), j ->
       |    p[((c // 8) * 2 + (j // 4)) * $W + (c % 8) * 4 + (j % 4) + 1]),
       |    (a, b) -> a + b))""".stripMargin

  private val q206Sql =
    s"""WITH plane AS (
       |  SELECT doc_id, $planeSql AS p
       |  FROM (SELECT doc_id, text, length(text) AS nch
       |        FROM documents WHERE length(text) >= 1)),
       |cells AS (SELECT doc_id, $cellsSql AS cs FROM plane),
       |tot AS (SELECT doc_id, cs,
       |          list_reduce(cs, (a, b) -> a + b) AS total FROM cells)
       |SELECT doc_id,
       |  CAST(list_reduce(list_transform(range(0, 63), i ->
       |    CASE WHEN cs[i + 1] > cs[i + 2]
       |      THEN (2**i)::BIGINT ELSE 0::BIGINT END),
       |    (a, b) -> a + b) AS BIGINT) AS dhash,
       |  CAST(list_reduce(list_transform(range(0, 63), i ->
       |    CASE WHEN cs[i + 1] * 64 > total
       |      THEN (2**i)::BIGINT ELSE 0::BIGINT END),
       |    (a, b) -> a + b) AS BIGINT) AS ahash
       |FROM tot""".stripMargin

  /** q207: image NEAR-DUP pairs — dHashes within Hamming distance ≤ 3
    * are near-duplicate images. The q104 pigeonhole join: the 63-bit
    * hash splits into 4 blocks (16+16+16+15 bits); hd ≤ 3 forces at
    * least one block to match exactly, so candidates come from an
    * EQUI-join on (block-idx, block-value) — never an all-pairs scan —
    * and each surviving pair is verified with one XOR + popcount.
    * Duplicate candidates are eliminated without a `distinct` shuffle
    * by the first-matching-block rule: a pair found at block k is kept
    * only when blocks 0..k−1 all differ.
    *
    * The pair LIST is the audit form and is output-bound quadratic in
    * duplicate-group size (g identical images are g(g−1)/2 hd = 0
    * rows) — at corpus scale a build materializes q208's CLUSTERS,
    * whose construction never expands a group into its clique. */
  private def q207(s: SparkSession, d: String): DataFrame = {
    val withBlocks = sig(s, d).select(
      col("doc_id"), col("dhash"),
      expr("dhash % 65536").as("b0"),
      expr("(dhash div 65536) % 65536").as("b1"),
      expr("(dhash div 4294967296) % 65536").as("b2"),
      expr("dhash div 281474976710656").as("b3"))
    val bandRows = withBlocks.select(
      col("doc_id"), col("dhash"), col("b0"), col("b1"), col("b2"),
      posexplode(array(col("b0"), col("b1"), col("b2"), col("b3")))
        .as(Seq("bidx", "bval")))
    val x = bandRows.select(col("bidx"), col("bval"),
      col("doc_id").as("doc_a"), col("dhash").as("ha"),
      col("b0").as("b0a"), col("b1").as("b1a"), col("b2").as("b2a"))
    val y = bandRows.select(col("bidx"), col("bval"),
      col("doc_id").as("doc_b"), col("dhash").as("hb"),
      col("b0").as("b0b"), col("b1").as("b1b"), col("b2").as("b2b"))
    x.join(y, Seq("bidx", "bval"))
      .filter(col("doc_a") < col("doc_b") &&
        (col("bidx") === 0 || col("b0a") =!= col("b0b")) &&
        (col("bidx") <= 1 || col("b1a") =!= col("b1b")) &&
        (col("bidx") <= 2 || col("b2a") =!= col("b2b")))
      .withColumn("hd", bit_count(col("ha").bitwiseXOR(col("hb"))))
      .filter(col("hd") <= 3)
      .select(col("doc_a"), col("doc_b"), col("hd"))
  }

  /** Oracle: all-pairs over the identical dHashes (correctness form
    * only — banding is a Spark-side performance shape and changes no
    * results). */
  private val q207Sql =
    s"""WITH s AS ($q206Sql)
       |SELECT x.doc_id AS doc_a, y.doc_id AS doc_b,
       |  CAST(bit_count(xor(x.dhash, y.dhash)) AS INT) AS hd
       |FROM s x JOIN s y ON x.doc_id < y.doc_id
       |WHERE bit_count(xor(x.dhash, y.dhash)) <= 3""".stripMargin

  /** q208: image duplicate CLUSTERS — the near-dup relation composed
    * into transitive groups with a canonical representative (min
    * doc_id), the "keep one copy per visual cluster" step of the
    * build, and the form a 100 TB pipeline actually materializes:
    * q207's pair LIST is output-bound quadratic in duplicate-group
    * size (an exact-dup group of g images is g(g−1)/2 pairs), so the
    * cluster operator never touches it. Instead: (1) STAR edges
    * within each exact-dhash group (doc → group-min, 1 edge/doc —
    * hd = 0 needs no verification); (2) the banded Hamming join run
    * over DISTINCT dhash values only (one representative per group,
    * hd 1..3) — cross-group pair volume is bounded by the distinct-
    * hash count, independent of group sizes. The union's components
    * equal the full verified-pair graph's: stars connect within
    * groups, and an (a, b) cross pair exists iff its representative
    * pair does. Min-label propagation
    * ([[graft.operators.ConnectedComponents.minLabel]], O(log
    * diameter) rounds) labels the components; the oracle computes the
    * same fixpoint from the all-pairs relation with a recursive
    * CTE. */
  private def q208(s: SparkSession, d: String): DataFrame = {
    val sg = sig(s, d)
    val reps = sg.groupBy(col("dhash")).agg(min(col("doc_id")).as("rep"))
    val stars = sg.join(reps, "dhash")
      .filter(col("doc_id") =!= col("rep"))
      .select(col("doc_id").as("src"), col("rep").as("dst"))
    val withBlocks = reps.select(
      col("rep"), col("dhash"),
      expr("dhash % 65536").as("b0"),
      expr("(dhash div 65536) % 65536").as("b1"),
      expr("(dhash div 4294967296) % 65536").as("b2"),
      expr("dhash div 281474976710656").as("b3"))
    val bandRows = withBlocks.select(
      col("rep"), col("dhash"), col("b0"), col("b1"), col("b2"),
      posexplode(array(col("b0"), col("b1"), col("b2"), col("b3")))
        .as(Seq("bidx", "bval")))
    val x = bandRows.select(col("bidx"), col("bval"),
      col("rep").as("rep_a"), col("dhash").as("ha"),
      col("b0").as("b0a"), col("b1").as("b1a"), col("b2").as("b2a"))
    val y = bandRows.select(col("bidx"), col("bval"),
      col("rep").as("rep_b"), col("dhash").as("hb"),
      col("b0").as("b0b"), col("b1").as("b1b"), col("b2").as("b2b"))
    val cross = x.join(y, Seq("bidx", "bval"))
      .filter(col("rep_a") < col("rep_b") &&
        (col("bidx") === 0 || col("b0a") =!= col("b0b")) &&
        (col("bidx") <= 1 || col("b1a") =!= col("b1b")) &&
        (col("bidx") <= 2 || col("b2a") =!= col("b2b")))
      .filter(bit_count(col("ha").bitwiseXOR(col("hb"))) <= 3)
      .select(col("rep_a").as("src"), col("rep_b").as("dst"))
    val half = stars.union(cross)
    val edges = half.union(
      half.select(col("dst").as("src"), col("src").as("dst")))
    val (labels, _) = graft.operators.ConnectedComponents.minLabel(edges)
    labels.groupBy(col("label").as("canonical_doc"))
      .agg(count(lit(1)).as("n_docs"), max(col("node")).as("max_doc"))
      .filter(col("n_docs") > 1)
  }

  private val q208Sql =
    s"""WITH RECURSIVE s AS ($q206Sql),
       |pairs AS (
       |  SELECT x.doc_id AS doc_a, y.doc_id AS doc_b
       |  FROM s x JOIN s y ON x.doc_id < y.doc_id
       |  WHERE bit_count(xor(x.dhash, y.dhash)) <= 3),
       |edges AS (
       |  SELECT doc_a AS src, doc_b AS dst FROM pairs
       |  UNION ALL
       |  SELECT doc_b AS src, doc_a AS dst FROM pairs),
       |lab AS (
       |  SELECT doc_id AS node, doc_id AS label FROM s
       |  UNION
       |  SELECT e.dst AS node, lab.label AS label
       |  FROM lab JOIN edges e ON lab.node = e.src),
       |final AS (SELECT node, min(label) AS label FROM lab GROUP BY node)
       |SELECT label AS canonical_doc, count(*) AS n_docs, max(node) AS max_doc
       |FROM final GROUP BY 1 HAVING count(*) > 1""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q206_image_phash", q206, Some(q206Sql)),
    QueryDef("q207_image_near_dup", q207, Some(q207Sql)),
    QueryDef("q208_image_dup_clusters", q208, Some(q208Sql)))
}
