package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Perceptual MULTIMODAL dedup — images (q206-q208) and audio
  * (q209-q210). The engine already dedups text five ways (q27/q29/
  * q30/q104/q109) and embeddings two ways (q151/q126); a LAION/
  * DataComp-style multimodal build ALSO drops near-duplicate images
  * and audio clips before paying for OCR/STT, which the reference
  * never does — every submitted image and clip is loaded and
  * processed unconditionally (`src/workers/ocr_worker.py:118-190`,
  * `src/preprocessing/audio_processor.py`; no content hash anywhere
  * in its tree). This family closes that gap with the standard
  * perceptual-hash pipeline: modality-specific fingerprint (Krawetz
  * dHash for images, Haitsma-Kalker band-energy signs for audio) →
  * banded Hamming-ball join (Manku WWW'07, the q104 machinery) →
  * connected-component clusters (the q78 machinery).
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

  /** The q104 pigeonhole join, shared by every 63-bit fingerprint in
    * this family: the hash splits into 4 blocks (16+16+16+15 bits);
    * hd ≤ 3 forces at least one block to match exactly, so candidates
    * come from an EQUI-join on (block-idx, block-value) — never an
    * all-pairs scan — and each surviving pair is verified with one
    * XOR + popcount. Duplicate candidates are eliminated without a
    * `distinct` shuffle by the first-matching-block rule: a pair found
    * at block k is kept only when blocks 0..k−1 all differ. Input:
    * (id, h); output: (id_a, id_b, hd) with id_a < id_b, hd ≤ 3. */
  private def hd3Pairs(sigDf: DataFrame): DataFrame = {
    val withBlocks = sigDf.select(
      col("id"), col("h"),
      expr("h % 65536").as("b0"),
      expr("(h div 65536) % 65536").as("b1"),
      expr("(h div 4294967296) % 65536").as("b2"),
      expr("h div 281474976710656").as("b3"))
    val bandRows = withBlocks.select(
      col("id"), col("h"), col("b0"), col("b1"), col("b2"),
      posexplode(array(col("b0"), col("b1"), col("b2"), col("b3")))
        .as(Seq("bidx", "bval")))
    val x = bandRows.select(col("bidx"), col("bval"),
      col("id").as("id_a"), col("h").as("ha"),
      col("b0").as("b0a"), col("b1").as("b1a"), col("b2").as("b2a"))
    val y = bandRows.select(col("bidx"), col("bval"),
      col("id").as("id_b"), col("h").as("hb"),
      col("b0").as("b0b"), col("b1").as("b1b"), col("b2").as("b2b"))
    x.join(y, Seq("bidx", "bval"))
      .filter(col("id_a") < col("id_b") &&
        (col("bidx") === 0 || col("b0a") =!= col("b0b")) &&
        (col("bidx") <= 1 || col("b1a") =!= col("b1b")) &&
        (col("bidx") <= 2 || col("b2a") =!= col("b2b")))
      .withColumn("hd", bit_count(col("ha").bitwiseXOR(col("hb"))))
      .filter(col("hd") <= 3)
      .select(col("id_a"), col("id_b"), col("hd"))
  }

  /** q207: image NEAR-DUP pairs — dHashes within Hamming distance ≤ 3
    * are near-duplicate images, found by [[hd3Pairs]]'s banded join.
    *
    * The pair LIST is the audit form and is output-bound quadratic in
    * duplicate-group size (g identical images are g(g−1)/2 hd = 0
    * rows) — at corpus scale a build materializes q208's CLUSTERS,
    * whose construction never expands a group into its clique. */
  private def q207(s: SparkSession, d: String): DataFrame =
    hd3Pairs(sig(s, d)
      .select(col("doc_id").as("id"), col("dhash").as("h")))
      .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"), col("hd"))

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
  /** (node, label) cluster membership of the image near-dup graph —
    * q208's interior, shared with the q212 funnel. */
  private def imageClusterLabels(s: SparkSession, d: String): DataFrame = {
    val sg = sig(s, d)
    val reps = sg.groupBy(col("dhash")).agg(min(col("doc_id")).as("rep"))
    val stars = sg.join(reps, "dhash")
      .filter(col("doc_id") =!= col("rep"))
      .select(col("doc_id").as("src"), col("rep").as("dst"))
    val cross = hd3Pairs(reps
      .select(col("rep").as("id"), col("dhash").as("h")))
      .select(col("id_a").as("src"), col("id_b").as("dst"))
    val half = stars.union(cross)
    val edges = half.union(
      half.select(col("dst").as("src"), col("src").as("dst")))
    val (labels, _) = graft.operators.ConnectedComponents.minLabel(edges)
    labels
  }

  private def q208(s: SparkSession, d: String): DataFrame =
    imageClusterLabels(s, d)
      .groupBy(col("label").as("canonical_doc"))
      .agg(count(lit(1)).as("n_docs"), max(col("node")).as("max_doc"))
      .filter(col("n_docs") > 1)

  /** The image cluster fixpoint as reusable CTEs (all-pairs oracle
    * form), shared by q208 and the q212 funnel: `final` is (node,
    * label) over every doc, label = min of the near-dup component. */
  private val clusterCteSql =
    s"""s AS ($q206Sql),
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
       |final AS (SELECT node, min(label) AS label FROM lab GROUP BY node)""".stripMargin

  private val q208Sql =
    s"""WITH RECURSIVE $clusterCteSql
       |SELECT label AS canonical_doc, count(*) AS n_docs, max(node) AS max_doc
       |FROM final GROUP BY 1 HAVING count(*) > 1""".stripMargin

  /** q209: perceptual AUDIO fingerprint
    * ([[graft.functions.AudioDsp.fingerprint63]], Haitsma-Kalker
    * ISMIR'02): a 256-sample waveform synthesized deterministically
    * from each doc's text (the q159 code-point discipline, carrier
    * dropped so the signal is purely text-derived), STFT'd with the
    * REAL [[graft.functions.AudioDsp.Stft]] tables (win 64 / hop 16 →
    * 13 frames × 32 non-DC bins), folded into 8 band energies per
    * frame, and sign-quantized along the time × band double
    * difference into 63 bits. Scan → UDF → no shuffle; the oracle
    * replays the full STFT as generated left-associated term chains
    * (the q159 discipline — every trig/window double embedded as a
    * round-trip literal).
    *
    * At 100 TB the fingerprint is 8 bytes per clip regardless of clip
    * length (a real build fingerprints every ~0.37 s granule and
    * matches on any granule hit — Haitsma's layout; the per-granule
    * operator is THIS one applied per window). */
  private def q209(s: SparkSession, d: String): DataFrame = {
    val probe = udf((text: String) => {
      val cps = text.codePoints().toArray
      val nch = math.max(1, cps.length)
      val x = Array.tabulate(256) { i =>
        val cp = if (cps.isEmpty) 0 else cps((i * 11) % nch)
        ((cp * (i + 7)) % 97) / 97.0 - 0.5
      }
      graft.functions.AudioDsp.fingerprint63(x)
    })
    Tables.documents(s, d)
      .filter(length(col("text")) >= 1)
      .select(col("doc_id"), probe(col("text")).as("fp"))
  }

  /** The original clip synthesis as a DuckDB list comprehension (the
    * q159 code-point discipline, carrier dropped). */
  private val origXSql =
    """(((ascii(substr(text, ((i * 11) % nch) + 1, 1))
      |             * (i + 7)) % 97) / CAST(97 AS DOUBLE) - 0.5)""".stripMargin

  /** The degraded copy: gain ×0.9 + ±0.025 noise from a second
    * code-point stream (amplitude 0.05 around zero). */
  private val degXSql =
    s"""0.9 * $origXSql
       |           + (((ascii(substr(text, ((i * 13) % nch) + 1, 1))
       |             * (i + 13)) % 89) / CAST(89 AS DOUBLE) - 0.5) * 0.05""".stripMargin

  /** Generated fingerprint SQL over any per-sample synthesis
    * expression (variable `i`, columns text/nch in scope): the full
    * STFT → band-energy → sign-quantize pipeline as left-associated
    * term chains (the q159 vectorization lesson). */
  private def fpSqlFrom(xSynth: String): String = {
    val st = graft.functions.AudioDsp.Stft
    val ct = st.cosT.mkString("[", ", ", "]")
    val stb = st.sinT.mkString("[", ", ", "]")
    val N = 256                  // probe signal length
    val W = st.Win               // 64: analysis window
    val H = st.Hop               // 16: hop
    val frames = (N - W) / H + 1 // 13 analysis frames
    val FK = frames * 32         // flat (frame, bin−1) space, bins 1..32
    val FB = frames * 8          // flat (frame, band) space
    // forward DFT as generated 64-term left-associated chains; hann
    // embeds per-term as a literal, trig tables index by (k·i) mod W
    def fwdTerms(tbl: String): String = (0 until W).map { i =>
      s"(${st.hann(i)} * x[(fk // 32) * $H + ${i + 1}])" +
        s" * $tbl[((((fk % 32) + 1) * $i) % $W) + 1]"
    }.mkString(" + ")
    // band energy: 4 bins per band, ascending k, re²+im² per bin
    val bandTerms = (0 until 4).map { kk =>
      val p = s"(fb // 8) * 32 + (fb % 8) * 4 + ${kk + 1}"
      s"(re[$p] * re[$p] + im[$p] * im[$p])"
    }.mkString(" + ")
    s"""SELECT doc_id,
       |  CAST(list_reduce(list_transform(range(0, 63), i ->
       |    CASE WHEN ((eb[(i // 7 + 1) * 8 + (i % 7) + 1]
       |              - eb[(i // 7 + 1) * 8 + (i % 7) + 2])
       |             - (eb[(i // 7) * 8 + (i % 7) + 1]
       |              - eb[(i // 7) * 8 + (i % 7) + 2])) > 0
       |      THEN (2**i)::BIGINT ELSE 0::BIGINT END),
       |    (a, b) -> a + b) AS BIGINT) AS fp
       |FROM (
       |  SELECT doc_id,
       |    list_transform(range(0, $FB), fb -> $bandTerms) AS eb
       |  FROM (
       |    SELECT doc_id,
       |      list_transform(range(0, $FK), fk -> ${fwdTerms("ct")}) AS re,
       |      list_transform(range(0, $FK), fk -> ${fwdTerms("stb")}) AS im
       |    FROM (
       |      SELECT doc_id, ct, stb,
       |        [ $xSynth
       |          for i in range(0, $N) ] AS x
       |      FROM (SELECT doc_id, text, length(text) AS nch
       |            FROM documents WHERE length(text) >= 1)
       |        CROSS JOIN (SELECT CAST($ct AS DOUBLE[]) AS ct,
       |          CAST($stb AS DOUBLE[]) AS stb))))""".stripMargin
  }

  private val q209Sql = fpSqlFrom(origXSql)

  /** q210: audio NEAR-DUP pairs under MEASURED degradation — the
    * q168 dual-generator discipline. The corpus's texts are all
    * distinct and the 63-bit fingerprint has full entropy (measured
    * min cross-doc hd = 12 at sf0.01), so a bare hd ≤ 3 join over the
    * original clips is vacuously empty; instead every doc contributes
    * its clip (clip_id = 2·doc_id) AND a deterministically DEGRADED
    * copy (2·doc_id+1): gain ×0.9 — which the sign-of-difference
    * fingerprint cancels exactly — plus ±0.025 additive noise from a
    * second code-point stream, which flips a measurable few bits.
    * The [[hd3Pairs]] banded join then has to RECOVER the planted
    * pairs (and any residual cross collisions) — the operator and its
    * robustness measurement in one relation; q211 rolls the recall
    * up. At 100 TB the same knobs apply: Haitsma's full layout is a
    * 32-bit sub-fingerprint per ~12 ms granule with block matching —
    * the per-granule operator is this one. */
  private def clips(s: SparkSession, d: String): DataFrame = {
    val probe = udf((text: String) => {
      val cps = text.codePoints().toArray
      val nch = math.max(1, cps.length)
      val x = Array.tabulate(256) { i =>
        val cp = if (cps.isEmpty) 0 else cps((i * 11) % nch)
        ((cp * (i + 7)) % 97) / 97.0 - 0.5
      }
      val x2 = Array.tabulate(256) { i =>
        val cp2 = if (cps.isEmpty) 0 else cps((i * 13) % nch)
        0.9 * x(i) + (((cp2 * (i + 13)) % 89) / 89.0 - 0.5) * 0.05
      }
      (graft.functions.AudioDsp.fingerprint63(x),
        graft.functions.AudioDsp.fingerprint63(x2))
    })
    Tables.documents(s, d)
      .filter(length(col("text")) >= 1)
      .select(col("doc_id"), probe(col("text")).as("t"))
      .select(explode(array(
        struct((col("doc_id") * 2).as("id"), col("t._1").as("h")),
        struct((col("doc_id") * 2 + 1).as("id"), col("t._2").as("h"))))
        .as("c"))
      .select(col("c.id").as("id"), col("c.h").as("h"))
  }

  private def q210(s: SparkSession, d: String): DataFrame =
    hd3Pairs(clips(s, d))
      .select(col("id_a").as("clip_a"), col("id_b").as("clip_b"), col("hd"))

  /** The clip relation's oracle: original + degraded fingerprint per
    * doc, both replayed through the generated-STFT SQL. */
  private val clipsSql =
    s"""SELECT doc_id * 2 AS id, fp AS h FROM (${fpSqlFrom(origXSql)})
       |UNION ALL
       |SELECT doc_id * 2 + 1 AS id, fp AS h FROM (${fpSqlFrom(degXSql)})""".stripMargin

  private val q210Sql =
    s"""WITH c AS ($clipsSql)
       |SELECT x.id AS clip_a, y.id AS clip_b,
       |  CAST(bit_count(xor(x.h, y.h)) AS INT) AS hd
       |FROM c x JOIN c y ON x.id < y.id
       |WHERE bit_count(xor(x.h, y.h)) <= 3""".stripMargin

  /** q211: the fingerprint ROBUSTNESS rollup — of the planted
    * (original, degraded) pairs, how many does the hd ≤ 3 near-dup
    * gate recover, per surviving Hamming distance and in total
    * (integer basis points, the q155/q170/q192 measured-recall
    * convention). A planted pair is (2k, 2k+1) — adjacent ids with
    * even left edge; residual cross-doc collisions are counted
    * separately, not dropped (a real gate pays for them too). */
  private def q211(s: SparkSession, d: String): DataFrame = {
    val pairs = hd3Pairs(clips(s, d))
    val nDocs = Tables.documents(s, d)
      .filter(length(col("text")) >= 1)
      .agg(count(lit(1)).as("n_planted"))
    pairs
      .withColumn("planted",
        (col("id_b") - col("id_a") === 1) && (col("id_a") % 2 === 0))
      .agg(
        sum(when(col("planted"), 1L).otherwise(0L)).as("n_recovered"),
        sum(when(!col("planted"), 1L).otherwise(0L)).as("n_collisions"),
        sum(when(col("planted") && col("hd") === 0, 1L).otherwise(0L))
          .as("n_hd0"),
        sum(when(col("planted") && col("hd") === 1, 1L).otherwise(0L))
          .as("n_hd1"),
        sum(when(col("planted") && col("hd") === 2, 1L).otherwise(0L))
          .as("n_hd2"),
        sum(when(col("planted") && col("hd") === 3, 1L).otherwise(0L))
          .as("n_hd3"))
      .crossJoin(broadcast(nDocs))
      .select(col("n_planted"), col("n_recovered"), col("n_collisions"),
        col("n_hd0"), col("n_hd1"), col("n_hd2"), col("n_hd3"),
        expr("(10000 * n_recovered) div n_planted").as("recall_bp"))
  }

  private val q211Sql =
    s"""WITH c AS ($clipsSql),
       |p AS (
       |  SELECT x.id AS id_a, y.id AS id_b,
       |    bit_count(xor(x.h, y.h)) AS hd,
       |    (y.id - x.id = 1 AND x.id % 2 = 0) AS planted
       |  FROM c x JOIN c y ON x.id < y.id
       |  WHERE bit_count(xor(x.h, y.h)) <= 3),
       |agg AS (
       |  SELECT
       |    CAST(coalesce(sum(CASE WHEN planted THEN 1 END), 0) AS BIGINT)
       |      AS n_recovered,
       |    CAST(coalesce(sum(CASE WHEN NOT planted THEN 1 END), 0) AS BIGINT)
       |      AS n_collisions,
       |    CAST(coalesce(sum(CASE WHEN planted AND hd = 0 THEN 1 END), 0)
       |      AS BIGINT) AS n_hd0,
       |    CAST(coalesce(sum(CASE WHEN planted AND hd = 1 THEN 1 END), 0)
       |      AS BIGINT) AS n_hd1,
       |    CAST(coalesce(sum(CASE WHEN planted AND hd = 2 THEN 1 END), 0)
       |      AS BIGINT) AS n_hd2,
       |    CAST(coalesce(sum(CASE WHEN planted AND hd = 3 THEN 1 END), 0)
       |      AS BIGINT) AS n_hd3
       |  FROM p),
       |n AS (SELECT count(*) AS n_planted FROM documents
       |      WHERE length(text) >= 1)
       |SELECT CAST(n.n_planted AS BIGINT) AS n_planted,
       |  agg.n_recovered, agg.n_collisions,
       |  agg.n_hd0, agg.n_hd1, agg.n_hd2, agg.n_hd3,
       |  (10000 * agg.n_recovered) // n.n_planted AS recall_bp
       |FROM agg CROSS JOIN n""".stripMargin

  /** q212: the MULTIMODAL dedup funnel — the capstone composition a
    * LAION/DataComp-style build runs: exact TEXT dedup (q79's md5
    * fingerprint, min doc kept per group) → perceptual IMAGE dedup
    * (survivors must be their near-dup cluster's canonical,
    * [[imageClusterLabels]]) → AUDIO fingerprint dedup (min doc per
    * 63-bit fp among remaining survivors); one row of per-stage
    * survivor counts. Scale shape: one md5 shuffle + the clique-free
    * cluster build + one fp shuffle; every window is PARTITIONED by
    * its dedup key; the four counts are 1-row broadcast scalars. */
  private def q212(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(s, d).filter(length(col("text")) >= 1)
    val s1 = docs
      .select(col("doc_id"), md5(col("text").cast("binary")).as("ft"))
      .withColumn("kmin",
        min(col("doc_id")).over(Window.partitionBy(col("ft"))))
      .filter(col("doc_id") === col("kmin"))
      .select(col("doc_id"))
    val clus = imageClusterLabels(s, d)
    val s2 = s1.join(clus, s1("doc_id") === clus("node"), "left")
      .filter(col("node").isNull || col("label") === col("doc_id"))
      .select(col("doc_id"))
    val s3 = s2.join(q209(s, d), "doc_id")
      .withColumn("kmin",
        min(col("doc_id")).over(Window.partitionBy(col("fp"))))
      .filter(col("doc_id") === col("kmin"))
      .select(col("doc_id"))
    docs.agg(count(lit(1)).as("n_docs"))
      .crossJoin(broadcast(s1.agg(count(lit(1)).as("n_after_text"))))
      .crossJoin(broadcast(s2.agg(count(lit(1)).as("n_after_image"))))
      .crossJoin(broadcast(s3.agg(count(lit(1)).as("n_after_audio"))))
  }

  private val q212Sql =
    s"""WITH RECURSIVE $clusterCteSql,
       |t AS (SELECT doc_id, md5(text) AS ft FROM documents
       |      WHERE length(text) >= 1),
       |s1 AS (SELECT doc_id FROM (
       |  SELECT doc_id, min(doc_id) OVER (PARTITION BY ft) AS kmin FROM t)
       |  WHERE doc_id = kmin),
       |s2 AS (SELECT s1.doc_id FROM s1 LEFT JOIN final
       |         ON s1.doc_id = final.node
       |       WHERE final.node IS NULL OR final.label = s1.doc_id),
       |a AS ($q209Sql),
       |s3 AS (SELECT doc_id FROM (
       |  SELECT a.doc_id, min(a.doc_id) OVER (PARTITION BY a.fp) AS kmin
       |  FROM a JOIN s2 USING (doc_id))
       |  WHERE doc_id = kmin)
       |SELECT CAST((SELECT count(*) FROM t) AS BIGINT) AS n_docs,
       |  CAST((SELECT count(*) FROM s1) AS BIGINT) AS n_after_text,
       |  CAST((SELECT count(*) FROM s2) AS BIGINT) AS n_after_image,
       |  CAST((SELECT count(*) FROM s3) AS BIGINT) AS n_after_audio""".stripMargin

  // ---- video: frame fingerprints + temporal-alignment clip match ----
  // Video DECODE stays behind the Multimodal stub seam (no codecs in
  // this container, SURVEY §S9) — but video DEDUP math is real: a
  // "video" here is its frame-sampled sequence of planes, which is
  // exactly what a production pipeline reduces a video to before
  // fingerprinting (frame-sample → per-frame perceptual hash →
  // temporal alignment). The synthesis makes frame j's plane a
  // deterministic phase-evolution of the doc's q88 plane, so both
  // engines derive identical frames.

  private val VFrames = 8  // frames per synthesized video
  private val ClipLen = 6  // planted clip length
  private val ClipOff = 2  // planted clip starts at this frame
  private val MinMatch = 4 // alignment vote threshold
  private val DfCap = 16   // max distinct videos per frame hash (q168's
                           // df-cap discipline: a frame hash shared by
                           // many videos — a blank frame — matches
                           // everything and identifies nothing; without
                           // the cap the x4 ScaleTrend measured the join
                           // superquadratic off 4.8k-video stop-hashes,
                           // with it the alignment collision mass drops
                           // to ZERO at sf0.01 for the measured price of
                           // 26/500 planted clips whose frames are
                           // themselves stop-hashes — q215 pins that
                           // trade in integers)

  /** Frame j's plane: the q88 rule with the code-point index advanced
    * by 3j — a moving scene, one deterministic step per frame. */
  private def framePlane(text: String, j: Int): Array[Byte] = {
    val cps = text.codePoints().toArray
    val n = math.max(1, cps.length)
    Array.tabulate(512) { i =>
      val c = if (cps.isEmpty) 0 else cps((i * 7 + j * 3) % n)
      (if ((c * (i + 1)) % 17 == 0) 40 else 255).toByte
    }
  }

  private def frameHash(text: String, j: Int): Long =
    graft.functions.ImageOps.dHash63(
      graft.functions.ImageOps.cellSums(
        graft.functions.ImageOps.Gray(W, H, framePlane(text, j)), 8, 8))

  /** q213: per-frame video fingerprints — frame-sample (8 frames) →
    * per-frame 63-bit dHash; the video analog of q206. Scan → one
    * bounded explode → UDF; no shuffle. (The codec round-trip is
    * q206's covered ground; frames here hash the plane directly.) */
  private def q213(s: SparkSession, d: String): DataFrame = {
    val fh = udf((text: String, j: Int) => frameHash(text, j))
    Tables.documents(s, d)
      .filter(length(col("text")) >= 1)
      .select(col("doc_id"), col("text"),
        explode(expr(s"sequence(0, ${VFrames - 1})")).as("fid"))
      .select(col("doc_id"), col("fid").cast("long").as("frame_id"),
        fh(col("text"), col("fid")).as("fhash"))
  }

  /** The q206 cell/dhash SQL over frame j's plane (j in scope). */
  private val framePlaneSql =
    s"""[CASE WHEN (ascii(substr(text, ((i * 7 + j * 3) % nch) + 1, 1))
       |            * (i + 1)) % 17 = 0
       |      THEN 40 ELSE 255 END for i in range(0, ${W * H})]""".stripMargin

  private val frameHashCoreSql =
    s"""SELECT doc_id, j AS frame_id,
       |  CAST(list_reduce(list_transform(range(0, 63), i ->
       |    CASE WHEN cs[i + 1] > cs[i + 2]
       |      THEN (2**i)::BIGINT ELSE 0::BIGINT END),
       |    (a, b) -> a + b) AS BIGINT) AS fhash
       |FROM (
       |  SELECT doc_id, j, $cellsSql AS cs
       |  FROM (
       |    SELECT doc_id, j, $framePlaneSql AS p
       |    FROM (SELECT doc_id, text, length(text) AS nch
       |          FROM documents WHERE length(text) >= 1)
       |      CROSS JOIN (SELECT unnest(range(0, $VFrames)) AS j)))""".stripMargin

  private val q213Sql = frameHashCoreSql

  /** The dual-generator video corpus: every doc's full video
    * (vid = 2·doc_id, frames 0..7) plus a planted CLIP
    * (vid = 2·doc_id+1, frames 0..5 = the original's frames 2..7) —
    * the re-posted-excerpt case video dedup exists for. */
  private def videoFrames(s: SparkSession, d: String): DataFrame = {
    val fh = udf((text: String, j: Int) => frameHash(text, j))
    val docs = Tables.documents(s, d).filter(length(col("text")) >= 1)
    val full = docs
      .select(col("doc_id"), col("text"),
        explode(expr(s"sequence(0, ${VFrames - 1})")).as("p"))
      .select((col("doc_id") * 2).as("vid"), col("p").cast("long").as("pos"),
        fh(col("text"), col("p")).as("fhash"))
    val clip = docs
      .select(col("doc_id"), col("text"),
        explode(expr(s"sequence(0, ${ClipLen - 1})")).as("p"))
      .select((col("doc_id") * 2 + 1).as("vid"),
        col("p").cast("long").as("pos"),
        fh(col("text"), col("p") + ClipOff).as("fhash"))
    full.union(clip)
  }

  private val videoFramesSql =
    s"""SELECT doc_id * 2 AS vid, frame_id AS pos, fhash
       |FROM ($frameHashCoreSql)
       |UNION ALL
       |SELECT doc_id * 2 + 1 AS vid, frame_id - $ClipOff AS pos, fhash
       |FROM ($frameHashCoreSql)
       |WHERE frame_id >= $ClipOff
       |  AND frame_id < ${ClipOff + ClipLen}""".stripMargin

  /** q214: temporal-alignment CLIP matching — the sequence analog of
    * the Hamming-ball join: two videos match when ≥ 4 frames share a
    * fingerprint at one CONSISTENT temporal offset (offset-delta
    * voting, the Shazam/Haitsma block-alignment trick: an equi-join
    * on the frame hash — an inverted frame-hash index at scale, never
    * all-pairs — then a groupBy on (vid_a, vid_b, pos_a − pos_b)
    * counts DISTINCT aligned positions, so a static video whose
    * frames all collide cannot inflate its own vote). Emits the
    * matched span and its alignment offset — the planted clips must
    * surface at offset = +2. */
  private def q214(s: SparkSession, d: String): DataFrame = {
    val f = videoFrames(s, d)
    val keep = f.groupBy(col("fhash"))
      .agg(countDistinct(col("vid")).as("df"))
      .filter(col("df") <= DfCap)
      .select(col("fhash"))
    val fk = f.join(keep, "fhash")
    val x = fk.select(col("vid").as("vid_a"), col("pos").as("pos_a"),
      col("fhash"))
    val y = fk.select(col("vid").as("vid_b"), col("pos").as("pos_b"),
      col("fhash"))
    x.join(y, "fhash")
      .filter(col("vid_a") < col("vid_b"))
      .groupBy(col("vid_a"), col("vid_b"),
        (col("pos_a") - col("pos_b")).as("offset"))
      .agg(countDistinct(col("pos_a")).as("n_matched"))
      .filter(col("n_matched") >= MinMatch)
  }

  private val q214Sql =
    s"""WITH f AS ($videoFramesSql),
       |keep AS (
       |  SELECT fhash FROM (
       |    SELECT fhash, count(DISTINCT vid) AS df FROM f GROUP BY fhash)
       |  WHERE df <= $DfCap),
       |fk AS (SELECT f.* FROM f JOIN keep USING (fhash))
       |SELECT x.vid AS vid_a, y.vid AS vid_b,
       |  CAST(x.pos - y.pos AS BIGINT) AS "offset",
       |  CAST(count(DISTINCT x.pos) AS BIGINT) AS n_matched
       |FROM fk x JOIN fk y ON x.fhash = y.fhash AND x.vid < y.vid
       |GROUP BY x.vid, y.vid, x.pos - y.pos
       |HAVING count(DISTINCT x.pos) >= $MinMatch""".stripMargin

  /** q215: the clip-match rollup — every planted clip must be
    * recovered at its true alignment (vid pair (2k, 2k+1) at
    * offset = +$ClipOff with all $ClipLen frames matched); residual
    * cross-video alignments are counted, not dropped. Integer
    * basis-point recall, the q211 convention. */
  private def q215(s: SparkSession, d: String): DataFrame = {
    val nDocs = Tables.documents(s, d)
      .filter(length(col("text")) >= 1)
      .agg(count(lit(1)).as("n_planted"))
    q214(s, d)
      .withColumn("planted",
        (col("vid_b") - col("vid_a") === 1) && (col("vid_a") % 2 === 0) &&
          (col("offset") === ClipOff))
      .agg(
        sum(when(col("planted"), 1L).otherwise(0L)).as("n_recovered"),
        sum(when(col("planted") && col("n_matched") === ClipLen, 1L)
          .otherwise(0L)).as("n_full_span"),
        sum(when(!col("planted"), 1L).otherwise(0L)).as("n_other"))
      .crossJoin(broadcast(nDocs))
      .select(col("n_planted"), col("n_recovered"), col("n_full_span"),
        col("n_other"),
        expr("(10000 * n_recovered) div n_planted").as("recall_bp"))
  }

  private val q215Sql =
    s"""WITH f AS ($videoFramesSql),
       |keep AS (
       |  SELECT fhash FROM (
       |    SELECT fhash, count(DISTINCT vid) AS df FROM f GROUP BY fhash)
       |  WHERE df <= $DfCap),
       |fk AS (SELECT f.* FROM f JOIN keep USING (fhash)),
       |m AS (
       |  SELECT x.vid AS vid_a, y.vid AS vid_b, x.pos - y.pos AS off,
       |    count(DISTINCT x.pos) AS n_matched
       |  FROM fk x JOIN fk y ON x.fhash = y.fhash AND x.vid < y.vid
       |  GROUP BY x.vid, y.vid, x.pos - y.pos
       |  HAVING count(DISTINCT x.pos) >= $MinMatch),
       |agg AS (
       |  SELECT
       |    CAST(coalesce(sum(CASE WHEN planted THEN 1 END), 0) AS BIGINT)
       |      AS n_recovered,
       |    CAST(coalesce(sum(CASE WHEN planted AND n_matched = $ClipLen
       |      THEN 1 END), 0) AS BIGINT) AS n_full_span,
       |    CAST(coalesce(sum(CASE WHEN NOT planted THEN 1 END), 0) AS BIGINT)
       |      AS n_other
       |  FROM (SELECT *,
       |          (vid_b - vid_a = 1 AND vid_a % 2 = 0 AND off = $ClipOff)
       |            AS planted
       |        FROM m)),
       |n AS (SELECT count(*) AS n_planted FROM documents
       |      WHERE length(text) >= 1)
       |SELECT CAST(n.n_planted AS BIGINT) AS n_planted,
       |  agg.n_recovered, agg.n_full_span, agg.n_other,
       |  (10000 * agg.n_recovered) // n.n_planted AS recall_bp
       |FROM agg CROSS JOIN n""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q206_image_phash", q206, Some(q206Sql)),
    QueryDef("q207_image_near_dup", q207, Some(q207Sql)),
    QueryDef("q208_image_dup_clusters", q208, Some(q208Sql)),
    QueryDef("q209_audio_fingerprint", q209, Some(q209Sql)),
    QueryDef("q210_audio_near_dup", q210, Some(q210Sql)),
    QueryDef("q211_audio_fp_recall", q211, Some(q211Sql)),
    QueryDef("q212_multimodal_dedup_funnel", q212, Some(q212Sql)),
    QueryDef("q213_video_fingerprint", q213, Some(q213Sql)),
    QueryDef("q214_video_clip_match", q214, Some(q214Sql)),
    QueryDef("q215_clip_match_recall", q215, Some(q215Sql)))
}
