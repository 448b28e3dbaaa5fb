package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Training-data-pipeline operators beyond the reference surface (driver
  * north star): temporal/as-of correlation, interval containment, split
  * management, cross-split contamination, sequence packing, and
  * deterministic sampling — each the shape a 100 TB LLM-data pipeline
  * runs daily, each expressed so the heavy work is one equi-shuffle (or
  * a broadcast) and never a pairwise cross product.
  */
object TrainingQueries {

  /** q42: AS-OF join — for every request (click) the most recent metric
    * (view) at or before its event time, per user. Spark lacks a native
    * as-of join; the scalable form is NOT a range self-join (pairwise)
    * but a single union + one shuffle on the key + a running
    * last-non-null window — per-key linear work that survives any
    * scale. Ties at the same timestamp: the metric sorts before the
    * request (is_req 0 < 1), matching the oracle's `r.t >= m.t`
    * inclusive semantics; same-timestamp metrics are pre-deduped to
    * max(value) so both engines pick the same row.
    * (Reference analog: J1 request↔result correlation by key+time,
    * `src/queue/redis_queue.py:329-344`.) */
  private def q42(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).select(col("event_id"), col("user_id"),
      col("event_type"), col("value"), Q.us.as("t_us"))
    val metrics = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id"), col("t_us")).agg(max(col("value")).as("mval"))
    val reqs = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("t_us"), col("event_id"))
    val m = metrics.select(col("user_id"), col("t_us"), col("mval"),
      lit(0).as("is_req"), lit(null).cast("long").as("event_id"))
    val r = reqs.select(col("user_id"), col("t_us"),
      lit(null).cast("double").as("mval"), lit(1).as("is_req"),
      col("event_id"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("t_us").asc, col("is_req").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    m.unionByName(r)
      .withColumn("asof_value", last(col("mval"), ignoreNulls = true).over(w))
      .filter(col("is_req") === 1)
      .select(col("event_id"), col("user_id"), col("t_us"), col("asof_value"))
  }

  private val q42Sql =
    """SELECT r.event_id, r.user_id, r.t_us, m.mval AS asof_value
      |FROM (SELECT event_id, user_id, epoch_us(ts) AS t_us
      |      FROM events WHERE event_type = 'click') r
      |ASOF LEFT JOIN (
      |  SELECT user_id, epoch_us(ts) AS t_us, max(value) AS mval
      |  FROM events WHERE event_type = 'view' GROUP BY 1, 2) m
      |ON r.user_id = m.user_id AND r.t_us >= m.t_us""".stripMargin

  /** q66: FULL OUTER reconciliation — per-nation customer vs supplier
    * counts with zero-fill on either side (the split-vs-split audit
    * shape: which partitions exist on one side only). */
  private def q66(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
      .groupBy(col("c_nationkey").as("ckey")).agg(count(lit(1)).as("n_cust"))
    val su = Tables.supplier(s, d)
      .groupBy(col("s_nationkey").as("skey")).agg(count(lit(1)).as("n_supp"))
    c.join(su, col("ckey") === col("skey"), "full_outer")
      .select(coalesce(col("ckey"), col("skey")).as("nationkey"),
        coalesce(col("n_cust"), lit(0L)).as("n_cust"),
        coalesce(col("n_supp"), lit(0L)).as("n_supp"))
  }

  private val q66Sql =
    """SELECT coalesce(c.ckey, s.skey) AS nationkey,
      |  CAST(coalesce(c.n_cust, 0) AS BIGINT) AS n_cust,
      |  CAST(coalesce(s.n_supp, 0) AS BIGINT) AS n_supp
      |FROM (SELECT c_nationkey AS ckey, count(*) AS n_cust
      |      FROM customer GROUP BY 1) c
      |FULL OUTER JOIN (SELECT s_nationkey AS skey, count(*) AS n_supp
      |      FROM supplier GROUP BY 1) s
      |ON c.ckey = s.skey""".stripMargin

  /** q73: interval containment join, bucketized — flag events falling
    * inside any ±5 s error window. The scalable plan: explode each
    * interval into the 10 s time buckets it overlaps (≤ 2, since bucket
    * width = interval width), equi-join on the bucket, then apply the
    * range predicate — work stays proportional to ACTUAL overlaps
    * instead of |events| × |intervals| (a nested-loop range join dies at
    * 100 TB; the oracle's IEJoin is single-node-only). */
  private def q73(s: SparkSession, d: String): DataFrame = {
    val bucketUs = 10000000L
    val ev = Tables.events(s, d)
      .select(col("event_id"), col("event_type"), Q.us.as("t_us"))
    val iv = ev.filter(col("event_type") === "error")
      .select((col("t_us") - 5000000L).as("lo"), (col("t_us") + 5000000L).as("hi"))
    val ivb = iv.withColumn("bucket",
      explode(sequence(expr(s"lo div $bucketUs"), expr(s"hi div $bucketUs"))))
    val evb = ev.withColumn("bucket", expr(s"t_us div $bucketUs"))
    val flagged = evb.join(ivb, "bucket")
      .filter(col("t_us") >= col("lo") && col("t_us") <= col("hi"))
      .select(col("event_id"), col("event_type")).distinct()
    val totals = ev.groupBy(col("event_type")).agg(count(lit(1)).as("n_total"))
    val fl = flagged.groupBy(col("event_type")).agg(count(lit(1)).as("n_flagged"))
    totals.join(fl, Seq("event_type"), "left")
      .select(col("event_type"), col("n_total"),
        coalesce(col("n_flagged"), lit(0L)).as("n_flagged"))
  }

  private val q73Sql =
    """SELECT t.event_type, t.n_total,
      |  CAST(coalesce(f.n_flagged, 0) AS BIGINT) AS n_flagged
      |FROM (SELECT event_type, count(*) AS n_total FROM events GROUP BY 1) t
      |LEFT JOIN (
      |  SELECT event_type, count(*) AS n_flagged FROM (
      |    SELECT DISTINCT e.event_id, e.event_type
      |    FROM (SELECT event_id, event_type, epoch_us(ts) AS t_us
      |          FROM events) e
      |    JOIN (SELECT epoch_us(ts) - 5000000 AS lo, epoch_us(ts) + 5000000 AS hi
      |          FROM events WHERE event_type = 'error') i
      |    ON e.t_us BETWEEN i.lo AND i.hi)
      |  GROUP BY 1) f
      |USING (event_type)""".stripMargin

  /** q74: deterministic stratified train/holdout split — assignment by
    * the first md5 byte of the doc id (hex-string compare, identical in
    * both engines; 'e5' keeps 230/256 ≈ 89.8 % in train). Hash-based
    * splits are reproducible under re-partitioning, re-runs, and data
    * growth — the property a 100 TB split must have (random() is not
    * replayable and rand(seed) is partition-order-dependent). */
  private def q74(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .withColumn("split",
        when(substring(md5(col("doc_id").cast("string").cast("binary")), 1, 2)
          <= "e5", "train").otherwise("holdout"))
      .groupBy(col("source"), col("split"))
      .agg(count(lit(1)).as("n"),
        expr("(1000 * sum(n_chars)) div count(1)").as("avg_chars_x1000"))

  private val q74Sql =
    """SELECT source,
      |  CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) <= 'e5'
      |    THEN 'train' ELSE 'holdout' END AS split,
      |  count(*) AS n,
      |  (1000 * CAST(sum(n_chars) AS BIGINT)) // count(*) AS avg_chars_x1000
      |FROM documents GROUP BY 1, 2""".stripMargin

  /** q75: cross-split contamination — source pairs sharing an 8-word
    * prefix fingerprint (the train/test-leak audit: exact-prefix overlap
    * across corpus slices). Join key is a 16-byte md5, so the shuffle
    * carries fingerprints, not documents. */
  private def q75(s: SparkSession, d: String): DataFrame = {
    val fp = Tables.documents(s, d)
      .select(md5(array_join(slice(split(col("text"), " "), 1, 8), " "))
        .as("fp"), col("source"))
      .distinct()
    val a = fp.select(col("fp"), col("source").as("src_a"))
    val b = fp.select(col("fp"), col("source").as("src_b"))
    a.join(b, "fp").filter(col("src_a") < col("src_b"))
      .groupBy(col("src_a"), col("src_b"))
      .agg(count(lit(1)).as("n_shared_fp"))
  }

  private val q75Sql =
    """SELECT a.src_a, b.src_b, count(*) AS n_shared_fp
      |FROM (SELECT DISTINCT md5(array_to_string(str_split(text, ' ')[1:8], ' ')) AS fp,
      |        source AS src_a FROM documents) a
      |JOIN (SELECT DISTINCT md5(array_to_string(str_split(text, ' ')[1:8], ' ')) AS fp,
      |        source AS src_b FROM documents) b
      |ON a.fp = b.fp AND a.src_a < b.src_b
      |GROUP BY 1, 2""".stripMargin

  /** q76: sequence packing — greedy in-order packing of each source's
    * docs into 8192-token context bins: running token sum, bin = cum
    * BEFORE the doc, integer-divided by the context length. One shuffle
    * on source + an in-partition window — the standard pre-tokenization
    * packing pass, scalable because bins never cross the partition key. */
  private def q76(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.documents(s, d)
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .withColumn("cum", sum(col("n_tokens")).over(w))
      .withColumn("bin", expr("(cum - n_tokens) div 8192"))
      .groupBy(col("source"), col("bin"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("bin_tokens"))
  }

  private val q76Sql =
    """SELECT source, bin, count(*) AS n_docs,
      |  CAST(sum(n_tokens) AS BIGINT) AS bin_tokens
      |FROM (
      |  SELECT source, CAST((cum - n_tokens) // 8192 AS BIGINT) AS bin, n_tokens
      |  FROM (
      |    SELECT source, n_tokens,
      |      sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
      |        ROWS UNBOUNDED PRECEDING) AS cum
      |    FROM (SELECT doc_id, source, len(str_split(text, ' ')) AS n_tokens
      |          FROM documents)))
      |GROUP BY 1, 2""".stripMargin

  /** q77: deterministic stratified sample — 5 docs per source, picked by
    * md5(text) order (content-addressed, so the sample is stable across
    * runs and replication; doc_id tiebreak makes the order total). */
  private def q77(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("source"))
      .orderBy(md5(col("text").cast("binary")).asc, col("doc_id").asc)
    Tables.documents(s, d)
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 5)
      .select(col("source"), col("doc_id"), col("rn"))
  }

  private val q77Sql =
    """SELECT source, doc_id, rn FROM (
      |  SELECT source, doc_id,
      |    row_number() OVER (PARTITION BY source
      |      ORDER BY md5(text), doc_id) AS rn
      |  FROM documents)
      |WHERE rn <= 5""".stripMargin

  /** q81: distribution-drift score (PSI) per source vs the global
    * corpus — the ingest-batch monitoring a training pipeline runs to
    * catch a source whose length profile shifted. Fixed-width 10-bucket
    * histogram of n_chars (integer math, engine-identical), Laplace
    * smoothing for empty buckets, and the PSI sum computed as an
    * ORDERED window fold over the bucket axis so the double summation
    * order is deterministic on both engines (a plain groupBy sum of
    * doubles is partial-order-dependent). */
  private def q81(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
      .select(col("source"),
        least(expr("n_chars div 500"), lit(9L)).as("bucket"))
    val g = docs.groupBy(col("bucket")).agg(count(lit(1)).as("gn"))
    val p = docs.groupBy(col("source"), col("bucket"))
      .agg(count(lit(1)).as("sn"))
    val stot = docs.groupBy(col("source")).agg(count(lit(1)).as("stot"))
    // global count as a broadcast 1-row cross join (q13/q108 pattern) —
    // never a driver-side action in a constructor (NoEagerActionSpec)
    val gtot = docs.agg(count(lit(1)).as("gtot"))
    val grid = docs.select(col("source")).distinct()
      .select(col("source"), explode(sequence(lit(0L), lit(9L))).as("bucket"))
    val byBucket = Window.partitionBy(col("source")).orderBy(col("bucket").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid
      .join(p, Seq("source", "bucket"), "left")
      .join(g, Seq("bucket"), "left")
      .join(stot, Seq("source"))
      .crossJoin(broadcast(gtot))
      .withColumn("sn", coalesce(col("sn"), lit(0L)))
      .withColumn("gn", coalesce(col("gn"), lit(0L)))
      .withColumn("ps",
        (col("sn") + 1).cast("double") / (col("stot") + 10).cast("double"))
      .withColumn("pg",
        (col("gn") + 1).cast("double") / (col("gtot") + 10).cast("double"))
      .withColumn("term", (col("ps") - col("pg")) * log(col("ps") / col("pg")))
      .withColumn("psi_cum", sum(col("term")).over(byBucket))
      .filter(col("bucket") === 9)
      .select(col("source"), col("stot").as("n_docs"),
        round(col("psi_cum"), 6).as("psi"))
  }

  private val q81Sql =
    """WITH docs AS (
      |  SELECT source, least(n_chars // 500, 9) AS bucket FROM documents),
      |g AS (SELECT bucket, count(*) AS gn FROM docs GROUP BY 1),
      |p AS (SELECT source, bucket, count(*) AS sn FROM docs GROUP BY 1, 2),
      |stot AS (SELECT source, count(*) AS stot FROM docs GROUP BY 1),
      |grid AS (
      |  SELECT s.source, b.bucket
      |  FROM (SELECT DISTINCT source FROM docs) s,
      |       (SELECT unnest(range(0, 10)) AS bucket) b),
      |terms AS (
      |  SELECT grid.source, grid.bucket, stot.stot,
      |    (CAST(coalesce(p.sn, 0) + 1 AS DOUBLE)
      |      / CAST(stot.stot + 10 AS DOUBLE)) AS ps,
      |    (CAST(coalesce(g.gn, 0) + 1 AS DOUBLE)
      |      / CAST((SELECT count(*) FROM docs) + 10 AS DOUBLE)) AS pg
      |  FROM grid
      |  LEFT JOIN p ON p.source = grid.source AND p.bucket = grid.bucket
      |  LEFT JOIN g ON g.bucket = grid.bucket
      |  JOIN stot ON stot.source = grid.source)
      |SELECT source, stot AS n_docs, round(psi_cum, 6) AS psi
      |FROM (
      |  SELECT source, bucket, stot,
      |    sum((ps - pg) * ln(ps / pg)) OVER (PARTITION BY source
      |      ORDER BY bucket ROWS UNBOUNDED PRECEDING) AS psi_cum
      |  FROM terms)
      |WHERE bucket = 9""".stripMargin

  /** q94: mixture-quota planning — given target mixture weights per
    * source, find the BINDING source (the one that runs out first at
    * its weight) and the per-source document quotas that realize the
    * largest mixture-faithful dataset: scale = min(n_s / w_s), quota_s
    * = floor(scale · w_s). The planning pass a dataset-mixing pipeline
    * runs before sampling; one aggregation + one broadcast scalar join
    * (no unpartitioned window — the share math stays parallel). */
  private def q94(s: SparkSession, d: String): DataFrame = {
    val counts = Tables.documents(s, d)
      .groupBy(col("source")).agg(count(lit(1)).as("n"))
      // deterministic synthetic weights 1..3 from the source's number
      .withColumn("w",
        (regexp_replace(col("source"), "[^0-9]", "").cast("long") % 3 + 1)
          .cast("double"))
    val scale = counts.agg(
      min(col("n").cast("double") / col("w")).as("scale"))
    counts.crossJoin(broadcast(scale))
      .select(col("source"), col("n"), col("w"),
        floor(col("scale") * col("w")).cast("long").as("quota"),
        round(floor(col("scale") * col("w")) / col("n").cast("double"), 6)
          .as("utilization"))
  }

  /** q169: OUTPUT-SHARD PLAN — the last hop before a training corpus
    * hits disk: deterministic hash assignment of documents to a fixed
    * shard count (the 100 TB-honest strategy — greedy bin-packing is
    * inherently sequential; hash sharding is what webdataset/tfrecord
    * writers actually do), with the per-shard doc/token/byte loads and
    * each shard's balance factor vs the mean so a skewed shard layout
    * is visible BEFORE the write job runs. The shard key is an md5
    * slice of doc_id (content-independent, reproducible in both
    * engines), so re-running the plan is idempotent. One corpus scan,
    * one 32-group aggregate, a 1-row broadcast total — nothing scales
    * with anything but the scan. */
  private def q169(s: SparkSession, d: String): DataFrame = {
    val nShards = 32
    val per = Tables.documents(s, d)
      .select(col("n_chars"),
        size(split(col("text"), " ")).cast("long").as("toks"),
        (expr("cast(conv(substring(md5(cast(cast(doc_id as string) as " +
          "binary)), 1, 8), 16, 10) as bigint)") % nShards).as("shard"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("toks")).as("n_tokens"),
        sum(col("n_chars")).as("n_bytes"))
    val tot = per.agg(sum(col("n_tokens")).as("tot_tokens"))
    per.crossJoin(broadcast(tot))
      .select(col("shard"), col("n_docs"), col("n_tokens"), col("n_bytes"),
        round(col("n_tokens").cast("double") * nShards /
          col("tot_tokens"), 6).as("balance"))
  }

  private val q169Sql =
    """WITH per AS (
      |  SELECT CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
      |      AS BIGINT) % 32 AS shard,
      |    CAST(count(*) AS BIGINT) AS n_docs,
      |    CAST(sum(len(str_split(text, ' '))) AS BIGINT) AS n_tokens,
      |    CAST(sum(n_chars) AS BIGINT) AS n_bytes
      |  FROM documents GROUP BY 1),
      |tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS tot_tokens FROM per)
      |SELECT shard, n_docs, n_tokens, n_bytes,
      |  round(CAST(n_tokens AS DOUBLE) * 32 / tot_tokens, 6) AS balance
      |FROM per, tot""".stripMargin

  private val q94Sql =
    """SELECT source, n, w,
      |  CAST(floor(scale * w) AS BIGINT) AS quota,
      |  round(floor(scale * w) / CAST(n AS DOUBLE), 6) AS utilization
      |FROM (
      |  SELECT source, n, w,
      |    min(CAST(n AS DOUBLE) / w) OVER () AS scale
      |  FROM (
      |    SELECT source, count(*) AS n,
      |      CAST(CAST(regexp_replace(source, '[^0-9]', '', 'g') AS BIGINT)
      |           % 3 + 1 AS DOUBLE) AS w
      |    FROM documents GROUP BY 1))""".stripMargin

  /** q133: weighted priority sample (Duffield–Lund–Thorup) — k=50 docs
    * drawn with probability ∝ length, plus the estimator a downstream
    * consumer needs for unbiased totals: ŵ = max(w, τ) with τ the
    * (k+1)-th priority. "Randomness" is the 60-bit md5 of doc_id (u =
    * (h+1)/2⁶⁰), so the draw is reproducible and the oracle replays it;
    * the priority w/u is one IEEE multiply+divide of exact inputs —
    * engine-identical, no pow/log. Top-k and τ both come from
    * TakeOrderedAndProject (never a global-window sort of the corpus:
    * each executor keeps its local top-51, the driver merges 51×P
    * rows); τ rides back as a 1-row broadcast (the q13 scalar rule).
    * Priority sampling is the published scheme behind weighted
    * telemetry/corpus subsampling at scale. */
  private def q133(s: SparkSession, d: String): DataFrame = {
    val two60 = 1152921504606846976.0 // 2^60, exact in double
    val pri = Tables.documents(s, d)
      .select(col("doc_id"), col("n_chars").as("w"),
        (col("n_chars").cast("double") * lit(two60) /
          (expr("cast(conv(substring(md5(cast(cast(doc_id as string) as binary)), 1, 15), 16, 10) as bigint)")
            + lit(1L)).cast("double")).as("q"))
    val tau = pri.orderBy(col("q").desc, col("doc_id").asc).limit(51)
      .agg(min(col("q")).as("tau"))
    pri.orderBy(col("q").desc, col("doc_id").asc).limit(50)
      .crossJoin(broadcast(tau))
      .select(col("doc_id"), col("w").as("weight"),
        round(col("q"), 6).as("priority"),
        round(col("tau"), 6).as("tau"),
        round(greatest(col("w").cast("double"), col("tau")), 6)
          .as("est_weight"))
  }

  private val q133Sql =
    """WITH pri AS (
      |  SELECT doc_id, n_chars AS w,
      |    CAST(n_chars AS DOUBLE) * 1152921504606846976.0
      |      / CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
      |          AS BIGINT) + 1 AS DOUBLE) AS q
      |  FROM documents),
      |tau AS (
      |  SELECT min(q) AS tau FROM (
      |    SELECT q FROM pri ORDER BY q DESC, doc_id LIMIT 51))
      |SELECT doc_id, w AS weight, round(q, 6) AS priority,
      |  round(tau, 6) AS tau,
      |  round(greatest(CAST(w AS DOUBLE), tau), 6) AS est_weight
      |FROM (SELECT * FROM pri ORDER BY q DESC, doc_id LIMIT 50), tau""".stripMargin

  /** q143: decile lift / gains table — the model-eval staple: users
    * ranked by a score (here: exact integer-cents activity value),
    * split into score deciles, and each decile's share of conversions
    * reported (a good score concentrates conversions in the top
    * deciles). The textbook ntile(10) is a GLOBAL-sort window — a
    * single-partition scan at 100 TB — so the deciles come instead
    * from the 9 exact interpolated quantile thresholds (one 1-row
    * broadcast, the q09 percentile ↔ quantile_cont parity) and each
    * user's decile is a per-row count of thresholds beaten: map-side
    * work, no global sort anywhere. Conversion totals ride a second
    * 1-row broadcast. */
  private def q143(s: SparkSession, d: String): DataFrame = {
    val per = Tables.events(s, d)
      .groupBy(col("user_id"))
      .agg(sum(round(col("value") * 100).cast("long")).as("score_c"),
        sum((col("event_type") === "purchase").cast("long")).as("convs"))
    // thresholds round to 6dp BEFORE the comparison (the q09 rule):
    // Spark's Percentile and DuckDB's quantile_cont interpolate with
    // different expression forms, so the raw doubles can differ in the
    // last bit — a boundary score would then flip deciles between
    // engines.
    val th = per.agg(expr(
      "transform(percentile(score_c, " +
        "array(0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9)), t -> round(t, 6))")
      .as("ths"))
    val tot = per.agg(sum(col("convs")).as("total_convs"))
    per.crossJoin(broadcast(th))
      .withColumn("decile",
        lit(1) + size(expr("filter(ths, t -> score_c > t)")))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n_users"), sum(col("convs")).as("convs"))
      .crossJoin(broadcast(tot))
      .select(col("decile"), col("n_users"), col("convs"),
        expr("(10000L * convs) div total_convs").as("conv_share_bp"))
  }

  private val q143Sql =
    """WITH per AS (
      |  SELECT user_id,
      |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
      |      AS score_c,
      |    CAST(sum(CAST(event_type = 'purchase' AS BIGINT)) AS BIGINT)
      |      AS convs
      |  FROM events GROUP BY 1),
      |th AS (
      |  SELECT list_transform(quantile_cont(score_c,
      |    [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]),
      |    t -> round(t, 6)) AS ths
      |  FROM per),
      |tot AS (SELECT CAST(sum(convs) AS BIGINT) AS total_convs FROM per)
      |SELECT decile, count(*) AS n_users,
      |  CAST(sum(convs) AS BIGINT) AS convs,
      |  (10000 * CAST(sum(convs) AS BIGINT))
      |    // CAST(any_value(total_convs) AS BIGINT) AS conv_share_bp
      |FROM (
      |  SELECT p.convs,
      |    1 + len(list_filter(th.ths, t -> CAST(p.score_c AS DOUBLE) > t))
      |      AS decile
      |  FROM per p, th), tot
      |GROUP BY 1""".stripMargin

  /** q174: TRAINING-ORDER plan — the step between q169's shard layout
    * and an actual training run: a deterministic pseudo-random global
    * order (okey = salted md5 slice of doc_id — reproducible from the
    * id alone, no RNG state to ship) materialized per shard, with the
    * audit a data-order reviewer actually wants: per shard, the
    * source-run structure of the order (count/max/mean of consecutive
    * same-source runs — a pathological run means a training window
    * sees one source for too long) and an exact integer checksum
    * Σ (pos·doc_id mod P) mod P (P = 2³¹−1, the band-key fold prime)
    * that pins the entire permutation, so any engine change that
    * silently reorders training data fails parity. The mod-P fold is
    * overflow-proof by construction: both factors are reduced below
    * 2³¹ before the multiply, so the product stays under 2⁶² — raw
    * Σ pos·doc_id would silently wrap in Spark (non-ANSI) while DuckDB
    * raises on BIGINT overflow, diverging at real corpus sizes.
    * avg_run ships ×1000 in integer thousandths (BIGINT division) so
    * no output column depends on either engine's double rounding.
    *
    * Scale shape: every window is PARTITIONED BY shard (shard count is
    * the q169 knob, ∝ corpus at 100 TB, so per-partition sort stays
    * bounded); one scan, one shard-keyed shuffle, aggregates ride the
    * same key. No global sort anywhere — the global order is defined
    * per (shard, okey), exactly how a multi-file training reader
    * consumes it. */
  private def q174(s: SparkSession, d: String): DataFrame = {
    val nShards = 32
    val w = Window.partitionBy(col("shard")).orderBy(col("okey"), col("doc_id"))
    val seq0 = Tables.documents(s, d)
      .select(col("doc_id"), col("source"),
        (expr("cast(conv(substring(md5(cast(cast(doc_id as string) as " +
          "binary)), 1, 8), 16, 10) as bigint)") % nShards).as("shard"),
        expr("cast(conv(substring(md5(cast(concat('ord:', " +
          "cast(doc_id as string)) as binary)), 1, 15), 16, 10) as bigint)")
          .as("okey"))
      .withColumn("pos", row_number().over(w).cast("long"))
      .withColumn("chg",
        when(lag(col("source"), 1).over(w).isNull ||
          lag(col("source"), 1).over(w) =!= col("source"), 1L).otherwise(0L))
    val runs = seq0.withColumn("run_id",
      sum(col("chg")).over(w.rowsBetween(Window.unboundedPreceding,
        Window.currentRow)))
    val maxRun = runs.groupBy(col("shard"), col("run_id"))
      .agg(count(lit(1)).as("rl"))
      .groupBy(col("shard")).agg(max(col("rl")).as("max_run"))
    runs.groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("source")).as("n_sources"),
        sum(col("chg")).as("n_runs"),
        (sum(expr("((pos % 2147483647L) * (doc_id % 2147483647L)) " +
          "% 2147483647L")) % 2147483647L).as("order_checksum"))
      .join(maxRun, "shard")
      .select(col("shard"), col("n_docs"), col("n_sources"), col("n_runs"),
        col("max_run"),
        expr("(1000L * n_docs) div n_runs").as("avg_run_x1000"),
        col("order_checksum"))
  }

  private val q174Sql =
    """WITH ord AS (
      |  SELECT doc_id, source,
      |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
      |      AS BIGINT) % 32 AS shard,
      |    CAST(('0x' || substr(md5('ord:' || CAST(doc_id AS VARCHAR)), 1, 15))
      |      AS BIGINT) AS okey
      |  FROM documents),
      |seq AS (
      |  SELECT shard, source, doc_id,
      |    CAST(row_number() OVER w AS BIGINT) AS pos,
      |    CASE WHEN lag(source) OVER w IS NULL
      |        OR lag(source) OVER w <> source THEN 1 ELSE 0 END AS chg
      |  FROM ord WINDOW w AS (PARTITION BY shard ORDER BY okey, doc_id)),
      |runs AS (
      |  SELECT shard, source, doc_id, pos, chg,
      |    sum(chg) OVER (PARTITION BY shard ORDER BY pos
      |      ROWS UNBOUNDED PRECEDING) AS run_id
      |  FROM seq),
      |rl AS (SELECT shard, run_id, count(*) AS rl FROM runs GROUP BY 1, 2),
      |mr AS (SELECT shard, CAST(max(rl) AS BIGINT) AS max_run
      |  FROM rl GROUP BY 1),
      |per AS (
      |  SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
      |    CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
      |    CAST(sum(chg) AS BIGINT) AS n_runs,
      |    CAST(sum(((pos % 2147483647) * (doc_id % 2147483647))
      |      % 2147483647) % 2147483647 AS BIGINT) AS order_checksum
      |  FROM runs GROUP BY 1)
      |SELECT p.shard, p.n_docs, p.n_sources, p.n_runs, m.max_run,
      |  (1000 * p.n_docs) // p.n_runs AS avg_run_x1000,
      |  p.order_checksum
      |FROM per p JOIN mr m ON m.shard = p.shard""".stripMargin

  // ---- q187: data-constrained repetition plan ----------------------

  /** Budget = [[BudgetEpochs]]× the corpus' unique tokens; no source
    * repeats beyond [[RepCapEpochs]] epochs (the ~4-epoch
    * value-retention cliff of Muennighoff et al. 2023 applied
    * conservatively); redistribution rounds after the initial
    * allocation. */
  private val BudgetEpochs = 3L
  private val RepCapEpochs = 3L
  private val RedistRounds = 2

  /** q187: REPETITION PLAN — the allocation a data-constrained
    * pretraining run computes when the token budget exceeds the unique
    * corpus (Muennighoff et al. 2023): each source wants
    * `budget · weight` tokens under the α=0.5 temperature mixture
    * (q164's weights), but no source may repeat beyond
    * [[RepCapEpochs]] epochs of its unique mass — temperature UPWEIGHTS
    * small sources, so exactly those saturate the cap first, and the
    * unplaced surplus WATER-FILLS back onto the uncapped sources,
    * weight-proportionally, for [[RedistRounds]] rounds.
    * `residual_tokens` records what finite redistribution leaves
    * unplaced — with budget = cap capacity (both 3×), the fixpoint is
    * full saturation and the residual measures convergence honestly.
    *
    * Integer discipline: weights are quantized to milli BEFORE the
    * budget multiply (`budget · w_milli` stays ≲10³ × corpus tokens —
    * never `10000·score`-style products that wrap BIGINT at corpus
    * scale), every share is an integer div, and the only double is
    * q164's proven `floor(sqrt·10⁶ + 0.5)` weight seed. Div-by-zero
    * guards (all-capped ⇒ `m_unc` NULL) are explicit CASEs on both
    * engines.
    *
    * Scale shape: ONE corpus scan collapses to |sources| rows
    * (map-side partial sums before the per-source exchange); every
    * round is a 1-row global aggregate broadcast back over the
    * |sources|-row frame — no join ever touches the corpus again. */
  private def q187(s: SparkSession, d: String): DataFrame = {
    val per = Tables.documents(s, d)
      .groupBy(col("source"))
      .agg(sum(size(split(col("text"), " ")).cast("long")).as("n_tokens"))
      .withColumn("m", expr(
        "cast(floor(sqrt(cast(n_tokens as double)) * 1000000 + 0.5) as bigint)"))
    val tot = per.agg(sum(col("n_tokens")).as("tot_tokens"),
      sum(col("m")).as("tot_m"))
    var f = per.crossJoin(broadcast(tot))
      .withColumn("budget", expr(s"${BudgetEpochs}L * tot_tokens"))
      .withColumn("cap", expr(s"${RepCapEpochs}L * n_tokens"))
      .withColumn("w_milli", expr("(1000L * m) div tot_m"))
      .withColumn("a", expr("least((budget * w_milli) div 1000L, cap)"))
      .select(col("source"), col("n_tokens"), col("m"), col("budget"),
        col("cap"), col("w_milli"), col("a"))
    for (_ <- 1 to RedistRounds) {
      val t = f.agg(sum(col("a")).as("sum_a"),
        sum(when(col("a") < col("cap"), col("m"))).as("m_unc"))
      f = f.crossJoin(broadcast(t))
        .withColumn("a", expr(
          "least(a + CASE WHEN a < cap AND coalesce(m_unc, 0L) > 0L " +
            "THEN ((budget - sum_a) * ((1000L * m) div m_unc)) div 1000L " +
            "ELSE 0L END, cap)"))
        .drop("sum_a", "m_unc")
    }
    val res = f.agg(sum(col("a")).as("alloc_total"))
    f.crossJoin(broadcast(res))
      .select(col("source"), col("n_tokens"), col("w_milli"),
        col("cap").as("cap_tokens"), col("a").as("alloc_tokens"),
        expr("(1000L * a) div n_tokens").as("epochs_milli"),
        (col("a") === col("cap")).as("capped"),
        expr("budget - alloc_total").as("residual_tokens"))
  }

  private val q187Sql = {
    val rounds = (1 to RedistRounds).map { r =>
      val prev = if (r == 1) "base" else s"f${r - 1}"
      s"""t$r AS (
         |  SELECT CAST(sum(a) AS BIGINT) AS sum_a,
         |    CAST(sum(CASE WHEN a < cap THEN m END) AS BIGINT) AS m_unc
         |  FROM $prev),
         |f$r AS (
         |  SELECT source, n_tokens, m, budget, cap, w_milli,
         |    least(a + CASE WHEN a < cap AND coalesce(m_unc, 0) > 0
         |      THEN ((budget - sum_a) * ((1000 * m) // m_unc)) // 1000
         |      ELSE 0 END, cap) AS a
         |  FROM $prev, t$r)""".stripMargin
    }.mkString(",\n")
    s"""WITH per AS (
       |  SELECT source,
       |    CAST(sum(len(str_split(text, ' '))) AS BIGINT) AS n_tokens
       |  FROM documents GROUP BY 1),
       |mm AS (
       |  SELECT *, CAST(floor(sqrt(CAST(n_tokens AS DOUBLE)) * 1000000
       |    + 0.5) AS BIGINT) AS m
       |  FROM per),
       |tot AS (
       |  SELECT CAST(sum(n_tokens) AS BIGINT) AS tot_tokens,
       |    CAST(sum(m) AS BIGINT) AS tot_m
       |  FROM mm),
       |base AS (
       |  SELECT source, n_tokens, m,
       |    $BudgetEpochs * tot_tokens AS budget,
       |    $RepCapEpochs * n_tokens AS cap,
       |    (1000 * m) // tot_m AS w_milli,
       |    least(($BudgetEpochs * tot_tokens * ((1000 * m) // tot_m)) // 1000,
       |      $RepCapEpochs * n_tokens) AS a
       |  FROM mm, tot),
       |$rounds,
       |res AS (
       |  SELECT CAST(sum(a) AS BIGINT) AS alloc_total FROM f$RedistRounds)
       |SELECT source, n_tokens, w_milli, cap AS cap_tokens,
       |  a AS alloc_tokens, (1000 * a) // n_tokens AS epochs_milli,
       |  a = cap AS capped, budget - alloc_total AS residual_tokens
       |FROM f$RedistRounds, res""".stripMargin
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q187_repetition_plan", q187, Some(q187Sql)),
    QueryDef("q174_training_order", q174, Some(q174Sql)),
    QueryDef("q143_decile_lift", q143, Some(q143Sql)),
    QueryDef("q133_priority_sample", q133, Some(q133Sql)),
    QueryDef("q42_asof_join", q42, Some(q42Sql)),
    QueryDef("q94_mixture_quota", q94, Some(q94Sql)),
    QueryDef("q169_shard_plan", q169, Some(q169Sql)),
    QueryDef("q81_drift_psi", q81, Some(q81Sql)),
    QueryDef("q66_full_outer_counts", q66, Some(q66Sql)),
    QueryDef("q73_interval_flag_join", q73, Some(q73Sql)),
    QueryDef("q74_stratified_split", q74, Some(q74Sql)),
    QueryDef("q75_contamination_pairs", q75, Some(q75Sql)),
    QueryDef("q76_sequence_packing", q76, Some(q76Sql)),
    QueryDef("q77_stratified_sample", q77, Some(q77Sql)))
}
