package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** URL/domain curation — the C4/RefinedWeb-standard pipeline stage
  * (VERDICT r13 #6): URL canonicalization, registrable-domain rollups
  * behind a blocklist anti-join, and domain-attributed duplication
  * stats. The documents table carries no URL column, so each query
  * SYNTHESIZES a deterministic raw URL per doc (messy on purpose —
  * mixed-case schemes/hosts, default and explicit ports, tracking
  * params, fragments) from the doc's md5 identity; both engines
  * derive the same string, so the oracle checks the CANONICALIZATION
  * MATH, not the synthesis.
  *
  * Canonical form (the curation-pipeline standard): lowercase scheme
  * and host, default port stripped (:80 http / :443 https), fragment
  * dropped, tracking query params removed (utm_*, fbclid, gclid),
  * remaining params kept in order. Registrable domain = last two host
  * labels (the public-suffix list is a lookup table in production;
  * two-label suffixes cover the synthesized hosts exactly).
  *
  * Scale shape: every query is scan → per-row string expressions
  * (whole-stage codegen; no UDF, no explode except the bounded param
  * split) → one aggregation shuffle on (source | tld | dup-key). The
  * blocklist side of q195 broadcasts (a real blocklist is a few MB at
  * 100 TB corpus scale). Nothing all-pairs, nothing corpus²; the one
  * window in q196 partitions by the dup key, never globally. */
object UrlQueries {

  /** Both engines' md5-derived variety key (the q74/q180 md5-byte
    * discipline: doc ids stride per source in the testdata, so any
    * polynomial in doc_id is CONSTANT per source mod small powers of
    * two — the hash key varies freely). */
  private val khExpr =
    "cast(conv(substring(md5(cast(doc_id as string)), 1, 15), 16, 10) " +
      "as bigint)"
  private val khSqlExpr =
    "CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)"

  /** The synthesized raw URL over a frame that already has `kh`. */
  private val urlExpr =
    "concat(" +
      "CASE kh % 4 WHEN 0 THEN 'HTTP' WHEN 1 THEN 'https' " +
      "WHEN 2 THEN 'http' ELSE 'HTTPS' END, '://', " +
      "CASE kh % 3 " +
      "WHEN 0 THEN concat('WWW.Site', cast(kh % 40 as string), '.COM') " +
      "WHEN 1 THEN concat('cdn.site', cast(kh % 40 as string), '.org') " +
      "ELSE concat('site', cast(kh % 40 as string), '.net') END, " +
      "CASE kh % 5 WHEN 0 THEN ':80' WHEN 1 THEN ':443' " +
      "WHEN 2 THEN ':8080' ELSE '' END, " +
      "'/docs/', cast(kh % 97 as string), " +
      "CASE kh % 7 " +
      "WHEN 0 THEN concat('?utm_source=feed&page=', cast(kh % 13 as string)) " +
      "WHEN 1 THEN concat('?page=', cast(kh % 13 as string), " +
      "'&utm_campaign=spring') " +
      "WHEN 2 THEN concat('?fbclid=XYZ', cast(kh % 11 as string)) " +
      "ELSE '' END, " +
      "CASE WHEN kh % 2 = 0 THEN '#section-2' ELSE '' END)"

  // NOTE: concat operators sit at line ENDS — stripMargin treats a
  // leading `|` of `||` as the margin character and silently eats it
  private val urlSqlExpr =
    """(CASE kh % 4 WHEN 0 THEN 'HTTP' WHEN 1 THEN 'https'
      |      WHEN 2 THEN 'http' ELSE 'HTTPS' END) || '://' ||
      |    (CASE kh % 3
      |      WHEN 0 THEN 'WWW.Site' || CAST(kh % 40 AS VARCHAR) || '.COM'
      |      WHEN 1 THEN 'cdn.site' || CAST(kh % 40 AS VARCHAR) || '.org'
      |      ELSE 'site' || CAST(kh % 40 AS VARCHAR) || '.net' END) ||
      |    (CASE kh % 5 WHEN 0 THEN ':80' WHEN 1 THEN ':443'
      |      WHEN 2 THEN ':8080' ELSE '' END) ||
      |    '/docs/' || CAST(kh % 97 AS VARCHAR) ||
      |    (CASE kh % 7
      |      WHEN 0 THEN '?utm_source=feed&page=' || CAST(kh % 13 AS VARCHAR)
      |      WHEN 1 THEN '?page=' || CAST(kh % 13 AS VARCHAR) ||
      |        '&utm_campaign=spring'
      |      WHEN 2 THEN '?fbclid=XYZ' || CAST(kh % 11 AS VARCHAR)
      |      ELSE '' END) ||
      |    (CASE WHEN kh % 2 = 0 THEN '#section-2' ELSE '' END)"""
      .stripMargin

  /** Parse patterns — identical regex text on both engines (simple
    * character-class patterns; Java and RE2 agree). */
  private val SchemeRe = "^([A-Za-z]+)://"
  private val HostRe = "^[A-Za-z]+://([^/:?#]+)"
  private val PortRe = "^[A-Za-z]+://[^/:?#]+:([0-9]+)"
  private val PathRe = "^[A-Za-z]+://[^/?#]+(/[^?#]*)"
  private val QsRe = "[?]([^#]*)"
  private val FragRe = "#(.*)$"

  private val trackingPred =
    "p LIKE 'utm_%' OR p LIKE 'fbclid=%' OR p LIKE 'gclid=%'"

  /** documents + (kh, url, parsed parts, canonical parts + flags). */
  private def curl(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .withColumn("kh", expr(khExpr))
      .withColumn("url", expr(urlExpr))
      .withColumn("scheme", regexp_extract(col("url"), SchemeRe, 1))
      .withColumn("host", regexp_extract(col("url"), HostRe, 1))
      .withColumn("port", regexp_extract(col("url"), PortRe, 1))
      .withColumn("path", regexp_extract(col("url"), PathRe, 1))
      .withColumn("qs", regexp_extract(col("url"), QsRe, 1))
      .withColumn("frag", regexp_extract(col("url"), FragRe, 1))
      .withColumn("c_scheme", lower(col("scheme")))
      .withColumn("c_host", lower(col("host")))
      .withColumn("had_default_port",
        expr("(lower(scheme) = 'http' AND port = '80') OR " +
          "(lower(scheme) = 'https' AND port = '443')"))
      .withColumn("c_port", expr("CASE WHEN (lower(scheme) = 'http' AND " +
        "port = '80') OR (lower(scheme) = 'https' AND port = '443') OR " +
        "port = '' THEN '' ELSE concat(':', port) END"))
      .withColumn("c_qs", expr("array_join(filter(split(qs, '&'), " +
        s"p -> NOT ($trackingPred) AND p != ''), '&')"))
      .withColumn("had_scheme_case", col("scheme") =!= lower(col("scheme")))
      .withColumn("had_host_case", col("host") =!= lower(col("host")))
      .withColumn("had_fragment", col("frag") =!= "")
      .withColumn("had_tracking", expr("size(filter(split(qs, '&'), " +
        s"p -> $trackingPred)) > 0"))
      .withColumn("canon_url", expr("concat(c_scheme, '://', c_host, " +
        "c_port, path, CASE WHEN c_qs != '' THEN concat('?', c_qs) " +
        "ELSE '' END)"))

  /** The shared oracle CTE prefix: urls → parsed → canon flags. */
  private val curlSql =
    s"""WITH urls AS (
       |  SELECT doc_id, text, source, n_chars, $urlSqlExpr AS url
       |  FROM (SELECT *, $khSqlExpr AS kh FROM documents)),
       |parsed AS (
       |  SELECT doc_id, text, source, n_chars, url,
       |    regexp_extract(url, '$SchemeRe', 1) AS scheme,
       |    regexp_extract(url, '$HostRe', 1) AS host,
       |    regexp_extract(url, '$PortRe', 1) AS port,
       |    regexp_extract(url, '$PathRe', 1) AS path,
       |    regexp_extract(url, '$QsRe', 1) AS qs,
       |    regexp_extract(url, '#(.*)${"$"}', 1) AS frag
       |  FROM urls),
       |curl AS (
       |  SELECT doc_id, text, source, n_chars, url,
       |    lower(scheme) AS c_scheme, lower(host) AS c_host,
       |    (lower(scheme) = 'http' AND port = '80')
       |      OR (lower(scheme) = 'https' AND port = '443')
       |      AS had_default_port,
       |    scheme <> lower(scheme) AS had_scheme_case,
       |    host <> lower(host) AS had_host_case,
       |    frag <> '' AS had_fragment,
       |    len(list_filter(string_split(qs, '&'),
       |      p -> $trackingPred)) > 0 AS had_tracking,
       |    lower(scheme) || '://' || lower(host) ||
       |      (CASE WHEN (lower(scheme) = 'http' AND port = '80')
       |        OR (lower(scheme) = 'https' AND port = '443')
       |        OR port = '' THEN '' ELSE ':' || port END) || path ||
       |      (CASE WHEN array_to_string(list_filter(string_split(qs, '&'),
       |        p -> NOT ($trackingPred) AND p <> ''), '&') <> ''
       |       THEN '?' || array_to_string(list_filter(string_split(qs, '&'),
       |        p -> NOT ($trackingPred) AND p <> ''), '&')
       |       ELSE '' END) AS canon_url
       |  FROM parsed)""".stripMargin

  // ---- q194: canonicalization audit ---------------------------------

  /** q194: per-source canonicalization audit — URL counts, raw vs
    * canonical distinct counts (the dedup gain canonicalization buys
    * before any content hashing), and per-transformation hit counts
    * (case folds, default-port strips, fragment drops, tracking-param
    * strips). All columns integer-exact. */
  private def q194(s: SparkSession, d: String): DataFrame =
    curl(s, d).groupBy(col("source"))
      .agg(count(lit(1)).as("n_urls"),
        countDistinct(col("url")).as("n_raw_distinct"),
        countDistinct(col("canon_url")).as("n_canon_distinct"),
        sum(when(col("had_scheme_case"), 1L).otherwise(0L))
          .as("n_scheme_case"),
        sum(when(col("had_host_case"), 1L).otherwise(0L)).as("n_host_case"),
        sum(when(col("had_default_port"), 1L).otherwise(0L))
          .as("n_port_stripped"),
        sum(when(col("had_fragment"), 1L).otherwise(0L))
          .as("n_frag_stripped"),
        sum(when(col("had_tracking"), 1L).otherwise(0L))
          .as("n_tracking_stripped"))

  private val q194Sql =
    s"""$curlSql
       |SELECT source, CAST(count(*) AS BIGINT) AS n_urls,
       |  CAST(count(DISTINCT url) AS BIGINT) AS n_raw_distinct,
       |  CAST(count(DISTINCT canon_url) AS BIGINT) AS n_canon_distinct,
       |  CAST(sum(CASE WHEN had_scheme_case THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_scheme_case,
       |  CAST(sum(CASE WHEN had_host_case THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_host_case,
       |  CAST(sum(CASE WHEN had_default_port THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_port_stripped,
       |  CAST(sum(CASE WHEN had_fragment THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_frag_stripped,
       |  CAST(sum(CASE WHEN had_tracking THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_tracking_stripped
       |FROM curl GROUP BY source""".stripMargin

  // ---- q195: registrable-domain rollup + blocklist ------------------

  /** The inline blocklist — a lookup TABLE in production (broadcast
    * side of the anti-join; a few MB at any corpus size). */
  private val Blocklist =
    Seq("site7.com", "site13.net", "site21.org", "site33.com", "site2.net")

  /** Registrable domain / TLD off the canonical host. */
  private def withDomain(df: DataFrame): DataFrame = df
    .withColumn("domain",
      expr("concat_ws('.', slice(split(c_host, '[.]'), -2, 2))"))
    .withColumn("tld", expr("element_at(split(c_host, '[.]'), -1)"))

  /** q195: per-TLD rollup of the registrable-domain space with the
    * blocklist applied — total docs, blocked docs, and the kept
    * partition's doc/domain/char counts. The Spark side marks blocked
    * rows by BROADCAST left join against the blocklist frame (the
    * production anti-join shape — a literal IN-list would not survive
    * a real blocklist's size); one aggregation shuffle on tld. */
  private def q195(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val block = Blocklist.toDF("domain").withColumn("blocked", lit(1L))
    withDomain(curl(s, d))
      .join(broadcast(block), Seq("domain"), "left")
      .withColumn("b", coalesce(col("blocked"), lit(0L)))
      .groupBy(col("tld"))
      .agg(count(lit(1)).as("n_docs_total"),
        sum(col("b")).as("n_blocked"),
        sum(lit(1L) - col("b")).as("n_docs_kept"),
        countDistinct(when(col("b") === 0L, col("domain")))
          .as("n_domains_kept"),
        sum(when(col("b") === 0L, col("n_chars")).otherwise(0L))
          .as("sum_chars_kept"))
  }

  private val q195Sql = {
    val list = Blocklist.map("'" + _ + "'").mkString(", ")
    s"""$curlSql,
       |doms AS (
       |  SELECT n_chars,
       |    array_to_string(list_slice(string_split(c_host, '.'),
       |      len(string_split(c_host, '.')) - 1,
       |      len(string_split(c_host, '.'))), '.') AS domain,
       |    string_split(c_host, '.')[len(string_split(c_host, '.'))] AS tld
       |  FROM curl),
       |flagged AS (
       |  SELECT *, CASE WHEN domain IN ($list) THEN 1 ELSE 0 END AS b
       |  FROM doms)
       |SELECT tld, CAST(count(*) AS BIGINT) AS n_docs_total,
       |  CAST(sum(b) AS BIGINT) AS n_blocked,
       |  CAST(sum(1 - b) AS BIGINT) AS n_docs_kept,
       |  CAST(count(DISTINCT CASE WHEN b = 0 THEN domain END) AS BIGINT)
       |    AS n_domains_kept,
       |  CAST(sum(CASE WHEN b = 0 THEN n_chars ELSE 0 END) AS BIGINT)
       |    AS sum_chars_kept
       |FROM flagged GROUP BY tld""".stripMargin
  }

  // ---- q196: domain-attributed duplication --------------------------

  /** q196: WHERE the duplicates come from — global 5-word-prefix dup
    * groups (the leading-boilerplate key; exact-text dups are near
    * zero in this corpus, prefix dups run ~5%) with every non-first
    * member attributed to its registrable domain, rolled up per TLD:
    * doc/dup counts, corpus dup share, and the domain-weighted view
    * (mean and max per-domain dup share) that tells a curation
    * pipeline which domains to de-prioritize. Integer-exact bp. */
  private def q196(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("th")).orderBy(col("doc_id"))
    val perDom = withDomain(curl(s, d))
      .withColumn("th",
        expr("array_join(slice(split(text, ' '), 1, 5), ' ')"))
      .withColumn("is_dup",
        when(row_number().over(w) > 1, 1L).otherwise(0L))
      .groupBy(col("tld"), col("domain"))
      .agg(count(lit(1)).as("n_docs"), sum(col("is_dup")).as("n_dups"))
    perDom.groupBy(col("tld"))
      .agg(count(lit(1)).as("n_domains"),
        sum(col("n_docs")).as("n_docs"),
        sum(col("n_dups")).as("n_dup_docs"),
        expr("(10000L * sum(n_dups)) div sum(n_docs)").as("dup_bp"),
        expr("sum((10000L * n_dups) div n_docs) div count(1)")
          .as("avg_domain_dup_bp"),
        max(expr("(10000L * n_dups) div n_docs")).as("max_domain_dup_bp"))
  }

  private val q196Sql =
    s"""$curlSql,
       |doms AS (
       |  SELECT doc_id,
       |    array_to_string(list_slice(string_split(c_host, '.'),
       |      len(string_split(c_host, '.')) - 1,
       |      len(string_split(c_host, '.'))), '.') AS domain,
       |    string_split(c_host, '.')[len(string_split(c_host, '.'))] AS tld,
       |    array_to_string(list_slice(string_split(text, ' '), 1, 5), ' ')
       |      AS th
       |  FROM curl),
       |marked AS (
       |  SELECT tld, domain,
       |    CASE WHEN row_number() OVER (PARTITION BY th ORDER BY doc_id) > 1
       |      THEN 1 ELSE 0 END AS is_dup
       |  FROM doms),
       |per_dom AS (
       |  SELECT tld, domain, CAST(count(*) AS BIGINT) AS n_docs,
       |    CAST(sum(is_dup) AS BIGINT) AS n_dups
       |  FROM marked GROUP BY 1, 2)
       |SELECT tld, CAST(count(*) AS BIGINT) AS n_domains,
       |  CAST(sum(n_docs) AS BIGINT) AS n_docs,
       |  CAST(sum(n_dups) AS BIGINT) AS n_dup_docs,
       |  (10000 * CAST(sum(n_dups) AS BIGINT)) // CAST(sum(n_docs) AS BIGINT)
       |    AS dup_bp,
       |  CAST(sum((10000 * n_dups) // n_docs) AS BIGINT)
       |    // CAST(count(*) AS BIGINT) AS avg_domain_dup_bp,
       |  CAST(max((10000 * n_dups) // n_docs) AS BIGINT)
       |    AS max_domain_dup_bp
       |FROM per_dom GROUP BY 1""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q194_url_canonicalize", q194, Some(q194Sql)),
    QueryDef("q195_domain_rollup", q195, Some(q195Sql)),
    QueryDef("q196_domain_dup_stats", q196, Some(q196Sql)))
}
