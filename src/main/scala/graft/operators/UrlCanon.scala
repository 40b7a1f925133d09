package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization — the standard pre-text-dedup grouping key
  * for web corpora (crawl curation groups by canonical URL/host
  * BEFORE any content dedup, so near-identical `?utm_source=` /
  * `www.` / trailing-slash variants collapse first): lowercase
  * scheme+host, strip `www.`, strip scheme-default ports (`:80` for
  * http, `:443` for https — non-default ports survive), drop the
  * fragment, drop tracking parameters (`utm_*` prefix plus a pinned
  * denylist), sort the surviving query parameters, and normalize the
  * path (`""` → `/`, trailing slash stripped off non-root paths).
  *
  * Everything is `split_part`/`substr`/`filter`/`array_sort` string
  * algebra — identical semantics in any engine (both Spark and
  * DuckDB define out-of-range `split_part` as `''` and compare
  * strings bytewise), zero shuffle, codegen-friendly — so a 100-TB
  * canonicalization pass is one scan, and the canonical string
  * hash-checks cross-engine (q275).
  */
object UrlCanon {

  /** Query parameters that never change content identity (exact
    * names; `utm_*` is matched as a prefix on the raw param).
    */
  val TrackingParams: Seq[String] =
    Seq("fbclid", "gclid", "ref", "mc_cid", "mc_eid", "igshid", "spm")

  /** The canonical host alone (lowercased, `www.`/default-port
    * stripped) — the host-level rollup key.
    */
  def canonicalHost(url: Column): Column = parts(url)._2

  /** The full canonical URL string. */
  def canonicalize(url: Column): Column = {
    val (scheme, host, cpath, cq) = parts(url)
    concat(scheme, lit("://"), host, cpath,
      when(cq =!= "", concat(lit("?"), cq)).otherwise(lit("")))
  }

  private def parts(url: Column): (Column, Column, Column, Column) = {
    val scheme = lower(split_part(url, lit("://"), lit(1)))
    val rest = split_part(url, lit("://"), lit(2))
    val defrag = split_part(rest, lit("#"), lit(1))
    // host stops at the first '/' OR '?' (http://host?q=1 is valid)
    val hostport =
      split_part(split_part(defrag, lit("?"), lit(1)), lit("/"), lit(1))
    val remainder = defrag.substr(length(hostport) + 1, length(defrag))
    val path0 = split_part(remainder, lit("?"), lit(1))
    val query0 = split_part(remainder, lit("?"), lit(2))
    val h0 = lower(hostport)
    val h1 = when(h0.startsWith("www."), h0.substr(lit(5), length(h0)))
      .otherwise(h0)
    val h2 = when(scheme === "http" && h1.endsWith(":80"),
        h1.substr(lit(1), length(h1) - 3))
      .when(scheme === "https" && h1.endsWith(":443"),
        h1.substr(lit(1), length(h1) - 4))
      .otherwise(h1)
    val keep = filter(split(query0, "&"), p =>
      p =!= "" && !p.startsWith("utm_") &&
        !split_part(p, lit("="), lit(1)).isin(TrackingParams: _*))
    val cq = concat_ws("&", array_sort(keep))
    val p1 = when(path0 === "", "/").otherwise(path0)
    val cpath = when(length(p1) > 1 && p1.endsWith("/"),
      p1.substr(lit(1), length(p1) - 1)).otherwise(p1)
    (scheme, h2, cpath, cq)
  }

  /** Host-level rollup over canonicalized URLs: per canonical host,
    * the doc count, distinct raw vs canonical URL counts (their gap
    * is the variant collapse the canonicalization bought), and a
    * weight total (chars/tokens). One hash aggregate on the host key
    * — the grouping a crawl curation pipeline runs before content
    * dedup.
    */
  def hostStats(df: DataFrame, urlCol: String,
      weightCol: String): DataFrame =
    df.select(col(urlCol).as("_raw"),
        canonicalize(col(urlCol)).as("_canon"),
        canonicalHost(col(urlCol)).as("host"),
        col(weightCol).as("_w"))
      .groupBy(col("host"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("_raw")).as("n_raw_urls"),
        countDistinct(col("_canon")).as("n_canonical_urls"),
        sum(col("_w")).cast("long").as("sum_weight"))

  /** The URL pattern for outlink extraction from running text —
    * RE2/Java-portable (inline (?i) flag, no lookaround, ASCII
    * classes only; schemes appear uppercased in the wild).
    */
  val LinkPattern: String = "(?i)https?://[^\\s\"<>]+"

  /** Extract every outlink from `textCol` and canonicalize it: one
    * row per (idCol, url_raw, url_canon, host). The extraction is a
    * generator over a codegen'd regexp — no UDF; at 100 TB this is
    * one scan + explode.
    */
  def extractOutlinks(df: DataFrame, idCol: String,
      textCol: String): DataFrame =
    df.select(col(idCol),
        explode(regexp_extract_all(col(textCol), lit(LinkPattern),
          lit(0))).as("url_raw"))
      .select(col(idCol), col("url_raw"),
        canonicalize(col("url_raw")).as("url_canon"),
        canonicalHost(col("url_raw")).as("host"))

  /** Host-level outlink rollup: total links, distinct canonical
    * targets, and citing-doc counts per host — the link-graph
    * aggregate a crawl prioritizer reads.
    */
  def outlinkHostStats(df: DataFrame, idCol: String,
      textCol: String): DataFrame =
    extractOutlinks(df, idCol, textCol)
      .groupBy(col("host"))
      .agg(count(lit(1)).as("n_links"),
        countDistinct(col("url_canon")).as("n_distinct_targets"),
        countDistinct(col(idCol)).as("n_citing_docs"))

  /** Robots-style URL rule application: `rules` is a small
    * (host, path_prefix, allow) table — longest matching prefix on
    * the CANONICAL path wins, no match defaults to allowed. The rule
    * table is dimension-sized and broadcast; one aggregate per URL
    * row picks the winner (min over (-prefix_len, prefix) — the
    * pinned tie-break). Returns the input ids plus (host, path,
    * matched_prefix, allowed).
    */
  def applyUrlRules(urls: DataFrame, idCol: String, urlCol: String,
      rules: DataFrame): DataFrame = {
    val (_, host, cpath, _) = parts(col(urlCol))
    val base = urls.select(col(idCol), host.as("host"),
      cpath.as("path"))
    val r = rules.select(col("host").as("_rh"),
      col("path_prefix").as("_rp"), col("allow").as("_ra"))
    base.join(broadcast(r),
        col("host") === col("_rh") &&
          expr("startswith(path, _rp)"), "left")
      .groupBy(col(idCol), col("host"), col("path"))
      .agg(min(when(col("_rp").isNotNull,
          struct((-length(col("_rp"))).as("nl"), col("_rp").as("p"),
            col("_ra").as("a")))).as("_best"))
      .select(col(idCol), col("host"), col("path"),
        col("_best.p").as("matched_prefix"),
        coalesce(col("_best.a"), lit(true)).as("allowed"))
  }

  /** The DuckDB mirror of [[canonicalize]]/[[canonicalHost]] as CTE
    * SQL rooted on `src` (providing `idCol`, `urlCol`): emits
    * `url_canon_out` with (idCol, url_raw, scheme, host, url_canon)
    * — generated from the same TrackingParams so the denylist cannot
    * desync.
    */
  def oracleSelect(src: String, idCol: String, urlCol: String): String = {
    val denylist = TrackingParams.map(p => s"'$p'").mkString(", ")
    s"""uc_a AS (
       |  SELECT $idCol, $urlCol AS url_raw,
       |    lower(split_part($urlCol, '://', 1)) AS scheme,
       |    split_part(split_part($urlCol, '://', 2), '#', 1) AS defrag
       |  FROM $src),
       |uc_b AS (
       |  SELECT *, split_part(split_part(defrag, '?', 1), '/', 1)
       |    AS hostport
       |  FROM uc_a),
       |uc_c AS (
       |  SELECT *, substr(defrag, length(hostport) + 1) AS remainder,
       |    lower(hostport) AS h0
       |  FROM uc_b),
       |uc_d AS (
       |  SELECT *, split_part(remainder, '?', 1) AS path0,
       |    split_part(remainder, '?', 2) AS query0,
       |    CASE WHEN starts_with(h0, 'www.') THEN substr(h0, 5)
       |      ELSE h0 END AS h1
       |  FROM uc_c),
       |uc_e AS (
       |  SELECT *,
       |    CASE WHEN scheme = 'http' AND ends_with(h1, ':80')
       |        THEN substr(h1, 1, length(h1) - 3)
       |      WHEN scheme = 'https' AND ends_with(h1, ':443')
       |        THEN substr(h1, 1, length(h1) - 4)
       |      ELSE h1 END AS host,
       |    COALESCE(array_to_string(list_sort(list_filter(
       |      string_split(query0, '&'),
       |      p -> p <> '' AND NOT starts_with(p, 'utm_')
       |        AND NOT split_part(p, '=', 1) IN ($denylist))), '&'), '')
       |      AS cq,
       |    CASE WHEN path0 = '' THEN '/' ELSE path0 END AS p1
       |  FROM uc_d),
       |url_canon_out AS (
       |  SELECT $idCol, url_raw, scheme, host,
       |    scheme || '://' || host ||
       |    (CASE WHEN length(p1) > 1 AND ends_with(p1, '/')
       |       THEN substr(p1, 1, length(p1) - 1) ELSE p1 END) ||
       |    (CASE WHEN cq <> '' THEN '?' || cq ELSE '' END) AS url_canon
       |  FROM uc_e)""".stripMargin
  }
}
