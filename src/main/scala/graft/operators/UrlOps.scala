package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.expr
import graft.queries.{SparkSql, SqlDialect}

/** URL canonicalization + host extraction — the pre-text step of
  * web-crawl pipelines (CCNet, Wenzek et al. 2020, arXiv:1911.00359;
  * RefinedWeb, Penedo et al. 2023, arXiv:2306.01116): crawl rows are
  * keyed by a CANONICAL URL and filtered/weighted per HOST before any
  * text operator runs, because crawl noise clusters by site, and the
  * same page arrives under utm-decorated, fragment-bearing, www/port
  * spelling variants that must collapse to one key.
  *
  * Canonical form: lowercase scheme and host, strip one leading 'www.',
  * drop the default port of the scheme (http:80 / https:443 — others
  * kept), strip trailing slashes from the path ('' -> '/'), drop the
  * fragment, and drop tracking params (utm_*, ref=) preserving the
  * order of the rest. Userinfo (user@host) is out of scope.
  *
  * Everything is a scalar projection — ZERO shuffle at any scale — and
  * the regexes stay in the backslash-free subset (character classes
  * only), the one regime where both dialects compile the identical
  * pattern (the PiiRedaction discipline), so the DuckDB oracle runs the
  * SAME template. */
object UrlOps {

  private val d = SparkSql

  private val schemePat = "^([a-zA-Z][a-zA-Z0-9+.-]*)://"
  private val authPat = "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)"
  private val pathPat = "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)"

  /** Lowercased scheme ('' when `u` has none). */
  def schemeExpr(d: SqlDialect, u: String): String =
    s"lower(regexp_extract($u, '$schemePat', 1))"

  /** Canonical host: lowercased authority minus port and one leading
    * 'www.'; NULL when `u` has no scheme://authority shape at all
    * (garbage in, NULL out — '' would silently aggregate all junk rows
    * into one pseudo-host). */
  def hostExpr(d: SqlDialect, u: String): String = {
    val stripped = d.regexReplaceAll(
      d.regexReplaceAll("hp0", ":[0-9]+$", ""), "^www[.]", "")
    d.bind(s"lower(regexp_extract($u, '$authPat', 1))", "hp0",
      s"CASE WHEN hp0 = '' OR hp0 IS NULL THEN NULL ELSE $stripped END")
  }

  /** Full canonical URL (see object doc for the rules). The scheme and
    * authority extractions are lambda-bound so each regex runs once per
    * row, not once per use. */
  def canonUrlExpr(d: SqlDialect, u: String): String = {
    val host = d.regexReplaceAll(d.regexReplaceAll("hp", ":[0-9]+$", ""),
      "^www[.]", "")
    val port = s"regexp_extract(hp, ':([0-9]+)$$', 1)"
    val cpath = d.regexReplaceAll(s"regexp_extract($u, '$pathPat', 1)", "/+$", "")
    // query = text after the FIRST '?' that precedes any '#': [^#?]*
    // can't skip a '?' (so no backtracking onto a later one) and can't
    // cross a '#' (so a fragment's '?' never leaks into the query —
    // 'http://h/p#a?b' has NO query, not query 'b')
    val keptParams = d.filterBy(
      d.splitOn(s"regexp_extract($u, '^[^#?]*[?]([^#]*)', 1)", "&"), "kv",
      s"NOT (${d.regexLike("kv", "^utm_")} OR ${d.regexLike("kv", "^ref=")} OR kv = '')")
    // coalesce: DuckDB's array_to_string of an EMPTY list is NULL where
    // Spark's array_join is '' — normalize before the concat
    val cq = s"coalesce(${d.joinStr(keptParams, "&")}, '')"
    d.bind(schemeExpr(d, u), "sch",
      d.bind(s"lower(regexp_extract($u, '$authPat', 1))", "hp",
        d.bind(port, "pt",
          d.bind(cq, "cq",
            d.bind(cpath, "cp",
              // garbage in, NULL out (see hostExpr)
              s"CASE WHEN sch = '' OR sch IS NULL OR hp = '' OR hp IS NULL THEN NULL ELSE " +
                s"sch || '://' || $host" +
                s" || CASE WHEN pt = '' OR (sch = 'http' AND pt = '80')" +
                s" OR (sch = 'https' AND pt = '443') THEN '' ELSE ':' || pt END" +
                s" || CASE WHEN cp = '' THEN '/' ELSE cp END" +
                s" || CASE WHEN cq = '' THEN '' ELSE '?' || cq END END")))))
  }

  /** Adds `canon_url` and `host` columns — a pure projection, the key
    * every downstream per-domain aggregation and URL-level dedup groups
    * on. */
  def canonicalize(docs: DataFrame, urlCol: String): DataFrame =
    docs.withColumn("canon_url", expr(canonUrlExpr(d, urlCol)))
      .withColumn("host", expr(hostExpr(d, urlCol)))
}
