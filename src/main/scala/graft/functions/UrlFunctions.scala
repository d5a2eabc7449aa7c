package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization for crawl dedup — the normalization every web
  * corpus applies before exact dedup so that tracking-parameter noise,
  * host-case variation, fragments, and trailing slashes don't hide
  * duplicate fetches of the same resource.
  *
  * Rules (each a plain regex, mirrored 1:1 in the DuckDB oracle):
  *   1. drop the fragment (`#...`);
  *   2. lowercase the host (NEVER the path/query — those are
  *      case-sensitive per RFC 3986);
  *   3. strip `utm_*` tracking parameters from the query, keeping
  *      everything else in original order;
  *   4. strip a trailing slash from the path;
  *   5. drop the `?` when the query string becomes empty.
  *
  * Pure map-side column work — canonicalization never shuffles; the
  * dedup that follows groups on the canonical string.
  */
object UrlFunctions {

  /** Canonical form of an http(s) URL column per the rules above. */
  def canonicalUrl(url: Column): Column = {
    val u1 = regexp_replace(url, "#.*$", "")
    val scheme = regexp_extract(u1, "^(https?)://", 1)
    val host = regexp_extract(u1, "^https?://([^/?]+)", 1)
    val path = regexp_replace(
      regexp_extract(u1, "^https?://[^/?]+([^?]*)", 1), "/$", "")
    val q = regexp_replace(
      regexp_replace(regexp_extract(u1, "\\?(.*)$", 1),
        "(^|&)utm_[^&]*", ""),
      "^&+", "")
    concat(lower(scheme), lit("://"), lower(host), path,
      when(q =!= "", concat(lit("?"), q)).otherwise(lit("")))
  }

  /** The same five rules as DuckDB SQL over a url-typed expression. */
  def canonicalUrlSql(e: String): String = {
    val u1 = s"regexp_replace($e, '#.*$$', '')"
    val scheme = s"lower(regexp_extract($u1, '^(https?)://', 1))"
    val host = s"lower(regexp_extract($u1, '^https?://([^/?]+)', 1))"
    val path = s"regexp_replace(regexp_extract($u1, '^https?://[^/?]+([^?]*)', 1), '/$$', '')"
    val q = s"regexp_replace(regexp_replace(regexp_extract($u1, '\\?(.*)$$', 1), '(^|&)utm_[^&]*', '', 'g'), '^&+', '')"
    s"$scheme || '://' || $host || $path || " +
      s"CASE WHEN $q <> '' THEN '?' || $q ELSE '' END"
  }
}
