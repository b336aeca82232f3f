package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization for web-corpus dedup — the standard first pass
  * before any content dedup: a crawl sees the same page under scheme/case
  * variants, default ports, tracking params in shuffled order, fragments,
  * and trailing slashes (cf. the C4/CCNet preprocessing convention of
  * URL-level dedup before text-level). Everything here is built from
  * `org.apache.spark.sql.functions` only — the whole canonicalization
  * stays inside whole-stage codegen, no UDF.
  *
  * Rules (each mirrors a DuckDB-expressible transform so the gate can
  * oracle it):
  *  - scheme and host lower-cased;
  *  - default ports stripped (`:80` for http, `:443` for https);
  *  - fragment dropped;
  *  - tracking params dropped (`utm_*`, `fbclid`, `gclid`, `ref`,
  *    `mc_cid`, `mc_eid`), remaining params sorted byte-wise;
  *  - trailing slashes stripped from the path;
  *  - `?` dropped when no params survive.
  */
object UrlFunctions {

  val TrackingParams: Seq[String] =
    Seq("fbclid", "gclid", "ref", "mc_cid", "mc_eid")

  def canonicalizeUrl(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "^([A-Za-z]+)://", 1))
    // everything after scheme and before any fragment
    val rest = regexp_extract(url, "^[A-Za-z]+://([^#]*)", 1)
    val hostport = lower(regexp_extract(rest, "^([^/?]+)", 1))
    val host = when(scheme === "http", regexp_replace(hostport, ":80$", ""))
      .when(scheme === "https", regexp_replace(hostport, ":443$", ""))
      .otherwise(hostport)
    val path = regexp_replace(
      regexp_extract(rest, "^[^/?]+([^?]*)", 1), "/+$", "")
    val query = regexp_extract(rest, "\\?(.*)$", 1)
    val kept = array_sort(filter(split(query, "&"), p =>
      !(p.startsWith("utm_") ||
        array_contains(
          lit(TrackingParams.toArray), split(p, "=").getItem(0)))))
    val queryOut = array_join(kept, "&")
    concat(scheme, lit("://"), host, path,
      when(length(queryOut) > 0, concat(lit("?"), queryOut)).otherwise(lit("")))
  }

  /** The matching canonical-host column (for per-domain stats/mixing). */
  def canonicalHost(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "^([A-Za-z]+)://", 1))
    val hostport = lower(regexp_extract(url, "^[A-Za-z]+://([^/?#]+)", 1))
    when(scheme === "http", regexp_replace(hostport, ":80$", ""))
      .when(scheme === "https", regexp_replace(hostport, ":443$", ""))
      .otherwise(hostport)
  }
}
