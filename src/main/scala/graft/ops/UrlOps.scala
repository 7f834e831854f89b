package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization for web-corpus curation (the normalize-then-key
  * step in front of URL/host-level dedup — cf. the reference's
  * date-from-URL extraction, R/_pull_data.R, which likewise treats the
  * URL as a structured key, and common-crawl-style curation where the
  * canonical URL is the dedup identity).
  *
  * Every rule is a plain `regexp_replace`/`lower` chain — whole-stage
  * codegen'd, engine-portable (the same POSIX-class-free patterns run
  * in DuckDB/Postgres verbatim), and a pure per-row map: canonicalizing
  * 100 TB of URLs shuffles nothing.
  */
object UrlOps {

  /** Canonical form:
    *   - scheme and host lowercased (path/query case is significant)
    *   - `www.` host prefix dropped
    *   - default ports stripped (`:80` for http, `:443` for https)
    *   - fragment dropped
    *   - tracking params dropped (`utm_*`, `fbclid`, `gclid`), the
    *     query's `?`/`&` structure re-normalized, empty query dropped
    *   - trailing slash stripped
    */
  def canonicalizeUrl(url: Column): Column = {
    // lowercase scheme://host[:port] only — split at the first '/'
    // after the authority; everything before it is case-insensitive
    val schemeHostLowered = concat(
      lower(regexp_extract(url, "^([^/]*//[^/]*)", 1)),
      regexp_replace(url, "^[^/]*//[^/]*", ""))
    val noWww = regexp_replace(schemeHostLowered,
      "^(https?://)www\\.", "$1")
    val noDefaultPort = regexp_replace(
      regexp_replace(noWww, "^(https://[^/:]+):443(/|$)", "$1$2"),
      "^(http://[^/:]+):80(/|$)", "$1$2")
    val noFragment = regexp_replace(noDefaultPort, "#.*$", "")
    // drop tracking params wherever they sit, then fix separators:
    // "?&" -> "?", "&&" -> "&", trailing "?"/"&" -> ""
    val noTracking = regexp_replace(noFragment,
      "(utm_[A-Za-z0-9_]*|fbclid|gclid)=[^&#]*&?", "")
    val fixedSeps = regexp_replace(
      regexp_replace(noTracking, "\\?&", "?"),
      "[?&]+$", "")
    regexp_replace(fixedSeps, "(.)/$", "$1")
  }

  /** Registrable host of a canonical URL (authority with port removed). */
  def host(canonicalUrl: Column): Column =
    regexp_extract(canonicalUrl, "^[^/]*//([^/:]+)", 1)
}
