package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL normalization for web-scale corpus curation — the step every crawl
  * pipeline runs BEFORE url-level dedup and per-domain caps: the same page
  * arrives as `HTTP://WWW.Site.com/a/`, `http://site.com:80/a?utm_source=x`
  * and `http://site.com/a#frag`, and without canonicalization url-dedup
  * keeps all three (RefinedWeb/CCNet both canonicalize first for exactly
  * this reason).
  *
  * Every function is a pure `Column` expression over built-in regexp /
  * string functions — no UDFs, no java.net.URI (driver-side parsing would
  * not distribute) — so canonicalization runs inside whole-stage codegen at
  * scan speed and a SQL oracle can replay it verbatim. Patterns stay inside
  * the RE2-safe subset (no lookahead/backreferences).
  *
  * Deliberate non-goals, documented so callers know the contract:
  * query-parameter ORDER is preserved (sorting params needs an
  * explode/reassemble pass — run url-dedup on the canonical form plus a
  * sorted-param fingerprint if param-order aliasing matters); IDN hosts are
  * passed through un-punycoded; percent-encoding is not normalized.
  */
object Urls {

  /** Tracking parameters stripped by [[canonicalize]]: the analytics /
    * click-id params that fan one logical URL out into thousands of
    * crawl-distinct ones.
    */
  val TrackingParams = "utm_[A-Za-z]+|fbclid|gclid|msclkid|mc_eid|igshid"

  private def scheme(u: Column): Column =
    lower(regexp_extract(u, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))

  private def hostPort(u: Column): Column =
    lower(regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))

  /** Lowercased host with any port and a leading `www.` stripped. */
  def host(u: Column): Column =
    regexp_replace(
      regexp_replace(hostPort(u), ":[0-9]+$", ""), "^www\\.", "")

  /** Canonical absolute URL:
    *  - fragment dropped;
    *  - scheme and host lowercased, leading `www.` dropped;
    *  - default ports (`:80` http, `:443` https) dropped, others kept;
    *  - [[TrackingParams]] stripped from the query, separators repaired,
    *    an emptied query dropped entirely;
    *  - one trailing `/` stripped from the path, empty path rendered `/`.
    */
  def canonicalize(url: Column): Column = {
    val u = regexp_replace(url, "#.*$", "") // fragment first: cheap, anchors the rest
    val sch = scheme(u)
    val hp = hostPort(u)
    val prt = regexp_extract(hp, ":([0-9]+)$", 1)
    val keepPort = prt =!= "" &&
      !((sch === "https" && prt === "443") || (sch === "http" && prt === "80"))
    val rest = regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(.*)$", 1)
    val path = regexp_extract(rest, "^([^?]*)", 1)
    val query = regexp_extract(rest, "\\?(.*)$", 1)
    val cleaned = regexp_replace(
      regexp_replace(query, s"(?:^|&)(?:$TrackingParams)=[^&]*", ""),
      "^&", "")
    val p1 = regexp_replace(path, "/$", "")
    val canonPath = when(p1 === "", lit("/")).otherwise(p1)
    concat(sch, lit("://"), host(u),
      when(keepPort, concat(lit(":"), prt)).otherwise(lit("")),
      canonPath,
      when(cleaned =!= "", concat(lit("?"), cleaned)).otherwise(lit("")))
  }

  /** Two-level public suffixes for [[registeredDomain]] — a deliberately
    * small STUB of the Mozilla public-suffix list (the full list is ~9k
    * entries and ships as data, not code; swap it in via the `suffixes`
    * parameter in production). Covers the common ccTLD second-level zones.
    */
  val DefaultMultiSuffixes: Seq[String] = Seq(
    "co.uk", "org.uk", "ac.uk", "gov.uk", "com.au", "net.au", "org.au",
    "co.jp", "or.jp", "ne.jp", "com.br", "com.cn", "com.mx", "co.in",
    "co.kr", "co.za", "com.tr", "com.ar")

  /** Registered (pay-level) domain of a HOST column: the last two labels,
    * or three when the last two are a listed multi-label public suffix —
    * the key per-domain caps and domain-reputation scores group by
    * (`a.blog.example.co.uk` → `example.co.uk`). Hosts with fewer labels
    * than needed (bare TLDs, localhost, IPs are out of scope) pass
    * through unchanged.
    */
  def registeredDomain(hostCol: Column,
                       suffixes: Seq[String] = DefaultMultiSuffixes)
  : Column = {
    val last2 = regexp_extract(hostCol, "([^.]+\\.[^.]+)$", 1)
    val last3 = regexp_extract(hostCol, "([^.]+\\.[^.]+\\.[^.]+)$", 1)
    when(last2.isin(suffixes: _*) && last3 =!= "", last3)
      .otherwise(when(last2 =!= "", last2).otherwise(hostCol))
  }
}
