package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization + registrable-domain extraction (round-9
  * directive #3) — the missing link between raw crawl URLs and the
  * graph/grouping operators: PageRank motivates itself as a
  * crawl-source quality prior but needs an edge list over DOMAINS,
  * and every per-domain aggregation (grouped sketches, domain stats)
  * needs a canonical domain key.
  *
  * Canonical form (RFC 3986 normalizations that are safe without
  * touching semantics):
  *   - scheme and host lowercased; userinfo stripped;
  *   - default ports dropped (http:80, https:443), others kept;
  *   - fragment stripped; empty path → '/'; a bare trailing '?' (empty
  *     query) dropped;
  *   - percent-escape hex uppercased (%2f → %2F) via a per-character
  *     pass — both engines index the same string the same way, so the
  *     pass replays exactly. Input is assumed RFC-escaped (a literal
  *     stray '%' is treated as an escape opener — documented).
  *
  * Registrable domain: longest-match against an EMBEDDED public-suffix
  * subset (the high-traffic 2-label rules; no network fetch — the rule
  * list ships with the library and is trivially extended). host →
  * last 2 labels, or last 3 when the last 2 are themselves a public
  * suffix (co.uk, github.io, …).
  *
  * Everything is a Column expression (regexp_extract decomposition +
  * one char-level transform) — scan-local, codegen'd, no UDF; the
  * DuckDB oracle mirrors each stage literally.
  */
object UrlOps {

  /** Embedded 2-label public-suffix rules (public suffix list subset). */
  val MultiSuffixes: Seq[String] = Seq(
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk",
    "co.jp", "ne.jp", "or.jp", "ac.jp",
    "com.au", "net.au", "org.au", "edu.au",
    "com.br", "net.br", "org.br",
    "com.cn", "net.cn", "org.cn",
    "com.mx", "com.ar", "com.tr", "com.sg", "com.hk", "com.tw",
    "co.in", "co.kr", "co.nz", "co.za", "co.id", "co.th",
    "github.io", "gitlab.io", "blogspot.com", "wordpress.com")

  private val SchemeRe = "^([A-Za-z][A-Za-z0-9+.-]*)://"

  /** Lowercased scheme ('' when the value is not a scheme://… URL). */
  def scheme(url: Column): Column =
    lower(regexp_extract(trim(url), SchemeRe, 1))

  /** Lowercased host: authority minus userinfo and port. */
  def host(url: Column): Column = {
    val hostport = regexp_extract(trim(url), SchemeRe + "([^/?#]*)", 2)
    lower(regexp_extract(hostport, "^(?:[^@]*@)?([^:@]*)", 1))
  }

  /** Explicit port digits ('' when absent). */
  def port(url: Column): Column = {
    val hostport = regexp_extract(trim(url), SchemeRe + "([^/?#]*)", 2)
    regexp_extract(hostport, ":([0-9]+)$", 1)
  }

  /** Path+query with the fragment stripped; '' when absent. */
  private def pathQuery(url: Column): Column = {
    val pq = regexp_extract(trim(url), SchemeRe + "[^/?#]*([^#]*)", 2)
    // empty path → '/': bare trailing '?' (empty query) dropped.
    when(regexp_replace(pq, "\\?$", "") === "", lit("/"))
      .otherwise(regexp_replace(pq, "\\?$", ""))
  }

  /** Uppercase the two hex chars of every %-escape: split on '%' and
    * uppercase the first two chars of every fragment AFTER the first —
    * exactly "a char is uppercased iff one of the two preceding chars
    * is '%'" ('%' itself and short/empty fragments are fixed points of
    * upper, so overlapping escapes like "%%2f" agree too). O(len):
    * the split materializes the source string ONCE and the lambda
    * touches short fragments. The first cut walked every character
    * through a lambda whose substr calls re-evaluated the
    * regexp-extracted SOURCE expression per character (higher-order
    * functions are interpreted, no subexpression reuse) — 64 s at
    * sf0.1 for what is now sub-second.
    */
  private def pctUpper(s: Column): Column = {
    val parts = split(s, "%", -1)
    val head = element_at(parts, 1)
    val tail = transform(
      slice(parts, lit(2), greatest(size(parts) - 1, lit(0))),
      frag => concat(upper(substring(frag, 1, 2)),
        frag.substr(lit(3), greatest(length(frag) - 2, lit(0)))))
    array_join(concat(array(head), tail), "%")
  }

  /** The canonical URL (null for values that are not scheme://… URLs). */
  def canonicalize(url: Column): Column = {
    val sch = scheme(url)
    val h = host(url)
    val p = port(url)
    val keepPort = p =!= "" &&
      !((sch === "http" && p === "80") || (sch === "https" && p === "443"))
    val portPart = when(keepPort, concat(lit(":"), p)).otherwise(lit(""))
    val canon = concat(sch, lit("://"), h, portPart, pctUpper(pathQuery(url)))
    when(sch === "" || h === "", lit(null).cast("string")).otherwise(canon)
  }

  /** Registrable domain of a (lowercased) host: last 2 labels, or
    * last 3 when the last 2 are an embedded public suffix. Single-
    * label hosts return themselves.
    */
  def registrableDomain(hostCol: Column): Column = {
    val labels = split(hostCol, "\\.")
    val n = size(labels)
    val last2 = concat_ws(".", element_at(labels, -2), element_at(labels, -1))
    val last3 = concat_ws(".",
      element_at(labels, -3), element_at(labels, -2), element_at(labels, -1))
    when(n <= 1, hostCol)
      .when(n >= 3 && last2.isin(MultiSuffixes: _*), last3)
      .otherwise(last2)
  }

  /** Registrable domain straight from a raw URL. */
  def urlDomain(url: Column): Column = registrableDomain(host(url))
}
