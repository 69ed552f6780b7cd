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

  // ---- one-pass JVM kernel ------------------------------------------

  private lazy val multiSuffixSet: Set[String] = MultiSuffixes.toSet

  /** (canonical, domain) of one raw URL — the [[canonicalize]] +
    * [[urlDomain]] Column pair as ONE hand-rolled scan, for the hot
    * path: the Column tree costs several regex passes plus an
    * INTERPRETED higher-order transform per row (HOFs don't codegen),
    * ~40 µs/row at sf0.1; this kernel is one pass over the chars.
    * Semantics are pinned character-for-character equal to the Column
    * forms by UrlOpsSpec (incl. userinfo, overlapping %%-escapes,
    * trailing '?', fragments, portless/non-URL inputs) — the
    * kernel≡Column discipline of TextFunctions/DocProfile.
    */
  private[graft] def canonDomainKernel(raw: String): (String, String) = {
    if (raw == null) return (null, null)
    // Spark's trim(col) strips ASCII spaces only.
    var lo = 0
    var hi = raw.length
    while (lo < hi && raw.charAt(lo) == ' ') lo += 1
    while (hi > lo && raw.charAt(hi - 1) == ' ') hi -= 1
    val s = raw.substring(lo, hi)
    // scheme = ^[A-Za-z][A-Za-z0-9+.-]*://
    def schemeEnd: Int = {
      if (s.isEmpty) return -1
      val c0 = s.charAt(0)
      if (!(c0.isLetter && c0 < 128)) return -1
      var i = 1
      while (i < s.length && {
        val c = s.charAt(i)
        (c.isLetterOrDigit && c < 128) || c == '+' || c == '.' || c == '-'
      }) i += 1
      if (i + 2 < s.length && s.charAt(i) == ':' && s.charAt(i + 1) == '/' &&
        s.charAt(i + 2) == '/') i
      else -1
    }
    val se = schemeEnd
    if (se < 0) return (null, extractDomain(""))
    val sch = s.substring(0, se).toLowerCase
    val authStart = se + 3
    var authEnd = authStart
    while (authEnd < s.length && {
      val c = s.charAt(authEnd); c != '/' && c != '?' && c != '#'
    }) authEnd += 1
    val hostport = s.substring(authStart, authEnd)
    // userinfo: "(?:[^@]*@)?" — up to the FIRST '@'
    val at = hostport.indexOf('@')
    val afterUser = if (at >= 0) at + 1 else 0
    // host = [^:@]* from there
    var he = afterUser
    while (he < hostport.length && {
      val c = hostport.charAt(he); c != ':' && c != '@'
    }) he += 1
    val host = hostport.substring(afterUser, he).toLowerCase
    // port = ":([0-9]+)$" over the FULL hostport
    val colon = hostport.lastIndexOf(':')
    val port =
      if (colon >= 0 && colon < hostport.length - 1 &&
        hostport.substring(colon + 1).forall(c => c >= '0' && c <= '9'))
        hostport.substring(colon + 1)
      else ""
    // path+query: from authority end up to '#', trailing '?' dropped,
    // empty → "/"
    var pqEnd = authEnd
    while (pqEnd < s.length && s.charAt(pqEnd) != '#') pqEnd += 1
    var pq = s.substring(authEnd, pqEnd)
    if (pq.endsWith("?")) pq = pq.substring(0, pq.length - 1)
    if (pq.isEmpty) pq = "/"
    // uppercase the two chars after each '%'
    val sb = new java.lang.StringBuilder(pq.length)
    var i = 0
    while (i < pq.length) {
      val c = pq.charAt(i)
      if (i >= 1 && pq.charAt(i - 1) == '%') sb.append(c.toUpper)
      else if (i >= 2 && pq.charAt(i - 2) == '%') sb.append(c.toUpper)
      else sb.append(c)
      i += 1
    }
    val keepPort = port.nonEmpty &&
      !((sch == "http" && port == "80") || (sch == "https" && port == "443"))
    val canon =
      if (sch.isEmpty || host.isEmpty) null
      else sch + "://" + host + (if (keepPort) ":" + port else "") + sb.toString
    (canon, extractDomain(host))
  }

  /** [[registrableDomain]] as a JVM function — Spark split("\\.")
    * keeps trailing empties (limit −1), mirrored here.
    */
  private def extractDomain(host: String): String = {
    if (host == null) return null
    val labels = host.split("\\.", -1)
    val n = labels.length
    if (n <= 1) host
    else {
      val last2 = labels(n - 2) + "." + labels(n - 1)
      if (n >= 3 && multiSuffixSet.contains(last2))
        labels(n - 3) + "." + last2
      else last2
    }
  }

  /** `df` plus canonical-URL and registrable-domain columns via the
    * one-pass kernel (kernel ≡ Column forms pinned by spec).
    */
  def withCanonical(
      df: org.apache.spark.sql.DataFrame,
      urlCol: String,
      canonCol: String = "canon",
      domainCol: String = "domain"): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types.StringType
    val outSchema = df.schema.add(canonCol, StringType).add(domainCol, StringType)
    val enc = Encoders.row(outSchema)
    val idx = df.schema.fieldIndex(urlCol)
    df.mapPartitions { it =>
      it.map { r =>
        val (c, d) = canonDomainKernel(
          if (r.isNullAt(idx)) null else r.getString(idx))
        Row.fromSeq(r.toSeq :+ c :+ d)
      }
    }(enc)
  }
}
