package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** robots.txt compliance filtering with LONGEST-MATCH semantics (RFC
  * 9309 / the Google rule): per host, the matching rule with the
  * longest path pattern decides, and on a length tie Allow beats
  * Disallow. The crawl pipeline's very first gate — URLs fetched in
  * violation poison everything downstream legally and statistically.
  *
  * Matching implements the RFC's pattern grammar: `*` matches any
  * octet sequence, a trailing `$` anchors the match at the path end,
  * and an EMPTY rule matches nothing (an empty `Disallow:` line means
  * allow-all, not block-all). Percent-encodings are compared after
  * hex-case normalization (%2f ≡ %2F); full percent-DECODING
  * equivalence (%41 ≡ 'A') is deliberately out of scope — crawlers
  * normalize encodings at canonicalization time ([[UrlOps]]), not at
  * rule-match time.
  *
  * Scale shape: rules are per-host and tiny next to the URL corpus,
  * so the rule lookup is a broadcast-able equi join on host; rules
  * WITHOUT wildcards (the overwhelming majority in real robots files)
  * match on the codegen'd `startsWith` fast path, and only wildcard
  * rules pay a regex — precompiled once per rule row on the tiny
  * rules frame, never synthesized per URL. The longest-match argmax
  * is ONE keyed aggregate over an integer score (patternlen·2 +
  * allowBit — no struct comparison, no window), and unmatched URLs
  * never fan out (left join, score −2).
  */
object Robots {

  /** Path+query of a URL under the [[UrlOps]] canon rules: scheme and
    * authority stripped, fragment dropped, bare trailing '?' removed,
    * empty path → '/'. (Mirrors UrlOps.pathQuery; robots matching is
    * defined on exactly this slice.) */
  def pathQuery(url: Column): Column = {
    val pq = regexp_extract(trim(url),
      "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)", 1)
    when(regexp_replace(pq, "\\?$", "") === "", lit("/"))
      .otherwise(regexp_replace(pq, "\\?$", ""))
  }

  /** Uppercase the hex digits of every %XX escape so equivalently-
    * encoded octets compare equal (%2f ≡ %2F) on both the rule and
    * the path side. Scan-local: one zero-width split + transform. */
  def normalizePercent(c: Column): Column =
    array_join(transform(split(c, "(?=%[0-9A-Fa-f]{2})"), s =>
      when(s.rlike("^%[0-9A-Fa-f]{2}"),
        concat(lit("%"), upper(substring(s, 2, 2)),
          substring(s, 4, Int.MaxValue)))
        .otherwise(s)), "")

  /** The Java regex equivalent of an RFC 9309 rule pattern: regex
    * metacharacters escaped, `*` → `.*`, a trailing `$` kept as the
    * end anchor, the whole thing start-anchored. Evaluated on the
    * tiny rules frame only. */
  private def ruleRegex(rule: Column): Column = {
    val anchored = rule.endsWith("$")
    val body = when(anchored, rule.substr(lit(1), length(rule) - 1))
      .otherwise(rule)
    val escaped = regexp_replace(body,
      "([\\\\.\\[\\]{}()+?^$|])", "\\\\$1")
    val wild = regexp_replace(escaped, "\\*", ".*")
    concat(lit("^"), wild, when(anchored, lit("$")).otherwise(lit("")))
  }

  /** Verdict per URL row: `rules` carries (host, rule, allow); output
    * adds `verdict` ∈ allowed (no rule matched) / allowed_override
    * (an Allow rule won the longest match) / blocked.
    */
  def evaluate(urls: DataFrame, urlCol: String, idCols: Seq[String],
      rules: DataFrame): DataFrame =
    evaluateParsed(urls.select(idCols.map(col) :+
      UrlOps.host(col(urlCol)).as("host") :+
      pathQuery(col(urlCol)).as("path"): _*), idCols, rules)

  /** [[evaluate]] over an already-parsed (idCols…, host, path) frame —
    * for callers that also derive the RULES from the same parse (the
    * q_robots shape): parse once, checkpoint, reuse. */
  def evaluateParsed(u: DataFrame, idCols: Seq[String],
      rules: DataFrame): DataFrame = {
    val prepped = rules
      .withColumn("rule", normalizePercent(col("rule")))
      .withColumn("__wild",
        col("rule").contains("*") || col("rule").endsWith("$"))
      .withColumn("__rx", ruleRegex(col("rule")))
    val j = u.withColumn("path", normalizePercent(col("path")))
      .join(prepped, Seq("host"), "left")
    // Empty rules never match (RFC 9309: an empty Disallow value
    // disallows nothing); plain rules take the startsWith fast path.
    val matched = col("rule").isNotNull && length(col("rule")) > 0 &&
      when(col("__wild"), regexp_like(col("path"), col("__rx")))
        .otherwise(col("path").startsWith(col("rule")))
    val score = when(matched,
      length(col("rule")) * 2 + when(col("allow"), 1).otherwise(0))
      .otherwise(lit(-2))
    j.groupBy((idCols :+ "host").map(col): _*)
      .agg(max(score).as("__s"))
      .withColumn("verdict",
        when(col("__s") < 0, "allowed")
          .when(col("__s") % 2 === 1, "allowed_override")
          .otherwise("blocked"))
      .drop("__s")
  }
}
