package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** robots.txt compliance filtering with LONGEST-MATCH semantics (RFC
  * 9309 / the Google rule): per host, the matching rule with the
  * longest path prefix decides, and on a length tie Allow beats
  * Disallow. The crawl pipeline's very first gate — URLs fetched in
  * violation poison everything downstream legally and statistically.
  *
  * Scale shape: rules are per-host and tiny next to the URL corpus,
  * so the rule lookup is a broadcast-able equi join on host; the
  * longest-match argmax is ONE keyed aggregate over an integer
  * score (matchlen·2 + allowBit — no struct comparison, no window),
  * and unmatched URLs never fan out (left join, score −2).
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
    val j = u.join(rules, Seq("host"), "left")
    val matched = col("rule").isNotNull &&
      col("path").startsWith(col("rule"))
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
