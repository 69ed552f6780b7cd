package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML → training-text extraction (round-9 directive #2) — the FIRST
  * stage of every crawl pipeline, upstream of all 20+ text operators
  * here: real corpora start at HTML, not clean text.
  *
  * Pipeline (public heuristics; the line-density gate is the jusText
  * shape reduced to engine-replayable integer arithmetic):
  *   1. drop <script>/<style> elements WITH their content (a script
  *      body is never training text, and may contain markup-looking
  *      strings) and <!-- comments -->;
  *   2. turn block-closing tags (</p>, </div>, </h1>…, <br>) into
  *      newlines so block structure survives the strip;
  *   3. strip every remaining tag;
  *   4. decode the core entities (&nbsp; &lt; &gt; &quot; &#39;
  *      &amp; — &amp; LAST, the standard order that avoids
  *      double-decoding);
  *   5. per line: collapse whitespace, trim, then keep only lines
  *      that look like prose — ≥ `minWords` words AND letters make up
  *      at least half the characters (`2·alpha ≥ len`, a PURE INTEGER
  *      comparison: no float ratio can flake a cross-engine gate).
  *
  * Everything is a single codegen'd Column expression (regexp chains +
  * array lambdas) — scan-local, no shuffle, no UDF; the DuckDB oracle
  * runs the literally-identical regex/list pipeline.
  *
  * Limits (documented, not silent): entity decoding covers the six
  * core entities, not the full HTML5 table; step 4 may reintroduce
  * literal '<' from &lt; (matching the oracle bit-for-bit — the tag
  * strip runs before decode by design).
  */
object Extract {

  /** Block-level closers (+ <br>) that become line breaks. */
  private val BlockBreak =
    "(?i)<(br|/p|/div|/h[1-6]|/li|/tr|/td|/table|/ul|/ol|/section|/article|/header|/footer|/nav|/title|/head)[^>]*>"

  /** Steps 1-4 + per-line whitespace normalization: the array of
    * trimmed, entity-decoded lines (blanks still included).
    */
  private def cleanedLines(html: Column): Column = {
    val noScript = regexp_replace(html, "(?is)<script[^>]*>.*?</script\\s*>", " ")
    val noStyle = regexp_replace(noScript, "(?is)<style[^>]*>.*?</style\\s*>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val withBreaks = regexp_replace(noComment, BlockBreak, "\n")
    val noTags = regexp_replace(withBreaks, "(?s)<[^>]*>", " ")
    val decoded = Seq(
      "&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&#39;" -> "'", "&amp;" -> "&")
      .foldLeft(noTags) { case (acc, (ent, ch)) =>
        call_function("replace", acc, lit(ent), lit(ch))
      }
    transform(split(decoded, "\n"), l => trim(regexp_replace(l, "\\s+", " ")))
  }

  /** The prose-line predicate of step 5. */
  private def prose(l: Column, minWords: Int): Column =
    size(split(l, " ")) >= minWords &&
      length(regexp_replace(l, "[^a-zA-Z]", "")) * 2 >= length(l)

  /** The extracted prose of an HTML column: kept lines joined by \n. */
  def text(html: Column, minWords: Int = 3): Column =
    array_join(filter(cleanedLines(html), l => prose(l, minWords)), "\n")

  /** Boilerplate diagnostic: (non-blank lines, kept prose lines) —
    * chrome-heavy pages keep few. Integer counts only; the caller
    * forms the ratio.
    */
  def lineCounts(html: Column, minWords: Int = 3): (Column, Column) = {
    val nonBlank = filter(cleanedLines(html), l => length(l) > 0)
    val kept = filter(nonBlank, l => prose(l, minWords))
    (size(nonBlank).cast("long"), size(kept).cast("long"))
  }
}
