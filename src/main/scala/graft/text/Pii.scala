package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Rule-based PII detection and redaction — the pre-training hygiene
  * pass that strips contact information from web corpora. Detection is
  * TOKEN-level over a case-preserving whitespace split, with
  * deliberately simple, ENGINE-PORTABLE rules: string primitives
  * (position/replace/length) where possible, and only regex constructs
  * whose semantics Java and RE2 share (anchored `[0-9]{1,3}` classes —
  * no lookaround, no backreferences), so a SQL oracle replays the
  * classification bit for bit. A production pass would add punctuation
  * stripping and checksum validation per PII type; the pipeline shape
  * (explode → classify → re-assemble) is the real contract.
  *
  * Precedence: email > IP > phone (an email's digits would otherwise
  * phone-match, an IP's would too). [[redact]] replaces every flagged
  * token with the `<PII>` sentinel and re-joins on single spaces.
  * All pure codegen'd Column expressions; scan-local, no shuffle.
  */
object Pii {

  /** Case-preserving whitespace tokens (unlike
    * [[TextFunctions.tokens]], which lowercases — redaction must not
    * rewrite the text it keeps).
    */
  def rawTokens(text: Column): Column =
    filter(split(text, "\\s+"), t => length(t) > 0)

  /** Exactly one '@' with a non-empty local part and a dotted,
    * non-degenerate domain ("a@b.c" shapes).
    */
  def emailLike(t: Column): Column = {
    val at = instr(t, "@")
    val domain = substr(t, (at + 1).cast("int"), lit(1000000))
    (length(t) - length(regexp_replace(t, "@", ""))) === 1 &&
      at >= 2 &&
      length(domain) >= 3 &&
      instr(domain, ".") >= 2 &&
      !domain.endsWith(".")
  }

  /** Four dot-separated 1-3 digit groups, whole token. */
  def ipLike(t: Column): Column =
    t.rlike("^[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}$")

  /** 7-15 digits once separators are stripped, with at most 5
    * separator characters — "+1-555-0123" shapes.
    */
  def phoneLike(t: Column): Column = {
    val digits = regexp_replace(t, "[^0-9]", "")
    length(digits).between(7, 15) && (length(t) - length(digits)) <= 5
  }

  /** (n_emails, n_phones, n_ips) over a token array column, with the
    * email > IP > phone precedence applied.
    */
  def emailCount(toks: Column): Column = size(filter(toks, t => emailLike(t)))
  def ipCount(toks: Column): Column =
    size(filter(toks, t => !emailLike(t) && ipLike(t)))
  def phoneCount(toks: Column): Column =
    size(filter(toks, t => !emailLike(t) && !ipLike(t) && phoneLike(t)))

  /** The text with every flagged token replaced by `<PII>`, re-joined
    * on single spaces (whitespace-normalized, case preserved).
    */
  def redact(text: Column): Column =
    array_join(
      transform(rawTokens(text), t =>
        when(emailLike(t) || ipLike(t) || phoneLike(t), lit("<PII>")).otherwise(t)),
      " ")
}
