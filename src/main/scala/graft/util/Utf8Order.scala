package graft.util

import org.apache.spark.unsafe.types.UTF8String

/** UTF-8 BINARY string ordering — the order Spark's min/max (and
  * DuckDB's memcmp comparisons) actually use for StringType. Java's
  * `String.compareTo` orders by UTF-16 code units instead, and the two
  * diverge for supplementary-plane code points vs [U+E000, U+FFFF]
  * (a surrogate pair's lead unit 0xD800-0xDBFF sorts BELOW 0xE000 in
  * UTF-16 but its code point sorts ABOVE U+FFFF in UTF-8). Every
  * driver-side comparison against manifest string zone maps — which
  * were collected by Spark min/max, hence in UTF-8 order — must go
  * through this object, or a file containing a matching row can be
  * pruned silently ([[graft.plans.ZoneEval]], ADVICE r13).
  */
object Utf8Order {

  def compare(a: String, b: String): Int =
    UTF8String.fromString(a).compareTo(UTF8String.fromString(b))

  def lt(a: String, b: String): Boolean = compare(a, b) < 0
  def le(a: String, b: String): Boolean = compare(a, b) <= 0
  def gt(a: String, b: String): Boolean = compare(a, b) > 0
  def ge(a: String, b: String): Boolean = compare(a, b) >= 0

  def min(a: String, b: String): String = if (le(a, b)) a else b
  def max(a: String, b: String): String = if (ge(a, b)) a else b

  /** Smallest byte string GREATER (in UTF-8 binary order) than every
    * string having prefix `p`, as raw bytes — 0xFF never occurs in
    * valid UTF-8, so the last byte is always incrementable; only the
    * empty prefix (which every string extends) has no successor. The
    * result may not be valid UTF-8; it exists only to be compared,
    * via [[ltBytes]]. */
  def prefixSuccessor(p: String): Option[Array[Byte]] = {
    val b = p.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    if (b.isEmpty) None
    else {
      val c = b.clone()
      c(c.length - 1) = (c(c.length - 1) + 1).toByte
      Some(c)
    }
  }

  /** `a < succ` where `succ` came from [[prefixSuccessor]] — compared
    * as raw bytes in the same unsigned order as [[compare]]. */
  def ltBytes(a: String, succ: Array[Byte]): Boolean =
    UTF8String.fromString(a).compareTo(UTF8String.fromBytes(succ)) < 0
}
