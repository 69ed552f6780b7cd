package graft.text

import graft.SparkSpec

class RobotsSpec extends SparkSpec {
  import spark.implicits._

  private val rules = Seq(
    ("a.com", "/", false),            // full disallow
    ("b.com", "/shop", false),        // prefix disallow
    ("b.com", "/shop/sale", true),    // longer Allow overrides
    ("c.com", "/x", false),
    ("c.com", "/x", true)             // equal length: Allow wins
  ).toDF("host", "rule", "allow")

  private def verdicts(urls: (Long, String)*): Map[Long, String] =
    Robots.evaluate(urls.toDF("id", "url"), "url", Seq("id"), rules)
      .select("id", "verdict").as[(Long, String)].collect().toMap

  test("longest match decides; Allow overrides a shorter Disallow") {
    val v = verdicts(
      (1L, "http://b.com/shop/item1"),
      (2L, "http://b.com/shop/sale/item2"),
      (3L, "http://b.com/other"))
    assert(v == Map(1L -> "blocked", 2L -> "allowed_override",
      3L -> "allowed"))
  }

  test("full disallow blocks everything; unknown host is allowed") {
    val v = verdicts(
      (1L, "https://a.com/anything"),
      (2L, "https://zz.org/whatever"))
    assert(v == Map(1L -> "blocked", 2L -> "allowed"))
  }

  test("equal-length tie goes to Allow (RFC 9309)") {
    val v = verdicts((1L, "http://c.com/x/page"))
    assert(v == Map(1L -> "allowed_override"))
  }

  test("path slice: query kept, fragment dropped, empty path is /") {
    val v = verdicts(
      (1L, "http://b.com/shop?x=1#frag"),
      (2L, "http://a.com"))
    assert(v == Map(1L -> "blocked", 2L -> "blocked"))
  }

  private def verdictsWith(extraRules: Seq[(String, String, Boolean)],
      urls: (Long, String)*): Map[Long, String] =
    Robots.evaluate(urls.toDF("id", "url"), "url", Seq("id"),
        extraRules.toDF("host", "rule", "allow"))
      .select("id", "verdict").as[(Long, String)].collect().toMap

  test("* matches any octet sequence (RFC 9309 wildcard)") {
    val v = verdictsWith(Seq(("w.com", "/a/*/c", false)),
      (1L, "http://w.com/a/b/c"),
      (2L, "http://w.com/a//cx"),   // * matches empty, /c prefix holds
      (3L, "http://w.com/a/b/d"))
    assert(v == Map(1L -> "blocked", 2L -> "blocked", 3L -> "allowed"))
  }

  test("trailing $ anchors the match at the path end") {
    val v = verdictsWith(Seq(("w.com", "/doc.pdf$", false)),
      (1L, "http://w.com/doc.pdf"),
      (2L, "http://w.com/doc.pdf.html"),
      (3L, "http://w.com/docXpdf"))  // '.' must be literal, not regex-any
    assert(v == Map(1L -> "blocked", 2L -> "allowed", 3L -> "allowed"))
  }

  test("empty Disallow rule means allow-all, not block-all") {
    val v = verdictsWith(Seq(("w.com", "", false)),
      (1L, "http://w.com/anything"))
    assert(v == Map(1L -> "allowed"))
  }

  test("percent-encodings compare hex-case-insensitively") {
    val v = verdictsWith(Seq(("w.com", "/a%2Fb", false)),
      (1L, "http://w.com/a%2fb/page"),
      (2L, "http://w.com/a%2Fb/page"))
    assert(v == Map(1L -> "blocked", 2L -> "blocked"))
  }

  test("wildcard loses longest-match to a longer literal Allow") {
    val v = verdictsWith(Seq(
      ("w.com", "/shop/*", false),         // len 7
      ("w.com", "/shop/public", true)),    // len 12 wins
      (1L, "http://w.com/shop/public/x"),
      (2L, "http://w.com/shop/private/x"))
    assert(v == Map(1L -> "allowed_override", 2L -> "blocked"))
  }
}
