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
}
