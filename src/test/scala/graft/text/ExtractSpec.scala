package graft.text

import org.apache.spark.sql.functions._
import graft.SparkSpec

class ExtractSpec extends SparkSpec {
  import spark.implicits._

  private def extractOne(html: String, minWords: Int = 3): String =
    Seq(html).toDF("html")
      .select(Extract.text(col("html"), minWords).as("t"))
      .head().getString(0)

  test("boilerplate drops: script+style bodies, comments, nav chrome, numeric junk") {
    val html =
      """<html><head><style>p{color:red}</style>
        |<script>var secret = "<p>do not leak this prose</p>";</script></head>
        |<body><div>home</div><div>about</div><div>login</div>
        |<!-- tracking pixel -->
        |<p>the quick brown fox jumps over the lazy dog</p>
        |<div>4 8 15 16 23 42</div>
        |<footer>c 2026</footer></body></html>""".stripMargin
    val got = extractOne(html)
    assert(got == "the quick brown fox jumps over the lazy dog")
    assert(!got.contains("secret") && !got.contains("leak"))
    assert(!got.contains("home") && !got.contains("login"))
    assert(!got.contains("42"))
  }

  test("entities decode in the standard order (&amp; last)") {
    val got = extractOne("<p>a &lt;b&gt; c &quot;d&quot; e&#39;s &amp; more&nbsp;here</p>")
    assert(got == "a <b> c \"d\" e's & more here")
    // &amp;lt; must become the literal text "&lt;", NOT "<".
    val doubled = extractOne("<p>one two &amp;lt; three four</p>")
    assert(doubled == "one two &lt; three four")
  }

  test("block closers keep paragraph boundaries; inline tags do not split lines") {
    val got = extractOne(
      "<p>first paragraph has words</p><p>second paragraph also has words</p>" +
        "<p>an <b>inline bold</b> stays on one line</p>")
    assert(got.split("\n").toSeq == Seq(
      "first paragraph has words",
      "second paragraph also has words",
      "an inline bold stays on one line"))
  }

  test("prose gate is integer-exact at the half-alpha boundary") {
    // "ab cd ef" → len 8, alpha 6, 2·6 ≥ 8 → kept.
    assert(extractOne("<p>ab cd ef</p>") == "ab cd ef")
    // "a1 b2 c3 d4" → len 11, alpha 4, 8 < 11 → dropped.
    assert(extractOne("<p>a1 b2 c3 d4</p>") == "")
  }

  test("lineCounts: chrome-heavy page keeps few lines") {
    val html = "<div>home</div><div>login</div><div>search</div>" +
      "<p>actual readable prose sits here</p>"
    val (tot, kept) = Extract.lineCounts(col("html"))
    val r = Seq(html).toDF("html").select(tot.as("t"), kept.as("k")).head()
    assert(r.getLong(0) == 4L && r.getLong(1) == 1L)
  }
}
