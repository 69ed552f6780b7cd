package graft.text

import org.apache.spark.sql.functions._
import graft.SparkSpec

class UrlOpsSpec extends SparkSpec {
  import spark.implicits._

  private def canonOne(url: String): (String, String) = {
    val r = Seq(url).toDF("url")
      .select(UrlOps.canonicalize(col("url")).as("c"),
        UrlOps.urlDomain(col("url")).as("d"))
      .head()
    (r.getString(0), r.getString(1))
  }

  test("scheme/host lowercase, default port drop, fragment strip, empty path → /") {
    assert(canonOne("HTTP://WWW.Example.COM:80#top")._1 == "http://www.example.com/")
    assert(canonOne("https://Example.com:443/a/b?x=1#frag")._1 == "https://example.com/a/b?x=1")
    // Non-default port survives; empty query '?' dropped.
    assert(canonOne("http://example.com:8080/a?")._1 == "http://example.com:8080/a")
    // https on port 80 is NOT a default — kept.
    assert(canonOne("https://example.com:80/")._1 == "https://example.com:80/")
  }

  test("userinfo stripped; percent-escape hex uppercased") {
    assert(canonOne("http://user:pw@Example.com/p%2fq%3ax")._1 ==
      "http://example.com/p%2Fq%3Ax")
    // Escapes in the QUERY normalize too; '%' itself untouched.
    assert(canonOne("http://e.com/a?b=%7e1")._1 == "http://e.com/a?b=%7E1")
  }

  test("non-URL values canonicalize to null") {
    assert(canonOne("not a url")._1 == null)
    assert(canonOne("mailto:x@y.com")._1 == null) // no ://
  }

  test("registrable domain: suffix rules, bare suffix, single label") {
    assert(canonOne("http://www.shop.example.co.uk/")._2 == "example.co.uk")
    assert(canonOne("http://a.b.github.io/")._2 == "b.github.io")
    assert(canonOne("http://www.example.com/")._2 == "example.com")
    assert(canonOne("http://deep.sub.tree.example.org/")._2 == "example.org")
    assert(canonOne("http://co.uk/")._2 == "co.uk") // host IS the suffix
    assert(canonOne("http://localhost/")._2 == "localhost")
  }
}
