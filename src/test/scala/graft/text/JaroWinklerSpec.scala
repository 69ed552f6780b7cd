package graft.text

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.SparkSpec

class JaroWinklerSpec extends SparkSpec {

  private def jw(a: String, b: String): Double =
    JaroWinkler.sim(UTF8String.fromString(a), UTF8String.fromString(b))

  test("textbook values") {
    assert(math.abs(jw("MARTHA", "MARHTA") - 0.9611111111111111) < 1e-15)
    assert(math.abs(jw("DWAYNE", "DUANE") - 0.84) < 1e-15)
    assert(math.abs(jw("CRATE", "TRACE") - 0.7333333333333334) < 1e-15)
    // jaro ≤ 0.7 → NO prefix boost (the classic threshold)
    assert(math.abs(jw("abcdef", "abczzz") - 2.0 / 3.0) < 1e-15)
    assert(jw("same", "same") == 1.0)
    assert(jw("", "") == 0.0) // DuckDB's empty-string convention
    assert(jw("a", "") == 0.0)
    assert(jw("ab", "ba") == 0.0) // window excludes adjacent swap at l=2
  }

  test("symmetry") {
    for ((a, b) <- Seq(("MARTHA", "MARHTA"), ("DWAYNE", "DUANE"),
        ("prefix", "prezzz"), ("abcdefgh", "abzzzzzz")))
      assert(jw(a, b) == jw(b, a), s"$a/$b")
  }

  test("codegen and interpreted agree, NULL propagates") {
    import spark.implicits._
    val df = Seq(("MARTHA", "MARHTA"), ("DWAYNE", "DUANE"), ("x", "y"))
      .toDF("a", "b")
    val got = df.select(JaroWinkler(col("a"), col("b")).as("s"))
      .collect().map(_.getDouble(0))
    assert(got.toSeq == Seq(jw("MARTHA", "MARHTA"), jw("DWAYNE", "DUANE"), 0.0))
    val n = Seq((Some("a"), None: Option[String])).toDF("a", "b")
      .select(JaroWinkler(col("a"), col("b")).as("s")).collect().head
    assert(n.isNullAt(0))
  }

  test("prefix boost caps at 4 characters") {
    // identical 6-char prefix, differing tails: boost must use l = 4
    val s = jw("prefixaaaa", "prefixbbbb")
    val jaroOnly = {
      val m = 6.0
      (m / 10 + m / 10 + m / m) / 3.0
    }
    assert(math.abs(s - (jaroOnly + 4 * 0.1 * (1.0 - jaroOnly))) < 1e-15)
  }
}
