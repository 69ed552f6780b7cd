package graft.text

import org.apache.spark.sql.functions._
import graft.SparkSpec

class QualityFiltersSpec extends SparkSpec {
  import spark.implicits._

  private def fracs(text: String): (Double, Double, Double, Double, Boolean) = {
    val df = Seq(text).toDF("text")
      .select(TextFunctions.tokens(col("text")).as("toks"))
    val ts = col("toks")
    val r = df.select(
      QualityFilters.dupTokenFrac(ts),
      QualityFilters.topTokenFrac(ts),
      QualityFilters.dupNgramFrac(ts, 2),
      QualityFilters.topNgramFrac(ts, 2),
      QualityFilters.repetitionOk(ts)).head()
    (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getBoolean(4))
  }

  test("hand-checked fractions on a repetitive document") {
    // tokens: a b a b a  → 5 tokens, 2 distinct → dup 3/5, top "a" 3/5.
    // 2-grams: "a b","b a","a b","b a" → 4 grams, 2 distinct → dup 1/2,
    // top 1/2; gate fails on top2 0.5 > 0.20.
    val (dupT, topT, dup2, top2, ok) = fracs("a b a b a")
    assert(dupT == 3.0 / 5)
    assert(topT == 3.0 / 5)
    assert(dup2 == 0.5)
    assert(top2 == 0.5)
    assert(!ok)
  }

  test("all-distinct document passes the gate") {
    val (dupT, topT, dup2, top2, ok) = fracs(
      (1 to 30).map(i => s"w$i").mkString(" "))
    assert(dupT == 0.0)
    assert(topT == 1.0 / 30)
    assert(dup2 == 0.0)
    assert(top2 == 1.0 / 29)
    assert(ok)
  }

  test("empty and shorter-than-n documents are all-zero and pass") {
    for (t <- Seq("", "   ", "solo")) {
      val (dupT, _, dup2, top2, ok) = fracs(t)
      assert(dupT == 0.0)
      assert(dup2 == 0.0)
      assert(top2 == 0.0)
      assert(ok, s"gate should pass for '$t'")
    }
  }
}
