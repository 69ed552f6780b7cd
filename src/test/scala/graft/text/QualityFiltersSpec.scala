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

  test("withSignals kernel ≡ Column forms on 200 random documents") {
    val rnd = new scala.util.Random(42)
    val vocab = Vector("a", "bb", "the", "spam", "x9", "!", "Tok", "zz-q", "ö")
    val texts = (0 until 200).map { _ =>
      val n = rnd.nextInt(30)
      (0 until n).map(_ => vocab(rnd.nextInt(vocab.size)))
        .mkString(if (rnd.nextBoolean()) " " else "  ")
    }
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val kernel = QualityFilters.withSignals(df, "text")
      .select("id", "dup_tok", "top_tok", "dup_2gram", "top_2gram", "top_3gram", "rep_ok")
      .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    val ts = col("toks")
    val columns = df.select(col("id"), TextFunctions.tokens(col("text")).as("toks"))
      .select(
        col("id"),
        QualityFilters.dupTokenFrac(ts),
        QualityFilters.topTokenFrac(ts),
        QualityFilters.dupNgramFrac(ts, 2),
        QualityFilters.topNgramFrac(ts, 2),
        QualityFilters.topNgramFrac(ts, 3),
        QualityFilters.repetitionOk(ts))
      .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    assert(kernel == columns)
  }

  test("withSignals kernel ≡ Column forms on a varied fixture") {
    val texts = Seq(
      "a b a b a", "x", "", "  ", "go go go go go go",
      "the quick brown fox jumps over the lazy dog the quick brown fox",
      "Mixed CASE Mixed case tokens  with   runs\tof\nwhitespace",
      (1 to 40).map(i => s"t${i % 7}").mkString(" "))
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val kernel = QualityFilters.withSignals(df, "text")
      .select("id", "dup_tok", "top_tok", "dup_2gram", "top_2gram", "top_3gram", "rep_ok")
      .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    val ts = col("toks")
    val columns = df.select(col("id"), TextFunctions.tokens(col("text")).as("toks"))
      .select(
        col("id"),
        QualityFilters.dupTokenFrac(ts),
        QualityFilters.topTokenFrac(ts),
        QualityFilters.dupNgramFrac(ts, 2),
        QualityFilters.topNgramFrac(ts, 2),
        QualityFilters.topNgramFrac(ts, 3),
        QualityFilters.repetitionOk(ts))
      .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    assert(kernel == columns)
  }
}
