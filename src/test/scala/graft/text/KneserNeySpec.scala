package graft.text

import org.apache.spark.sql.functions._
import graft.SparkSpec

class KneserNeySpec extends SparkSpec {
  import spark.implicits._

  // Train "a b a b c": c(ab)=2 c(ba)=1 c(bc)=1, B=3 types, V=3,
  // denom=6; ctx a:(c1 2,n1v 1) b:(c1 2,n1v 2); cont b=1 a=1 c=1.
  private val df = Seq(
    ("g1", "train", "a b a b c"),
    ("g1", "eval", "a b x"),
    ("g2", "eval", "z q")).toDF("src", "split", "text")

  private lazy val rows =
    KneserNey.heldOutLogProb(df, "text", "src", col("split") === "train")
      .orderBy("src").collect()

  test("seen context: discounted count + continuation mass") {
    // P(b|a) = 1.25/2 + (0.75/2)(2/6) = 0.75
    // P(x|b) = 0 + (1.5/2)(1/6)       = 0.125
    val g1 = rows(0)
    assert(g1.getString(0) == "g1")
    assert(g1.getLong(1) == 2L && g1.getLong(2) == 0L)
    val want = BigDecimal((math.log(0.75) + math.log(0.125)) / 2)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(g1.getDouble(3) == want)
  }

  test("unseen context backs off to the smoothed continuation prior") {
    val g2 = rows(1)
    assert(g2.getString(0) == "g2")
    assert(g2.getLong(1) == 1L && g2.getLong(2) == 1L)
    val want = BigDecimal(math.log(1.0 / 6.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(g2.getDouble(3) == want)
  }

  test("eval docs under two tokens contribute nothing") {
    val d2 = Seq(("g", "train", "a b"), ("g", "eval", "solo"))
      .toDF("src", "split", "text")
    val r = KneserNey.heldOutLogProb(d2, "text", "src",
      col("split") === "train").collect()
    assert(r.isEmpty)
  }
}
