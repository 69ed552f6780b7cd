package graft.text

import graft.SparkSpec

class LmScoreSpec extends SparkSpec {
  import spark.implicits._

  test("hand-computed add-1 bigram log-probs; short/null docs absent") {
    val docs = Seq(
      (1L, "a b a b"),   // bigrams: "a b"×2, "b a"×1
      (2L, "a b"),
      (3L, "c"),         // < 2 tokens → absent
      (4L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    // corpus counts: c1(a)=3, c1(b)=3, c1(c)=1, V=3
    // c2("a b")=3, c2("b a")=1
    val got = LmScore.bigramLogProb(docs, "text", "doc_id")
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    def lp(c2: Double, c1: Double) = math.log((c2 + 1.0) / (c1 + 3.0))
    val exp1 = BigDecimal((lp(3, 3) + lp(1, 3) + lp(3, 3)) / 3)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val exp2 = BigDecimal(lp(3, 3)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.map(_._1).toSeq == Seq(1L, 2L))
    assert(got(0) == ((1L, 3L, exp1)))
    assert(got(1) == ((2L, 1L, exp2)))
  }

  test("improbable transitions score lower than corpus-typical ones") {
    val docs = ((1L to 20L).map(i => (i, "the quick brown fox")) :+
      (99L, "fox the brown quick")).toDF("doc_id", "text")
    val byId = LmScore.bigramLogProb(docs, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toMap
    assert(byId(99L) < byId(1L))
  }
}
