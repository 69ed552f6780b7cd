package graft.ml

import graft.SparkSpec

class NaiveBayesSpec extends SparkSpec {
  import spark.implicits._

  test("scores equal the hand-computed smoothed product and rank sensibly") {
    val train = Seq(
      ("spam", Seq("buy", "now", "buy")),
      ("spam", Seq("cheap", "buy")),
      ("ham", Seq("meeting", "tomorrow")),
      ("ham", Seq("see", "you", "tomorrow"))).toDF("label", "toks")
    val test = Seq((1L, Seq("buy", "tomorrow")), (2L, Seq("tomorrow")))
      .toDF("id", "toks")
    val got = NaiveBayes.score(train, test, "label", "toks", "id", maxTokens = 40)
      .as[(Long, String, Double)].collect()
      .map { case (i, l, s) => (i, l) -> s }.toMap
    // vocab = {buy,now,cheap,meeting,tomorrow,see,you} → V=7
    // spam: tot=5, cnt(buy)=3, cnt(tomorrow)=0; prior 2/4
    // ham:  tot=5, cnt(buy)=0, cnt(tomorrow)=2; prior 2/4
    val spam1 = 2.0 / 4 * 4 / 12 * 1 / 12
    val ham1 = 2.0 / 4 * 1 / 12 * 3 / 12
    val spam2 = 2.0 / 4 * 1 / 12
    val ham2 = 2.0 / 4 * 3 / 12
    assert(got((1L, "spam")) == spam1)
    assert(got((1L, "ham")) == ham1)
    assert(got((2L, "spam")) == spam2)
    assert(got((2L, "ham")) == ham2)
    // doc 2 ("tomorrow") must rank ham above spam
    assert(got((2L, "ham")) > got((2L, "spam")))
  }

  test("unseen tokens fall back to the smoothing floor, never drop rows") {
    val train = Seq(("a", Seq("x")), ("b", Seq("y"))).toDF("label", "toks")
    val test = Seq((9L, Seq("zzz", "zzz"))).toDF("id", "toks")
    val got = NaiveBayes.score(train, test, "label", "toks", "id", maxTokens = 40)
      .as[(Long, String, Double)].collect()
    assert(got.length == 2)
    // both classes identical: same prior, same smoothed floor (1/(1+2))²
    val s = 1.0 / 2 * 1 / 3 * 1 / 3
    assert(got.forall(_._3 == s))
  }
}
