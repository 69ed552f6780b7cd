package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class Bm25Spec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "spark sort spark merge"),    // tf(spark)=2, len 4
    (2L, "hash join sort"),            // tf(sort)=1, tf(hash)=1, len 3
    (3L, "filter scan project"),       // no match, len 3
    (4L, null.asInstanceOf[String])
  ).toDF("doc_id", "text")

  test("matches the hand-computed Okapi formula; non-matching and null docs absent") {
    val got = Bm25.score(docs, "text", "doc_id", Seq("spark", "sort", "hash"))
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    val n = 3.0
    val avgLen = 10.0 / 3.0
    def idf(df: Double) = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    def w(tf: Double, len: Double, df: Double) =
      idf(df) * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * len / avgLen))
    val exp1 = BigDecimal(w(2, 4, 1) + w(1, 4, 2)).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val exp2 = BigDecimal(w(1, 3, 2) + w(1, 3, 1)).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    assert(got.map(_._1).toSeq == Seq(1L, 2L)) // doc 3 matches nothing, doc 4 is null
    assert(got(0)._2 == exp1.toDouble && got(0)._3 == 2L)
    assert(got(1)._2 == exp2.toDouble && got(1)._3 == 2L)
  }

  test("rarer terms weigh more; longer docs are penalized") {
    val corpus = ((1L to 9L).map(i => (i, "common filler words here")) :+
      (10L, "rare common") :+ (11L, "rare common extra padding tokens making this doc much longer than ten")
      ).toDF("doc_id", "text")
    val byId = Bm25.score(corpus, "text", "doc_id", Seq("rare", "common"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    // doc 10: rare (df=2) should outscore any common-only doc (df=11).
    assert(byId(10L) > byId(1L))
    // same terms, longer doc → smaller score.
    assert(byId(10L) > byId(11L))
  }
}
