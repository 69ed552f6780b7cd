package graft.text

import graft.SparkSpec

class PhraseSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox and the quick brown hen"),
    (2L, "THE Quick   Brown bear"), // case/whitespace normalize
    (3L, "quick the brown"), // right words, wrong order
    (4L, "the quick"), // incomplete phrase
    (5L, null.asInstanceOf[String])
  ).toDF("doc_id", "text")

  private def brute(phrase: Seq[String]): Map[Long, (Long, Long)] =
    docs.collect().flatMap { r =>
      Option(r.getString(1)).flatMap { t =>
        val toks = t.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
        val hits = (0 to toks.length - phrase.length)
          .filter(i => toks.slice(i, i + phrase.length) == phrase)
          .map(_ + 1L)
        if (hits.nonEmpty) Some(r.getLong(0) -> ((hits.size.toLong, hits.min))) else None
      }
    }.toMap

  test("matches == brute force; multi-match counts and 1-based first position") {
    val phrase = Seq("the", "quick", "brown")
    val got = Phrase.phraseMatches(docs, "text", "doc_id", phrase)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got == brute(phrase))
    assert(got(1L) == ((2L, 1L))) // two occurrences, first at token 1
    assert(got(2L) == ((1L, 1L))) // case/whitespace-normalized match
    assert(!got.contains(3L) && !got.contains(4L) && !got.contains(5L))
  }

  test("single-term phrase degenerates to term occurrence counting") {
    val got = Phrase.phraseMatches(docs, "text", "doc_id", Seq("quick"))
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r._2).toMap
    assert(got == Map(1L -> 2L, 2L -> 1L, 3L -> 1L, 4L -> 1L))
  }

  test("plan is equi-joins over term-filtered postings — no nested-loop, no cartesian") {
    val plan = Phrase.phraseMatches(docs, "text", "doc_id", Seq("the", "quick", "brown"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"phrase search must stay an equi-join plan:\n$plan")
  }

  test("input phrase terms are case-normalized") {
    val a = Phrase.phraseMatches(docs, "text", "doc_id", Seq("Quick", "BROWN"))
      .as[(Long, Long, Long)].collect().toSet
    val b = Phrase.phraseMatches(docs, "text", "doc_id", Seq("quick", "brown"))
      .as[(Long, Long, Long)].collect().toSet
    assert(a == b && a.nonEmpty)
  }
}
