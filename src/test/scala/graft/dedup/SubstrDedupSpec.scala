package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.Row

class SubstrDedupSpec extends SparkSpec {
  import spark.implicits._

  // Distinct documents sharing one planted 10-token boilerplate span;
  // every other token is unique corpus-wide, so nothing else repeats.
  private val boiler =
    "this content is provided as is without warranty of any kind"
  private def docs = Seq(
    (1L, s"alpha bravo charlie $boiler delta echo"),
    (2L, s"foxtrot golf $boiler hotel india juliet kilo"),
    (3L, "lima mike november oscar papa quebec romeo sierra tango uniform victor")
  ).toDF("doc_id", "text")

  test("finds the planted span at the right positions, nothing else") {
    val spans = SubstrDedup.duplicatedSpans(docs, "text", "doc_id", n = 5, minSpanTokens = 8)
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
    // Doc 1: boiler occupies tokens 4..14 (1-based); doc 2: tokens 3..13.
    assert(spans.toSeq === Seq((1L, 4, 14, 11), (2L, 3, 13, 11)))
  }

  test("within-doc repetition counts as duplication") {
    val selfRep = Seq(
      (1L, "one two three four five six seven EXTRA one two three four five six seven")
    ).toDF("doc_id", "text")
    val spans = SubstrDedup.duplicatedSpans(selfRep, "text", "doc_id", n = 5, minSpanTokens = 7)
      .orderBy("span_start").collect()
    assert(spans.map(r => (r.getInt(1), r.getInt(2))).toSeq === Seq((1, 7), (9, 15)))
  }

  test("minSpanTokens filters short runs; n-gram resolution bounds detection") {
    // Shared run of exactly 5 tokens: one 5-gram window → span_tokens = 5.
    val short = Seq(
      (1L, "aa bb shared1 shared2 shared3 shared4 shared5 cc dd"),
      (2L, "ee ff gg shared1 shared2 shared3 shared4 shared5 hh")
    ).toDF("doc_id", "text")
    assert(SubstrDedup.duplicatedSpans(short, "text", "doc_id", 5, minSpanTokens = 8).isEmpty)
    val found = SubstrDedup.duplicatedSpans(short, "text", "doc_id", 5, minSpanTokens = 5)
      .orderBy("doc_id").collect()
    assert(found.map(r => (r.getLong(0), r.getInt(3))).toSeq === Seq((1L, 5), (2L, 5)))
  }

  test("withoutDuplicatedSpans strips exactly the flagged tokens, everywhere") {
    val out = SubstrDedup.withoutDuplicatedSpans(docs, "text", "doc_id", n = 5, minSpanTokens = 8)
      .orderBy("doc_id").select("text").as[String].collect()
    assert(out(0) === "alpha bravo charlie delta echo")
    assert(out(1) === "foxtrot golf hotel india juliet kilo")
    // Doc 3 had no span: text passes through UNTOUCHED (not re-tokenized).
    assert(out(2) === "lima mike november oscar papa quebec romeo sierra tango uniform victor")
  }

  test("null text rows are dropped (the oracle's IS NOT NULL contract)") {
    // The rewritten column is defined over the tokenization contract —
    // a NULL text has no token stream, and passing it through would
    // emit engine-specific md5(NULL) downstream while SQL oracles
    // filter `text IS NOT NULL`. Aligned by construction.
    val withNull = docs.union(Seq((4L, null.asInstanceOf[String])).toDF("doc_id", "text"))
    val out = SubstrDedup.withoutDuplicatedSpans(withNull, "text", "doc_id", 5, 8)
    assert(out.count() === 3)
    assert(out.filter("doc_id = 4").count() === 0)
  }
}
