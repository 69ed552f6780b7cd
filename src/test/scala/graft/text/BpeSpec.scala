package graft.text

import org.apache.spark.sql.functions._
import graft.SparkSpec

class BpeSpec extends SparkSpec {
  import spark.implicits._

  // "aaab" ×3 + "aab" ×2: pair counts round 1 — (a,a): 3·2+2·1 = 8,
  // (a,b): 5, (b,_): 5 → merge (a,a). Round 2 over |aa||a||b||_| ×3,
  // |aa||b||_| ×2: (aa,a) 3, (aa,b) 2, (a,b) 3, (b,_) 5 → merge (b,_).
  private def corpus = Seq(
    (1L, "aaab aaab"), (2L, "aaab aab"), (3L, "aab")).toDF("doc_id", "text")

  test("hand-computed merges: counts, tie-breaks, greedy application") {
    val m = Bpe.train(corpus, "text", steps = 3)
    val got = m.merges.map(x => (x.step, x.lhs, x.rhs, x.cnt))
    assert(got(0) == ((0, "a", "a", 8L)))
    assert(got(1) == ((1, "b", "_", 5L)))
    // Round 3 over |aa||a||b_| ×3, |aa||b_| ×2:
    // (aa,a) 3, (a,b_) 3, (aa,b_) 2 → ties at 3 break lexicographically:
    // lhs "a" < "aa" → (a, b_).
    assert(got(2) == ((2, "a", "b_", 3L)))
  }

  test("greedy left-to-right application: aaaa collapses pairwise, not overlapping") {
    val df = Seq((1L, "aaaa aaaa aaaa")).toDF("doc_id", "text")
    val m = Bpe.train(df, "text", steps = 1)
    assert(m.merges.head.lhs == "a" && m.merges.head.rhs == "a")
    // |a||a||a||a||_| → |aa||aa||_| (greedy non-overlapping): 3 tokens.
    val v = m.vocab.select("symstr", "n_tokens").head()
    assert(v.getString(0) == "|aa||aa||_|")
    assert(v.getLong(1) == 3L)
  }

  test("tokenCounts (vocab join) ≡ countTokens (chained-replace encode) on the corpus") {
    val m = Bpe.train(corpus, "text", steps = 3)
    val a = Bpe.tokenCounts(corpus, "text", "doc_id", m)
      .select("doc_id", "bpe_tokens").orderBy("doc_id").collect()
    val b = corpus.select(col("doc_id"),
        Bpe.countTokens(col("text"), m.merges).as("bpe_tokens"))
      .orderBy("doc_id").collect()
    assert(a.toSeq == b.toSeq)
    // And both count REAL subwords: doc 3 "aab" → |aa||b_| = 2 tokens.
    assert(a(2).getLong(1) == 2L)
  }

  test("JVM kernel ≡ countTokens Column form (adversarial + corpus)") {
    val m = Bpe.train(corpus, "text", steps = 3)
    val adversarial = Seq(
      (1L, "aaab aaab"), (2L, "aab"), (3L, ""), (4L, "  !?—  "),
      (5L, "AAAB Aab"), (6L, "unseen words zzz9"), (7L, "a"),
      (8L, "mixed aaab-aab.aaab"), (9L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val colForm = adversarial.select(col("doc_id"),
        Bpe.countTokens(col("text"), m.merges).as("n"))
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    val kernel = Bpe.withBpeCount(adversarial, "text", m.merges, "n")
      .select("doc_id", "n")
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(colForm.toSeq == kernel.toSeq)
  }

  test("wordless docs count 0; unseen words still encode via countTokens") {
    val m = Bpe.train(corpus, "text", steps = 2)
    val odd = Seq((9L, "!!! ???"), (10L, "baab")).toDF("doc_id", "text")
    val viaExpr = odd.select(col("doc_id"),
      Bpe.countTokens(col("text"), m.merges).as("t")).orderBy("doc_id").collect()
    assert(viaExpr(0).getLong(1) == 0L)
    // "baab": |b||a||a||b||_| → merge(a,a) → |b||aa||b||_| → merge(b,_)
    // only matches the trailing pair → |b||aa||b_| = 3 tokens.
    assert(viaExpr(1).getLong(1) == 3L)
  }

  test("zero steps: token count is chars + end marker") {
    val m = Bpe.train(corpus, "text", steps = 0)
    assert(m.merges.isEmpty)
    // "aab" → 3 chars + _ = 4 tokens.
    assert(m.vocab.filter(col("word") === "aab").head().getAs[Long]("n_tokens") == 4L)
  }
}
