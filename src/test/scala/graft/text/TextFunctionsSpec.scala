package graft.text

import org.apache.spark.sql.functions._
import graft.SparkSpec

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def one(text: String) = Seq(text).toDF("t")

  test("tokens: lowercase, whitespace split, empties dropped") {
    val r = one("  The  quick\tBrown\nfox ").select(TextFunctions.tokens($"t")).head.getSeq[String](0)
    assert(r == Seq("the", "quick", "brown", "fox"))
  }

  test("tokens: empty and all-whitespace text give empty array") {
    assert(one("").select(TextFunctions.tokens($"t")).head.getSeq[String](0).isEmpty)
    assert(one("   ").select(TextFunctions.tokens($"t")).head.getSeq[String](0).isEmpty)
  }

  test("bpeTokens: word pieces plus standalone punctuation") {
    val r = one("It's a test-case!").select(TextFunctions.bpeTokens($"t")).head.getSeq[String](0)
    assert(r == Seq("it", "'", "s", "a", "test", "-", "case", "!"))
  }

  test("shingles: n-grams, distinct, short docs empty") {
    val r = one("a b c d").select(TextFunctions.shingles($"t", 3)).head.getSeq[String](0)
    assert(r.toSet == Set("a b c", "b c d"))
    val short = one("a b").select(TextFunctions.shingles($"t", 3)).head.getSeq[String](0)
    assert(short.isEmpty)
    val dup = one("x y x y x y").select(TextFunctions.shingles($"t", 3)).head.getSeq[String](0)
    assert(dup.toSet == Set("x y x", "y x y"))
  }

  test("stopwordRatio and punctRatio") {
    val sw = one("the cat of doom").select(TextFunctions.stopwordRatio($"t")).head.getDouble(0)
    assert(math.abs(sw - 0.5) < 1e-9)
    val p = one("ab, cd!").select(TextFunctions.punctRatio($"t")).head.getDouble(0)
    assert(math.abs(p - 2.0 / 6.0) < 1e-9) // "ab,cd!" → 2 punct / 6 chars
    assert(one("").select(TextFunctions.punctRatio($"t")).head.getDouble(0) == 0.0)
  }

  test("meanTokenLen") {
    val m = one("ab cdef").select(TextFunctions.meanTokenLen($"t")).head.getDouble(0)
    assert(math.abs(m - 3.0) < 1e-9)
  }

  test("qualityScore is in [0,1] and favors normal prose") {
    val good = one("the quick brown fox jumps over a lazy dog and runs to the hills again today")
      .select(TextFunctions.qualityScore($"t")).head.getDouble(0)
    val junk = one("!!! ### $$$ %%%").select(TextFunctions.qualityScore($"t")).head.getDouble(0)
    assert(good > junk)
    assert(good >= 0.0 && good <= 1.0 && junk >= 0.0 && junk <= 1.0)
  }

  test("langId: marker argmax with alphabetical tie-break, und fallback") {
    assert(one("the cat is on the mat").select(TextFunctions.langId($"t")).head.getString(0) == "en")
    assert(one("der hund ist nicht da und").select(TextFunctions.langId($"t")).head.getString(0) == "de")
    assert(one("xyz qqq").select(TextFunctions.langId($"t")).head.getString(0) == "und")
    // 'la' is a marker for both es and fr → tie → es (alphabetical).
    assert(one("la la").select(TextFunctions.langId($"t")).head.getString(0) == "es")
  }

  test("langIdNgram: trigram occurrence counting and argmax") {
    // overlapping/repeated occurrences: "the theater" contains 'the' twice.
    val en = one("the theater is opening tonight")
    assert(en.select(TextFunctions.langIdNgram($"t")).head.getString(0) == "en")
    val gEn = en.select(TextFunctions.langNgramScores($"t")(1)).head.getLong(0)
    assert(gEn >= 3) // the×2 + ing ("opening"/"tonight" contribute 'ing' and 'igh'…)
    assert(one("der schneider ergriff eine richtung")
      .select(TextFunctions.langIdNgram($"t")).head.getString(0) == "de")
    assert(one("zzz qqq").select(TextFunctions.langIdNgram($"t")).head.getString(0) == "und")
  }

  test("fingerprint: whitespace/case-insensitive, content-sensitive") {
    val fps = Seq("a b  c", "A  B c", "a b d").toDF("t")
      .select(TextFunctions.fingerprint($"t")).collect().map(_.getString(0))
    assert(fps(0) == fps(1))
    assert(fps(0) != fps(2))
  }

  test("rollingFingerprint: deterministic, order-sensitive, in [0, 2^31)") {
    val r = Seq("a b c", "c b a", "a b c").toDF("t")
      .select(TextFunctions.rollingFingerprint($"t")).collect().map(_.getLong(0))
    assert(r(0) == r(2))
    assert(r(0) != r(1)) // rolling hash is order-sensitive, unlike a bag hash
    assert(r.forall(v => v >= 0 && v < 2147483647L))
  }

  test("tokenEntropy: closed-form values, case/whitespace normalization, empties absent") {
    val df = Seq(
      (1L, "a a a a"),        // one token type → 0 bits
      (2L, "a b  A B"),       // uniform 2 types (case-folded) → 1 bit
      (3L, "a b c d"),        // uniform 4 types → 2 bits
      (4L, "a a b"),          // 2/3, 1/3 → H ≈ 0.918296
      (5L, "   "),            // no tokens → absent
      (6L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val got = TextFunctions.tokenEntropy(df, "text", "doc_id")
      .select($"doc_id", org.apache.spark.sql.functions.round($"entropy", 6))
      .as[(Long, Double)].collect().toMap
    assert(got.keySet == Set(1L, 2L, 3L, 4L))
    assert(got(1L) == 0.0 && got(2L) == 1.0 && got(3L) == 2.0)
    assert(math.abs(got(4L) - 0.918296) < 1e-6)
  }

  test("candidatePhrases splits at every stopword, adjacent ones included") {
    import org.apache.spark.sql.functions.col
    def phrases(s: String): Seq[String] =
      Seq(s).toDF("text")
        .select(TextFunctions.candidatePhrases(col("text")).as("p"))
        .as[Seq[String]].head()
    // adjacent stopwords ("of the") must both break; case folds
    assert(phrases("Quick brown fox of the lazy dog") ==
      Seq("quick brown fox", "lazy dog"))
    // leading/trailing stopwords produce no empty phrases
    assert(phrases("the deep learning and the gradient descent and") ==
      Seq("deep learning", "gradient descent"))
    // repeated identical stopwords back to back
    assert(phrases("alpha the the beta") == Seq("alpha", "beta"))
    // no stopwords: one maximal phrase; empty text: none
    assert(phrases("red green blue") == Seq("red green blue"))
    assert(phrases("") == Seq.empty)
    assert(phrases("the of and") == Seq.empty)
  }
}
