package graft.text

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Pins the readability kernel columns (vowel-group syllable surrogate,
  * sentence-terminator runs) and a hand-computed Flesch value. */
class ReadabilitySpec extends SparkSpec {
  import spark.implicits._

  private def one(text: String) = Seq(text).toDF("t")

  test("vowelGroupCount: maximal [aeiouy]+ runs, case-insensitive") {
    // "beautiful" -> eau, i, u  (3 runs)
    assert(one("beautiful").select(TextFunctions.vowelGroupCount($"t")).head.getLong(0) == 3L)
    // "rhythm" -> y (1 run); "strength" -> e (1)
    assert(one("Rhythm strength").select(TextFunctions.vowelGroupCount($"t")).head.getLong(0) == 2L)
    assert(one("bcdfg").select(TextFunctions.vowelGroupCount($"t")).head.getLong(0) == 0L)
    assert(one("").select(TextFunctions.vowelGroupCount($"t")).head.getLong(0) == 0L)
  }

  test("sentenceCount: terminator runs collapse ([.!?]+ = one end)") {
    assert(one("Hi. There!? Done...").select(TextFunctions.sentenceCount($"t")).head.getLong(0) == 3L)
    assert(one("no terminators here").select(TextFunctions.sentenceCount($"t")).head.getLong(0) == 0L)
  }

  test("flesch formula replays by hand on a fixed doc") {
    // "The cat sat. It ran fast." : words=6, sentences=2,
    // vowel groups: e,a,a,i,a,a = 6
    // flesch = 206.835 - 1.015*(6/2) - 84.6*(6/6) = 206.835-3.045-84.6
    val d = one("The cat sat. It ran fast.")
    val w = d.select(TextFunctions.tokenCount($"t").cast("long")).head.getLong(0)
    val sc = d.select(TextFunctions.sentenceCount($"t")).head.getLong(0)
    val y = d.select(TextFunctions.vowelGroupCount($"t")).head.getLong(0)
    assert((w, sc, y) == ((6L, 2L, 6L)))
    val fl = 206.835 - 1.015 * (w.toDouble / sc) - 84.6 * (y.toDouble / w)
    assert(math.abs(fl - 119.19) < 1e-9)
  }

  test("zero-word / zero-sentence docs hit the clamp, not a div-by-zero") {
    // Kernel ratios clamp denominators at 1 — mirror the query's greatest(1, _).
    val d = one("")
    val w = d.select(greatest(lit(1L), TextFunctions.tokenCount($"t").cast("long"))).head.getLong(0)
    val sc = d.select(greatest(lit(1L), TextFunctions.sentenceCount($"t"))).head.getLong(0)
    assert(w == 1L && sc == 1L)
  }
}
