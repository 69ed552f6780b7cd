package graft.text

import org.apache.spark.sql.functions._
import graft.SparkSpec

class BoilerplateSpec extends SparkSpec {
  import spark.implicits._

  test("chunks: non-overlapping n-token windows, tail dropped") {
    val d = Seq("A b c d e f g").toDF("t")
    val got = d.select(Boilerplate.chunks($"t", 3)).head.getSeq[String](0)
    assert(got == Seq("a b c", "d e f"))
    assert(Seq("a b").toDF("t")
      .select(Boilerplate.chunks($"t", 3)).head.getSeq[String](0).isEmpty)
  }

  test("detect: recurring chunk flagged by the integer df rule") {
    val docs = Seq(
      (1L, "g", "the same header one two three"),
      (2L, "g", "the same header four five six"),
      (3L, "g", "totally different words here now"),
      (4L, "h", "the same header but other domain")).toDF("id", "grp", "t")
    val r = Boilerplate.detect(docs, "t", "id", "grp", n = 3,
      num = 3, den = 10).collect()
      .map(x => ((x.getString(0), x.getString(1)), (x.getLong(2), x.getBoolean(4))))
      .toMap
    // "the same header" appears in 2 of g's 3 docs: 2*10 >= 3*3 → boiler
    assert(r(("g", "the same header")) == ((2L, true)))
    // single-doc chunks in g: 1*10 >= 9 → true at 30%? 10 >= 9 yes!
    // threshold 30% of 3 docs is 0.9 — any chunk qualifies; use h
    // (1 of 1 docs) to check the rule is per-group.
    assert(r(("h", "the same header")) == ((1L, true)))
  }

  test("detect: below-threshold chunk not flagged") {
    val docs = (1 to 10).map(i => (i.toLong, "g", s"unique$i words here"))
      .toDF("id", "grp", "t")
    val r = Boilerplate.detect(docs, "t", "id", "grp", n = 3,
      num = 3, den = 10)
    // every chunk df=1, n_docs=10: 1*10 >= 3*10 false
    assert(r.filter(col("is_boiler")).count() == 0)
    assert(r.count() == 10)
  }
}
