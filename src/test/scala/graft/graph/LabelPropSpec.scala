package graft.graph

import graft.SparkSpec

class LabelPropSpec extends SparkSpec {
  import spark.implicits._

  private def clique(ids: Seq[Long]): Seq[(Long, Long)] =
    for (a <- ids; b <- ids if a < b) yield (a, b)

  test("two cliques joined by a bridge resolve to two communities") {
    val edges = (clique(Seq(1L, 2L, 3L, 4L)) ++
      clique(Seq(10L, 11L, 12L, 13L)) :+ (4L, 10L))
      .toDF("src", "dst")
    val got = LabelProp.communities(edges, "src", "dst", rounds = 3)
      .as[(Long, Long)].collect().toMap
    assert(got.keySet == Set(1L, 2L, 3L, 4L, 10L, 11L, 12L, 13L))
    val a = Set(1L, 2L, 3L, 4L).map(got)
    val b = Set(10L, 11L, 12L, 13L).map(got)
    assert(a.size == 1, s"clique A split: $got")
    assert(b.size == 1, s"clique B split: $got")
    assert(a != b, s"cliques merged: $got")
  }

  test("deterministic; edge direction and duplicates are irrelevant") {
    val base = (clique(Seq(1L, 2L, 3L)) ++ clique(Seq(7L, 8L, 9L)) :+ (3L, 7L))
    val fwd = base.toDF("src", "dst")
    val rev = base.map(_.swap).toDF("src", "dst")
    val dup = (base ++ base).toDF("src", "dst")
    def run(df: org.apache.spark.sql.DataFrame) =
      LabelProp.communities(df, "src", "dst", rounds = 3)
        .as[(Long, Long)].collect().toSet
    val r = run(fwd)
    assert(r == run(fwd) && r == run(rev) && r == run(dup))
  }

  test("string labels propagate without a hash step; rounds=0 is the identity") {
    val edges = Seq(("a.example", "b.example"), ("b.example", "c.example"))
      .toDF("src", "dst")
    val r0 = LabelProp.communities(edges, "src", "dst", rounds = 0)
      .as[(String, String)].collect().toMap
    assert(r0 == Map("a.example" -> "a.example", "b.example" -> "b.example",
      "c.example" -> "c.example"))
    val r2 = LabelProp.communities(edges, "src", "dst", rounds = 2)
      .as[(String, String)].collect().toMap
    assert(r2.keySet.size == 3)
    assert(r2.values.toSet.subsetOf(r0.keySet))
  }

  test("size histogram counts communities by size") {
    val edges = (clique(Seq(1L, 2L, 3L, 4L)) ++ clique(Seq(10L, 11L, 12L, 13L)))
      .toDF("src", "dst")
    val hist = LabelProp.sizeHistogram(
      LabelProp.communities(edges, "src", "dst", rounds = 3))
      .as[(Long, Long)].collect().toMap
    assert(hist == Map(4L -> 2L))
  }
}
