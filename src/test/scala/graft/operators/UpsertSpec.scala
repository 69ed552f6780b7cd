package graft.operators

import graft.SparkSpec

class UpsertSpec extends SparkSpec {
  import spark.implicits._

  test("updates replace base rows; unmatched base rows survive") {
    val base = Seq((1L, "a", -1L), (2L, "b", -1L), (3L, "c", -1L))
      .toDF("k", "v", "version")
    val updates = Seq((2L, "B1", 10L), (2L, "B2", 20L), (4L, "D", 5L))
      .toDF("k", "v", "version")
    val got = Upsert.latestWins(base, updates, Seq("k"), "version")
      .orderBy("k").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq((1L, "a"), (2L, "B2"), (3L, "c"), (4L, "D")))
  }

  test("result is layout-invariant") {
    val base = (1L to 100L).map(i => (i, s"b$i", -1L)).toDF("k", "v", "version")
    val updates = (1L to 50L).flatMap(i => Seq((i, s"u$i-1", i), (i, s"u$i-2", i + 100)))
      .toDF("k", "v", "version")
    val a = Upsert.latestWins(base.coalesce(1), updates.coalesce(1), Seq("k"), "version")
      .orderBy("k").collect().toSeq
    val b = Upsert.latestWins(base.repartition(7), updates.repartition(3), Seq("k"), "version")
      .orderBy("k").collect().toSeq
    assert(a == b)
    assert(a.count(_.getString(1).startsWith("u")) == 50)
  }
}
