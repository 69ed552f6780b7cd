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

  test("applyCdc: winning tombstone erases the key, later upsert resurrects") {
    val base = Seq((1L, "a", -1L), (2L, "b", -1L), (3L, "c", -1L))
      .toDF("k", "v", "version")
    val changes = Seq(
      (1L, "x", 10L, "D"), // delete wins over base → key 1 gone
      (2L, "x", 10L, "D"), (2L, "B", 20L, "U"), // resurrected by later U
      (3L, "C", 5L, "U"), (3L, "x", 9L, "D"), // later D erases key 3
      (4L, "N", 1L, "I")) // insert of a new key
      .toDF("k", "v", "version", "op")
    val got = Upsert.applyCdc(base, changes, Seq("k"), "version", "op")
      .orderBy("k").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got === Seq((2L, "B"), (4L, "N")))
  }

  test("applyCdc: untouched base keys survive and op column is dropped") {
    val base = Seq((1L, "a", -1L)).toDF("k", "v", "version")
    val changes = Seq((2L, "B", 1L, "U")).toDF("k", "v", "version", "op")
    val out = Upsert.applyCdc(base, changes, Seq("k"), "version", "op")
    assert(out.columns.toSeq === Seq("k", "v", "version"))
    assert(out.orderBy("k").collect().map(_.getString(1)).toSeq === Seq("a", "B"))
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

  test("netChanges: first/last ops decide the net effect per key") {
    val changes = Seq(
      (1L, 1L, "I", "a"), (1L, 2L, "U", "b"), // insert with last payload
      (2L, 1L, "U", "x"), (2L, 2L, "U", "y"), // update
      (3L, 1L, "I", "p"), (3L, 2L, "D", "q"), // flicker → none
      (4L, 1L, "D", "z"),                     // delete
      (5L, 1L, "D", "q"), (5L, 2L, "I", "r")  // delete+reinsert → update
    ).toDF("k", "version", "op", "v")
    val got = Upsert.netChanges(changes, Seq("k"), "version", "op", Seq("v"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), Option(r.getString(2)))))
      .toMap
    assert(got == Map(
      1L -> (("insert", Some("b"))), 2L -> (("update", Some("y"))),
      3L -> (("none", None)), 4L -> (("delete", None)),
      5L -> (("update", Some("r")))))
  }
}
