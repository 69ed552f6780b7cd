package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MergeIntoSpec extends SparkSpec {
  import spark.implicits._
  import MergeInto._

  private val base = Seq(
    (1L, 100L, "A"), // target-only → by-source clause
    (2L, 200L, "B"), // matched, clause 1 fires
    (3L, 300L, "C"), // matched, clause 2 (delete) fires
    (4L, 400L, "D"), // matched, no clause → keep unchanged
    (6L, 600L, "F")) // matched, BOTH clauses true → clause order decides
  private val source = Seq(
    (2L, 10L), (3L, -5L), (4L, 3L), (5L, 70L), (6L, 99L))

  private def run(matched: Seq[(org.apache.spark.sql.Column, Action)],
      withInsert: Boolean = true, withBySource: Boolean = true) =
    MergeInto.merge(
      base.toDF("k", "v", "tag"), source.toDF("k", "d"), Seq("k"),
      matched = matched,
      notMatched = if (withInsert)
        Seq((col("s_d") > 50L, Insert(Map(
          "k" -> col("s_k"), "v" -> col("s_d"), "tag" -> lit("NEW")))))
      else Nil,
      bySource = if (withBySource)
        Seq((lit(true), Update(Map("tag" -> lit("ORPHAN"))))) else Nil)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2))))
      .toMap

  test("all four categories and clause order resolve per the standard") {
    val got = run(matched = Seq(
      (col("s_d") >= 10L, Update(Map("v" -> (col("t_v") + col("s_d"))))),
      (col("s_d") < 0L, Delete)))
    assert(got(1L) === ((100L, "ORPHAN"))) // by-source update
    assert(got(2L) === ((210L, "B"))) // matched update
    assert(!got.contains(3L)) // matched delete
    assert(got(4L) === ((400L, "D"))) // matched fall-through keeps
    assert(got(5L) === ((70L, "NEW"))) // insert (d=70 > 50)
    // k=6: d=99 satisfies BOTH >= 10 (update) and... only one here;
    // flip the clauses below to prove order decides
    assert(got(6L) === ((699L, "F")))
    assert(got.size === 5)
  }

  test("earlier clause wins when two matched clauses both apply") {
    val updateFirst = run(matched = Seq(
      (col("s_d") > 50L, Update(Map("v" -> lit(-1L)))),
      (col("s_d") > 50L, Delete)))
    assert(updateFirst(6L)._1 === -1L) // update (declared first) fires
    val deleteFirst = run(matched = Seq(
      (col("s_d") > 50L, Delete),
      (col("s_d") > 50L, Update(Map("v" -> lit(-1L))))))
    assert(!deleteFirst.contains(6L)) // delete (declared first) fires
  }

  test("source rows matching no insert clause are dropped") {
    val got = run(matched = Nil)
    // k=2 (d=10), k=3 (d=-5), k=4 (d=3) match no insert cond; they are
    // matched rows though — kept unchanged. A pure-source key with a
    // failing insert cond would vanish: remove key 5's qualifier
    val noInsert = run(matched = Nil, withInsert = false)
    assert(!noInsert.contains(5L))
    assert(got(5L) === ((70L, "NEW")))
  }

  test("no by-source clause keeps target-only rows unchanged") {
    val got = run(matched = Nil, withBySource = false)
    assert(got(1L) === ((100L, "A")))
  }
}
