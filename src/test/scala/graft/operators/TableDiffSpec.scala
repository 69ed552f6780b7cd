package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TableDiffSpec extends SparkSpec {
  import spark.implicits._

  private def oldSnap = Seq(
    (1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L), (4L, "d", 40L))
    .toDF("k", "s", "v")

  test("classifies added / removed / changed, drops unchanged") {
    val newSnap = Seq(
      (1L, "a", 10L),            // unchanged → absent
      (2L, "B", 20L),            // changed payload
      (4L, "d", 41L),            // changed payload
      (5L, "e", 50L))            // added; 3 removed
      .toDF("k", "s", "v")
    val d = TableDiff.diff(oldSnap, newSnap, Seq("k"), Seq("s", "v"))
      .orderBy("k")
      .select("k", "change").as[(Long, String)].collect()
    assert(d.toSeq == Seq((2L, "changed"), (3L, "removed"),
      (4L, "changed"), (5L, "added")))
  }

  test("NULL vs empty string is a change; separator cannot alias columns") {
    val a = Seq((1L, Option.empty[String], "x"), (2L, Some("ab"), "c"))
      .toDF("k", "s", "t")
    val b = Seq((1L, Some(""), "x"), (2L, Some("a"), "bc"))
      .toDF("k", "s", "t")
    val d = TableDiff.diff(a, b, Seq("k"), Seq("s", "t"))
      .select("k", "change").as[(Long, String)].collect().toMap
    assert(d == Map(1L -> "changed", 2L -> "changed"))
  }

  test("duplicate key in a snapshot fails loudly") {
    val dup = Seq((1L, "a", 1L), (1L, "b", 2L)).toDF("k", "s", "v")
    val e = intercept[Exception] {
      TableDiff.diff(dup, oldSnap, Seq("k"), Seq("s", "v")).collect()
    }
    assert(e.getMessage.contains("duplicate key") ||
      e.getCause != null && e.getCause.getMessage.contains("duplicate key"),
      s"unexpected: ${e.getMessage}")
  }

  test("multi-column keys and layout invariance") {
    val a = (1 to 100).map(i => (i.toLong % 10, i.toLong / 10, s"p$i"))
      .toDF("k1", "k2", "p")
    val b = (1 to 100).map { i =>
      val p = if (i % 7 == 0) s"q$i" else s"p$i"
      (i.toLong % 10, i.toLong / 10, p)
    }.toDF("k1", "k2", "p")
    val x = TableDiff.diff(a.repartition(7), b.coalesce(1), Seq("k1", "k2"), Seq("p"))
    val y = TableDiff.diff(a.coalesce(1), b.repartition(5), Seq("k1", "k2"), Seq("p"))
    assert(x.orderBy("k1", "k2").collect().toSeq ==
      y.orderBy("k1", "k2").collect().toSeq)
    assert(x.count() == (7 to 100 by 7).size)
    assert(x.filter(col("change") =!= "changed").isEmpty)
  }

  test("plan is union + one aggregate, no join") {
    val d = TableDiff.diff(oldSnap, oldSnap, Seq("k"), Seq("s"))
    val plan = d.queryExecution.optimizedPlan.toString
    assert(!plan.toLowerCase.contains("join"), plan)
  }
}
