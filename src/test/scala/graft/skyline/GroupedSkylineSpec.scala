package graft.skyline

import scala.util.Random
import graft.SparkSpec

class GroupedSkylineSpec extends SparkSpec {
  import spark.implicits._

  private val spec = SkylineSpec(Seq(SkyDim("x", Min), SkyDim("y", Max)))

  test("grouped == per-group brute force on random data") {
    val rnd = new Random(1234)
    val rows = (1L to 300L).map { i =>
      (s"g${rnd.nextInt(5)}", rnd.nextInt(20).toDouble, rnd.nextInt(20).toDouble, i)
    }
    val df = rows.toDF("g", "x", "y", "id")
    val got = SkylineOp.grouped(df, spec, Seq("g"))
      .select("g", "id").as[(String, Long)].collect().toSet
    // .toSeq before flatMap: flatMapping a Map with pair-valued results
    // would collapse to one entry per group key.
    val expected = rows.groupBy(_._1).toSeq.flatMap { case (g, pts) =>
      pts.filter { p =>
        !pts.exists(q => (q._2 <= p._2 && q._3 >= p._3) && (q._2 < p._2 || q._3 > p._3))
      }.map(p => (g, p._4))
    }.toSet
    assert(got == expected)
  }

  test("groups are independent: a dominating point in one group does not prune another") {
    val df = Seq(
      ("a", 0.0, 10.0, 1L), // dominates everything in-coordinates
      ("b", 5.0, 5.0, 2L)
    ).toDF("g", "x", "y", "id")
    val got = SkylineOp.grouped(df, spec, Seq("g")).select("id").as[Long].collect().toSet
    assert(got == Set(1L, 2L))
  }

  test("multi-column grouping keys") {
    val df = Seq(
      ("a", 1, 5.0, 5.0, 1L), ("a", 1, 4.0, 6.0, 2L), // (a,1): 2 dominates 1
      ("a", 2, 9.0, 1.0, 3L), // different subgroup — kept
      ("b", 1, 9.0, 1.0, 4L)
    ).toDF("g1", "g2", "x", "y", "id")
    val got = SkylineOp.grouped(df, spec, Seq("g1", "g2")).select("id").as[Long].collect().toSet
    assert(got == Set(2L, 3L, 4L))
  }
}
