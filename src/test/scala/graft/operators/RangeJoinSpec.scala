package graft.operators

import scala.util.Random
import graft.SparkSpec

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("pointInInterval == naive BETWEEN join on random data (several widths)") {
    val rnd = new Random(17)
    val points = (1L to 400L).map(i => (i, rnd.nextDouble() * 1000)).toDF("pid", "p")
    val intervals = (1L to 60L).map { i =>
      val lo = rnd.nextDouble() * 900
      (i, lo, lo + rnd.nextDouble() * 150)
    }.toDF("iid", "lo", "hi")
    val expected = points.join(intervals, $"p" >= $"lo" && $"p" <= $"hi")
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    for (w <- Seq(10.0, 50.0, 500.0)) {
      val got = RangeJoin.pointInInterval(points, "p", intervals, "lo", "hi", w)
        .select("pid", "iid").as[(Long, Long)].collect().toSet
      assert(got == expected, s"width $w")
    }
    assert(expected.nonEmpty)
  }

  test("boundary inclusivity and degenerate/invalid intervals") {
    val points = Seq((1L, 5.0), (2L, 10.0), (3L, 10.000001)).toDF("pid", "p")
    val intervals = Seq(
      (1L, 5.0, 10.0),   // closed on both ends
      (2L, 7.0, 7.0),    // degenerate single-point interval
      (3L, 9.0, 3.0)     // inverted → dropped
    ).toDF("iid", "lo", "hi")
    val got = RangeJoin.pointInInterval(points, "p", intervals, "lo", "hi", 2.0)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 1L), (2L, 1L))) // both boundaries in; inverted ignored
  }
}
