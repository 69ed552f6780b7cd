package graft.operators

import graft.SparkSpec

class SurvivalSpec extends SparkSpec {
  import spark.implicits._

  // classic textbook fixture: durations with mixed events/censoring
  private val subjects = Seq(
    // (grp, duration, event)
    ("a", 1L, 1), ("a", 2L, 1), ("a", 2L, 0), ("a", 3L, 1), ("a", 5L, 0),
    ("b", 1L, 0), ("b", 4L, 1))

  test("risk sets, event counts and survival match the hand-computed KM curve") {
    val df = subjects.toDF("grp", "dur", "ev")
    val got = Survival.kaplanMeier(df, Seq("grp"), "dur", "ev")
      .orderBy("grp", "t")
      .as[(String, Long, Long, Long, Long, Double)].collect()
    // group a: n=5 at t=1 (d=1) -> 4/5; t=2 n=4 (d=1,c=1) -> 4/5*3/4=3/5
    //          t=3 n=2 (d=1) -> 3/5*1/2; t=5 n=1 (c=1) -> unchanged
    val sA1 = 4.0 / 5
    val sA2 = sA1 * 3 / 4
    val sA3 = sA2 * 1 / 2
    val sA5 = sA3 * 1 / 1
    // group b: t=1 n=2 c=1 -> s=2/2=1; t=4 n=1 d=1 -> 0
    assert(got.toSeq == Seq(
      ("a", 1L, 5L, 1L, 0L, sA1),
      ("a", 2L, 4L, 1L, 1L, sA2),
      ("a", 3L, 2L, 1L, 0L, sA3),
      ("a", 5L, 1L, 0L, 1L, sA5),
      ("b", 1L, 2L, 0L, 1L, 1.0),
      ("b", 4L, 1L, 1L, 0L, 0.0)))
  }

  test("survival is monotone non-increasing and censoring-only steps leave it flat") {
    val df = (1 to 400).map { i =>
      ("g", (i % 37).toLong, if (i % 3 == 0) 0 else 1)
    }.toDF("grp", "dur", "ev")
    val rows = Survival.kaplanMeier(df, Seq("grp"), "dur", "ev")
      .orderBy("t")
      .as[(String, Long, Long, Long, Long, Double)].collect()
    rows.sliding(2).foreach { case Array(p, q) =>
      assert(q._6 <= p._6 + 1e-15)
      // d=0 step: (s·n)/n — flat up to the two rounding steps
      if (q._4 == 0) assert(math.abs(q._6 - p._6) < 1e-12)
      ()
    case _ => ()
    }
    // risk set telescopes: n_{k+1} = n_k - d_k - c_k
    rows.sliding(2).foreach { case Array(p, q) =>
      assert(q._3 == p._3 - p._4 - p._5)
      ()
    case _ => ()
    }
  }
}
