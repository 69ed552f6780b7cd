package graft.operators

import graft.SparkSpec

class SweepLineSpec extends SparkSpec {
  import spark.implicits._

  /** Brute-force peak concurrency over [s, e) intervals. */
  private def brutePeak(iv: Seq[(Long, Long)]): Long =
    iv.flatMap { case (s, _) => Seq(s) }.map { t =>
      iv.count { case (s, e) => s <= t && t < e }.toLong
    }.max

  test("running count matches hand-computed sweep") {
    // [0,10) [5,15) [5,8) [20,30): peaks 3 in [5,8), 1 after 20.
    val iv = Seq((0L, 10L), (5L, 15L), (5L, 8L), (20L, 30L)).toDF("s", "e")
    val run = SweepLine.concurrency(iv, "s", "e")
      .orderBy("t", "delta").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(run.map(_._3).max === 3L)
    // Half-open: at t=10 both [0,10) and [5,8) are closed — only
    // [5,15) is still live.
    val atEnd = run.filter(_._1 == 10L)
    assert(atEnd === Seq((10L, -1L, 1L)))
    // Final point drains to zero.
    assert(run.last === ((30L, -1L, 0L)))
  }

  test("end == start of another interval does not overlap (half-open)") {
    val iv = Seq((0L, 5L), (5L, 10L)).toDF("s", "e")
    val peak = SweepLine.concurrency(iv, "s", "e")
      .agg(org.apache.spark.sql.functions.max("concurrent")).head.getLong(0)
    assert(peak === 1L)
  }

  test("per-bucket peak matches brute force and is layout-invariant") {
    val rnd = new scala.util.Random(5)
    val iv = Seq.fill(500) {
      val s = rnd.nextInt(10000).toLong
      (s, s + 1 + rnd.nextInt(500).toLong)
    }
    val df = iv.toDF("s", "e")
    val expected = brutePeak(iv)
    for (parts <- Seq(1, 4, 9)) {
      val peak = SweepLine.concurrency(df.repartition(3), "s", "e", parts)
        .agg(org.apache.spark.sql.functions.max("concurrent")).head.getLong(0)
      assert(peak === expected, s"parts=$parts")
    }
  }

  test("start > end fails loudly") {
    val iv = Seq((10L, 5L)).toDF("s", "e")
    val e = intercept[Exception] {
      SweepLine.concurrency(iv, "s", "e").collect()
    }
    assert(e.getMessage.contains("start > end") ||
      (e.getCause != null && e.getCause.getMessage.contains("start > end")))
  }
}
