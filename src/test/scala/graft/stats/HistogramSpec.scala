package graft.stats

import graft.SparkSpec

class HistogramSpec extends SparkSpec {
  import spark.implicits._

  test("bin edges, clamping, and per-bin extremes") {
    // lo=0, hi=10, 5 bins of width 2; -3 clamps to bin 0, 10 and 99 to bin 4
    val df = Seq(-3.0, 0.0, 1.9, 2.0, 5.0, 9.99, 10.0, 99.0).toDF("v")
    val got = Histogram.equiWidth(df, "v", lo = 0.0, hi = 10.0, bins = 5)
      .orderBy("bin")
      .as[(Long, Long, Double, Double)].collect().toSeq
    assert(got == Seq(
      (0L, 3L, -3.0, 1.9),
      (1L, 1L, 2.0, 2.0),
      (2L, 1L, 5.0, 5.0),
      (4L, 3L, 9.99, 99.0))) // bin 3 empty → absent
  }

  test("nulls are dropped; counts are total over the rest") {
    val df = Seq(Some(1.0), None, Some(3.0), None).toDF("v")
    val n = Histogram.equiWidth(df, "v", 0.0, 4.0, 2)
      .agg(org.apache.spark.sql.functions.sum("n")).head().getLong(0)
    assert(n == 2L)
  }
}
