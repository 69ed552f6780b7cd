package graft.ml

import graft.SparkSpec

class LinearGdSpec extends SparkSpec {
  import spark.implicits._

  private def rnd(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("one GD step on a hand-computable fixture") {
    // y = 2x over {(1,2),(2,4)}; w=(0,0): resid=-y
    // S0 = -(2+4) = -6 ; S1 = -(2·1+4·2) = -10 ; n=2
    // g0 = 2·(-6)/2 = -6 ; g1 = 2·(-10)/2 = -10 ; lr=0.01
    val df = Seq((1.0, 2.0), (2.0, 4.0)).toDF("x", "y")
    val w = LinearGd.fit(df, Seq("x"), "y", lr = 0.01, iters = 1)
    assert(w == Seq(rnd(0.06), rnd(0.10)))
  }

  test("loss decreases over iterations on a clean linear signal") {
    val data = (1 to 200).map { i =>
      val x1 = (i % 10).toDouble / 10; val x2 = (i % 7).toDouble / 7
      (x1, x2, 1.0 + 2.0 * x1 - 1.5 * x2)
    }
    val df = data.toDF("x1", "x2", "y")
    def mse(iters: Int): Double = {
      val w = LinearGd.fit(df, Seq("x1", "x2"), "y", lr = 0.1, iters = iters)
      LinearGd.predict(df, Seq("x1", "x2"), "y", w)
        .selectExpr("avg(residual * residual)").head().getDouble(0)
    }
    val m1 = mse(1); val m5 = mse(5); val m20 = mse(20)
    assert(m5 < m1 && m20 < m5, s"mse not decreasing: $m1 $m5 $m20")
  }

  test("fit is layout-invariant (rounded gradient contract)") {
    val data = (1 to 500).map(i => ((i % 13).toDouble, (i % 5).toDouble * 2 + 1))
    val a = LinearGd.fit(data.toDF("x", "y").coalesce(1), Seq("x"), "y", 0.01, 3)
    val b = LinearGd.fit(data.toDF("x", "y").repartition(7), Seq("x"), "y", 0.01, 3)
    assert(a == b)
  }
}
