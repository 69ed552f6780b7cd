package graft.ml

import graft.SparkSpec

class QuantileGdSpec extends SparkSpec {

  test("intercept-only fit walks toward the tau quantile") {
    import spark.implicits._
    // y in 1..100 uniform, no features beyond a zero column: the
    // pinball subgradient for w0 is P(y<w0) - tau, so w0 climbs while
    // under the tau-quantile and oscillates around it once there.
    val df = (1 to 100).map(i => (0.0, i.toDouble)).toDF("x1", "y")
    val w = QuantileGd.fit(df, Seq("x1"), "y", tau = 0.75, lr = 40.0,
      iters = 12)
    assert(math.abs(w(0) - 75.0) <= 12.0,
      s"w0=${w(0)} should be near the p75 of 1..100")
    val cov = df.agg(QuantileGd.coverage(df, Seq("x1"), "y", w))
      .head().getDouble(0)
    assert(cov >= 0.55 && cov <= 0.95, s"coverage $cov far from tau")
  }

  test("first step is exactly lr * tau for the intercept") {
    import spark.implicits._
    // pred starts at 0, all y > 0 -> ind = 0, g0 = -tau, w0 = lr*tau
    val df = Seq((0.0, 5.0), (0.0, 7.0)).toDF("x1", "y")
    val w = QuantileGd.fit(df, Seq("x1"), "y", tau = 0.75, lr = 2.0,
      iters = 1)
    assert(w(0) == 1.5)
    assert(w(1) == 0.0)
  }

  test("feature weight moves with the covariate sign") {
    import spark.implicits._
    // y = 10*x1 exactly; after a few steps w1 should be positive
    val df = (1 to 50).map(i => (i.toDouble / 10, i.toDouble)).toDF("x1", "y")
    val w = QuantileGd.fit(df, Seq("x1"), "y", tau = 0.5, lr = 1.0,
      iters = 5)
    assert(w(1) > 0.0, s"w1=${w(1)}")
  }
}
