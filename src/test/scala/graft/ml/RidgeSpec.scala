package graft.ml

import graft.SparkSpec

class RidgeSpec extends SparkSpec {
  import spark.implicits._

  /** Scalar reference: centered 2×2 ridge solve. */
  private def ref(rows: Seq[(Double, Double, Double)], lam: Double)
      : (Double, Double, Double) = {
    val n = rows.length.toDouble
    val sx1 = rows.map(_._1).sum; val sx2 = rows.map(_._2).sum
    val sy = rows.map(_._3).sum
    val c11 = rows.map(r => r._1 * r._1).sum - sx1 * sx1 / n
    val c22 = rows.map(r => r._2 * r._2).sum - sx2 * sx2 / n
    val c12 = rows.map(r => r._1 * r._2).sum - sx1 * sx2 / n
    val c1y = rows.map(r => r._1 * r._3).sum - sx1 * sy / n
    val c2y = rows.map(r => r._2 * r._3).sum - sx2 * sy / n
    val a11 = c11 + lam; val a22 = c22 + lam
    val det = a11 * a22 - c12 * c12
    val w1 = (c1y * a22 - c2y * c12) / det
    val w2 = (a11 * c2y - c12 * c1y) / det
    (w1, w2, (sy - w1 * sx1 - w2 * sx2) / n)
  }

  private def fit(rows: Seq[(Double, Double, Double)], lambdas: Seq[Double])
      : Map[Double, (Double, Double, Double)] =
    Ridge.fit(rows.toDF("x1", "x2", "y"), "x1", "x2", "y", lambdas)
      .collect()
      .map(r => r.getDouble(0) ->
        ((r.getDouble(2), r.getDouble(3), r.getDouble(4))))
      .toMap

  test("matches the scalar solve across the lambda path") {
    val rnd = new scala.util.Random(5)
    val rows = (0 until 400).map { _ =>
      val x1 = rnd.nextInt(100).toDouble
      val x2 = rnd.nextInt(50).toDouble
      (x1, x2, 3.0 * x1 - 2.0 * x2 + 7 + rnd.nextInt(11) - 5)
    }
    val got = fit(rows, Seq(0.0, 10.0, 1e5))
    for (lam <- Seq(0.0, 10.0, 1e5)) {
      val (ew1, ew2, eb0) = ref(rows, lam)
      val (gw1, gw2, gb0) = got(lam)
      assert(math.abs(gw1 - ew1) < 1e-5, s"w1 at lam=$lam")
      assert(math.abs(gw2 - ew2) < 1e-5, s"w2 at lam=$lam")
      assert(math.abs(gb0 - eb0) < 1e-5, s"b0 at lam=$lam")
    }
    // lambda=0 recovers the generating coefficients (small noise)
    assert(math.abs(got(0.0)._1 - 3.0) < 0.1)
    assert(math.abs(got(0.0)._2 + 2.0) < 0.2)
  }

  test("weights shrink monotonically toward zero as lambda grows") {
    val rnd = new scala.util.Random(9)
    val rows = (0 until 300).map { _ =>
      val x1 = rnd.nextInt(40).toDouble
      (x1, x1 / 2 + rnd.nextInt(5), 5.0 * x1 + rnd.nextInt(7))
    }
    val lams = Seq(0.0, 100.0, 1e4, 1e6, 1e9)
    val got = fit(rows, lams)
    val norms = lams.map(l =>
      math.sqrt(got(l)._1 * got(l)._1 + got(l)._2 * got(l)._2))
    norms.sliding(2).foreach { case Seq(a, b) =>
      assert(b <= a + 1e-9, s"ridge norm must shrink: $norms")
    }
    assert(norms.last < 0.01)
  }

  test("collinear features at lambda=0 yield NULL, regularized do not") {
    val rows = (1 to 50).map(i => (i.toDouble, 2.0 * i, 3.0 * i))
    val out = Ridge.fit(rows.toDF("x1", "x2", "y"), "x1", "x2", "y",
      Seq(0.0, 10.0)).collect().map(r => r.getDouble(0) -> r).toMap
    assert(out(0.0).isNullAt(2) && out(0.0).isNullAt(3))
    assert(!out(10.0).isNullAt(2) && !out(10.0).isNullAt(3))
  }
}
