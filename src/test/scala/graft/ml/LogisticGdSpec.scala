package graft.ml

import graft.SparkSpec

class LogisticGdSpec extends SparkSpec {
  import spark.implicits._

  private def rnd(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("one GD step on a hand-computable fixture") {
    // {(x=1,y=1),(x=-1,y=0)}; w=(0,0) → z=0 → σ̂=0.5 both rows
    // S0 = (0.5−1) + (0.5−0) = 0 ; S1 = (0.5−1)·1 + (0.5−0)·(−1) = −1
    // g0 = 0/2 = 0 ; g1 = −0.5 ; lr=0.1 → w = (0, 0.05)
    val df = Seq((1.0, 1.0), (-1.0, 0.0)).toDF("x", "y")
    val w = LogisticGd.fit(df, Seq("x"), "y", lr = 0.1, iters = 1)
    assert(w == Seq(0.0, rnd(0.05)))
  }

  test("log-loss decreases over iterations on a separable signal") {
    val data = (1 to 200).map { i =>
      val x = (i % 21).toDouble - 10 // -10..10
      (x / 10, if (x > 0) 1.0 else 0.0)
    }
    val df = data.toDF("x", "y")
    def logLoss(iters: Int): Double = {
      val w = LogisticGd.fit(df, Seq("x"), "y", lr = 0.5, iters = iters)
      LogisticGd.predict(df, Seq("x"), w)
        .selectExpr(
          "avg(-(y * ln(greatest(probability, 1e-9)) " +
            "+ (1 - y) * ln(greatest(1 - probability, 1e-9))))")
        .head().getDouble(0)
    }
    val l1 = logLoss(1); val l5 = logLoss(5); val l20 = logLoss(20)
    assert(l5 < l1 && l20 < l5, s"log-loss not decreasing: $l1 $l5 $l20")
  }

  test("separable signal classifies correctly after training") {
    val data = (1 to 100).map { i =>
      val x = (i % 11).toDouble - 5
      (x, if (x > 0) 1.0 else 0.0)
    }
    val df = data.toDF("x", "y")
    val w = LogisticGd.fit(df, Seq("x"), "y", lr = 1.0, iters = 30)
    val wrong = LogisticGd.predict(df.filter("x <> 0"), Seq("x"), w)
      .filter("predicted <> CAST(y AS INT)").count()
    assert(wrong == 0, s"$wrong misclassified with w=$w")
  }

  test("fit is layout-invariant (rounded per-row sigmoid + gradient contract)") {
    val data = (1 to 500).map(i =>
      ((i % 13).toDouble / 13, if (i % 3 == 0) 1.0 else 0.0))
    val a = LogisticGd.fit(data.toDF("x", "y").coalesce(1), Seq("x"), "y", 0.5, 3)
    val b = LogisticGd.fit(data.toDF("x", "y").repartition(7), Seq("x"), "y", 0.5, 3)
    assert(a == b)
  }
}
