package graft.ml

import graft.SparkSpec

class EvalSpec extends SparkSpec {

  test("AUC matches brute-force pair counting, including ties") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // Quantized scores so ties are common
    val rows = (1 to 500).map { _ =>
      val y = rnd.nextInt(2)
      val s = (rnd.nextInt(20) + y * rnd.nextInt(6)).toDouble / 25.0
      (math.rint(s * 1e6) / 1e6, y)
    }
    val df = rows.toDF("score", "y").repartition(6)
    val r = Eval.auc(df, "score", "y").collect().head
    val pos = rows.filter(_._2 == 1).map(_._1)
    val neg = rows.filter(_._2 == 0).map(_._1)
    val u = pos.map(p => neg.map(n =>
      if (p > n) 1.0 else if (p == n) 0.5 else 0.0).sum).sum
    val expected = u / (pos.size.toDouble * neg.size)
    assert(r.getAs[Long]("n_pos") == pos.size)
    assert(r.getAs[Long]("n_neg") == neg.size)
    assert(r.getAs[Long]("u2") == math.rint(2 * u).toLong)
    assert(math.abs(r.getAs[Double]("auc") - expected) < 1e-6)
  }

  test("AUC is layout-invariant and 0.5 for a constant score") {
    import spark.implicits._
    val rows = (1 to 100).map(i => (0.25, i % 2))
    val a = Eval.auc(rows.toDF("score", "y"), "score", "y").collect().head
    val b = Eval.auc(scala.util.Random.shuffle(rows).toDF("score", "y")
      .repartition(11), "score", "y").collect().head
    assert(a == b)
    assert(a.getAs[Double]("auc") == 0.5)
  }

  test("perfect separation gives AUC 1.0") {
    import spark.implicits._
    val rows = (1 to 50).map(i => (0.9, 1)) ++ (1 to 50).map(i => (0.1, 0))
    val r = Eval.auc(rows.toDF("score", "y"), "score", "y").collect().head
    assert(r.getAs[Double]("auc") == 1.0)
  }

  test("aucGrouped: per-slice rank-sum, NULL on single-class slices") {
    import spark.implicits._
    val rows =
      // slice a: perfect separation → 1.0
      (1 to 10).map(_ => ("a", 0.9, 1)) ++ (1 to 10).map(_ => ("a", 0.1, 0)) ++
      // slice b: anti-ranked → 0.0
      (1 to 5).map(_ => ("b", 0.1, 1)) ++ (1 to 5).map(_ => ("b", 0.9, 0)) ++
      // slice c: single class → undefined
      (1 to 4).map(_ => ("c", 0.5, 1))
    val got = Eval.aucGrouped(rows.toDF("g", "score", "y"),
        "score", "y", "g")
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(4)) None else Some(r.getDouble(4)))).toMap
    assert(got == Map("a" -> Some(1.0), "b" -> Some(0.0), "c" -> None))
  }

  test("aucGrouped matches global auc on a single slice") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val rows = (1 to 200).map { _ =>
      val y = rnd.nextInt(2)
      ("only", math.min(1.0, math.max(0.0, rnd.nextDouble() * 0.6 + y * 0.3)), y)
    }
    val df = rows.toDF("g", "score", "y")
    val global = Eval.auc(df, "score", "y").collect().head.getAs[Double]("auc")
    val sliced = Eval.aucGrouped(df, "score", "y", "g")
      .collect().head.getAs[Double]("auc")
    assert(sliced == global)
  }

  test("eceGrouped: zero when perfectly calibrated, weighted gap otherwise") {
    import spark.implicits._
    // slice a perfectly calibrated in its bins: bin .5 with half pos
    val a = Seq(("a", 0.5, 1), ("a", 0.5, 0), ("a", 0.5, 1), ("a", 0.5, 0))
    // slice b: predicts .9 but nothing is positive → ece = .9
    val b = Seq(("b", 0.9, 0), ("b", 0.9, 0))
    val got = Eval.eceGrouped((a ++ b).toDF("g", "score", "y"),
        "score", "y", "g")
      .collect().map(r => r.getString(0) -> r.getAs[Double]("ece")).toMap
    assert(got == Map("a" -> 0.0, "b" -> 0.9))
  }

  test("brierGrouped: exact mean squared residual per slice") {
    import spark.implicits._
    val rows = Seq(
      ("a", 1.0, 1), ("a", 0.0, 0),          // perfect → 0
      ("b", 0.5, 1), ("b", 0.5, 0),          // hedged → 0.25
      ("c", 0.9, 0))                          // confidently wrong → 0.81
    val got = Eval.brierGrouped(rows.toDF("g", "score", "y"),
        "score", "y", "g")
      .collect().map(r => r.getString(0) -> r.getAs[Double]("brier")).toMap
    assert(got == Map("a" -> 0.0, "b" -> 0.25, "c" -> 0.81))
  }

  test("calibration bins partition the corpus with exact counts and means") {
    import spark.implicits._
    val rows = Seq((0.05, 0), (0.07, 1), (0.55, 1), (0.58, 0), (0.99, 1), (1.0, 1))
    val df = rows.toDF("score", "y")
    val got = Eval.calibration(df, "score", "y", bins = 10)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getAs[Double]("mean_score"), r.getAs[Double]("frac_pos"))).toSet
    assert(got == Set(
      (0, 2L, 1L, 0.06, 0.5),
      (5, 2L, 1L, 0.565, 0.5),
      (9, 2L, 2L, 0.995, 1.0))) // score 1.0 clamps into the top bin
  }
}
