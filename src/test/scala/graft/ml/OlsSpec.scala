package graft.ml

import graft.SparkSpec

class OlsSpec extends SparkSpec {

  test("recovers a hand-computed line per group") {
    import spark.implicits._
    // group a: exact line y = 2x + 1 (r2 = 1); group b: known fit
    val df = Seq(
      ("a", 1.0, 3.0), ("a", 2.0, 5.0), ("a", 3.0, 7.0),
      ("b", 1.0, 1.0), ("b", 2.0, 2.0), ("b", 3.0, 2.0))
      .toDF("g", "x", "y").repartition(3)
    val out = Ols.fitGrouped(df, "x", "y", Seq("g")).collect()
      .map(r => r.getString(0) ->
        (r.getAs[Double]("slope"), r.getAs[Double]("intercept"),
          r.getAs[Double]("r2"))).toMap
    val (sa, ia, ra) = out("a")
    assert(sa == 2.0 && ia == 1.0 && ra == 1.0)
    // group b by hand: n=3 Sx=6 Sy=5 Sxy=11 Sxx=14 → slope=(33-30)/(42-36)=0.5
    val (sb, ib, rb) = out("b")
    assert(sb == 0.5)
    assert(math.abs(ib - (5.0 - 0.5 * 6.0) / 3.0) < 1e-6) // 6dp-rounded output
    assert(math.abs(rb - 0.75) < 1e-9)
  }

  test("constant x yields NULL fit, not a division blowup") {
    import spark.implicits._
    val df = Seq(("a", 2.0, 1.0), ("a", 2.0, 5.0)).toDF("g", "x", "y")
    val r = Ols.fitGrouped(df, "x", "y", Seq("g")).collect().head
    assert(r.isNullAt(r.fieldIndex("slope")))
    assert(r.isNullAt(r.fieldIndex("intercept")))
    assert(r.isNullAt(r.fieldIndex("r2")))
  }

  test("null rows are excluded from the sufficient statistics") {
    import spark.implicits._
    val df = Seq(
      ("a", Some(1.0), Some(3.0)), ("a", Some(2.0), Some(5.0)),
      ("a", Some(3.0), Some(7.0)), ("a", None, Some(9.0)),
      ("a", Some(9.0), None))
      .toDF("g", "x", "y")
    val r = Ols.fitGrouped(df, "x", "y", Seq("g")).collect().head
    assert(r.getLong(r.fieldIndex("n")) == 3L)
    assert(r.getAs[Double]("slope") == 2.0)
  }
}
