package graft.stats

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ABTestSpec extends SparkSpec {

  test("matches the textbook Pearson statistic on a hand 2x2 table") {
    import spark.implicits._
    // a: 10 fail / 20 convert; b: 25 fail / 5 convert
    val rows = Seq.fill(10)(("A", 0)) ++ Seq.fill(20)(("A", 1)) ++
      Seq.fill(25)(("B", 0)) ++ Seq.fill(5)(("B", 1))
    val df = rows.toDF("arm", "conv").repartition(4)
    val r = ABTest.chiSquare2x2(df, "arm", "A", "B", col("conv") === 1)
      .collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ==
      (10L, 20L, 25L, 5L, 60L))
    // by hand: E = [17.5, 12.5, 17.5, 12.5]; chi2 = 4*(7.5^2)/... = 15.428571...
    val expected = {
      val e = Seq(17.5, 12.5, 17.5, 12.5)
      val o = Seq(10.0, 20.0, 25.0, 5.0)
      o.zip(e).map { case (oo, ee) => (oo - ee) * (oo - ee) / ee }.sum
    }
    assert(math.abs(r.getAs[Double]("chi2") - expected) < 1e-5)
  }

  test("degenerate margins yield NULL instead of NaN") {
    import spark.implicits._
    val df = Seq(("A", 1), ("A", 1), ("B", 1)).toDF("arm", "conv")
    val r = ABTest.chiSquare2x2(df, "arm", "A", "B", col("conv") === 1)
      .collect().head
    assert(r.isNullAt(r.fieldIndex("chi2")))
  }

  test("rows outside the two arms are ignored") {
    import spark.implicits._
    val df = Seq(("A", 0), ("A", 1), ("B", 0), ("B", 1), ("C", 1), ("C", 0))
      .toDF("arm", "conv")
    val r = ABTest.chiSquare2x2(df, "arm", "A", "B", col("conv") === 1)
      .collect().head
    assert(r.getLong(r.fieldIndex("n")) == 4L)
  }

  test("Welch t matches the closed form on hand-computed arms") {
    import spark.implicits._
    // arm A: 2, 4, 6 (n=3, mean 4, var 4); arm B: 1, 3 (n=2, mean 2, var 2)
    val df = Seq(("A", 2), ("A", 4), ("A", 6), ("B", 1), ("B", 3))
      .toDF("arm", "x").repartition(3)
    val r = ABTest.welchT(df, "arm", "A", "B", col("x")).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == (3L, 12L, 56L))
    assert((r.getLong(3), r.getLong(4), r.getLong(5)) == (2L, 4L, 10L))
    val se2 = 4.0 / 3 + 2.0 / 2
    val t = (4.0 - 2.0) / math.sqrt(se2)
    val dfW = se2 * se2 /
      ((4.0 / 3) * (4.0 / 3) / 2 + (2.0 / 2) * (2.0 / 2) / 1)
    assert(math.abs(r.getAs[Double]("t_stat") - t) < 1e-6)
    assert(math.abs(r.getAs[Double]("df_welch") - dfW) < 1e-6)
  }

  test("Welch t: a single-row arm yields NULL statistics, not NaN") {
    import spark.implicits._
    val df = Seq(("A", 2), ("A", 4), ("B", 7)).toDF("arm", "x")
    val r = ABTest.welchT(df, "arm", "A", "B", col("x")).collect().head
    assert(r.isNullAt(r.fieldIndex("t_stat")))
    assert(r.isNullAt(r.fieldIndex("df_welch")))
  }

  test("KS D matches the brute-force ECDF max gap, ties included") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val rows = (1 to 400).map { _ =>
      val arm = if (rnd.nextBoolean()) "A" else "B"
      val v = rnd.nextInt(25) + (if (arm == "A") rnd.nextInt(6) else 0)
      (arm, v)
    }
    val df = rows.toDF("arm", "x").repartition(5)
    val r = ABTest.ksTest(df, "arm", "A", "B", col("x")).collect().head
    val a = rows.filter(_._1 == "A").map(_._2)
    val b = rows.filter(_._1 == "B").map(_._2)
    val values = (a ++ b).distinct.sorted
    val d = values.map { v =>
      math.abs(a.count(_ <= v).toDouble / a.size - b.count(_ <= v).toDouble / b.size)
    }.max
    assert(r.getAs[Long]("n_a") == a.size && r.getAs[Long]("n_b") == b.size)
    assert(math.abs(r.getAs[Double]("ks_d") - d) < 1e-6)
  }

  test("KS D is 0 for identical samples and 1 for disjoint ranges") {
    import spark.implicits._
    val same = ((1 to 50).map(i => ("A", i)) ++ (1 to 50).map(i => ("B", i)))
      .toDF("arm", "x")
    assert(ABTest.ksTest(same, "arm", "A", "B", col("x"))
      .collect().head.getAs[Double]("ks_d") == 0.0)
    val disjoint = ((1 to 50).map(i => ("A", i)) ++ (1 to 50).map(i => ("B", i + 100)))
      .toDF("arm", "x")
    assert(ABTest.ksTest(disjoint, "arm", "A", "B", col("x"))
      .collect().head.getAs[Double]("ks_d") == 1.0)
  }
}
