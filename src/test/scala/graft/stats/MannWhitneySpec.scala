package graft.stats

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MannWhitneySpec extends SparkSpec {

  private def run(as: Seq[Long], bs: Seq[Long]) = {
    import spark.implicits._
    val df = (as.map(v => (v, "A")) ++ bs.map(v => (v, "B")))
      .toDF("v", "g").repartition(3)
    MannWhitney.uTest(df, col("g") === "A", "v").head()
  }

  test("separated samples: U hits its extreme, z positive") {
    // A strictly above B: U_A = n_a*n_b = 9, u2 = 18
    val r = run(Seq(10L, 11L, 12L), Seq(1L, 2L, 3L))
    assert((r.getLong(0), r.getLong(1)) == ((3L, 3L)))
    assert(r.getLong(2) == 18L)
    assert(r.getLong(3) == 0L)
    assert(r.getDouble(4) > 1.9)
  }

  test("identical samples: U = n_a*n_b/2, z = 0, ties counted") {
    // both groups {5,5}: one tie group of 4 -> ties = 4^3-4 = 60;
    // midranks all 2.5 -> R_A = 5, U_A = 5 - 3 = 2, u2 = 4 = n_a*n_b
    val r = run(Seq(5L, 5L), Seq(5L, 5L))
    assert(r.getLong(2) == 4L)
    assert(r.getLong(3) == 60L)
    // sigma^2 = (4/12)*((5) - 60/(4*3)) = (1/3)*0 = 0 -> z NaN/null;
    // the degenerate all-tied case divides by zero variance
    assert(r.isNullAt(4) || r.getDouble(4).isNaN)
  }

  test("hand-computed midranks with partial ties") {
    // A = {1, 3}, B = {3, 5}. Ranks: 1->1, {3,3}->2.5 each, 5->4.
    // R_A = 1 + 2.5 = 3.5, U_A = 3.5 - 2*3/2 = 0.5, u2 = 1
    val r = run(Seq(1L, 3L), Seq(3L, 5L))
    assert(r.getLong(2) == 1L)
    assert(r.getLong(3) == 6L) // tie group of 2: 8-2
    assert(r.getDouble(4) < 0.0) // A stochastically smaller
  }
}
