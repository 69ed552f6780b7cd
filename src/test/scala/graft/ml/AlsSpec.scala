package graft.ml

import graft.SparkSpec

class AlsSpec extends SparkSpec {
  import spark.implicits._

  /** Scalar replay of the exact recurrence (micros, Cramer, requantize). */
  private def ref(ratings: Seq[(Long, Long, Long)], iters: Int,
      lambda: Double): (Map[Long, (Long, Long)], Map[Long, (Long, Long)]) = {
    var itemF = ratings.map(_._2).distinct
      .map(i => i -> ((1000000L + (i % 7) * 100000L,
        1000000L - (i % 5) * 50000L))).toMap
    var userF = Map.empty[Long, (Long, Long)]
    def solve(rs: Seq[(Long, (Long, Long))]): (Long, Long) = {
      val s11 = rs.map { case (_, (f1, _)) => BigInt(f1) * f1 }.sum
      val s12 = rs.map { case (_, (f1, f2)) => BigInt(f1) * f2 }.sum
      val s22 = rs.map { case (_, (_, f2)) => BigInt(f2) * f2 }.sum
      val b1 = rs.map { case (r, (f1, _)) => BigInt(r) * f1 }.sum
      val b2 = rs.map { case (r, (_, f2)) => BigInt(r) * f2 }.sum
      val a11 = s11.toDouble / 1e12 + lambda
      val a12 = s12.toDouble / 1e12
      val a22 = s22.toDouble / 1e12 + lambda
      val b1d = b1.toDouble / 1e6; val b2d = b2.toDouble / 1e6
      val det = a11 * a22 - a12 * a12
      val w1 = (b1d * a22 - b2d * a12) / det
      val w2 = (a11 * b2d - a12 * b1d) / det
      (math.round(w1 * 1e6), math.round(w2 * 1e6))
    }
    for (_ <- 1 to iters) {
      userF = ratings.groupBy(_._1).map { case (u, rs) =>
        u -> solve(rs.map(t => (t._3, itemF(t._2)))) }
      itemF = ratings.groupBy(_._2).map { case (i, rs) =>
        i -> solve(rs.map(t => (t._3, userF(t._1)))) }
    }
    (userF, itemF)
  }

  test("factors match the scalar replay bit-for-bit (micros)") {
    val rnd = new scala.util.Random(13)
    val ratings = (for (u <- 1L to 12L; i <- 1L to 15L
      if rnd.nextDouble() < 0.6)
      yield (u, i, (rnd.nextInt(50) + 1).toLong)).toSeq
    val (uf, itf, _) = Als.fit(
      ratings.toDF("u", "i", "r"), "u", "i", "r", iters = 2)
    val (eu, ei) = ref(ratings, iters = 2, lambda = 0.1)
    val gu = uf.collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val gi = itf.collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(gu === eu)
    assert(gi === ei)
  }

  test("a true rank-1 matrix is reconstructed nearly exactly") {
    // r(u,i) = a_u * b_i — rank 1 lives inside rank 2
    val ratings = for (u <- 1L to 8L; i <- 1L to 10L)
      yield (u, i, (u + 1) * (i + 2))
    val (_, _, rmse) = Als.fit(
      ratings.toDF("u", "i", "r"), "u", "i", "r", iters = 4, lambda = 0.001)
    assert(rmse < 0.05, s"rank-1 reconstruction rmse=$rmse")
  }

  test("training rmse does not increase with more alternations") {
    val rnd = new scala.util.Random(29)
    val ratings = (for (u <- 1L to 10L; i <- 1L to 10L
      if rnd.nextDouble() < 0.7)
      yield (u, i, (rnd.nextInt(30) + 1).toLong)).toSeq
    val df = ratings.toDF("u", "i", "r")
    val r1 = Als.fit(df, "u", "i", "r", iters = 1)._3
    val r3 = Als.fit(df, "u", "i", "r", iters = 3)._3
    assert(r3 <= r1 + 1e-6, s"rmse $r1 -> $r3")
  }
}
