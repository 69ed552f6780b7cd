package graft.stats

import graft.SparkSpec

class EbSmoothSpec extends SparkSpec {

  private def run(rows: Seq[(Long, Long, Long)]) = {
    import spark.implicits._
    EbSmooth.betaBinomial(
        rows.toDF("g", "k", "n").repartition(2), Seq("g"), "k", "n")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(3), r.getLong(4)))).toMap
  }

  test("fixed-point fit matches hand computation") {
    // rates: 500000, 250000, 750000, 500000 -> m6 = 500000
    // var12 = (0 + 250000^2 + 250000^2 + 0) / 4 = 31_250_000_000
    // r = 500000*500000 // var12 = 8
    // r = 500000*500000 // 31_250_000_000 = 8, prior adds m6*(r-1)
    // pseudo-successes over r-1 pseudo-trials: post = (k*1e6+3.5e6)//(n+7)
    val rows = Seq((1L, 1L, 2L), (2L, 1L, 4L), (3L, 3L, 4L), (4L, 2L, 4L))
    val m = run(rows)
    assert(m(1L) == ((500000L, 500000L)))  // 4500000 // 9
    assert(m(2L) == ((250000L, 409090L)))  // 4500000 // 11
    assert(m(3L) == ((750000L, 590909L)))  // 6500000 // 11
    assert(m(4L) == ((500000L, 500000L)))  // 5500000 // 11
  }

  test("small-n group shrinks harder than large-n at the same rate") {
    // two groups at rate 1.0 with n=2 and n=200, many at rate 0
    val rows = Seq((1L, 2L, 2L), (2L, 200L, 200L),
      (3L, 0L, 50L), (4L, 0L, 50L), (5L, 0L, 50L), (6L, 0L, 50L))
    val m = run(rows)
    val (p1, post1) = m(1L)
    val (p2, post2) = m(2L)
    assert(p1 == 1000000L && p2 == 1000000L)
    // both shrink toward the prior mean (~333333), small n further
    assert(post1 < p1 && post2 < p2)
    assert(post1 < post2)
  }

  test("zero variance clamps prior strength; identical groups unmoved far") {
    // all groups identical -> var12 = 0 -> r clamps via greatest(.,1)
    // divisor, giving a huge r: posterior collapses to the mean.
    val rows = Seq((1L, 1L, 2L), (2L, 2L, 4L), (3L, 4L, 8L))
    val m = run(rows)
    m.values.foreach { case (p6, post6) =>
      assert(p6 == 500000L && post6 == 500000L)
    }
  }
}
