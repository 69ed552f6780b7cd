package graft.ml

import graft.SparkSpec

class IsotonicSpec extends SparkSpec {
  import spark.implicits._

  /** Reference pool-adjacent-violators on (value → (n, mean)) pairs. */
  private def pava(points: Seq[(Long, Long, Double)]): Seq[(Long, Double)] = {
    case class Block(w: Long, sum: Double, members: List[Long])
    var blocks = List.empty[Block]
    for ((q, n, mean) <- points.sortBy(_._1)) {
      blocks = Block(n, mean * n, List(q)) :: blocks
      while (blocks.size > 1 &&
        blocks(1).sum / blocks(1).w >= blocks.head.sum / blocks.head.w) {
        val a :: b :: rest = blocks
        blocks = Block(a.w + b.w, a.sum + b.sum, b.members ++ a.members) :: rest
      }
    }
    blocks.reverse.flatMap(b => b.members.map(q => (q, b.sum / b.w)))
  }

  test("minimax fit == pool-adjacent-violators on a violating sequence") {
    // means by q: 10, 30, 20, 5, 40 — two violations to pool.
    val data = Seq(
      (1L, Seq(10L, 10L)), (2L, Seq(20L, 40L)), (3L, Seq(20L, 20L)),
      (4L, Seq(5L)), (5L, Seq(40L, 40L, 40L)))
    val df = data.flatMap { case (q, ys) => ys.map(y => (q, y)) }.toDF("q", "y")
    val got = Isotonic.fit(df, "q", "y")
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    val ref = pava(data.map { case (q, ys) =>
      (q, ys.size.toLong, ys.sum.toDouble / ys.size) })
    assert(got.map(_._1).toSeq == ref.map(_._1))
    got.zip(ref).foreach { case ((q, _, fit), (qr, fr)) =>
      assert(q == qr && math.abs(fit - fr) < 1e-6, s"q=$q fit=$fit ref=$fr")
    }
    // And it really is monotone.
    assert(got.map(_._3).toSeq == got.map(_._3).sorted.toSeq)
  }

  test("already-monotone means are returned unchanged; counts correct") {
    val df = Seq((1L, 10L), (1L, 10L), (2L, 30L), (3L, 50L)).toDF("q", "y")
    val got = Isotonic.fit(df, "q", "y")
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, 2L, 10.0), (2L, 1L, 30.0), (3L, 1L, 50.0)))
  }

  test("deterministic and layout-invariant on random data") {
    val rnd = new scala.util.Random(5)
    val rows = (0 until 400).map(_ =>
      ((rnd.nextInt(8) + 1).toLong, rnd.nextInt(1000).toLong))
    val a = Isotonic.fit(rows.toDF("q", "y"), "q", "y")
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    val b = Isotonic.fit(rows.toDF("q", "y").repartition(13), "q", "y")
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(a == b)
    assert(a.map(_._3) == a.map(_._3).sorted)
  }
}
