package graft.sim

import graft.SparkSpec

class CoresetSpec extends SparkSpec {
  import spark.implicits._

  test("hand fixture: farthest-first order with id tie-break") {
    // quantized codes: v0=(-127,-127) v1=(127,-127) v2=(0,-127)
    // v3=(-127,127); seed v0; round2 tie 254² between v1/v3 → v1;
    // round3 → v3 at its unchanged 254².
    val e = Seq(
      (0L, Seq(0.0f, 0.0f)), (1L, Seq(1.0f, 0.0f)),
      (2L, Seq(0.5f, 0.0f)), (3L, Seq(0.0f, 0.9f)))
      .toDF("vec_id", "embedding")
    val got = Coreset.kCenters(e, "embedding", "vec_id", k = 3)
      .as[(Int, Long, Long)].collect().toSeq
    assert(got == Seq((1, 0L, 0L), (2, 1L, 64516L), (3, 3L, 64516L)))
  }

  /** Scalar replica: identical quantization + greedy rule. */
  private def replica(vecs: Map[Long, Array[Double]],
      k: Int): Seq[(Int, Long, Long)] = {
    val dim = vecs.head._2.length
    val lo = (0 until dim).map(i => vecs.values.map(_(i)).min)
    val hi = (0 until dim).map(i => vecs.values.map(_(i)).max)
    def q(x: Double, i: Int): Long =
      (if (hi(i) > lo(i))
        BigDecimal((x - lo(i)) / (hi(i) - lo(i)) * 254)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
      else 0L) - 127
    val codes = vecs.map { case (id, v) =>
      id -> v.zipWithIndex.map { case (x, i) => q(x, i) } }
    def d2(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val seed = codes.keys.min
    var chosen = Vector((1, seed, 0L))
    val minD = scala.collection.mutable.Map(
      codes.keys.map(id => id -> d2(codes(id), codes(seed))).toSeq: _*)
    for (r <- 2 to k) {
      val (id, d) = minD.filterKeys(id => !chosen.exists(_._2 == id))
        .toSeq.maxBy { case (id, d) => (d, -id) }
      chosen :+= ((r, id, d))
      codes.keys.foreach(x => minD(x) = math.min(minD(x), d2(codes(x), codes(id))))
    }
    chosen
  }

  test("matches the scalar replica on a seeded random set") {
    val rnd = new scala.util.Random(99)
    val vecs = (0L until 40L).map(id =>
      id -> Array.fill(4)(rnd.nextDouble() * 2 - 1)).toMap
    val e = vecs.toSeq.map { case (id, v) => (id, v.map(_.toFloat).toSeq) }
      .toDF("vec_id", "embedding")
    val got = Coreset.kCenters(e, "embedding", "vec_id", k = 5)
      .as[(Int, Long, Long)].collect().toSeq
    assert(got == replica(vecs, 5))
  }
}
