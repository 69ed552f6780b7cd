package graft.sim

import scala.util.Random
import graft.SparkSpec

class IvfFlatSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(n: Int, dim: Int, seed: Int) = {
    val rnd = new Random(seed)
    (0L until n.toLong).map(i => (i, 0, Seq.fill(dim)(rnd.nextGaussian())))
      .toDF("vec_id", "label", "embedding")
  }

  test("assign: deterministic, every list id within [0, nLists)") {
    val df = corpus(50, 8, 3)
    def lists() = IvfFlat.assign(df, "embedding", "vec_id", nLists = 8)
      .select("vec_id", "list").as[(Long, Int)].collect().toMap
    val l1 = lists()
    assert(l1 == lists())
    assert(l1.values.forall(l => l >= 0 && l < 8))
    assert(l1.size == 50)
  }

  test("nProbe = nLists degenerates to the exact brute-force topK") {
    val df = corpus(60, 8, 7)
    val q = df.filter($"vec_id" === 3).select($"embedding").head.getSeq[Double](0).toArray
    val got = IvfFlat.topK(df, "embedding", "vec_id", q, k = 5, nLists = 8, nProbe = 8)
      .select("vec_id").as[Long].collect().toSeq
    val exact = VectorSim.topK(df, "embedding", q, 5, "vec_id")
      .select("vec_id").as[Long].collect().toSeq
    assert(got == exact)
  }

  test("a clone of the query is recalled even at nProbe = 1") {
    // The clone quantizes to the same centroid as the query (they are
    // the same point up to scale), so the query's own nearest list —
    // always probed — contains it.
    val rnd = new Random(11)
    val dim = 8
    val base = Array.fill(dim)(rnd.nextGaussian())
    val rows = (0L until 40L).map(i => (i, 0, Seq.fill(dim)(rnd.nextGaussian()))) :+
      (99L, 0, base.map(_ * 1.001).toSeq)
    val df = rows.toDF("vec_id", "label", "embedding")
    val got = IvfFlat.topK(df, "embedding", "vec_id", base, k = 1, nLists = 8, nProbe = 1)
      .select("vec_id").as[Long].collect()
    assert(got.sameElements(Array(99L)))
  }
}
