package graft.sim

import graft.SparkSpec

class PcaSpec extends SparkSpec {
  import spark.implicits._

  test("recovers the dominant direction of points on a known line") {
    // points along y = 2x (plus a tiny orthogonal wiggle): PC1 ∝
    // (1, 2)/√5 = (0.447214, 0.894427)
    val pts = (-20 to 20).map { i =>
      val t = i / 10.0
      val wig = (i % 3 - 1) * 0.01
      (i.toLong, Seq((t + 2 * wig).toFloat, (2 * t - wig).toFloat))
    }
    val v = Pca.topComponent(pts.toDF("id", "vec"), "vec", "id", iters = 5)
      .orderBy("j").select("loading").as[Double].collect()
    assert(v.length == 2)
    assert(math.abs(math.abs(v(0)) - 0.447214) < 0.01, v.toSeq)
    assert(math.abs(math.abs(v(1)) - 0.894427) < 0.01, v.toSeq)
    assert(math.abs(v.map(x => x * x).sum - 1.0) < 1e-4)
  }

  test("loadings are layout-invariant (exact-decimal contract)") {
    val pts = (1 to 200).map(i =>
      (i.toLong, Seq.tabulate(8)(j => ((i * (j + 3)) % 101 / 101.0f))))
    val df = pts.toDF("id", "vec")
    val a = Pca.topComponent(df.repartition(13), "vec", "id", iters = 3)
      .orderBy("j").collect().toSeq
    val b = Pca.topComponent(df.coalesce(1), "vec", "id", iters = 3)
      .orderBy("j").collect().toSeq
    assert(a == b)
  }

  test("constant input stalls loudly") {
    val pts = (1 to 50).map(i => (i.toLong, Seq(1.0f, 2.0f, 3.0f)))
    val e = intercept[IllegalArgumentException] {
      Pca.topComponent(pts.toDF("id", "vec"), "vec", "id", iters = 1).collect()
    }
    assert(e.getMessage.contains("stalled"))
  }
}
