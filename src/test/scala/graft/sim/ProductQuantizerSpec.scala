package graft.sim

import graft.SparkSpec

class ProductQuantizerSpec extends SparkSpec {
  import spark.implicits._

  // 4 well-separated clusters in 8-D; subspaces of 4 dims each see the
  // same separation, so codes align with true clusters.
  private def vec(cluster: Int, i: Long): Seq[Double] =
    (0 until 8).map { d =>
      (if (d % 4 == cluster % 4) 100.0 * (cluster + 1) else 0.0) +
        ((i * 31 + d * 7) % 9 - 4) * 0.05
    }
  private def corpus = (0L until 120L)
    .map(i => (i, (i % 4).toInt, vec((i % 4).toInt, i)))
    .toDF("vec_id", "label", "embedding")

  test("codes are within [0, k), deterministic, layout-invariant") {
    val model = ProductQuantizer.fit(corpus, "embedding", "vec_id",
      dim = 8, m = 2, k = 4, iters = 2)
    def codes(df: org.apache.spark.sql.DataFrame) =
      ProductQuantizer.encode(df, "embedding", model)
        .select("vec_id", "code").as[(Long, Seq[Int])].collect().toMap
    val a = codes(corpus)
    val b = codes(corpus.repartition(7))
    assert(a == b)
    assert(a.values.forall(c => c.length == 2 && c.forall(r => r >= 0 && r < 4)))
  }

  test("ADC top-k recovers the query's true cluster") {
    val model = ProductQuantizer.fit(corpus, "embedding", "vec_id",
      dim = 8, m = 2, k = 4, iters = 3)
    val q = vec(2, 1000L).toArray
    val got = ProductQuantizer.topKAdc(corpus, "embedding", "vec_id", model, q, k = 10)
      .select("label").as[Int].collect()
    assert(got.forall(_ == 2), s"expected all cluster-2 results, got ${got.toSeq}")
  }

  test("null vectors get null codes and are excluded from ADC") {
    val withNull = corpus.union(
      Seq((999L, 0, null.asInstanceOf[Seq[Double]])).toDF("vec_id", "label", "embedding"))
    val model = ProductQuantizer.fit(withNull, "embedding", "vec_id", 8, 2, 4, 1)
    val enc = ProductQuantizer.encode(withNull, "embedding", model)
    assert(enc.filter("vec_id = 999").select("code").first().isNullAt(0))
    val top = ProductQuantizer.topKAdc(withNull, "embedding", "vec_id", model,
      vec(0, 7L).toArray, k = 200)
    assert(top.filter("vec_id = 999").count() == 0)
  }
}
