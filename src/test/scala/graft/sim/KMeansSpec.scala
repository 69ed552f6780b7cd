package graft.sim

import graft.SparkSpec

class KMeansSpec extends SparkSpec {
  import spark.implicits._

  // Two well-separated 2-D blobs; offsets small vs the 100-unit gap.
  private def blobs = (0L until 20L).map { i =>
    val c = if (i < 10) 0.0 else 100.0
    (i, Seq(c + i * 0.01, c - i * 0.01))
  }.toDF("vec_id", "embedding")

  test("fit converges to the blob means; assignments split the blobs") {
    val cents = KMeans.fit(blobs, "embedding", "vec_id", k = 2, iters = 3)
    assert(cents.size == 2)
    // One centroid per blob regardless of which seeds md5 drew.
    val sorted = cents.map(_._2).sortBy(_.head)
    assert(math.abs(sorted(0)(0)) < 1.0 && math.abs(sorted(1)(0) - 100.0) < 1.0)
    val a = KMeans.assignments(blobs, "embedding", "vec_id", k = 2, iters = 3)
      .select("vec_id", "cluster").as[(Long, Int)].collect().toMap
    assert(a.filter(_._1 < 10).values.toSet.size == 1)
    assert(a.filter(_._1 >= 10).values.toSet.size == 1)
    assert(a(0L) != a(19L))
  }

  test("deterministic across repartitioning (the layout-invariance contract)") {
    val base = KMeans.assignments(blobs, "embedding", "vec_id", 2, 2)
      .select("vec_id", "cluster").as[(Long, Int)].collect().toSet
    val shuffled = KMeans.assignments(blobs.repartition(7), "embedding", "vec_id", 2, 2)
      .select("vec_id", "cluster").as[(Long, Int)].collect().toSet
    assert(base == shuffled)
  }

  test("centroids are rounded to 6 decimals each round") {
    val cents = KMeans.fit(blobs, "embedding", "vec_id", k = 2, iters = 1)
    cents.foreach(_._2.foreach { x =>
      assert(x == BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    })
  }

  test("empty clusters drop out; ties assign to the smaller rank") {
    // All points identical: both seeds coincide, every point ties and
    // goes to rank 0; rank 1 starves and disappears after one round.
    val same = (0L until 6L).map(i => (i, Seq(1.0, 2.0))).toDF("vec_id", "embedding")
    val cents = KMeans.fit(same, "embedding", "vec_id", k = 2, iters = 1)
    assert(cents.map(_._1) == Seq(0))
    val a = KMeans.assignments(same, "embedding", "vec_id", 2, 1)
      .select("cluster").as[Int].collect().toSet
    assert(a == Set(0))
  }

  test("null embeddings are ignored in training and assigned null") {
    val withNull = blobs.union(Seq((99L, null.asInstanceOf[Seq[Double]])).toDF("vec_id", "embedding"))
    val cents = KMeans.fit(withNull, "embedding", "vec_id", 2, 2)
    assert(cents.size == 2)
    val row = KMeans.assignWith(withNull, "embedding", cents)
      .filter($"vec_id" === 99L).select("cluster").collect().head
    assert(row.isNullAt(0))
  }
}
