package graft.stats

import graft.SparkSpec

class HllSpec extends SparkSpec {

  private def est(n: Int): (Double, Long) = {
    import spark.implicits._
    val df = (1 to n).map(i => s"val_$i").toDF("v").repartition(4)
    val row = Hll.summary(df, "v").collect().head
    (row.getAs[Double]("est_distinct"), row.getAs[Long]("zeros"))
  }

  test("estimate tracks true cardinality within the m=64 error regime") {
    // σ ≈ 1.04/√64 = 13%; allow 4σ to keep the test deterministic-safe
    for (n <- Seq(200, 1000, 5000)) {
      val (e, _) = est(n)
      assert(math.abs(e - n) / n < 0.52, s"n=$n est=$e")
    }
  }

  test("small cardinalities fall into the linear-counting branch and are near-exact") {
    for (n <- Seq(3, 10, 40)) {
      val (e, zeros) = est(n)
      assert(zeros > 0)
      // linear counting at m=64 is very tight for n << m
      assert(math.abs(e - n) <= math.max(2.0, 0.25 * n), s"n=$n est=$e")
    }
  }

  test("duplicates do not move the estimate (distinct semantics)") {
    import spark.implicits._
    val once = (1 to 300).map(i => s"v$i")
    val dup = once ++ once ++ once
    val a = Hll.summary(once.toDF("v"), "v").collect().head
    val b = Hll.summary(dup.toDF("v").repartition(7), "v").collect().head
    assert(a == b)
  }

  test("grouped summary equals the plain summary run per group") {
    import spark.implicits._
    val rows = (1 to 900).map(i => (s"g${i % 3}", s"v${i % (100 * (i % 3 + 1))}"))
    val df = rows.toDF("g", "v").repartition(6)
    val grouped = Hll.summaryGrouped(df, "v", Seq("g")).collect()
      .map(r => r.getString(0) -> r.toSeq.drop(1)).toMap
    for (g <- Seq("g0", "g1", "g2")) {
      val plain = Hll.summary(df.filter($"g" === g), "v").collect().head.toSeq
      assert(grouped(g) == plain, s"group $g")
    }
  }

  test("summary is layout-invariant and deterministic") {
    import spark.implicits._
    val data = (1 to 800).map(i => s"doc_$i")
    val a = Hll.summary(data.toDF("v").repartition(2), "v").collect().head
    val b = Hll.summary(scala.util.Random.shuffle(data).toDF("v").repartition(13), "v")
      .collect().head
    assert(a == b)
  }
}
