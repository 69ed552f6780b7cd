package graft.stats

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BootstrapSpec extends SparkSpec {
  import spark.implicits._

  test("poissonWeight is the inverse CDF with a cap at 6") {
    val us = Seq(0.0, 0.3678, 0.368, 0.7357, 0.736, 0.92, 0.9811,
      0.9964, 0.9995, 0.99999)
    val got = us.toDF("u").select(Bootstrap.poissonWeight(col("u")).as("w"))
      .as[Long].collect().toSeq
    assert(got === Seq(0L, 0L, 1L, 1L, 2L, 3L, 4L, 5L, 6L, 6L))
  }

  test("replicate weights behave like Poisson(1): Sigma-w tracks n, mean near value mean") {
    val df = (1L to 2000L).map(i => (i, 100L + (i % 7))).toDF("id", "v")
    val reps = Bootstrap.replicateSums(df, "v", "id", b = 16, salt = "t")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(reps.length === 16)
    reps.foreach { case (_, n, s) =>
      assert(math.abs(n - 2000) < 300, s"n=$n") // sd(Σw) = √2000 ≈ 45
      val mean = s.toDouble / n
      assert(math.abs(mean - 103.0) < 1.0, s"mean=$mean")
    }
  }

  test("deterministic and layout-invariant") {
    val df = (1L to 500L).map(i => (i, i * 3)).toDF("id", "v")
    val a = Bootstrap.rankedMeans(df, "v", "id", 8, "s").collect().toSeq
    val b = Bootstrap.rankedMeans(df.repartition(13), "v", "id", 8, "s")
      .collect().toSeq
    assert(a.map(_.toString).sorted === b.map(_.toString).sorted)
  }

  test("sql mirror carries the same thresholds") {
    val sql = Bootstrap.poissonWeightSql("u")
    assert(sql.contains("0.36787944117144233"))
    assert(sql.contains("0.9994058151824183"))
    assert(sql.contains("CASE WHEN u < 0.36787944117144233 THEN 0"))
  }

  test("non-long value column fails loudly") {
    val df = Seq((1L, 1.5)).toDF("id", "v")
    val e = intercept[IllegalArgumentException] {
      Bootstrap.replicateSums(df, "v", "id", 4, "s")
    }
    assert(e.getMessage.contains("LongType"))
  }
}
