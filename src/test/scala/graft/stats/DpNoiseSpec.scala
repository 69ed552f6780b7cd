package graft.stats

import org.apache.spark.sql.functions._
import graft.SparkSpec

class DpNoiseSpec extends SparkSpec {
  import spark.implicits._

  test("seeded uniform is strictly inside (0,1) and replayable") {
    val d = (1 to 200).map(i => s"g$i").toDF("g")
    val us = d.select(DpNoise.seededUniform($"g", "s1").as("u"))
      .as[Double].collect()
    assert(us.forall(u => u > 0.0 && u < 1.0))
    val again = d.select(DpNoise.seededUniform($"g", "s1").as("u"))
      .as[Double].collect()
    assert(us.toSeq == again.toSeq)
    // different salt → different stream
    val other = d.select(DpNoise.seededUniform($"g", "s2").as("u"))
      .as[Double].collect()
    assert(us.toSeq != other.toSeq)
  }

  test("laplace noise: integer, signed both ways, scale tracks epsilon") {
    val d = (1 to 500).map(i => s"g$i").toDF("g")
    val loose = d.select(DpNoise.seededLaplace($"g", "s1", 0.1).as("x"))
      .as[Long].collect()
    val tight = d.select(DpNoise.seededLaplace($"g", "s1", 2.0).as("x"))
      .as[Long].collect()
    assert(loose.exists(_ > 0) && loose.exists(_ < 0))
    // E|X| = 1/eps: 10 vs 0.5 — means must be far apart
    val mLoose = loose.map(math.abs).sum.toDouble / loose.length
    val mTight = tight.map(math.abs).sum.toDouble / tight.length
    assert(mLoose > 5 * mTight, s"$mLoose vs $mTight")
  }

  test("noisyCounts clamps at zero and keys noise by group") {
    val d = Seq.fill(3)("a").union(Seq("b")).toDF("g")
    val r = DpNoise.noisyCounts(d.toDF("g"), "g", "s1", 0.05)
      .as[(String, Long)].collect().toMap
    assert(r.keySet == Set("a", "b"))
    assert(r.values.forall(_ >= 0L))
  }
}
