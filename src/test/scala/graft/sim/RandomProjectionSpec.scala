package graft.sim

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RandomProjectionSpec extends SparkSpec {
  import spark.implicits._

  private val d = 8
  private val m = 4
  private val seed = "t"

  /** Scalar reference with the SAME left-to-right order. */
  private def refProj(x: Seq[Double]): Seq[Double] =
    (1 to m).map { j =>
      var acc = 0.0
      for (i <- 1 to d)
        acc = if (RandomProjection.sign(seed, i, j) > 0) acc + x(i - 1)
              else acc - x(i - 1)
      acc
    }

  test("projection matches the scalar reference bit-for-bit") {
    val vecs = Seq(
      Seq(1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0),
      Seq(0.1, -0.2, 0.33, 1e-9, -7.5, 2.25, 0.0, 9.75))
    val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "v")
    val got = RandomProjection.project(df, "v", d, m, seed)
      .orderBy("id").select("proj").as[Seq[Double]].collect()
    vecs.zip(got).foreach { case (x, y) =>
      assert(y === refProj(x)) // exact — same fp order
    }
  }

  test("signs are deterministic and roughly balanced") {
    val s1 = for (i <- 1 to 64; j <- 1 to 16) yield RandomProjection.sign("rp9", i, j)
    val s2 = for (i <- 1 to 64; j <- 1 to 16) yield RandomProjection.sign("rp9", i, j)
    assert(s1 === s2)
    val pos = s1.count(_ > 0)
    assert(pos > s1.size * 0.4 && pos < s1.size * 0.6, s"pos=$pos of ${s1.size}")
    assert(RandomProjection.sign("other", 1, 1) * RandomProjection.sign("rp9", 1, 1) != 0)
  }

  test("JL audit: distortion concentrates near 1 on random vectors") {
    val rnd = new scala.util.Random(11)
    val df = (0 until 200).map { i =>
      (i.toLong, Seq.fill(32)(rnd.nextGaussian()))
    }.toDF("id", "v")
    val dist = RandomProjection.distortion(df, "v", 32, 16, "jl")
      .select("distortion").as[Double].collect()
    assert(dist.length === 200)
    val mean = dist.sum / dist.length
    assert(math.abs(mean - 1.0) < 0.15, s"mean=$mean")
    assert(dist.forall(x => x > 0.05 && x < 5.0))
  }

  test("zero vectors are excluded from the audit (no 0/0)") {
    val df = Seq((1L, Seq.fill(8)(0.0)), (2L, Seq.fill(8)(1.0))).toDF("id", "v")
    val rows = RandomProjection.distortion(df, "v", 8, 4, seed).collect()
    assert(rows.length === 1)
  }
}
