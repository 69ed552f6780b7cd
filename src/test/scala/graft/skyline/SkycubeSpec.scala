package graft.skyline

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SkycubeSpec extends SparkSpec {

  private val spec = SkylineSpec(Seq(
    SkyDim("a", Min), SkyDim("b", Max), SkyDim("c", Min)))

  /** Brute-force skyline of one subspace under MIN-normalized signs. */
  private def brute(
      pts: Seq[(Long, Double, Double, Double)],
      dims: Seq[Int]): Set[Long] = {
    def vec(p: (Long, Double, Double, Double)): Seq[Double] =
      dims.map {
        case 0 => p._2
        case 1 => -p._3 // b is MAX
        case 2 => p._4
      }
    pts.filter { p =>
      val vp = vec(p)
      !pts.exists { q =>
        val vq = vec(q)
        vq.zip(vp).forall { case (x, y) => x <= y } && vq != vp
      }
    }.map(_._1).toSet
  }

  private val masks = 1 until 8
  private def dimsOf(mask: Int): Seq[Int] = (0 until 3).filter(i => (mask & (1 << i)) != 0)
  private def labelOf(mask: Int): String =
    dimsOf(mask).map(Seq("a", "b", "c")).mkString("+")

  test("every subspace matches the brute-force skyline (300-point random trial)") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    // Coarse grid so value ties actually occur (the distinct-value caveat)
    val pts = (1L to 300L).map(i =>
      (i, rnd.nextInt(12).toDouble, rnd.nextInt(12).toDouble, rnd.nextInt(12).toDouble))
    val df = pts.toDF("id", "a", "b", "c").repartition(7)
    val got = Skycube.skycube(df, spec)
      .select("subspace", "id").collect()
      .groupBy(_.getString(0)).map { case (k, rs) => k -> rs.map(_.getLong(1)).toSet }
    assert(got.keySet == masks.map(labelOf).toSet)
    masks.foreach { m =>
      assert(got(labelOf(m)) == brute(pts, dimsOf(m)),
        s"subspace ${labelOf(m)} mismatch")
    }
  }

  test("subspace skyline is NOT contained in the full-space skyline under ties") {
    import spark.implicits._
    // p1/p2 tie on a; p2 is worse on c, so p2 is out of the full skyline
    // but shares the a-subspace skyline with p1.
    val pts = Seq((1L, 1.0, 5.0, 1.0), (2L, 1.0, 5.0, 2.0), (3L, 2.0, 9.0, 3.0))
    val df = pts.toDF("id", "a", "b", "c")
    val got = Skycube.skycube(df, spec)
      .select("subspace", "id").collect()
      .groupBy(_.getString(0)).map { case (k, rs) => k -> rs.map(_.getLong(1)).toSet }
    assert(got("a") == Set(1L, 2L))
    assert(got("a+b+c") == Set(1L, 3L))
  }

  test("one scan, one shuffle: no more exchanges than the single-skyline plan pair") {
    import spark.implicits._
    val df = (1L to 50L).map(i => (i, i.toDouble % 7, i.toDouble % 5, i.toDouble % 3))
      .toDF("id", "a", "b", "c")
    val plan = Skycube.skycube(df, spec).queryExecution.executedPlan.toString
    // exactly one repartition (the mask shuffle) + whatever the final
    // order adds; the subspace fan-out must not multiply exchanges
    assert("Exchange".r.findAllIn(plan).size <= 2, plan)
  }

  test("d > 6 fails loudly") {
    import spark.implicits._
    val df = Seq((1.0, 2.0)).toDF("a", "b")
    val wide = SkylineSpec((1 to 7).map(i => SkyDim("a", Min)))
    intercept[IllegalArgumentException] {
      Skycube.skycube(df, wide)
    }
  }
}
