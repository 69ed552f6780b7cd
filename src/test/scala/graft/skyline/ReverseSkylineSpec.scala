package graft.skyline

import scala.util.Random
import graft.SparkSpec

class ReverseSkylineSpec extends SparkSpec {
  import spark.implicits._

  private def brute(
      pts: Seq[(Long, Double, Double)], q: (Double, Double)): Set[Long] =
    pts.filter { case (id, x, y) =>
      val rx = math.abs(q._1 - x)
      val ry = math.abs(q._2 - y)
      !pts.exists { case (cid, cx, cy) =>
        val dx = math.abs(cx - x)
        val dy = math.abs(cy - y)
        cid != id && dx <= rx && dy <= ry && (dx < rx || dy < ry)
      }
    }.map(_._1).toSet

  test("hand example: nearest neighbors on each side survive, shadowed points don't") {
    // 1-D-ish line at y=0, q at x=10: p=8 shadows p=5 (|6−8|=2 ≤ |10−8|=2?
    // strict on dim x: |6−8|=2 = r=2, |0−0|=0 = 0 — no strict < → 8 stays;
    // p=2: c=5 has |5−2|=3 ≤ |10−2|=8, 0 ≤ 0, strict → 2 falls.
    val pts = Seq((1L, 8.0, 0.0), (2L, 5.0, 0.0), (3L, 2.0, 0.0), (4L, 12.0, 0.0))
    val got = ReverseSkyline.reverseSkyline(
      pts.toDF("id", "x", "y"), Seq("x", "y"), "id", Array(10.0, 0.0))
      .select("id").as[Long].collect().toSet
    assert(got == brute(pts, (10.0, 0.0)))
    assert(got.contains(1L) && got.contains(4L) && !got.contains(3L))
  }

  test("matches brute force on random data; exact duplicates knock each other out") {
    val rnd = new Random(23)
    for (trial <- 1 to 3) {
      val base = (1L to 150L).map(i =>
        (i, rnd.nextInt(40).toDouble, rnd.nextInt(40).toDouble))
      // plant an exact duplicate pair
      val pts = base :+ (200L, base.head._2, base.head._3)
      val q = (rnd.nextInt(40).toDouble, rnd.nextInt(40).toDouble)
      val got = ReverseSkyline.reverseSkyline(
        pts.toDF("id", "x", "y").repartition(5), Seq("x", "y"), "id",
        Array(q._1, q._2))
        .select("id").as[Long].collect().toSet
      assert(got == brute(pts, q), s"trial $trial q=$q")
      assert(!got.contains(base.head._1) && !got.contains(200L),
        "exact duplicates should eliminate each other (unless degenerate at q)")
    }
  }

  test("incomplete rows (null/NaN dims) are excluded") {
    val pts = Seq((1L, Some(1.0), 1.0), (2L, None, 2.0), (3L, Some(Double.NaN), 3.0))
      .toDF("id", "x", "y")
    val got = ReverseSkyline.reverseSkyline(pts, Seq("x", "y"), "id", Array(0.0, 0.0))
      .select("id").as[Long].collect().toSet
    assert(got == Set(1L))
  }

  test("grid path ≡ BNL path on random data, across grid/sample params") {
    val rnd = new Random(41)
    for (trial <- 1 to 5) {
      val base = (1L to 200L).map(i =>
        (i, rnd.nextInt(50).toDouble, rnd.nextInt(50).toDouble))
      val pts = base :+ (300L, base.head._2, base.head._3) // exact duplicate
      val q = (rnd.nextInt(50).toDouble + 0.5, rnd.nextInt(50).toDouble + 0.5)
      val df = pts.toDF("id", "x", "y").repartition(5)
      val expect = ReverseSkyline.reverseSkyline(df, Seq("x", "y"), "id",
        Array(q._1, q._2)).select("id").as[Long].collect().toSet
      assert(expect == brute(pts, q), s"BNL vs brute, trial $trial")
      // degenerate grids and zero/tiny samples must not change the set
      for ((g, ss) <- Seq((32, 64), (1, 0), (4, 1), (64, 512))) {
        val got = ReverseSkyline.reverseSkylineGrid(df, Seq("x", "y"), "id",
          Array(q._1, q._2), gridSize = g, sampleSize = ss)
          .select("id").as[Long].collect().toSet
        assert(got == expect, s"grid($g,$ss) vs BNL, trial $trial q=$q")
      }
    }
  }

  test("grid path: q coinciding with a data point, and constant dims") {
    // constant y → zero-width dim (w clamps); q exactly on a point →
    // that point's radius is 0 and it must survive.
    val pts = Seq((1L, 10.0, 5.0), (2L, 12.0, 5.0), (3L, 20.0, 5.0))
    val got = ReverseSkyline.reverseSkylineGrid(
      pts.toDF("id", "x", "y"), Seq("x", "y"), "id", Array(10.0, 5.0))
      .select("id").as[Long].collect().toSet
    assert(got == brute(pts, (10.0, 5.0)))
    assert(got.contains(1L))
  }

  private def bruteBi(
      probe: Seq[(Long, Double, Double)], cand: Seq[(Double, Double)],
      q: (Double, Double)): Set[Long] =
    probe.filter { case (_, x, y) =>
      val rx = math.abs(q._1 - x)
      val ry = math.abs(q._2 - y)
      !cand.exists { case (cx, cy) =>
        val dx = math.abs(cx - x)
        val dy = math.abs(cy - y)
        dx <= rx && dy <= ry && (dx < rx || dy < ry)
      }
    }.map(_._1).toSet

  test("bichromatic: grid ≡ BNL ≡ brute force; candidate set comes from the other table") {
    val rnd = new Random(59)
    for (trial <- 1 to 3) {
      val probe = (1L to 120L).map(i =>
        (i, rnd.nextInt(40).toDouble, rnd.nextInt(40).toDouble))
      val cand = (1 to 80).map(_ =>
        (rnd.nextInt(40).toDouble, rnd.nextInt(40).toDouble))
      val q = (rnd.nextInt(40).toDouble + 0.5, rnd.nextInt(40).toDouble + 0.5)
      val pDf = probe.toDF("id", "x", "y").repartition(4)
      val cDf = cand.toDF("x", "y").repartition(3)
      val expect = bruteBi(probe, cand, q)
      val bnl = ReverseSkyline.reverseSkylineBichromatic(pDf, cDf, Seq("x", "y"),
        Array(q._1, q._2)).select("id").as[Long].collect().toSet
      assert(bnl == expect, s"BNL vs brute, trial $trial q=$q")
      for ((g, ss) <- Seq((32, 64), (1, 0), (64, 512))) {
        val got = ReverseSkyline.reverseSkylineBichromaticGrid(pDf, cDf,
          Seq("x", "y"), "id", Array(q._1, q._2), gridSize = g, sampleSize = ss)
          .select("id").as[Long].collect().toSet
        assert(got == expect, s"grid($g,$ss), trial $trial q=$q")
      }
    }
  }

  test("bichromatic: empty candidate catalog keeps every probe point") {
    val pDf = Seq((1L, 1.0, 2.0), (2L, 3.0, 4.0)).toDF("id", "x", "y")
    val cDf = Seq.empty[(Double, Double)].toDF("x", "y")
    val got = ReverseSkyline.reverseSkylineBichromaticGrid(pDf, cDf,
      Seq("x", "y"), "id", Array(0.5, 0.5))
      .select("id").as[Long].collect().toSet
    assert(got == Set(1L, 2L))
  }

  test("grid plan has no nested-loop join and prunes through to an equi-join") {
    val pts = (1L to 100L).map(i => (i, (i % 17).toDouble, (i % 23).toDouble))
    val plan = ReverseSkyline.reverseSkylineGrid(
      pts.toDF("id", "x", "y"), Seq("x", "y"), "id", Array(8.5, 11.5))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"grid path must never plan a nested-loop join:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"grid path must never plan a cartesian product:\n$plan")
  }
}
