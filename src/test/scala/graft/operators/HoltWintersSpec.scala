package graft.operators

import graft.SparkSpec

class HoltWintersSpec extends SparkSpec {
  import spark.implicits._

  /** Scalar reference of the exact recurrence (truncating division). */
  private def ref(vs: Seq[Long], m: Int): Seq[(Long, Long, Long, Long)] = {
    if (vs.length < m) return Seq.empty
    val l0 = vs.take(m).sum / m
    val ring = scala.collection.mutable.ArrayBuffer(
      vs.take(m).map(_ - l0): _*)
    val init = (0 until m).map { i =>
      val nxt = if (i + 1 < m) ring(i + 1) else ring(0)
      (l0, 0L, ring(i), l0 + nxt)
    }
    var l = l0; var b = 0L
    val rest = vs.drop(m).map { v =>
      val sOld = ring.remove(0)
      val lNew = (v - sOld + l + b) / 2
      val bNew = (lNew - l + b) / 2
      val sNew = (v - lNew + sOld) / 2
      ring += sNew
      l = lNew; b = bNew
      (lNew, bNew, sNew, lNew + bNew + ring(0))
    }
    init ++ rest
  }

  private def run(rows: Seq[(String, Int, Long)], m: Int,
      partitions: Int = 0): Map[(String, Int), (Long, Long, Long, Long)] =
    HoltWinters.smooth(rows.toDF("k", "t", "v"), Seq("k"), Seq("t"), "v",
        m, partitions = partitions)
      .collect()
      .map(r => (r.getString(0), r.getInt(1)) ->
        ((r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))))
      .toMap

  test("recurrence matches the scalar reference, negatives included") {
    // seasonal deltas go negative (values below the init mean) — the
    // truncating-div agreement on negatives is the point of the test
    val series = Map(
      "a" -> Seq(100L, 10L, 250L, 3L, 80L, 80L, 999L, 120L, 5L, 260L, 1L),
      "b" -> (0 until 20).map(i => (50 + 40 * (i % 7) - i).toLong))
    val rows = scala.util.Random.shuffle(
      series.toSeq.flatMap { case (k, vs) =>
        vs.zipWithIndex.map { case (v, i) => (k, i, v) }
      })
    val got = run(rows, m = 7)
    series.foreach { case (k, vs) =>
      val exp = ref(vs, 7)
      assert(exp.nonEmpty)
      exp.zipWithIndex.foreach { case (e, i) =>
        assert(got((k, i)) === e, s"key=$k t=$i")
      }
    }
    assert(got.size === series.valuesIterator.map(_.length).sum)
  }

  test("keys shorter than the season emit nothing") {
    val rows = (0 until 5).map(i => ("short", i, 10L)) ++
      (0 until 9).map(i => ("full", i, (i * 3).toLong))
    val got = run(rows, m = 7)
    assert(!got.keys.exists(_._1 == "short"))
    assert(got.count(_._1._1 == "full") === 9)
  }

  test("layout-invariant: same answer at 1, 3, and 7 partitions") {
    val rnd = new scala.util.Random(11)
    val rows = for (k <- 0 until 6; t <- 0 until 30)
      yield (s"k$k", t, rnd.nextInt(2000).toLong - 400)
    val base = run(rows, m = 7, partitions = 1)
    for (p <- Seq(3, 7)) assert(run(rows, m = 7, partitions = p) === base)
  }

  test("one-step forecast reads the next seasonal slot") {
    val vs = (0 until 15).map(i => (100 + 7 * i).toLong)
    val got = run(vs.zipWithIndex.map { case (v, i) => ("k", i, v) }, m = 7)
    val exp = ref(vs, 7)
    // steady-state rows: fc = level + trend + s_{t+1-m} (ring head
    // after the shift) — cross-check one row by hand from the ref
    val (l, b, _, fc) = got(("k", 10))
    assert(fc === l + b + exp(4)._3) // s at t=4 is the t=11 slot's season
  }
}
