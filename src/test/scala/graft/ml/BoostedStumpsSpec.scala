package graft.ml

import graft.SparkSpec

class BoostedStumpsSpec extends SparkSpec {
  import spark.implicits._

  test("a perfect step function is captured in round 1; later rounds add ~nothing") {
    // y = 100 for q <= 5, 900 for q > 5 — exactly one stump's worth.
    val df = (1L to 10L).flatMap(q =>
      Seq.fill(4)((q, if (q <= 5) 100L else 900L)))
      .toDF("q", "y")
    val m = BoostedStumps.fit(df, "q", "y", rounds = 2)
    assert(m.head.threshold == 5L)
    assert(m.head.predLeft == 100L && m.head.predRight == 900L)
    assert(m.head.gain == 1.0)
    // Residuals are exactly zero → round 2 predicts 0 on both sides.
    assert(m(1).predLeft == 0L && m(1).predRight == 0L)
  }

  test("boosting round 2 refines what round 1 left: ensemble beats single stump") {
    // Two nested steps: coarse split at 8, finer structure below it.
    val df = (1L to 16L).flatMap { q =>
      val y = (if (q <= 8) 0L else 1000L) + (if (q <= 4) 0L else 200L)
      Seq.fill(3)((q, y))
    }.toDF("q", "y")
    def sse(model: Seq[BoostedStumps.Stump]): Double = {
      val rows = df.as[(Long, Long)].collect()
      rows.map { case (q, y) =>
        val pred = model.map(s => if (q <= s.threshold) s.predLeft else s.predRight).sum
        val e = (y - pred).toDouble; e * e
      }.sum
    }
    val one = BoostedStumps.fit(df, "q", "y", rounds = 1)
    val two = BoostedStumps.fit(df, "q", "y", rounds = 2)
    assert(two.take(1) == one) // boosting extends, never rewrites, round 1
    assert(sse(two) < sse(one), s"round 2 did not reduce SSE: ${sse(two)} vs ${sse(one)}")
  }

  test("closed-form residual histogram == brute-force per-row residuals") {
    val rnd = new scala.util.Random(7)
    val rows = (0 until 200).map(_ =>
      ((rnd.nextInt(6) + 1).toLong, (rnd.nextInt(2000) - 400).toLong))
    val df = rows.toDF("q", "y")
    val m = BoostedStumps.fit(df, "q", "y", rounds = 3)
    // Brute force: materialize residuals after round 1, fit a fresh
    // single stump on them — must equal round 2 of the boosted fit.
    val s1 = m.head
    val resid = rows.map { case (q, y) =>
      (q, y - (if (q <= s1.threshold) s1.predLeft else s1.predRight))
    }
    val fresh = BoostedStumps.fit(resid.toDF("q", "y"), "q", "y", rounds = 1)
    assert(fresh.head == m(1), s"closed form diverged: ${fresh.head} vs ${m(1)}")
  }

  test("deterministic and layout-invariant") {
    val rnd = new scala.util.Random(11)
    val rows = (0 until 300).map(_ =>
      ((rnd.nextInt(9) + 1).toLong, rnd.nextInt(5000).toLong))
    val a = BoostedStumps.fit(rows.toDF("q", "y"), "q", "y", 3)
    val b = BoostedStumps.fit(rows.toDF("q", "y").repartition(7), "q", "y", 3)
    assert(a == b)
  }
}
