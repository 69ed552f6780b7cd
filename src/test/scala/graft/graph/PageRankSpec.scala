package graft.graph

import graft.SparkSpec

class PageRankSpec extends SparkSpec {
  import spark.implicits._

  test("hand-computed 3-node chain a→b→c") {
    // N=3, d=0.85. r0 = 1/3 each (rounded 0.333333).
    // iter1: dangling = r(c) = 0.333333; base = 0.05 + 0.85*0.333333/3
    //   a: base + 0            ; b: base + 0.85*r(a); c: base + 0.85*r(b)
    val edges = Seq(("a", "b"), ("b", "c")).toDF("src", "dst")
    val got = PageRank.pageRank(edges, "src", "dst", iters = 1)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val r0 = BigDecimal(1.0 / 3).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // (1 - 0.85), NOT the literal 0.15: the two differ by one ulp and
    // the implementation computes 1 − damping.
    val base = (1 - 0.85) / 3 + 0.85 * (r0 / 3)
    def rnd(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got("a") == rnd(base))
    assert(got("b") == rnd(base + 0.85 * r0))
    assert(got("c") == rnd(base + 0.85 * r0))
  }

  test("mass is conserved across iterations (up to rounding)") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L), (4L, 1L))
      .toDF("src", "dst")
    val total = PageRank.pageRank(edges, "src", "dst", iters = 3)
      .agg(org.apache.spark.sql.functions.sum("rank")).head().getDouble(0)
    assert(math.abs(total - 1.0) < 1e-3, s"total mass $total")
  }

  test("a sink (dangling) node still receives and redistributes rank") {
    // star into a sink: the sink's rank must exceed the leaves', and
    // the dangling redistribution keeps leaves above the raw teleport.
    val edges = Seq((1L, 9L), (2L, 9L), (3L, 9L)).toDF("src", "dst")
    val got = PageRank.pageRank(edges, "src", "dst", iters = 2)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(9L) > got(1L))
    assert(got(1L) > 0.15 / 4 - 1e-9)
    assert(got(1L) == got(2L) && got(2L) == got(3L))
  }

  test("ONE driver action per iteration (dangling mass folded into the main aggregate)") {
    // Round-9 directive: round 8 ran two extra driver actions per
    // iteration (dangling head() + materializing count()). Now the
    // dangling mass rides the contribution aggregate under a NULL key,
    // so the marginal cost of an extra iteration is exactly one query
    // execution. (Counting raw Spark JOBS would over-count: AQE splits
    // one action into a job per materialized stage.) Comparing iters=2
    // vs iters=5 cancels the fixed setup/teardown actions.
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L), (4L, 1L))
      .toDF("src", "dst")
    def jobsFor(iters: Int): Int = {
      val counter = new java.util.concurrent.atomic.AtomicInteger(0)
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onOtherEvent(
            e: org.apache.spark.scheduler.SparkListenerEvent): Unit = e match {
          case _: org.apache.spark.sql.execution.ui.SparkListenerSQLExecutionStart =>
            counter.incrementAndGet()
          case _ => ()
        }
      }
      spark.sparkContext.addSparkListener(listener)
      try {
        PageRank.pageRank(edges, "src", "dst", iters = iters)
        // Listener delivery is async: poll until the count is stable.
        var last = -1
        var stable = 0
        while (stable < 3) {
          Thread.sleep(200)
          val c = counter.get()
          if (c == last) stable += 1 else { stable = 0; last = c }
        }
      } finally spark.sparkContext.removeSparkListener(listener)
      counter.get()
    }
    val j2 = jobsFor(2)
    val j5 = jobsFor(5)
    assert(j5 - j2 == 3, s"expected 1 job per extra iteration, got $j2 → $j5")
  }

  test("zero iterations returns the uniform vector") {
    val edges = Seq((1L, 2L)).toDF("src", "dst")
    val got = PageRank.pageRank(edges, "src", "dst", iters = 0)
      .collect().map(_.getDouble(1)).toSet
    assert(got == Set(0.5))
  }

  test("personalized: matches the scalar strongly-preferential recurrence") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (2L, 4L), (4L, 5L))
      .toDF("src", "dst")
    val seeds = Set(1L, 2L)
    val got = PageRank.personalized(edges, "src", "dst",
        seedPred = org.apache.spark.sql.functions.col("id").isin(1L, 2L),
        iters = 4)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // scalar replay with identical per-iteration rounding
    val nodes = Seq(1L, 2L, 3L, 4L, 5L)
    val out = Map(1L -> Seq(2L), 2L -> Seq(3L, 4L), 3L -> Seq(1L),
      4L -> Seq(5L), 5L -> Seq.empty[Long])
    val p = nodes.map(n => n -> (if (seeds(n)) 0.5 else 0.0)).toMap
    def rnd(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    var r = nodes.map(n => n -> rnd(p(n))).toMap
    for (_ <- 1 to 4) {
      val dm = nodes.filter(out(_).isEmpty).map(r).sum
      r = nodes.map { v =>
        val cin = nodes.filter(u => out(u).contains(v))
          .map(u => r(u) / out(u).size).sum
        v -> rnd((0.15 * p(v) + 0.85 * (dm * p(v))) + 0.85 * cin)
      }.toMap
    }
    nodes.foreach(n => assert(math.abs(got(n) - r(n)) < 2e-6, s"node $n"))
    // mass conserved: teleport + dangling both re-enter through p
    assert(math.abs(got.values.sum - 1.0) < 1e-4)
    // authority decays with distance from the seed set
    assert(got(3L) > got(5L))
  }

  test("personalized: a node unreachable from the seeds holds zero rank") {
    val edges = Seq((1L, 2L), (3L, 4L)).toDF("src", "dst")
    val got = PageRank.personalized(edges, "src", "dst",
        seedPred = org.apache.spark.sql.functions.col("id") === 1L,
        iters = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(3L) === 0.0) // not a seed, no in-path from seeds
    assert(got(1L) > 0.0 && got(2L) > 0.0)
  }
}
