package graft.stats

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QuantileSketchSpec extends SparkSpec {
  import spark.implicits._

  private def gk(df: org.apache.spark.sql.DataFrame, ps: Seq[Double], eps: Double) =
    df.agg(QuantileSketch.gkQuantiles(col("x"), ps, eps).as("q"))
      .head().getSeq[Double](0)

  test("exact regime matches order statistics at rank ceil(phi*N)") {
    // N = 1000 distinct values 1..1000; eps=1e-4 → exact while N < 5000.
    val df = (1 to 1000).map(_.toDouble).toDF("x").repartition(7)
    val got = gk(df, Seq(0.25, 0.5, 0.75, 0.9, 1.0), eps = 1e-4)
    assert(got == Seq(250.0, 500.0, 750.0, 900.0, 1000.0))
  }

  test("exact regime is layout-invariant (mergeable partials)") {
    val vals = (1 to 2000).map(i => ((i * 7919) % 2003).toDouble)
    val a = gk(vals.toDF("x").repartition(1), Seq(0.5), 1e-4)
    val b = gk(vals.toDF("x").repartition(13), Seq(0.5), 1e-4)
    assert(a == b)
  }

  test("nulls are skipped; empty input yields null entries") {
    val df = Seq[Option[Double]](Some(1.0), None, Some(3.0), None, Some(2.0)).toDF("x")
    assert(gk(df, Seq(0.5), 1e-4) == Seq(2.0))
    val empty = Seq.empty[Double].toDF("x")
    val r = empty.agg(QuantileSketch.gkQuantiles(col("x"), Seq(0.5), 1e-4).as("q")).head()
    assert(r.getSeq[Any](0) == Seq(null))
  }

  test("approximate regime: rank error within 2*eps*N under adversarial partitioning") {
    // N = 200k >> 1/(2*eps) at eps = 1e-2 (exact regime ends at 50):
    // the sketch compresses hard and merges 16 partials.
    val n = 200000
    val eps = 1e-2
    val vals = (1 to n).map(i => ((i.toLong * 48271) % 199999).toDouble)
    val sortedVals = vals.sorted
    val df = vals.toDF("x").repartition(16)
    val ps = Seq(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)
    val got = gk(df, ps, eps)
    ps.zip(got).foreach { case (phi, v) =>
      val target = math.max(1, math.ceil(phi * n).toLong)
      // True rank window of the returned value (handles duplicates).
      val lo = sortedVals.indexWhere(_ >= v) + 1
      val hi = sortedVals.lastIndexWhere(_ <= v) + 1
      val err = if (target < lo) lo - target else if (target > hi) target - hi else 0L
      assert(err <= (2 * eps * n).toLong,
        s"phi=$phi value=$v rank window [$lo,$hi] target $target err $err")
    }
  }

  test("bounded memory: tuple count stays O((1/eps) log(eps N))") {
    val eps = 1e-2
    val s = new GkSummary(eps)
    (1 to 100000).foreach(i => s.insert(((i.toLong * 16807) % 99991).toDouble))
    // 3/(2e)+16 = 166 is the compress trigger; allow the post-flush
    // overshoot of one pending batch.
    assert(s.tupleCount <= (3.0 / (2 * eps)).toInt + 16 + 4096,
      s"summary grew to ${s.tupleCount} tuples")
    assert(s.n == 100000L)
  }
}
