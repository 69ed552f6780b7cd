package graft.stats

import graft.SparkSpec

class DistinctSketchSpec extends SparkSpec {
  import spark.implicits._

  test("small cardinality: exact branch") {
    val df = (1 to 50).map(i => s"v$i").toDF("v")
    val r = DistinctSketch.kmv(df, "v", k = 128).head()
    assert(r.getLong(0) == 50L)
    assert(r.getDouble(2) == 50.0)
  }

  test("duplicates do not move the sketch") {
    val df = (1 to 50).map(i => s"v$i").toDF("v")
    val dup = df.union(df).union(df)
    assert(DistinctSketch.kmv(df, "v", 128).head() ==
      DistinctSketch.kmv(dup, "v", 128).head())
  }

  test("estimate within KMV error bounds at 10k distinct") {
    val df = (1 to 10000).map(i => s"value-$i").toDF("v")
    val est = DistinctSketch.kmv(df, "v", k = 256).head().getDouble(2)
    // relative error ~1/sqrt(k-2) ≈ 6.3%; allow 4σ.
    assert(math.abs(est - 10000) < 10000 * 0.25, s"est=$est")
  }

  test("nulls are ignored") {
    val df = ((1 to 50).map(i => Some(s"v$i")) ++ Seq(None, None)).toDF("v")
    assert(DistinctSketch.kmv(df, "v", 128).head().getLong(0) == 50L)
  }

  test("plan is distinct-aggregate + TakeOrdered (k-bounded, no full value shuffle to one node)") {
    val df = (1 to 1000).map(i => s"v$i").toDF("v")
    val plan = DistinctSketch.kmv(df, "v", 64).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"))
    assert(!plan.contains("GlobalLimit")) // the k-cut must be the top-k operator, not sort+limit
  }
}
