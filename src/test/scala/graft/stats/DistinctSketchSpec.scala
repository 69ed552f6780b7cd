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

  test("grouped: per-key sketches match the global formula, any partitioning") {
    // 3 groups with 10/40/90 distinct values — k=64 makes g1/g2 exact
    // and g3 estimated; the estimate is an order statistic, so it is
    // identical however the input is partitioned.
    val rows = (1 to 10).map(i => ("g1", s"a$i")) ++
      (1 to 40).map(i => ("g2", s"b$i")) ++
      (1 to 90).map(i => ("g3", s"c$i")) ++
      (1 to 90).map(i => ("g3", s"c$i")) // dupes must not move it
    for (parts <- Seq(1, 7)) {
      val got = DistinctSketch.kmvGrouped(
        rows.toDF("g", "v").repartition(parts), "v", Seq("g"), k = 64)
        .orderBy("g")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(3)))
      assert(got(0) == (("g1", 10L, 10.0)), s"parts=$parts")
      assert(got(1) == (("g2", 40L, 40.0)), s"parts=$parts")
      assert(got(2)._2 == 64L && got(2)._3 > 45 && got(2)._3 < 180,
        s"parts=$parts: ${got(2)}") // KMV error band at k=64
    }
  }

  test("grouped: buffers stay capped at k entries per partial") {
    val rows = (1 to 5000).map(i => ("g", s"v$i"))
    val mins = rows.toDF("g", "v").repartition(11)
      .groupBy($"g")
      .agg(DistinctSketch.kMin(
        org.apache.spark.sql.functions.conv(
          org.apache.spark.sql.functions.substring(
            org.apache.spark.sql.functions.md5($"v"), 1, 15), 16, 10)
          .cast("long"), 32).as("m"))
      .select("m").as[Seq[Long]].head()
    assert(mins.length == 32 && mins == mins.sorted)
  }

  test("setops: k >= universe makes every estimate exact") {
    // A = 1..60, B = 41..100: |A|=60 |B|=60 |A∪B|=100 |A∩B|=20.
    val a = (1 to 60).map(i => s"x$i").toDF("v")
    val b = (41 to 100).map(i => s"x$i").toDF("v")
    val r = DistinctSketch.kmvSetOps(a, b, "v", k = 256).head()
    assert(r.getAs[Double]("est_a") === 60.0)
    assert(r.getAs[Double]("est_b") === 60.0)
    assert(r.getAs[Double]("est_union") === 100.0)
    assert(r.getAs[Double]("est_inter") === 20.0)
    assert(r.getAs[Double]("est_jaccard") === 0.2)
  }

  test("setops: estimates land in the KMV error band when k < |sets|") {
    // A = 1..3000, B = 2001..5000: union 5000, inter 1000, J = 0.2.
    val a = (1 to 3000).map(i => s"x$i").toDF("v")
    val b = (2001 to 5000).map(i => s"x$i").toDF("v")
    val r = DistinctSketch.kmvSetOps(a, b, "v", k = 256).head()
    assert(r.getAs[Long]("ku") === 256L)
    assert(math.abs(r.getAs[Double]("est_union") - 5000) < 1500)
    assert(math.abs(r.getAs[Double]("est_inter") - 1000) < 600)
    assert(math.abs(r.getAs[Double]("est_jaccard") - 0.2) < 0.12)
  }

  test("setops: layout-invariant (partitioning does not change the sketch)") {
    val a = (1 to 800).map(i => s"a$i").toDF("v")
    val b = (400 to 1200).map(i => s"a$i").toDF("v")
    val one = DistinctSketch.kmvSetOps(a.coalesce(1), b.coalesce(1), "v", 64).head()
    val many = DistinctSketch.kmvSetOps(a.repartition(7), b.repartition(5), "v", 64).head()
    assert(one === many)
  }

  test("plan is distinct-aggregate + TakeOrdered (k-bounded, no full value shuffle to one node)") {
    val df = (1 to 1000).map(i => s"v$i").toDF("v")
    val plan = DistinctSketch.kmv(df, "v", 64).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"))
    assert(!plan.contains("GlobalLimit")) // the k-cut must be the top-k operator, not sort+limit
  }
}
