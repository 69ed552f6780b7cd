package graft.sim

import graft.SparkSpec

class ProductQuantizerSpec extends SparkSpec {
  import spark.implicits._

  // 4 well-separated clusters in 8-D; subspaces of 4 dims each see the
  // same separation, so codes align with true clusters.
  private def vec(cluster: Int, i: Long): Seq[Double] =
    (0 until 8).map { d =>
      (if (d % 4 == cluster % 4) 100.0 * (cluster + 1) else 0.0) +
        ((i * 31 + d * 7) % 9 - 4) * 0.05
    }
  private def corpus = (0L until 120L)
    .map(i => (i, (i % 4).toInt, vec((i % 4).toInt, i)))
    .toDF("vec_id", "label", "embedding")

  test("codes are within [0, k), deterministic, layout-invariant") {
    val model = ProductQuantizer.fit(corpus, "embedding", "vec_id",
      dim = 8, m = 2, k = 4, iters = 2)
    def codes(df: org.apache.spark.sql.DataFrame) =
      ProductQuantizer.encode(df, "embedding", model)
        .select("vec_id", "code").as[(Long, Seq[Int])].collect().toMap
    val a = codes(corpus)
    val b = codes(corpus.repartition(7))
    assert(a == b)
    assert(a.values.forall(c => c.length == 2 && c.forall(r => r >= 0 && r < 4)))
  }

  test("ADC top-k recovers the query's true cluster") {
    val model = ProductQuantizer.fit(corpus, "embedding", "vec_id",
      dim = 8, m = 2, k = 4, iters = 3)
    val q = vec(2, 1000L).toArray
    val got = ProductQuantizer.topKAdc(corpus, "embedding", "vec_id", model, q, k = 10)
      .select("label").as[Int].collect()
    assert(got.forall(_ == 2), s"expected all cluster-2 results, got ${got.toSeq}")
  }

  test("IvfPq at nProbe = nLists degenerates to plain PQ ADC") {
    val q = vec(1, 500L).toArray
    val all = IvfPq.topK(corpus, "embedding", "vec_id", dim = 8, q, k = 10,
      nLists = 4, nProbe = 4, m = 2, kSub = 4, pqIters = 1)
      .select("vec_id").as[Long].collect().toSeq
    val model = ProductQuantizer.fit(corpus, "embedding", "vec_id", 8, 2, 4, 1)
    val plain = ProductQuantizer.topKAdc(corpus, "embedding", "vec_id", model, q, 10)
      .select("vec_id").as[Long].collect().toSeq
    assert(all == plain)
  }

  test("IvfPq probes prune candidates but keep the query's own cluster") {
    val q = vec(3, 77L).toArray
    val got = IvfPq.topK(corpus, "embedding", "vec_id", dim = 8, q, k = 10,
      nLists = 4, nProbe = 1, m = 2, kSub = 4, pqIters = 3)
      .select("label").as[Int].collect()
    assert(got.nonEmpty && got.forall(_ == 3))
  }

  // Clustered fixture where the cluster OFFSET dominates the signal:
  // 4 clusters at per-dim offsets 1000·(k+1); intra-cluster detail is
  // a scalar t ∈ {−2..2} added to every dim. Raw-vector PQ spends its
  // code book on the offsets (every member of a cluster collapses to
  // one code → ADC ties → arbitrary tie-break ranking); residual PQ
  // spends the SAME bytes on the detail axis. Ground truth: the 10
  // vectors at distance 0 from the query.
  private def clustered = (0L until 200L).map { i =>
    val k = (i % 4).toInt
    val t = (((i / 4) % 3).toDouble - 1.0) * 2.0
    (i, k, (0 until 8).map(_ => 1000.0 * (k + 1) + t))
  }.toDF("vec_id", "label", "embedding")

  test("residual encoding ≥ raw at equal bytes on clustered data (Jégou §IV.B)") {
    val q = (0 until 8).map(_ => 1000.0 * 3 + 2.0).toArray // cluster 2, t = +2
    // ground truth: top-10 by exact L2, ties by vec_id — the 10
    // smallest-id members of (cluster 2, t = +2), all at distance 0
    val truth = (0L until 200L)
      .filter(i => i % 4 == 2 && (i / 4) % 3 == 2).take(10).toSet
    assert(truth.size == 10)
    def recall(ids: Seq[Long]): Double =
      ids.count(truth.contains).toDouble / truth.size
    val raw = IvfPq.topK(clustered, "embedding", "vec_id", dim = 8, q, k = 10,
      nLists = 8, nProbe = 8, m = 2, kSub = 8, pqIters = 2)
      .select("vec_id").as[Long].collect().toSeq
    val res = IvfPq.topKResidual(clustered, "embedding", "vec_id", dim = 8, q,
      k = 10, nLists = 8, nProbe = 8, m = 2, kSub = 8, pqIters = 2)
      .select("vec_id").as[Long].collect().toSeq
    assert(recall(res) >= recall(raw),
      s"residual recall ${recall(res)} < raw ${recall(raw)}")
    assert(recall(res) >= 0.6,
      s"residual recall too low: ${recall(res)} (res=$res raw=$raw rawRecall=${recall(raw)})")
  }

  test("topKResidual is deterministic and layout-invariant") {
    val q = vec(1, 500L).toArray
    def run(df: org.apache.spark.sql.DataFrame) =
      IvfPq.topKResidual(df, "embedding", "vec_id", dim = 8, q, k = 10,
        nLists = 4, nProbe = 4, m = 2, kSub = 4, pqIters = 1)
        .select("vec_id", "adc").as[(Long, Double)].collect().toSeq
    assert(run(corpus) == run(corpus.repartition(7)))
  }

  test("at-rest IVF-PQ index: codes-only storage, pruned probe, ≡ in-memory path") {
    val path = java.nio.file.Files.createTempDirectory("pq_idx_spec").toString
    IvfPq.writeIndex(corpus, "embedding", "vec_id", dim = 8, path,
      nLists = 4, m = 2, kSub = 4, pqIters = 1)
    // the vector column does NOT exist at rest — codes only
    val stored = spark.read.parquet(path)
    assert(!stored.columns.contains("embedding") && stored.columns.contains("code"))
    val q = vec(1, 500L).toArray
    val served = IvfPq.topKIndexed(spark, path, "vec_id", q, k = 10, nProbe = 4)
    val plan = served.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("list"),
      s"probe must prune partitions:\n$plan")
    val inMem = IvfPq.topK(corpus, "embedding", "vec_id", dim = 8, q, k = 10,
      nLists = 4, nProbe = 4, m = 2, kSub = 4, pqIters = 1)
      .select("vec_id", "adc").as[(Long, Double)].collect().toSeq
    assert(served.select("vec_id", "adc").as[(Long, Double)].collect().toSeq == inMem)
  }

  test("IvfPq.appendToIndex: batch-split == one-shot; appended vectors servable") {
    import org.apache.spark.sql.functions.{col, pmod, lit}
    val base = corpus.filter(pmod(col("vec_id"), lit(3)) =!= 0)
    val delta = corpus.filter(pmod(col("vec_id"), lit(3)) === 0)
    val tmp = java.nio.file.Files.createTempDirectory("graft_ivfpq_incr").toString
    val p1 = s"$tmp/one"; val p2 = s"$tmp/split"
    for (p <- Seq(p1, p2))
      IvfPq.writeIndex(base, "embedding", "vec_id", dim = 8, p,
        nLists = 4, m = 2, kSub = 4)
    IvfPq.appendToIndex(spark, delta, "embedding", p1)
    IvfPq.appendToIndex(spark,
      delta.filter(col("vec_id") < 60), "embedding", p2)
    IvfPq.appendToIndex(spark,
      delta.filter(col("vec_id") >= 60), "embedding", p2)
    // Identical merged content either way — existing quantizers route
    // and encode the delta deterministically.
    def content(p: String) = spark.read.parquet(p)
      .select($"vec_id", $"list", $"code")
      .as[(Long, Int, Seq[Int])].collect().toSet
    assert(content(p1) == content(p2))
    assert(content(p1).size == 120)
    // Serving reaches the appended rows: an appended vector's own
    // cluster is recalled through the merged index.
    val q = vec(0, 12L).toArray // vec_id 12 ∈ delta (12 % 3 == 0)
    val got = IvfPq.topKIndexed(spark, p1, "vec_id", q, k = 10, nProbe = 2)
      .select("vec_id").as[Long].collect().toSet
    assert(got.contains(12L))
    assert(IvfPq.topKIndexed(spark, p2, "vec_id", q, k = 10, nProbe = 2)
      .select("vec_id").as[Long].collect().toSet == got)
  }

  test("null vectors get null codes and are excluded from ADC") {
    val withNull = corpus.union(
      Seq((999L, 0, null.asInstanceOf[Seq[Double]])).toDF("vec_id", "label", "embedding"))
    val model = ProductQuantizer.fit(withNull, "embedding", "vec_id", 8, 2, 4, 1)
    val enc = ProductQuantizer.encode(withNull, "embedding", model)
    assert(enc.filter("vec_id = 999").select("code").first().isNullAt(0))
    val top = ProductQuantizer.topKAdc(withNull, "embedding", "vec_id", model,
      vec(0, 7L).toArray, k = 200)
    assert(top.filter("vec_id = 999").count() == 0)
  }
}
