package graft.sim

import scala.util.Random
import graft.SparkSpec

class IvfFlatSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(n: Int, dim: Int, seed: Int) = {
    val rnd = new Random(seed)
    (0L until n.toLong).map(i => (i, 0, Seq.fill(dim)(rnd.nextGaussian())))
      .toDF("vec_id", "label", "embedding")
  }

  test("assign: deterministic, every list id within [0, nLists)") {
    val df = corpus(50, 8, 3)
    def lists() = IvfFlat.assign(df, "embedding", "vec_id", nLists = 8)
      .select("vec_id", "list").as[(Long, Int)].collect().toMap
    val l1 = lists()
    assert(l1 == lists())
    assert(l1.values.forall(l => l >= 0 && l < 8))
    assert(l1.size == 50)
  }

  test("nProbe = nLists degenerates to the exact brute-force topK") {
    val df = corpus(60, 8, 7)
    val q = df.filter($"vec_id" === 3).select($"embedding").head.getSeq[Double](0).toArray
    val got = IvfFlat.topK(df, "embedding", "vec_id", q, k = 5, nLists = 8, nProbe = 8)
      .select("vec_id").as[Long].collect().toSeq
    val exact = VectorSim.topK(df, "embedding", q, 5, "vec_id")
      .select("vec_id").as[Long].collect().toSeq
    assert(got == exact)
  }

  test("writeIndex + topKIndexed == in-memory topK, and the probe scan is partition-pruned") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val df = corpus(80, 8, 19)
    val q = df.filter($"vec_id" === 5).select($"embedding").head.getSeq[Double](0).toArray
    val path = java.nio.file.Files.createTempDirectory("graft_ivf_spec").toString + "/idx"
    IvfFlat.writeIndex(df, "embedding", "vec_id", nLists = 8, path)

    val indexed = IvfFlat.topKIndexed(spark, path, "embedding", "vec_id", q, k = 5, nProbe = 3)
    val inMem = IvfFlat.topK(df, "embedding", "vec_id", q, k = 5, nLists = 8, nProbe = 3)
    assert(indexed.select("vec_id").as[Long].collect().toSeq ==
      inMem.select("vec_id").as[Long].collect().toSeq)

    // The scale claim itself: the list filter must reach the scan as a
    // PARTITION filter (directory pruning), not a data filter — i.e. a
    // probe reads nProbe/nLists of the index, the way a routed SkyMr
    // reader touches only its own quadtree cell.
    val scans = indexed.queryExecution.executedPlan.collect { case f: FileSourceScanExec => f }
    assert(scans.nonEmpty, "expected a file scan over the index")
    val scan = scans.head
    assert(scan.partitionFilters.exists(_.references.exists(_.name == "list")),
      s"list filter missing from PartitionFilters: ${scan.partitionFilters}")
    // And the pruning actually selects nProbe of the nLists directories.
    val listDirs = new java.io.File(path).listFiles().filter(_.getName.startsWith("list="))
    assert(listDirs.length == 8, "index should have one directory per non-empty list")
    val scannedLists = scan.inputRDDs().head.partitions.length
    assert(scannedLists > 0)
    val readRows = spark.read.parquet(path)
      .filter($"list".isin(0, 1, 2)) // arbitrary 3 lists
      .count()
    assert(readRows < 80, "a 3-of-8 probe must not read the whole corpus")

    // nProbe = nLists through the index degenerates to exact brute force.
    val all = IvfFlat.topKIndexed(spark, path, "embedding", "vec_id", q, k = 5, nProbe = 8)
      .select("vec_id").as[Long].collect().toSeq
    val exact = VectorSim.topK(df, "embedding", q, 5, "vec_id")
      .select("vec_id").as[Long].collect().toSeq
    assert(all == exact)
  }

  test("topKIndexedBatch == per-query topKIndexed, one pass over the probed union") {
    val df = corpus(90, 8, 23)
    val path = java.nio.file.Files.createTempDirectory("graft_ivf_batch").toString + "/idx"
    IvfFlat.writeIndex(df, "embedding", "vec_id", nLists = 8, path)
    val queries = df.filter($"vec_id" < 4)
      .select($"vec_id".as("qid"), $"embedding".as("qv"))
    val batchDf = IvfFlat.topKIndexedBatch(spark, path, "embedding", "vec_id",
      queries, "qid", "qv", k = 5, nProbe = 3)
    // the union-of-probed-lists filter must land as a PARTITION filter
    // on the index scan, same as the single-query path. sparkPlan, not
    // executedPlan: the joins make this an adaptive plan whose scans
    // are hidden until execution
    val scans = batchDf.queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.exists(_.partitionFilters.exists(_.references.exists(_.name == "list"))),
      s"list filter missing from batch scan PartitionFilters")
    val batch = batchDf
      .select("qid", "vec_id", "rank").as[(Long, Long, Int)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._3).map(_._2).toSeq).toMap
    val single = (0L until 4L).map { qid =>
      val q = df.filter($"vec_id" === qid).select($"embedding").head.getSeq[Double](0).toArray
      qid -> IvfFlat.topKIndexed(spark, path, "embedding", "vec_id", q, k = 5, nProbe = 3)
        .select("vec_id").as[Long].collect().toSeq
    }.toMap
    assert(batch == single)
  }

  test("a clone of the query is recalled even at nProbe = 1") {
    // The clone quantizes to the same centroid as the query (they are
    // the same point up to scale), so the query's own nearest list —
    // always probed — contains it.
    val rnd = new Random(11)
    val dim = 8
    val base = Array.fill(dim)(rnd.nextGaussian())
    val rows = (0L until 40L).map(i => (i, 0, Seq.fill(dim)(rnd.nextGaussian()))) :+
      (99L, 0, base.map(_ * 1.001).toSeq)
    val df = rows.toDF("vec_id", "label", "embedding")
    val got = IvfFlat.topK(df, "embedding", "vec_id", base, k = 1, nLists = 8, nProbe = 1)
      .select("vec_id").as[Long].collect()
    assert(got.sameElements(Array(99L)))
  }

  test("trained quantizer beats hash-random recall on clustered data") {
    // The hash-random failure mode is a SPLIT QUERY CLUSTER: two seeds
    // inside one tight cluster shard it across two lists, and a
    // one-probe query sees only one shard. Rather than hope the md5
    // draw produces it, FORCE it: compute the three md5-smallest seed
    // ids first (the exact order IvfFlat.centroids and KMeans.fit
    // share, salt "ivf"), then build the geometry around them — seeds
    // 0 and 1 inside cluster X, a heavier seedless cluster Y 10 units
    // away, seed 2 in a far cluster Z. Lloyd provably repairs the
    // split: Y's mass captures one of X's two centroids (round 1 mean
    // lands between X and Y, then Y wins it outright), X reunifies
    // under the other, so trained lists = true clusters. Hash-random
    // keeps X sharded forever. Fully deterministic — no RNG at all.
    val dim = 8
    val n = 110L
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val bySeedOrder = (0L until n).sortBy(id => md5hex(s"ivf:$id"))
    val seeds = bySeedOrder.take(3)
    val rest = bySeedOrder.drop(3).sorted
    val clusterOf: Map[Long, Int] =
      (seeds.take(2).map(_ -> 0) ++ rest.take(28).map(_ -> 0) ++
        rest.slice(28, 88).map(_ -> 1) ++
        (seeds.drop(2) ++ rest.drop(88)).map(_ -> 2)).toMap
    val centers = Map(0 -> 0.0, 1 -> 10.0, 2 -> 1000.0)
    // The two X-seeds are PINNED at 0 and 0.1 on dim 0 with no other
    // jitter: the initial Voronoi plane at x=0.05 is guaranteed to cut
    // X's jitter cloud (±0.25), and every Y point is strictly nearer
    // seed 1 (0.2·x − 0.01 > 0 for x ≈ 10) — the asymmetric capture
    // Lloyd needs to hand Y one centroid and reunify X under the other.
    // All points carry +100 on the LAST dim: IVF routes by L2 but
    // scores by cosine, and the common offset puts the three clusters
    // in distinct narrow cones so the cosine top-10 and the L2 cells
    // agree (X-member ≈ 0.99998 vs Y-member ≈ 0.9952 vs Z ≈ 0.0995
    // to an X query) without touching the Lloyd dynamics.
    def vec(id: Long): Seq[Double] =
      if (id == seeds(0)) Seq.fill(dim - 1)(0.0) :+ 100.0
      else if (id == seeds(1)) (0.1 +: Seq.fill(dim - 2)(0.0)) :+ 100.0
      else {
        val c = clusterOf(id)
        (0 until dim).map { d =>
          (if (d == 0) centers(c) else 0.0) +
            (if (d == dim - 1) 100.0 else 0.0) +
            ((id * 37 + d * 11) % 11 - 5) * 0.05
        }
      }
    val df = (0L until n).map(i => (i, clusterOf(i), vec(i)))
      .toDF("vec_id", "label", "embedding")

    def avgRecall(trainIters: Int): Double = {
      val rs = for (c <- 0 to 2) yield {
        val q = (0 until dim).map(d =>
          (if (d == 0) centers(c) else 0.0) +
            (if (d == dim - 1) 100.0 else 0.0) + 0.001).toArray
        val exact = VectorSim.topK(df, "embedding", q, 10, "vec_id")
          .select("vec_id").as[Long].collect().toSet
        val got = IvfFlat.topK(df, "embedding", "vec_id", q, k = 10,
          nLists = 3, nProbe = 1, trainIters = trainIters)
          .select("vec_id").as[Long].collect().toSet
        got.intersect(exact).size / 10.0
      }
      rs.sum / rs.size
    }
    val hashRandom = avgRecall(0)
    val trained = avgRecall(5)
    assert(trained == 1.0, s"trained recall was $trained")
    assert(trained > hashRandom,
      s"trained ($trained) should beat hash-random ($hashRandom)")
  }

  test("appendToIndex: index+delta serving == rebuilt index with the base centroids") {
    import org.apache.spark.sql.functions.{col, pmod, lit}
    val df = corpus(90, 8, 23)
    val base = df.filter(pmod(col("vec_id"), lit(3)) =!= 0)
    val delta = df.filter(pmod(col("vec_id"), lit(3)) === 0)
    val tmp = java.nio.file.Files.createTempDirectory("graft_ivf_incr_spec").toString
    val incrPath = s"$tmp/incr"
    val rebuiltPath = s"$tmp/rebuilt"

    IvfFlat.writeIndex(base, "embedding", "vec_id", nLists = 8, incrPath)
    val baseCents = IvfFlat.readCentroids(spark, incrPath)
    IvfFlat.appendToIndex(spark, delta, "embedding", "vec_id", incrPath)
    // Rebuild arm: same centroids, full corpus, from scratch.
    IvfFlat.writeIndexWith(df, "embedding", baseCents, rebuiltPath)

    // Every list partition holds the same id set both ways (the delta
    // landed exactly where a rebuild would put it)...
    def lists(p: String) = spark.read.parquet(p)
      .select("vec_id", "list").as[(Long, Int)].collect().toMap
    assert(lists(incrPath) == lists(rebuiltPath))
    assert(lists(incrPath).size == 90)
    // ...and serving through the merged index is byte-identical.
    val q = df.filter($"vec_id" === 7).select($"embedding").head.getSeq[Double](0).toArray
    def serve(p: String) =
      IvfFlat.topKIndexed(spark, p, "embedding", "vec_id", q, k = 6, nProbe = 3)
        .select("vec_id", "score").as[(Long, Double)].collect().toSeq
    assert(serve(incrPath) == serve(rebuiltPath))
    // The sidecar was not touched by the append.
    assert(IvfFlat.readCentroids(spark, incrPath).map(_.toSeq).toSeq ==
      baseCents.map(_.toSeq).toSeq)
  }
}
