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
}
