package graft.text

import graft.SparkSpec
import org.apache.spark.sql.execution.FileSourceScanExec

class InvertedIndexSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the cat sat on the mat"),
    (2L, "the dog sat"),
    (3L, "cat cat dog"),
    (4L, null.asInstanceOf[String]),
    (5L, "mat and cat and mat")).toDF("doc_id", "text")

  test("postings carry exact per-doc term frequencies; null text drops") {
    val p = InvertedIndex.postings(docs, "text", "doc_id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(p.contains(("cat", 3L, 2L)))
    assert(p.contains(("the", 1L, 2L)))
    assert(p.contains(("mat", 5L, 2L)))
    assert(!p.exists(_._2 == 4L))
  }

  test("driver-side bucketOf matches the executor-side bucket column") {
    val dir = java.nio.file.Files.createTempDirectory("graft_inv_b").toString
    InvertedIndex.writeIndex(docs, "text", "doc_id", nBuckets = 7, dir)
    val got = spark.read.parquet(dir)
      .select("term", "bucket").distinct()
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    got.foreach { case (t, b) =>
      assert(InvertedIndex.bucketOf(t, 7) == b, s"term $t")
    }
  }

  test("searchAll: conjunctive match ranked by summed tf, doc_id tiebreak") {
    val dir = java.nio.file.Files.createTempDirectory("graft_inv_s").toString
    InvertedIndex.writeIndex(docs, "text", "doc_id", nBuckets = 7, dir)
    // cat AND mat: doc 1 (1+1=2), doc 5 (1+2=3); doc 3 lacks mat.
    val got = InvertedIndex.searchAll(spark, dir, 7, Seq("cat", "mat"), 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((5L, 3L), (1L, 2L)))
  }

  test("duplicate query terms collapse (cat cat == cat)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_inv_d").toString
    InvertedIndex.writeIndex(docs, "text", "doc_id", nBuckets = 7, dir)
    val a = InvertedIndex.searchAll(spark, dir, 7, Seq("cat", "cat"), 10).collect().toSeq
    val b = InvertedIndex.searchAll(spark, dir, 7, Seq("cat"), 10).collect().toSeq
    assert(a == b)
  }

  test("serving reads only the query terms' buckets (PartitionFilters prune)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_inv_p").toString
    InvertedIndex.writeIndex(docs, "text", "doc_id", nBuckets = 7, dir)
    val df = InvertedIndex.searchAll(spark, dir, 7, Seq("cat"), 10)
    // sparkPlan, not executedPlan: the aggregation makes this adaptive
    // and AQE hides the scans until execution (IvfFlatSpec pattern).
    val scans = df.queryExecution.sparkPlan.collect {
      case s: FileSourceScanExec => s
    }
    assert(scans.nonEmpty, "expected a file scan over the index")
    val scan = scans.head
    assert(scan.partitionFilters.exists(_.references.exists(_.name == "bucket")),
      s"bucket filter missing from PartitionFilters: ${scan.partitionFilters}")
    // And pruning actually narrows the read to the probed bucket's
    // file splits (strictly fewer than a full-index scan would touch).
    val full = spark.read.parquet(dir).queryExecution.sparkPlan.collect {
      case s: FileSourceScanExec => s
    }.head
    assert(scan.inputRDDs().head.partitions.length <
      full.inputRDDs().head.partitions.length ||
      scan.inputRDDs().head.partitions.length == 1)
  }
}
