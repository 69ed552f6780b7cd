package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import graft.SparkSpec

class LayoutOpsSpec extends SparkSpec {
  import spark.implicits._

  /** Rows the scan actually produced (post row-group pruning + pushed
    * filters), from the FileSourceScan metric after execution.
    */
  private def scanOutputRows(df: DataFrame): Long = {
    df.collect()
    val scans = df.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s
    }
    assert(scans.nonEmpty)
    scans.map(_.metrics("numOutputRows").value).sum
  }

  test("sorted layout prunes row groups for a narrow key predicate; unsorted reads everything") {
    val n = 400000L
    // small row groups so the file holds MANY of them (default 128 MB
    // would put this whole fixture in one group and nothing could prune)
    spark.conf.set("parquet.block.size", 64 * 1024)
    try {
      val data = spark.range(n).select(
        col("id").as("k"),
        (col("id") % 1000).as("payload"))
      val base = System.getProperty("java.io.tmpdir") + "/graft_layout_spec"
      // unsorted: round-robin shuffle scatters every key range into
      // every row group
      data.orderBy(rand(7)).repartition(4)
        .write.mode("overwrite").parquet(s"$base/unsorted")
      LayoutOps.writeSorted(data, s"$base/sorted", Seq("k"), numFiles = 4)

      val pred = col("k") >= 1000 && col("k") < 2000 // 0.25% of the domain
      val sortedRows = scanOutputRows(spark.read.parquet(s"$base/sorted").filter(pred))
      val unsortedRows = scanOutputRows(spark.read.parquet(s"$base/unsorted").filter(pred))

      // both answer identically...
      assert(spark.read.parquet(s"$base/sorted").filter(pred).count() == 1000L)
      assert(spark.read.parquet(s"$base/unsorted").filter(pred).count() == 1000L)
      // ...but the sorted layout's scan emits only the matching groups,
      // while the unsorted one decodes (almost) the full table
      assert(sortedRows < n / 20,
        s"sorted scan read $sortedRows rows — row-group stats did not prune")
      assert(unsortedRows > n / 2,
        s"unsorted scan read only $unsortedRows rows — fixture not scattered enough to demonstrate")
      assert(sortedRows * 10 < unsortedRows)
    } finally spark.conf.unset("parquet.block.size")
  }
}
