package graft.sources

import org.apache.spark.sql.SparkSession

/** Small-file compaction — the housekeeping pass every long-lived
  * 100 TB table needs: streaming ingest and per-batch writes leave
  * thousands of KB-sized files whose per-file open/footer overhead
  * eventually dominates scan cost; compaction rewrites a directory
  * into ~`targetRecordsPerFile` files without changing a single row
  * (q_compaction reads its aggregate THROUGH the compacted copy
  * against the raw-table oracle).
  *
  * One count job sizes the output, one `repartition(files)` round-robin
  * shuffle balances it — deliberately NOT `coalesce`, which would skew
  * output files to the accidental input layout and starve upstream
  * parallelism.
  */
object Compaction {

  /** Rewrite the parquet directory `inPath` to `outPath` with about
    * `targetRecordsPerFile` rows per output file. Returns
    * (inputDataFiles, outputDataFiles).
    */
  def compact(
      spark: SparkSession,
      inPath: String,
      outPath: String,
      targetRecordsPerFile: Long): (Int, Int) = {
    require(targetRecordsPerFile > 0, "target must be positive")
    val df = spark.read.parquet(inPath)
    val n = df.count()
    val files = math.max(1, math.ceil(n.toDouble / targetRecordsPerFile).toInt)
    df.repartition(files).write.mode("overwrite").parquet(outPath)
    (dataFiles(spark, inPath), dataFiles(spark, outPath))
  }

  /** Data-file census through the Hadoop FileSystem API — resolves the
    * path's own scheme (file://, hdfs://, s3a://…), so the counts are
    * real on the operator's actual 100 TB targets instead of silently
    * 0 off the local filesystem (ADVICE r8).
    */
  private def dataFiles(spark: SparkSession, path: String): Int = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) 0
    else fs.listStatus(p).count { st =>
      val n = st.getPath.getName
      st.isFile && n.endsWith(".parquet") && !n.startsWith("_") && !n.startsWith(".")
    }
  }
}
