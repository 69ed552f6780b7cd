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
    (dataFiles(inPath), dataFiles(outPath))
  }

  private def dataFiles(path: String): Int =
    Option(new java.io.File(path).listFiles())
      .map(_.count(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_")))
      .getOrElse(0)
}
