package graft.sources

import org.apache.spark.sql.SparkSession

/** Orphan-file vacuum — [[Compaction]]'s sibling housekeeping pass:
  * speculative/retried tasks, aborted jobs and interrupted uploads
  * leave uncommitted files next to a table's committed data. Readers
  * that glob the directory then double-count or crash, and on object
  * stores the orphans bill forever. Vacuum deletes everything in the
  * table directory that is NOT part of the committed table: the
  * `part-*`/`*.parquet` data files and the `_`-prefixed commit
  * markers (`_SUCCESS`, metadata) stay; temp/attempt/partial files
  * (`.inprogress`, `.tmp`, `.staging-*`, dot-files) go.
  *
  * Answer-invariant by construction: committed data is never touched,
  * so any query through the directory reads the same rows before and
  * after (q_vacuum's oracle is the raw-table aggregate). All file ops
  * go through the Hadoop FileSystem of the path's own scheme — real
  * on hdfs:// and s3a://, not just file:// (the Compaction r8 lesson).
  */
object Vacuum {

  /** True for members of the committed table set that must survive. */
  private[sources] def isCommitted(name: String): Boolean =
    (name.endsWith(".parquet") && !name.startsWith(".") && !name.startsWith("_")) ||
      name.startsWith("_") // commit markers / metadata

  /** Delete orphans under `path` (non-recursive — one table
    * directory). Returns (deletedOrphans, keptFiles).
    */
  def vacuum(spark: SparkSession, path: String): (Int, Int) = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return (0, 0)
    val files = fs.listStatus(p).filter(_.isFile)
    val (keep, drop) = files.partition(st => isCommitted(st.getPath.getName))
    drop.foreach(st => fs.delete(st.getPath, false))
    (drop.length, keep.length)
  }
}
