package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{
  LongType, StringType, StructField, StructType}

/** Operational introspection over a commit-log table — the DESCRIBE
  * DETAIL / DESCRIBE HISTORY surface every table format ships, built
  * from manifests alone: O(metadata) driver reads, no data file is
  * listed or opened (at 100 TB "how big is this table" must not cost
  * a scan — that is what the recorded row counts are FOR).
  */
object TableInfo {

  private val describeSchema = StructType(Seq(
    StructField("version", LongType, nullable = false),
    StructField("n_files", LongType, nullable = false),
    StructField("n_data_files", LongType, nullable = false),
    StructField("n_delete_files", LongType, nullable = false),
    // Σ recorded per-file row counts; NULL when some live file was
    // written without stats (refuse over undercount — tableRowCount's
    // contract)
    StructField("n_rows", LongType, nullable = true),
    StructField("n_groups", LongType, nullable = false),
    StructField("stats_col", StringType, nullable = false),
    StructField("stats_cols", StringType, nullable = false),
    StructField("schema_id", StringType, nullable = false),
    StructField("spec_id", StringType, nullable = false),
    StructField("checks_id", StringType, nullable = false),
    StructField("txn", StringType, nullable = false)))

  private def isDelete(f: String): Boolean =
    f.startsWith("posdel-") || f.startsWith("deletes-")

  /** One-row DESCRIBE DETAIL of the table at `version` (head by
    * default). */
  def describe(spark: SparkSession, table: String,
      version: Long = -1L): DataFrame = {
    val v = if (version >= 0) version
      else CommitLog.currentVersion(spark, table).getOrElse(
        throw new IllegalArgumentException(s"no committed version at $table"))
    val m = CommitLog.readManifest(spark, table, v)
    val rc = m.colStats.getOrElse(CommitLog.RowCountCol, Map.empty)
    val data = m.files.filterNot(isDelete)
    val nRows: Any =
      if (data.nonEmpty && data.forall(rc.contains))
        data.map(f => rc(f)._1).sum
      else if (data.isEmpty) 0L
      else null
    val statCols = (m.colStats.keys ++ m.strStats.keys).toSeq
      .filterNot(_.startsWith("__")).distinct.sorted
    val row = Row(v, m.files.size.toLong, data.size.toLong,
      (m.files.size - data.size).toLong, nRows, m.groups.size.toLong,
      m.statsCol, statCols.mkString(","), m.schemaId, m.specId,
      m.checksId, m.txn)
    spark.createDataFrame(
      java.util.Arrays.asList(row), describeSchema)
  }

  private val historySchema = StructType(Seq(
    StructField("version", LongType, nullable = false),
    StructField("n_files", LongType, nullable = false),
    StructField("n_added", LongType, nullable = false),
    StructField("n_removed", LongType, nullable = false),
    // append | rewrite | delete (delete-file add) | metadata
    StructField("operation", StringType, nullable = false),
    StructField("txn", StringType, nullable = false),
    StructField("schema_id", StringType, nullable = false),
    StructField("checks_id", StringType, nullable = false)))

  /** DESCRIBE HISTORY: one row per RETAINED version, newest first —
    * adds/removes derived by diffing each version against its
    * predecessor (vacuumed versions are absent by definition; the
    * walk costs O(versions) manifest reads, each O(groups)). The
    * operation class is derived, not stored: a commit that removes
    * files is a rewrite, one that only adds delete files is a
    * delete, one that touches nothing is metadata (schema/spec/
    * checks/branch bookkeeping), anything else an append. */
  def history(spark: SparkSession, table: String): DataFrame = {
    val vs = CommitLog.versions(spark, table)
    var prev = Set.empty[String]
    val rows = vs.map { v =>
      val m = CommitLog.readManifest(spark, table, v)
      val cur = m.files.toSet
      val added = cur -- prev
      val removed = prev -- cur
      val op =
        if (removed.nonEmpty) "rewrite"
        else if (added.isEmpty) "metadata"
        else if (added.forall(isDelete)) "delete"
        else "append"
      prev = cur
      Row(v, cur.size.toLong, added.size.toLong, removed.size.toLong,
        op, m.txn, m.schemaId, m.checksId)
    }.reverse
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(rows.asJava, historySchema)
  }
}
