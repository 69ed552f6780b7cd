package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Merge-on-read table = [[CommitLog]] manifests + equality-delete
  * files IN the manifest — the full Iceberg v2 shape: ONE atomic
  * commit makes a delete visible (readers racing it see either the
  * whole delete or none of it), time travel reads straight through
  * (a pre-delete version still lists no delete file, so the rows are
  * simply back), and vacuum/compaction already handle delete files
  * because they are ordinary manifest entries.
  *
  * File roles ride the staging dir prefix (`stage-` data, `deletes-`
  * delete files) — no manifest schema change. Data rows carry their
  * commit's sequence in a `data_seq` column; a delete file carries
  * key tuples + `delete_seq`, and a row dies iff some live delete
  * matches its keys with `delete_seq > data_seq` (so delete +
  * re-insert replays in any file order — [[DeleteVectors]]'
  * equality-delete rule, now transactional). The MoR read is the
  * same broadcast-able anti join.
  */
object MorTable {

  /** Append a data snapshot (tagging rows with `seq`); one commit. */
  def appendData(spark: SparkSession, df: DataFrame, seq: Long,
      table: String): Long =
    CommitLog.commit(spark, table,
      adds = CommitLog.stage(spark, df.withColumn("data_seq", lit(seq)),
        table))

  /** Commit an equality-delete file for `keys` at `seq`; one commit —
    * the delete becomes visible atomically with the manifest swap. */
  def commitDeletes(spark: SparkSession, keys: DataFrame, seq: Long,
      table: String): Long =
    CommitLog.commit(spark, table,
      adds = CommitLog.stageUnder(spark,
        keys.distinct().withColumn("delete_seq", lit(seq)),
        table, "deletes"))

  /** Apply one CDC batch as ONE atomic commit (the Iceberg
    * streaming-upsert writer): an equality-delete file with each
    * key's max batch version, plus data files for the non-tombstone
    * rows carrying their own version as `data_seq`. Because
    * sequencing comes from the DATA (not the batch id), replaying
    * batches in any order converges to the same table: an
    * out-of-order older batch's delete_seq can't kill newer rows,
    * and its stale data is already covered by the newer batch's
    * delete file. Within a batch the winner survives its own delete
    * (strict `<`). Net semantics ≡ [[graft.operators.Upsert.applyCdc]]
    * latest-wins.
    */
  def applyCdcBatch(spark: SparkSession, batch: DataFrame,
      keyCols: Seq[String], versionCol: String, opCol: String,
      table: String): Long = {
    val dels = batch.groupBy(keyCols.map(col): _*)
      .agg(max(col(versionCol)).as("delete_seq"))
    val data = batch.filter(col(opCol) =!= "D").drop(opCol)
      .withColumnRenamed(versionCol, "data_seq")
    CommitLog.commit(spark, table,
      adds = CommitLog.stageUnder(spark, dels, table, "deletes") ++
        CommitLog.stage(spark, data, table))
  }

  /** COMPACT the merge-on-read debt: materialize the current MoR
    * state as fresh data files and retire BOTH the old data files and
    * the delete files in one [[CommitLog.rewrite]] — which aborts
    * with ConcurrentRewriteException if a racing commit touched the
    * read set (the Delta concurrent-delete rule), so the swap never
    * resurrects deleted rows. Rows keep their data_seq: a reader
    * can't tell compacted from not (pinned in spec), and later
    * deletes still sequence correctly against them. Returns the new
    * version. */
  def compact(spark: SparkSession, table: String,
      keyCols: Seq[String]): Long = {
    val v = CommitLog.currentVersion(spark, table).getOrElse(
      throw new IllegalArgumentException(s"no committed version at $table"))
    val live = CommitLog.liveFiles(spark, table, v)
    val staged = CommitLog.stage(spark,
      readMor(spark, table, keyCols, Some(v)), table)
    CommitLog.rewrite(spark, table, adds = staged, removes = live)
  }

  /** Merge-on-read at `version` (current if None): live data files
    * MINUS live delete files under the sequence rule. */
  def readMor(spark: SparkSession, table: String, keyCols: Seq[String],
      version: Option[Long] = None): DataFrame = {
    val v = version.orElse(CommitLog.currentVersion(spark, table))
      .getOrElse(throw new IllegalArgumentException(
        s"no committed version at $table"))
    val files = CommitLog.liveFiles(spark, table, v)
    val (delFiles, dataFiles) = files.partition(_.startsWith("deletes-"))
    val root = CommitLog.dataRoot(table)
    val data = spark.read.parquet(dataFiles.map(f => s"$root/$f"): _*)
    if (delFiles.isEmpty) data
    else {
      val dels = spark.read.parquet(delFiles.map(f => s"$root/$f"): _*)
        .select(keyCols.map(c => col(c).as(s"__del_$c"))
          :+ col("delete_seq"): _*)
      val cond = keyCols.map(c => data(c) === dels(s"__del_$c"))
        .reduce(_ && _) && data("data_seq") < dels("delete_seq")
      data.join(dels, cond, "left_anti")
    }
  }
}
