package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Iceberg-style POSITION DELETES (merge-on-read): deletes land as
  * small (file_id, pos) delete files next to immutable data files;
  * readers subtract them with one keyed anti join instead of
  * rewriting data. This is how a 100 TB table absorbs a
  * GDPR/right-to-be-forgotten or bad-batch delete in seconds — the
  * copy-on-write alternative (CommitLog.rewrite / q_replace_where)
  * rewrites every touched file.
  *
  * Positions are assigned per data file (row ordinal under the
  * file's write sort), so the pos window is partitioned by file id —
  * within-file work a writer does anyway, never a global sort. The
  * merge-on-read anti join is keyed on (file_id, pos): the data side
  * is at rest partitioned by file_id, and the delete side is
  * typically orders of magnitude smaller than the data side, so AQE
  * broadcasts it; nothing here scales with table width.
  *
  * The reference engine rewrites full text outputs per job
  * (Skyline.java's per-run output dirs); mutable-table semantics are
  * north-star extension territory.
  */
object DeleteVectors {

  /** Stage `df` as a position-addressed table: one hive partition per
    * synthetic data file (`fileIdCol`), each row given its ordinal
    * `pos` under `orderCols` within the file.
    */
  def stage(df: DataFrame, fileIdCol: String, orderCols: Seq[String],
      dir: String): Unit = {
    val w = Window.partitionBy(col(fileIdCol))
      .orderBy(orderCols.map(col): _*)
    df.withColumn("pos", row_number().over(w).cast("long") - 1)
      .write.mode("overwrite").partitionBy(fileIdCol).parquet(dir)
  }

  /** Write position-delete files for every staged row matching
    * `predicate`: just (file_id, pos). Plain (unpartitioned) parquet —
    * delete vectors are small, and an EMPTY delete set must still
    * leave a schema-bearing file for readers (a hive-partitioned
    * empty write leaves nothing readable). The data files are
    * untouched — a reader without the delete files still sees the
    * exact pre-delete state.
    */
  def writeDeletes(spark: SparkSession, tableDir: String,
      deleteDir: String, predicate: Column, fileIdCol: String): Unit =
    spark.read.parquet(tableDir).filter(predicate)
      .select(col(fileIdCol).cast("long").as(fileIdCol), col("pos"))
      .write.mode("overwrite").parquet(deleteDir)

  /** Merge-on-read: data MINUS delete vectors, one (file_id, pos)
    * anti join. Hive partition-value inference narrows the partition
    * column to int; normalize back to long so MoR output schema ==
    * staged schema.
    */
  def readMor(spark: SparkSession, tableDir: String, deleteDir: String,
      fileIdCol: String): DataFrame = {
    val data = spark.read.parquet(tableDir)
      .withColumn(fileIdCol, col(fileIdCol).cast("long"))
    val dels = spark.read.parquet(deleteDir)
      .select(col(fileIdCol), col("pos"))
    data.join(dels, Seq(fileIdCol, "pos"), "left_anti")
  }

  // ---- Equality deletes (the CDC flavor) -------------------------
  //
  // An equality delete names KEY VALUES, not positions, and carries a
  // sequence number: it removes every data row with a matching key
  // whose snapshot sequence is OLDER than the delete's. A row
  // re-inserted AFTER the delete (higher sequence) survives — the
  // semantics a CDC ingest needs so a delete+reinsert pair replays in
  // any file order. The reader is one anti join: equi on the keys
  // (shuffle/broadcast-able) plus the sequence inequality as its
  // residual filter.

  /** Stage a data snapshot tagged with its commit sequence. */
  def stageSnapshot(df: DataFrame, seq: Long, dir: String): Unit =
    df.withColumn("data_seq", lit(seq)).write.mode("overwrite").parquet(dir)

  /** Write an equality-delete file: distinct key tuples + the
    * delete's sequence number. */
  def writeEqualityDeletes(keys: DataFrame, seq: Long, dir: String): Unit =
    keys.distinct().withColumn("delete_seq", lit(seq))
      .write.mode("overwrite").parquet(dir)

  /** Merge-on-read across snapshots: a row dies iff SOME delete
    * matches its keys with delete_seq > data_seq. */
  def readMorEquality(spark: SparkSession, dataDirs: Seq[String],
      deleteDir: String, keyCols: Seq[String]): DataFrame = {
    val data = dataDirs.map(spark.read.parquet(_)).reduce(_ unionByName _)
    val dels = spark.read.parquet(deleteDir).select(
      keyCols.map(c => col(c).as(s"__del_$c")) :+ col("delete_seq"): _*)
    val cond = keyCols.map(c => data(c) === dels(s"__del_$c"))
      .reduce(_ && _) && data("data_seq") < dels("delete_seq")
    data.join(dels, cond, "left_anti")
  }
}
