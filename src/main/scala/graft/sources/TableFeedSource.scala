package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
import org.apache.spark.sql.catalyst.types.DataTypeUtils
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.execution.streaming.{Offset => V1Offset, Source}
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.StructType

/** A commit-log table version as a streaming offset. */
final case class VersionOffset(v: Long) extends V1Offset {
  override def json: String = v.toString
}

/** Structured Streaming SOURCE over a [[CommitLog]] table (VERDICT
  * r12 directive #5 — [[TableFeed]]'s micro-batch loop lifted into
  * `spark.readStream`): offsets ARE table versions, each micro-batch
  * reads exactly the data files added by the non-rewrite commits in
  * its (start, end] version range ([[TableFeed.addedDataFiles]] — the
  * first batch is the initial snapshot, rewrite commits are layout
  * no-ops, schema-evolved generations project under the head schema
  * by field id), and Spark's own checkpoint WAL makes the version
  * cursor exactly-once. Triggers, rate limiting, progress reporting
  * and restart semantics all come for free from the engine:
  *
  * {{{
  * spark.readStream
  *   .format("graft.sources.TableFeedSourceProvider")
  *   .option("path", table)
  *   .option("maxVersionsPerTrigger", "1")   // optional rate limit
  *   .load()
  * }}}
  *
  * The v1 `Source` API is deliberate — it is exactly the seam Delta's
  * streaming source uses: `getBatch` runs on the driver and returns a
  * DataFrame over the range's parquet files with the relation
  * re-flagged `isStreaming=true` (via the [[StreamingFrames]] bridge),
  * so executors run a plain columnar parquet scan; no custom row
  * reader, no serialization layer, whole-stage codegen intact.
  *
  * Rate limiting needs the last PLANNED offset to survive restarts
  * (Spark only replays committed ones): each advance drops a tiny
  * marker file under this source's private `metadataPath`, written
  * BEFORE the offset reaches the WAL — after a crash the cap resumes
  * from max(marker, WAL), so a capped stream can neither skip a range
  * nor plan backwards below its own checkpoint.
  */
class TableFeedSource(
    spark: SparkSession,
    table: String,
    metadataPath: String,
    maxVersionsPerTrigger: Long,
    /** Non-empty = CHANGE-FEED mode: each micro-batch emits the
      * delete-aware CDC rows of its version range
      * ([[MorTable.changeFeed]] — insert/delete + commit version,
      * keyed on these columns) instead of raw added files. */
    cdfKeyCols: Seq[String] = Seq.empty,
    /** >0 = start tailing AT this version (Delta's startingVersion):
      * the first batch covers (startingVersion-1, head] instead of
      * the initial snapshot — for consumers that already hold the
      * snapshot and only want the increment. */
    startingVersion: Long = 0L) extends Source
    with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {

  private val fs = new Path(metadataPath)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Highest version this source ever PLANNED (returned from
    * getOffset or saw in getBatch), restart-safe via marker files. */
  private var lastPlanned: Long = {
    val dir = new Path(metadataPath)
    val marked = if (!fs.exists(dir)) 0L
      else fs.listStatus(dir).toSeq.map(_.getPath.getName)
        .filter(_.startsWith("v")).map(_.drop(1).toLong)
        .maxOption.getOrElse(0L)
    // startingVersion shifts only the FIRST plan of a fresh stream;
    // a checkpointed/marked cursor always wins.
    math.max(marked, math.max(0L, startingVersion - 1L))
  }

  private def recordPlanned(v: Long): Unit = if (v > lastPlanned) {
    fs.mkdirs(new Path(metadataPath))
    fs.create(new Path(metadataPath, s"v$v"), true).close()
    // Retire the previous marker (one tiny file steady-state).
    if (lastPlanned > 0L)
      fs.delete(new Path(metadataPath, s"v$lastPlanned"), false)
    lastPlanned = v
  }

  override val schema: StructType =
    if (cdfKeyCols.isEmpty) TableFeedSource.tableSchema(spark, table)
    else StructType(TableFeedSource.tableSchema(spark, table).fields ++ Seq(
      org.apache.spark.sql.types.StructField("_change_type",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("_commit_version",
        org.apache.spark.sql.types.LongType)))

  /** Trigger.AvailableNow pins the drain target to the head AT TRIGGER
    * START — commits racing the drain wait for the next run, so the
    * trigger terminates (the SupportsTriggerAvailableNow contract). */
  private var availableNowCap: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = CommitLog.currentVersion(spark, table)

  override def getDefaultReadLimit
      : org.apache.spark.sql.connector.read.streaming.ReadLimit =
    org.apache.spark.sql.connector.read.streaming.ReadLimit.allAvailable()

  /** Admission control (the engine's preferred planning path when a
    * source supports AvailableNow): the next end-offset from the LAST
    * PLANNED version — rate-limited, capped by any AvailableNow pin,
    * never backwards. `startOffset` is ignored like FileStreamSource
    * does: the marker-backed lastPlanned survives restarts and is
    * always ≥ the engine's committed offset. */
  override def latestOffset(
      startOffset: org.apache.spark.sql.connector.read.streaming.Offset,
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit)
      : org.apache.spark.sql.connector.read.streaming.Offset = {
    val head0 = CommitLog.currentVersion(spark, table).getOrElse(return null)
    val head = availableNowCap.map(math.min(head0, _)).getOrElse(head0)
    val target =
      if (maxVersionsPerTrigger > 0)
        math.min(head, lastPlanned + maxVersionsPerTrigger)
      else head
    val v = math.max(target, lastPlanned) // never plan backwards
    if (v <= 0) null
    else {
      recordPlanned(v)
      VersionOffset(v)
    }
  }

  override def reportLatestOffset()
      : org.apache.spark.sql.connector.read.streaming.Offset =
    CommitLog.currentVersion(spark, table).map(VersionOffset).orNull

  override def getOffset: Option[V1Offset] =
    Option(latestOffset(null, getDefaultReadLimit))
      .map(o => VersionOffset(o.json.toLong))

  override def getBatch(start: Option[V1Offset], end: V1Offset): DataFrame = {
    val from = start.map(_.json.toLong)
      .getOrElse(math.max(0L, startingVersion - 1L))
    val to = end.json.toLong
    recordPlanned(to)
    if (to <= from) return emptyBatch()
    if (cdfKeyCols.nonEmpty) {
      // Change-feed mode: the delete-aware CDC rows of (from, to].
      // Shipped as a lazily-computed InternalRow RDD rather than a
      // re-flagged plan — changeFeed's data-vs-delete anti joins must
      // stay BATCH joins; flagging their relations streaming would
      // make the incremental planner treat them as stream-stream
      // state machines.
      import org.apache.spark.sql.functions.col
      val cdc = MorTable.changeFeed(spark, table, from, to, cdfKeyCols)
        .select(schema.fields.toSeq.map(f =>
          col(f.name).cast(f.dataType).as(f.name)): _*)
      return StreamingFrames.ofRdd(spark, cdc.queryExecution.toRdd, schema)
    }
    val headM = CommitLog.readManifest(spark, table, to)
    val (added, tags) = TableFeed.addedDataFiles(spark, table, from, to)
    if (added.isEmpty) return emptyBatch()
    val root = CommitLog.dataRoot(table)
    val batch =
      if (headM.schemaId.nonEmpty)
        SchemaEvolution.projectFiles(spark, table,
          headM.copy(fileSchemas = tags ++ headM.fileSchemas), added)
      else
        spark.read.schema(schema)
          .parquet(added.map(f => s"$root/$f"): _*)
    // The v1 contract: the returned frame must carry isStreaming=true.
    // Re-flag the file relation inside the (possibly projected) plan.
    val plan = batch.queryExecution.analyzed.transform {
      case lr: LogicalRelation => lr.copy(isStreaming = true)
    }
    StreamingFrames.ofRows(spark, plan)
  }

  private def emptyBatch(): DataFrame =
    StreamingFrames.ofRows(spark,
      LocalRelation(DataTypeUtils.toAttributes(schema), Nil,
        isStreaming = true))

  override def commit(end: V1Offset): Unit = ()
  override def stop(): Unit = ()
  override def toString: String = s"TableFeedSource[$table]"
}

object TableFeedSource {
  /** The table's DATA schema: the evolved schema when one exists (its
    * typed-empty projection), otherwise one live data file's footer.
    * Delete files never contribute. */
  private[sources] def tableSchema(spark: SparkSession,
      table: String): StructType = {
    val v = CommitLog.currentVersion(spark, table).getOrElse(
      throw new IllegalArgumentException(
        s"streaming source needs a committed table at $table"))
    val m = CommitLog.readManifest(spark, table, v)
    if (m.schemaId.nonEmpty)
      SchemaEvolution.projectFiles(spark, table, m, Seq.empty).schema
    else {
      val donor = m.files.find(_.startsWith("stage-")).getOrElse(
        throw new IllegalArgumentException(
          s"$table@$v has no data file to derive a schema from"))
      spark.read.parquet(s"${CommitLog.dataRoot(table)}/$donor").schema
    }
  }
}

/** `spark.readStream.format("graft.sources.TableFeedSourceProvider")`
  * entry point (resolved by class name — no service registration
  * needed). Options: `path` (the table root or `root#branch` ref),
  * `maxVersionsPerTrigger` (optional rate limit). */
class TableFeedSourceProvider extends StreamSourceProvider with DataSourceRegister {

  override def shortName(): String = "graft-table"

  private def tableOf(parameters: Map[String, String]): String =
    parameters.getOrElse("path", throw new IllegalArgumentException(
      "option 'path' (the commit-log table root) is required"))

  override def sourceSchema(
      sqlContext: SQLContext,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): (String, StructType) =
    (shortName(), schema.getOrElse {
      val base = TableFeedSource.tableSchema(
        sqlContext.sparkSession, tableOf(parameters))
      if (keyColsOf(parameters).isEmpty) base
      else StructType(base.fields ++ Seq(
        org.apache.spark.sql.types.StructField("_change_type",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("_commit_version",
          org.apache.spark.sql.types.LongType)))
    })

  override def createSource(
      sqlContext: SQLContext,
      metadataPath: String,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): Source =
    new TableFeedSource(sqlContext.sparkSession, tableOf(parameters),
      metadataPath,
      parameters.get("maxVersionsPerTrigger").map(_.toLong).getOrElse(0L),
      cdfKeyCols = keyColsOf(parameters),
      startingVersion =
        parameters.get("startingVersion").map(_.toLong).getOrElse(0L))

  private def keyColsOf(parameters: Map[String, String]): Seq[String] =
    if (!parameters.get("changeFeed").exists(_.toBoolean)) Seq.empty
    else parameters.getOrElse("keyCols", throw new IllegalArgumentException(
      "changeFeed=true needs option 'keyCols' (comma-separated equality-" +
        "delete key columns)")).split(",").toSeq.map(_.trim)
}
