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

  // ---- Position deletes (the Iceberg v2 positional flavor) --------
  //
  // A position delete addresses a PHYSICAL row: (file, row ordinal).
  // The file identity is the data file's manifest-relative path — it
  // begins at its `stage-<uuid>/` segment, which is exactly how the
  // manifest records it, so the tuple survives any number of commits
  // unchanged (VERDICT r11 #3: name-stable identities). The ordinal
  // is Spark's `_metadata.row_index` — the parquet row position the
  // scan itself reports, so writer and reader agree by construction
  // even when a file is split across input partitions.

  /** The manifest-relative file key of an absolute scan path: from
    * the LAST path segment starting with `stage-` (greedy prefix), so
    * an ancestor directory that happens to contain "stage-" cannot
    * shift the key off the manifest-relative form. */
  private[sources] def fileKey(p: org.apache.spark.sql.Column) =
    regexp_extract(p, "^(?:.*/)?(stage-.*)$", 1)


  /** Commit-time guard: throws if any of `readFiles` is no longer
    * live — the staged artifact was derived from files a concurrent
    * rewrite retired, so publishing it would reference retired rows.
    * Callers rebase (re-read the new head, restage). */
  private[sources] def requireStillLive(table: String,
      readFiles: Seq[String]): Seq[String] => Unit = { live =>
    val gone = readFiles.filterNot(live.toSet)
    if (gone.nonEmpty) throw new java.util.ConcurrentModificationException(
      s"concurrent rewrite at $table: ${gone.size} file(s) this commit " +
        s"read are no longer live (first: ${gone.head}) — rebase and retry")
  }

  /** Commit-time guard for compaction: throws if a DELETE FILE
    * appeared since the compaction read its snapshot — the staged
    * materialization predates that delete, so swapping it in would
    * RESURRECT the deleted rows (the hole equality deletes' sequence
    * rule cannot cover for position deletes). */
  private[sources] def noNewDeletes(table: String,
      knownDeletes: Set[String]): Seq[String] => Unit = { live =>
    val fresh = live.filter(f => (f.startsWith("posdel-") ||
      f.startsWith("deletes-")) && !knownDeletes(f))
    if (fresh.nonEmpty) throw new java.util.ConcurrentModificationException(
      s"concurrent delete at $table: ${fresh.size} delete file(s) " +
        s"appeared since the compaction snapshot (first: ${fresh.head}) " +
        "— recompact from the new head")
  }

  /** Commit position deletes for every row of the live DATA FILES
    * matching `predicate`: one scan collecting (file_key, pos),
    * staged under a `posdel-` dir and published in ONE manifest
    * swap — a racing reader sees wholly the pre-delete or wholly the
    * post-delete table, never a partial delete. Rows already dead
    * under an earlier delete may be re-recorded; the MoR anti join
    * makes that a harmless no-op. Data files are never rewritten;
    * time travel to a pre-delete version simply lists no posdel
    * file, and the rows are back. */
  def commitPositionDeletes(spark: SparkSession, table: String,
      predicate: org.apache.spark.sql.Column): Long = {
    val v = CommitLog.currentVersion(spark, table).getOrElse(
      throw new IllegalArgumentException(s"no committed version at $table"))
    val files = CommitLog.liveFiles(spark, table, v)
    val dataFiles = files.filter(_.startsWith("stage-"))
    val root = CommitLog.dataRoot(table)
    val dels = spark.read.parquet(dataFiles.map(f => s"$root/$f"): _*)
      .select(col("*"),
        fileKey(col("_metadata.file_path")).as("file_key"),
        col("_metadata.row_index").as("pos"))
      .filter(predicate)
      .select("file_key", "pos")
    CommitLog.commit(spark, table,
      adds = CommitLog.stageUnder(spark, dels, table, "posdel"),
      // the tuples are keyed by v's file paths: if a concurrent
      // compaction retired any of them, this delete would be a silent
      // permanent no-op — conflict instead
      validateLive = requireStillLive(table, dataFiles))
  }

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
    * the delete files in one [[CommitLog.rewrite]]. Two conflict
    * rules close every resurrection window (the Delta concurrent-
    * delete discipline): the rewrite aborts if any read-set file was
    * already retired (requireRemovesLive), AND if any NEW delete file
    * appeared since the snapshot was read ([[noNewDeletes]]) — the
    * staged materialization predates that delete, so publishing it
    * would resurrect rows a committed delete already killed. Rows
    * keep their data_seq: a reader can't tell compacted from not
    * (pinned in spec), and later deletes still sequence correctly
    * against them. Returns the new version. */
  def compact(spark: SparkSession, table: String,
      keyCols: Seq[String]): Long = {
    val v = CommitLog.currentVersion(spark, table).getOrElse(
      throw new IllegalArgumentException(s"no committed version at $table"))
    val m = CommitLog.readManifest(spark, table, v)
    // Guard the schema-evolution footgun (ADVICE r12 #3): this compact
    // reads files RAW (no field-id projection), so a table with files
    // written under an older schema generation would permanently bake
    // NULLs into every renamed column. Homogeneous-current tags are
    // fine; anything else must go through the projecting path.
    require(m.schemaId.isEmpty || m.fileSchemas.values.forall(_ == m.schemaId),
      s"$table@$v carries files written under older schema generations — " +
        "MorTable.compact would null-fork their renamed columns; use " +
        "SchemaEvolution.compactEvolved instead")
    val live = m.files
    val knownDeletes = live.filter(f => f.startsWith("posdel-") ||
      f.startsWith("deletes-")).toSet
    val staged = CommitLog.stage(spark,
      readMor(spark, table, keyCols, Some(v)), table)
    CommitLog.rewrite(spark, table, adds = staged, removes = live,
      validateLive = noNewDeletes(table, knownDeletes))
  }

  /** Data rows of `files` with their physical identity attached:
    * `__fk` (manifest-relative file key) + `__pos` (parquet row
    * ordinal) from the scan's own `_metadata`. */
  private def withPhysicalIds(spark: SparkSession, root: String,
      files: Seq[String]): DataFrame =
    spark.read.parquet(files.map(f => s"$root/$f"): _*)
      .select(col("*"),
        fileKey(col("_metadata.file_path")).as("__fk"),
        col("_metadata.row_index").as("__pos"))

  /** Subtract a manifest's delete state from any frame carrying
    * physical ids: anti join the posdel tuples on (__fk, __pos), then
    * the equality deletes under the `data_seq < delete_seq` rule.
    * Both delete sides are tiny next to the data, so AQE broadcasts
    * them — the data side never reshuffles. */
  private def applyDeletes(spark: SparkSession, root: String,
      m: CommitLog.Manifest, df: DataFrame,
      keyCols: Seq[String]): DataFrame = {
    val posFiles = m.files.filter(_.startsWith("posdel-"))
    val eqFiles = m.files.filter(_.startsWith("deletes-"))
    val afterPos =
      if (posFiles.isEmpty) df
      else {
        val pd = spark.read.parquet(posFiles.map(f => s"$root/$f"): _*)
          .select(col("file_key").as("__fk"), col("pos").as("__pos"))
        df.join(pd, Seq("__fk", "__pos"), "left_anti")
      }
    if (eqFiles.isEmpty) afterPos
    else {
      val dels = spark.read.parquet(eqFiles.map(f => s"$root/$f"): _*)
        .select(keyCols.map(c => col(c).as(s"__del_$c"))
          :+ col("delete_seq"): _*)
      val cond = keyCols.map(c => afterPos(c) === dels(s"__del_$c"))
        .reduce(_ && _) && afterPos("data_seq") < dels("delete_seq")
      afterPos.join(dels, cond, "left_anti")
    }
  }

  /** A zero-row frame with the table's DATA schema, for manifests
    * whose data-file set is empty: resolved from the newest manifest
    * (at or before `m.version`) that still lists a data file — one
    * footer read, O(versions) driver probes at worst. Loud when the
    * table never carried data (no schema to derive). */
  private def typedEmptyData(spark: SparkSession, table: String,
      m: CommitLog.Manifest): DataFrame = {
    val root = CommitLog.dataRoot(table)
    val donor = CommitLog.versions(spark, table)
      .filter(_ <= m.version).reverse.iterator
      .map(v => if (v == m.version) m else CommitLog.readManifest(spark, table, v))
      .flatMap(_.files.find(_.startsWith("stage-")))
      .nextOption()
      .getOrElse(throw new IllegalStateException(
        s"$table@${m.version} has no data file anywhere in history — " +
          "no schema to derive a typed-empty frame from"))
    spark.read.parquet(s"$root/$donor").limit(0)
  }

  /** The live MoR view WITH each row's physical identity retained
    * (`__fk` manifest-relative file key, `__pos` parquet row ordinal) —
    * what a merge-on-read WRITER ([[CommitMerge.mergeIntoMor]]) joins
    * against: the surviving rows it retargets become (file, pos)
    * delete tuples, no data file rewritten. */
  private[sources] def readMorWithIds(spark: SparkSession, table: String,
      keyCols: Seq[String], version: Option[Long] = None): DataFrame = {
    val v = version.orElse(CommitLog.currentVersion(spark, table))
      .getOrElse(throw new IllegalArgumentException(
        s"no committed version at $table"))
    val m = CommitLog.readManifest(spark, table, v)
    val root = CommitLog.dataRoot(table)
    val dataFiles = m.files.filter(_.startsWith("stage-"))
    require(dataFiles.nonEmpty, s"$table@$v has no data files")
    applyDeletes(spark, root, m,
      withPhysicalIds(spark, root, dataFiles), keyCols)
  }

  /** Merge-on-read at `version` (current if None): live data files
    * MINUS live position-delete files (physical (file_key, pos) anti
    * join) MINUS live equality-delete files under the sequence rule. */
  def readMor(spark: SparkSession, table: String, keyCols: Seq[String],
      version: Option[Long] = None): DataFrame = {
    val v = version.orElse(CommitLog.currentVersion(spark, table))
      .getOrElse(throw new IllegalArgumentException(
        s"no committed version at $table"))
    val m = CommitLog.readManifest(spark, table, v)
    val root = CommitLog.dataRoot(table)
    val dataFiles = m.files.filter(_.startsWith("stage-"))
    if (dataFiles.isEmpty)
      // Everything deleted/rewritten away: spark.read.parquet() with
      // zero paths would throw unable-to-infer-schema, so derive the
      // typed-empty frame from the newest data-carrying manifest
      // (ADVICE r12 #5).
      typedEmptyData(spark, table, m)
    else if (!m.files.exists(f =>
        f.startsWith("posdel-") || f.startsWith("deletes-")))
      spark.read.parquet(dataFiles.map(f => s"$root/$f"): _*)
    else
      applyDeletes(spark, root, m,
        withPhysicalIds(spark, root, dataFiles), keyCols)
        .drop("__fk", "__pos")
  }

  /** CHANGE-DATA FEED (the Delta CDF shape, delete-aware): every
    * logical row change in versions (fromVersion, toVersion], tagged
    * `_change_type` ∈ insert/delete and `_commit_version`. Derived
    * INCREMENTALLY from each commit's ADDED files — never a snapshot
    * diff:
    *   - an append/CDC commit's inserts are its new data rows, with
    *     the commit's own delete state applied (a dead-on-arrival row
    *     — inserted and out-versioned in the same batch — was never
    *     visible, so it never reaches the feed);
    *   - a delete commit's deletes are the rows its new posdel/eqdel
    *     files kill: candidates come from a semi join against only
    *     the delete tuples (posdel candidates read only the TOUCHED
    *     files), then the previous version's delete state filters out
    *     rows that were already dead.
    * REWRITE commits (any commit that removes files) are treated as
    * layout no-ops: correct for [[compact]] (state-preserving by
    * contract), but a state-CHANGING rewrite — [[CommitLog.replaceWhere]],
    * a CDC swap, [[CommitLog.replace]] — does not flow through this
    * feed; route such tables through snapshot diff
    * (graft.operators.TableDiff) instead. Feed cost is O(changed
    * rows), not O(table); composes with [[TableFeed]] for an
    * exactly-once downstream CDC pipeline. */
  def changeFeed(spark: SparkSession, table: String, fromVersion: Long,
      toVersion: Long, keyCols: Seq[String]): DataFrame = {
    require(fromVersion < toVersion,
      "changeFeed needs a non-empty (fromVersion, toVersion] range")
    // Thread each manifest through the loop: version v's manifest is
    // v+1's prev, so the range costs N+1 driver reads, not 2N.
    var prevM = if (fromVersion == 0) CommitLog.Manifest(0, "", "",
      Seq.empty, Map.empty)
      else CommitLog.readManifest(spark, table, fromVersion)
    val frames = ((fromVersion + 1) to toVersion).flatMap { v =>
      val curM = CommitLog.readManifest(spark, table, v)
      // A restore is a state change in a rewrite's shape (see
      // TableFeed.addedDataFiles): emitting nothing for it would
      // leave every CDC consumer silently diverged. Fail loud.
      if (curM.txn.startsWith("restore:"))
        throw new IllegalStateException(
          s"change-feed range ($fromVersion, $toVersion] of $table " +
            s"contains a RESTORE at version $v — reconcile via " +
            "snapshot diff (TableDiff) and restart the feed from here")
      val out = versionChanges(spark, table, prevM, curM, keyCols)
      prevM = curM
      out
    }
    frames.reduceOption(_ unionByName _).getOrElse {
      // nothing changed in the range (all rewrites): empty, typed
      readMor(spark, table, keyCols, Some(toVersion)).limit(0)
        .withColumn("_change_type", lit("insert"))
        .withColumn("_commit_version", lit(toVersion))
    }
  }

  private def versionChanges(spark: SparkSession, table: String,
      prevM: CommitLog.Manifest, curM: CommitLog.Manifest,
      keyCols: Seq[String]): Seq[DataFrame] = {
    val root = CommitLog.dataRoot(table)
    val v = curM.version
    val prevSet = prevM.files.toSet
    val added = curM.files.filterNot(prevSet)
    val removed = prevM.files.filterNot(curM.files.toSet)
    def tagged(df: DataFrame, t: String): DataFrame =
      df.drop("__fk", "__pos")
        .withColumn("_change_type", lit(t))
        .withColumn("_commit_version", lit(v))
    if (removed.nonEmpty) return Seq.empty // rewrite: logical no-op
    val addedData = added.filter(_.startsWith("stage-"))
    val addedPos = added.filter(_.startsWith("posdel-"))
    val addedEq = added.filter(_.startsWith("deletes-"))

    val inserts =
      if (addedData.isEmpty) None
      else Some(tagged(applyDeletes(spark, root, curM,
        withPhysicalIds(spark, root, addedData), keyCols), "insert"))

    val prevData = prevM.files.filter(_.startsWith("stage-"))
    val posCands =
      if (addedPos.isEmpty || prevData.isEmpty) None
      else {
        val pd = spark.read.parquet(addedPos.map(f => s"$root/$f"): _*)
          .select(col("file_key").as("__fk"), col("pos").as("__pos"))
        // touched-file pruning: the posdel tuples name their files, so
        // only those parquet files are opened (bounded driver collect —
        // one row per file, never corpus rows)
        val touched = pd.select("__fk").distinct().collect()
          .map(_.getString(0)).toSet
        val files = prevData.filter(touched)
        if (files.isEmpty) None
        else Some(withPhysicalIds(spark, root, files)
          .join(pd, Seq("__fk", "__pos"), "left_semi"))
      }
    val eqCands =
      if (addedEq.isEmpty || prevData.isEmpty) None
      else {
        val ed = spark.read.parquet(addedEq.map(f => s"$root/$f"): _*)
          .select(keyCols.map(c => col(c).as(s"__del_$c"))
            :+ col("delete_seq"): _*)
        val data = withPhysicalIds(spark, root, prevData)
        val cond = keyCols.map(c => data(c) === ed(s"__del_$c"))
          .reduce(_ && _) && data("data_seq") < ed("delete_seq")
        Some(data.join(ed, cond, "left_semi"))
      }
    val deletes = (posCands.toSeq ++ eqCands.toSeq)
      .reduceOption(_ unionByName _)
      .map(_.dropDuplicates("__fk", "__pos"))
      .map(c => tagged(applyDeletes(spark, root, prevM, c, keyCols),
        "delete"))

    inserts.toSeq ++ deletes.toSeq
  }
}
