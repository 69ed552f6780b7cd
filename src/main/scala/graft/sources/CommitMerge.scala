package graft.sources

import org.apache.spark.sql.{Column, SparkSession, DataFrame}
import org.apache.spark.sql.functions._
import graft.operators.MergeInto

/** Transactional MERGE INTO over the [[CommitLog]] (VERDICT r12
  * directive #2): the multi-clause [[MergeInto]] operator composed
  * with the conflict-checked [[CommitLog.rewrite]], so an
  * upsert-with-clauses is ONE atomic commit — a reader racing the
  * merge resolves the old manifest (wholly-old) or the new one
  * (wholly-new), never a mix, and time travel to the pre-merge
  * version still reads the untouched state.
  *
  * Touched-file pruning (the Delta MERGE execution shape): only files
  * holding at least one source-key match are rewritten. One semi join
  * of the table's physical file keys against the (broadcast-small)
  * source keys finds them — a bounded collect of ONE ROW PER FILE,
  * never corpus rows; every other file survives the commit BY
  * REFERENCE (with sharded manifests, without even re-serializing its
  * metadata). On a 100 TB table a merge touching one partition's
  * files rewrites exactly those files plus an insert file. Source
  * rows matching nothing can only insert, and rows in untouched files
  * can match nothing — so merging only the touched rows is exact,
  * not an approximation. `WHEN NOT MATCHED BY SOURCE` clauses can
  * retarget EVERY row, so they disable the pruning (full rewrite),
  * loudly visible in the returned stats.
  *
  * Concurrency (the Delta conflict rules on this log):
  *  - a concurrent rewrite/delete of any touched file aborts with
  *    [[CommitLog.ConcurrentRewriteException]] (requireRemovesLive);
  *  - a delete FILE appearing since the snapshot aborts via
  *    [[MorTable.noNewDeletes]] — the staged merge output predates
  *    that delete and would resurrect its rows;
  *  - concurrent blind APPENDS commute (WriteSerializable): the CAS
  *    retry re-validates and lands on top of them.
  *
  * Schema evolution composes: on an evolved table every scan runs
  * through the per-generation field-id projection, the merge operates
  * under the CURRENT column names, and the rewritten files are tagged
  * with the current schema id — so a merge doubles as an incremental
  * compaction of the touched files' schema debt. Boundaries, loud not
  * silent: live merge-on-read delete files are refused (compact the
  * debt first — [[MorTable.compact]] /
  * [[SchemaEvolution.compactEvolved]]); the source must be
  * deduplicated per key ([[MergeInto]]'s contract).
  */
object CommitMerge {

  /** Outcome of one merge commit: the new version plus the pruning
    * arithmetic (how many live files the merge rewrote vs reused). */
  final case class MergeResult(version: Long, filesTotal: Int,
      filesRewritten: Int)

  def mergeInto(
      spark: SparkSession,
      table: String,
      source: DataFrame,
      keyCols: Seq[String],
      matched: Seq[(Column, MergeInto.Action)] = Nil,
      notMatched: Seq[(Column, MergeInto.Insert)] = Nil,
      bySource: Seq[(Column, MergeInto.Action)] = Nil,
      txn: String = ""): MergeResult = {
    val v = CommitLog.currentVersion(spark, table).getOrElse(
      throw new IllegalArgumentException(s"no committed version at $table"))
    if (txn.nonEmpty) {
      val existing = CommitLog.findTxn(spark, table, txn)
      if (existing.isDefined)
        return MergeResult(existing.get, -1, -1) // replay: already applied
    }
    val m = CommitLog.readManifest(spark, table, v)
    require(!m.files.exists(f =>
      f.startsWith("posdel-") || f.startsWith("deletes-")),
      s"$table@$v carries merge-on-read delete files — compact the " +
        "delete debt first (MorTable.compact / SchemaEvolution.compactEvolved)")
    val root = CommitLog.dataRoot(table)
    val dataFiles = m.files
    // A schema-EVOLVED table composes: every scan below goes through
    // the per-generation field-id projection (old files' renamed
    // columns resolve, added ones read as typed NULL), the merge runs
    // under the CURRENT names, and the rewritten files are tagged with
    // the current schema id — a merge is also an incremental
    // compaction of the touched files' schema debt.
    val evolved = m.schemaId.nonEmpty
    def readFiles(files: Seq[String], keepIds: Boolean): DataFrame =
      if (evolved) {
        val p = SchemaEvolution.projectFiles(spark, table, m, files, keepIds)
        if (keepIds) p.drop("__pos") else p
      }
      else if (files.isEmpty)
        spark.read.parquet(dataFiles.map(f => s"$root/$f"): _*).limit(0)
      else {
        val raw = spark.read.parquet(files.map(f => s"$root/$f"): _*)
        if (!keepIds) raw
        else raw.select(col("*"),
          MorTable.fileKey(col("_metadata.file_path")).as("__fk"))
      }
    val touched: Seq[String] =
      if (bySource.nonEmpty) dataFiles // every target row is addressable
      else if (dataFiles.isEmpty) Seq.empty
      else {
        val keys = source
          .select(keyCols.map(k => col(k).as(s"__src_$k")): _*).distinct()
        val scan = readFiles(dataFiles, keepIds = true)
        // NULL-SAFE (<=>) like the merge join itself — a name-equality
        // semi join would miss a NULL-keyed match, leave its file
        // untouched, and let the merge insert a duplicate row beside
        // the one it should have updated. One row per file after the
        // semi join + dedup — bounded metadata, never corpus rows;
        // AQE broadcasts the key side.
        scan.join(keys,
            keyCols.map(k => scan(k) <=> keys(s"__src_$k")).reduce(_ && _),
            "left_semi")
          .select("__fk").distinct()
          .collect().map(_.getString(0)).toSeq
      }
    require(dataFiles.nonEmpty, s"$table@$v has no data files to merge into")
    val base = readFiles(touched, keepIds = false)
    val merged = MergeInto.merge(base, source, keyCols, matched,
      notMatched, bySource)
    val staged = CommitLog.stage(spark, merged, table)
    // persisted CHECK constraints gate the merged images (update and
    // insert clauses can both mint violating rows) — the
    // checkedAppend discipline on the merge path — and the merged
    // files stay prunable: zone maps + bloom sidecars re-collected
    // for the staged output (VERDICT r14 #3). Audit + stats + blooms
    // ride ONE scan of the staged batch (r16 fusion).
    val (nums, strs) = CommitDml.restats(spark, table, m, staged,
      audit = true)
    val newV = CommitLog.rewrite(spark, table, adds = staged,
      removes = touched, txn = txn,
      statsCol = m.statsCol, colStats = nums, strColStats = strs,
      fileSchemas = if (evolved) staged.map(_ -> m.schemaId).toMap
        else Map.empty,
      // a delete file appearing mid-merge would be resurrected by the
      // staged output — conflict, exactly as compaction does
      validateLive = MorTable.noNewDeletes(table, Set.empty),
      // the projection was rendered under m.schemaId — a concurrent
      // evolution would publish stale-shaped files under a wrong tag;
      // and the check set we audited against must still be in force
      validateManifest = { base =>
        if (evolved)
          SchemaEvolution.requireSchemaStill(table, m.schemaId)(base)
        if (base.map(_.checksId).getOrElse("") != m.checksId)
          throw new Constraints.ConcurrentChecksException(table)
      })
    MergeResult(newV, dataFiles.size, touched.size)
  }

  /** MERGE-ON-READ merge (Iceberg's merge-on-read write mode — the
    * true 100 TB upsert shape): instead of rewriting the files that
    * hold matched rows, ONE commit adds
    *  - a position-delete file addressing every row a matched
    *    UPDATE/DELETE clause retargets (physical (file, row_index)
    *    tuples — schema-independent, no data file touched), and
    *  - data files holding the post-UPDATE images and the INSERT rows,
    *    stamped `data_seq = seq`.
    * [[MorTable.readMor]] then serves the merged state. Write
    * amplification is O(changed rows), not O(touched files) — on a
    * table whose hot keys are smeared across thousands of files, the
    * copy-on-write [[mergeInto]] would rewrite them all; this commits
    * kilobytes. The trade is read-side anti-join debt, retired by the
    * conflict-guarded [[MorTable.compact]], exactly the Iceberg
    * write.merge.mode=merge-on-read / copy-on-write pair.
    *
    * Matching runs against the LIVE MoR view (rows already dead under
    * earlier deletes can only re-insert, never re-update — Delta
    * semantics). Conflicts: the posdel tuples key the snapshot's data
    * files, so a concurrent rewrite of ANY of them aborts
    * (requireStillLive); concurrent appends/deletes commute (a later
    * `delete_seq > seq` still wins over the new images). `bySource`
    * clauses are copy-on-write territory — refused here. */
  def mergeIntoMor(
      spark: SparkSession,
      table: String,
      source: DataFrame,
      keyCols: Seq[String],
      matched: Seq[(Column, MergeInto.Action)] = Nil,
      notMatched: Seq[(Column, MergeInto.Insert)] = Nil,
      seq: Long = 0L,
      txn: String = ""): Long = {
    val v = CommitLog.currentVersion(spark, table).getOrElse(
      throw new IllegalArgumentException(s"no committed version at $table"))
    if (txn.nonEmpty) {
      val existing = CommitLog.findTxn(spark, table, txn)
      if (existing.isDefined) return existing.get
    }
    val m = CommitLog.readManifest(spark, table, v)
    // Schema evolution composes for POSITION-delete debt (physical
    // identities are schema-independent; the projection supplies
    // current names) — live EQUALITY deletes need key re-resolution
    // and must be compacted first.
    val evolved = m.schemaId.nonEmpty
    if (evolved) require(!m.files.exists(_.startsWith("deletes-")),
      s"$table@$v is schema-evolved AND carries equality deletes — " +
        "SchemaEvolution.compactEvolved first")
    val dataFiles = m.files.filter(_.startsWith("stage-"))
    val base =
      if (evolved)
        SchemaEvolution.readWithPositionDeletesCore(spark, table, Some(v),
          keepIds = true)
      else MorTable.readMorWithIds(spark, table, keyCols, Some(v))
    require(base.columns.contains("data_seq"),
      s"$table is not a merge-on-read table (no data_seq column) — " +
        "write it via MorTable.appendData / applyCdcBatch")
    // Staged twice (posdel tuples, then images) → persist the one
    // full-outer join rather than running it twice.
    val j = MergeInto.resolved(base, source, keyCols, matched,
      notMatched, Nil)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // The same lossless-up-cast analysis rule as the copy-on-write
      // path (MergeInto.merge enforces it there): a double expression
      // cast into a long column would silently truncate data through
      // the image projection below. One driver-side schema probe.
      val typed = (matched.collect { case (_, MergeInto.Update(set)) => set } ++
        notMatched.map(_._2.values)).zipWithIndex.flatMap { case (m0, ci) =>
        m0.toSeq.zipWithIndex.collect {
          case ((c, e), ei) if base.columns.contains(c) =>
            (c, s"__probe_${ci}_$ei", e)
        }
      }
      if (typed.nonEmpty) {
        val probed = j.select(typed.map { case (_, a, e) => e.as(a) }: _*)
          .schema
        typed.foreach { case (c, a, _) =>
          val from = probed(a).dataType
          val to = base.schema(c).dataType
          require(from == org.apache.spark.sql.types.NullType ||
            org.apache.spark.sql.catalyst.expressions.Cast.canUpCast(from, to),
            s"MERGE type mismatch on column '$c': expression type " +
              s"${from.simpleString} does not up-cast losslessly to " +
              s"${to.simpleString} — add an explicit cast if the " +
              "narrowing is intended")
        }
      }
      val updateIds = matched.zipWithIndex.collect {
        case ((_, MergeInto.Update(_)), i) => 1000 + i }
      val deleteIds = MergeInto.deleteActionIds(matched, Nil)
      val retargeted = (updateIds ++ deleteIds).map(_.asInstanceOf[Any])
      // Every row an UPDATE or DELETE clause fires on loses its current
      // physical version — one posdel tuple each.
      val posdel = j.filter(col("__a").isin(retargeted: _*))
        .select(col("t___fk").as("file_key"), col("t___pos").as("pos"))
      // The new images: post-UPDATE rows + INSERT rows, all at `seq`.
      val dataCols = base.columns.toSeq.filterNot(Set("__fk", "__pos"))
      val imageIds = updateIds.map(_.asInstanceOf[Any]) ++
        notMatched.indices.map(i => (2000 + i).asInstanceOf[Any])
      val images = j.filter(col("__a").isin(imageIds: _*))
        .select(dataCols.map { c =>
          val chain =
            matched.zipWithIndex.collect { case ((_, MergeInto.Update(set)), i)
              if set.contains(c) => (1000 + i, set(c)) } ++
            notMatched.zipWithIndex.map { case ((_, MergeInto.Insert(vs)), i) =>
              (2000 + i, vs.getOrElse(c, lit(null))) }
          chain.foldRight(col(s"t_$c")) { case ((id, e), acc) =>
            when(col("__a") === id, e).otherwise(acc)
          }.cast(base.schema(c).dataType).as(c)
        }: _*)
        .withColumn("data_seq", lit(seq))
      val posdelAdds = if (retargeted.isEmpty) Seq.empty[String]
        else CommitLog.stageUnder(spark, posdel, table, "posdel")
      val imageAdds = if (imageIds.isEmpty) Seq.empty[String]
        else CommitLog.stage(spark, images, table)
      // the MoR images are new visible rows too — same check audit
      // (posdel tuples only kill rows; they cannot violate)
      CommitDml.auditChecks(spark, table, m, imageAdds)
      CommitLog.commit(spark, table,
        adds = posdelAdds ++ imageAdds,
        txn = txn,
        fileSchemas = if (evolved) imageAdds.map(_ -> m.schemaId).toMap
          else Map.empty,
        // tuples key this snapshot's data files: a concurrent rewrite
        // of any of them would make the posdels silent no-ops and the
        // new images duplicates — conflict instead
        validateLive = MorTable.requireStillLive(table, dataFiles),
        // the images were rendered under m.schemaId
        validateManifest = if (evolved)
          SchemaEvolution.requireSchemaStill(table, m.schemaId)
          else _ => ())
    } finally j.unpersist()
  }
}
