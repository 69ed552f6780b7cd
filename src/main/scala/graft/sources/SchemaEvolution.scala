package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Field-id schema evolution on the [[CommitLog]] — the Delta/Iceberg
  * core the manifest previously lacked (VERDICT r11 directive #4):
  * add / rename / drop columns WITHOUT rewriting data files, with
  * time travel reading every historical version under the schema it
  * had then.
  *
  * Mechanism: every column owns a STABLE integer field id, assigned
  * once at table bootstrap and never reused. A schema version is the
  * ordered field list (id, name, type), content-addressed by md5 and
  * persisted as an immutable `_log/schema-<id>.json`; the manifest
  * carries the table's current schema id plus a sparse per-file map
  * of the schema each data file was WRITTEN under. Readers project
  * each file BY FIELD ID: a renamed column resolves to its old
  * parquet name in old files, a column added later reads as typed
  * NULL there, and a dropped id is simply not selected — so a rename
  * can never fork the table and old files never need rewriting.
  *
  * Scale shape: all schema resolution is O(schema-versions) driver
  * metadata; the executor-side cost is the same parquet scan plus a
  * per-file-group column projection (which Spark prunes as usual).
  * Evolution commits are metadata-only (adds = removes = ∅), so an
  * add/rename/drop on a 100 TB table is one JSON write + one CAS.
  *
  * Merge-on-read composes fully: [[readWithPositionDeletes]] applies
  * POSITION deletes after the projection (physical (file, pos)
  * identities are schema-independent), and [[readMorEvolved]] applies
  * EQUALITY deletes too — delete files written via
  * [[commitEqualityDeletes]] are schema-tagged like data files, so
  * their key columns re-resolve by field id after any later rename.
  * The plain [[read]] ignores delete files entirely (append-only
  * view); [[readWithPositionDeletes]] still refuses live equality
  * deletes rather than silently resurrect rows.
  */
object SchemaEvolution {

  /** Thrown when a schema evolution (or bootstrap) loses a race with a
    * concurrent evolution: the schema this commit was computed against
    * is no longer the table's schema, so publishing it would silently
    * undo the winner's change — and, for two racing addColumn calls,
    * hand the SAME fresh field id to two different columns (old bytes
    * of one would then resolve under the other's name). Callers re-read
    * the new schema and retry their evolution against it. */
  final class ConcurrentSchemaEvolutionException(table: String,
      expected: String, found: String)
    extends java.util.ConcurrentModificationException(
      s"schema evolution conflict at $table: computed against schema " +
        s"'$expected' but the table moved to '$found' — re-read the " +
        "current schema and retry")

  /** Commit-time guard ([[CommitLog.commit]]'s validateManifest hook):
    * conflicts unless the FRESH base manifest still carries
    * `expectedSid` — re-evaluated on every CAS attempt, so an
    * evolution landing between our validate and publish is caught by
    * the retry, never silently overwritten. */
  private[sources] def requireSchemaStill(table: String, expectedSid: String)
      : Option[CommitLog.Manifest] => Unit = { base =>
    val found = base.map(_.schemaId).getOrElse("")
    if (found != expectedSid)
      throw new ConcurrentSchemaEvolutionException(table, expectedSid, found)
  }

  final case class Field(id: Int, name: String, dataType: String)
  /** `lastId` = highest field id EVER assigned in this lineage; it
    * only grows, so dropped ids are never reused and a re-added name
    * cannot resurrect old bytes through an id collision. */
  final case class TableSchema(sid: String, fields: Seq[Field],
      lastId: Int)

  /** Content address of a schema: md5 over the canonical
    * "id:name:type" join plus lastId — identical schemas collide on
    * purpose; same fields with different id history do not. */
  private def schemaIdOf(fields: Seq[Field], lastId: Int): String = {
    val canon = fields.map(f => s"${f.id}:${f.name}:${f.dataType}")
      .mkString("|") + s"|last=$lastId"
    java.security.MessageDigest.getInstance("MD5")
      .digest(canon.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
  }

  /** The table's current schema, if it has ever been evolved. */
  def currentSchema(spark: SparkSession, table: String): Option[TableSchema] =
    CommitLog.currentVersion(spark, table)
      .map(v => CommitLog.readManifest(spark, table, v))
      .filter(_.schemaId.nonEmpty)
      .map(m => load(spark, table, m.schemaId))

  private def load(spark: SparkSession, table: String,
      sid: String): TableSchema = {
    val (fields, lastId) = CommitLog.readSchemaFile(spark, table, sid)
    TableSchema(sid, fields.map { case (id, n, t) => Field(id, n, t) },
      lastId)
  }

  private def persist(spark: SparkSession, table: String,
      fields: Seq[Field], lastId: Int): String = {
    // The schema-file encoding joins fields as "id:name:type" — a ':'
    // (or control char) in a column name would misparse on read, so
    // refuse it at write time, loudly.
    fields.foreach(f => require(
      f.name.nonEmpty && f.name.forall(c =>
        c.isLetterOrDigit || c == '_' || c == '-' || c == '.'),
      s"column name '${f.name}' must be [A-Za-z0-9_.-]+ " +
        "(the schema-file encoding reserves ':')"))
    val sid = schemaIdOf(fields, lastId)
    CommitLog.writeSchemaFile(spark, table, sid,
      fields.map(f => (f.id, f.name, f.dataType)), lastId)
    sid
  }

  /** Append `df` under the table's current schema (bootstrapping one
    * from df's own schema — field ids 1..n — on a fresh table). The
    * staged files are tagged with the schema id they were written
    * under; one commit. */
  def append(spark: SparkSession, df: DataFrame, table: String): Long = {
    val existing = currentSchema(spark, table)
    val schema = existing.getOrElse {
      val fs = df.schema.fields.toSeq.zipWithIndex.map { case (f, i) =>
        Field(i + 1, f.name, f.dataType.sql.toLowerCase)
      }
      TableSchema(persist(spark, table, fs, fs.size), fs, fs.size)
    }
    val names = schema.fields.map(_.name)
    require(df.columns.toSet == names.toSet,
      s"append columns ${df.columns.toSeq.sorted} != current schema " +
        s"${names.sorted} — evolve the schema first, then append")
    // Lossless-up-cast rule (same as MergeInto's): a long frame into
    // an int column would silently truncate through the Cast below.
    schema.fields.foreach { f =>
      val from = df.schema(f.name).dataType
      val to = org.apache.spark.sql.catalyst.parser.CatalystSqlParser
        .parseDataType(f.dataType)
      require(from == org.apache.spark.sql.types.NullType ||
        org.apache.spark.sql.catalyst.expressions.Cast.canUpCast(from, to),
        s"append type mismatch on '${f.name}': ${from.simpleString} " +
          s"does not up-cast losslessly to ${to.simpleString} — widen " +
          "the schema or cast explicitly")
    }
    val shaped = df.select(
      schema.fields.map(f => col(f.name).cast(f.dataType).as(f.name)): _*)
    val staged = CommitLog.stage(spark, shaped, table)
    if (existing.isEmpty)
      // Bootstrap sets the TABLE schema — conflicting if any schema
      // appeared concurrently (two racing bootstraps must not silently
      // pick a winner with the loser's files mis-tagged).
      CommitLog.commit(spark, table, adds = staged, schemaId = schema.sid,
        fileSchemas = staged.map(_ -> schema.sid).toMap,
        validateManifest = requireSchemaStill(table, ""))
    else
      // Data append: tag the files with the schema they were WRITTEN
      // under; the table-level schema id stays whatever the head says
      // (sticky in the commit loop) — passing schema.sid here would
      // let a CAS retry racing a rename RESET the table to this
      // append's stale schema (the read-modify-write hole; field-id
      // projection keeps the stale-tagged files reading correctly
      // under the winner's schema).
      CommitLog.commit(spark, table, adds = staged,
        fileSchemas = staged.map(_ -> schema.sid).toMap)
  }

  private def requireSchema(spark: SparkSession, table: String): TableSchema =
    currentSchema(spark, table).getOrElse(throw new IllegalArgumentException(
      s"$table has no evolved schema — bootstrap with SchemaEvolution.append"))

  /** Metadata-only schema commit: same live files, new schema id.
    * `baseSid` is the schema this evolution was COMPUTED against —
    * the commit conflicts (every CAS attempt re-checks) if the table
    * moved to any other schema in between, closing the lost-update /
    * reused-field-id race two concurrent evolutions would otherwise
    * hit (ADVICE r12 #1). */
  private def commitSchema(spark: SparkSession, table: String,
      baseSid: String, fields: Seq[Field], lastId: Int): Long =
    CommitLog.commit(spark, table, adds = Seq.empty,
      schemaId = persist(spark, table, fields, lastId),
      validateManifest = requireSchemaStill(table, baseSid))

  /** ADD a column — a FRESH field id past every id ever assigned
    * (including dropped ones), read as typed NULL in older files. */
  def addColumn(spark: SparkSession, table: String, name: String,
      dataType: String): Long = {
    val cur = requireSchema(spark, table)
    require(!cur.fields.exists(_.name == name),
      s"column '$name' already exists")
    val nextId = cur.lastId + 1
    commitSchema(spark, table, cur.sid,
      cur.fields :+ Field(nextId, name, dataType), nextId)
  }

  /** RENAME a column — the field id is unchanged, so files written
    * under the old name keep resolving; no data is touched. */
  def renameColumn(spark: SparkSession, table: String, from: String,
      to: String): Long = {
    val cur = requireSchema(spark, table)
    require(cur.fields.exists(_.name == from), s"no column '$from'")
    require(!cur.fields.exists(_.name == to),
      s"column '$to' already exists")
    commitSchema(spark, table, cur.sid, cur.fields.map(f =>
      if (f.name == from) f.copy(name = to) else f), cur.lastId)
  }

  /** The lossless type promotions (the Iceberg v2 set, plus the
    * smaller integer rungs): a reader casting old bytes UP to the new
    * type can never lose information. */
  private val Widenings: Set[(String, String)] = Set(
    ("tinyint", "smallint"), ("tinyint", "int"), ("tinyint", "bigint"),
    ("smallint", "int"), ("smallint", "bigint"),
    ("int", "bigint"), ("float", "double"))

  /** WIDEN a column's type (int→bigint, float→double, …): metadata
    * only — the field id keeps resolving, old files' narrow bytes
    * up-cast at read. Narrowing or any lossy change is refused. */
  def widenColumnType(spark: SparkSession, table: String, name: String,
      newType: String): Long = {
    val cur = requireSchema(spark, table)
    val f = cur.fields.find(_.name == name).getOrElse(
      throw new IllegalArgumentException(s"no column '$name'"))
    require(Widenings((f.dataType, newType)),
      s"not a lossless widening: ${f.dataType} -> $newType")
    commitSchema(spark, table, cur.sid, cur.fields.map(x =>
      if (x.name == name) x.copy(dataType = newType) else x), cur.lastId)
  }

  /** DROP a column — its field id is retired (never reused: ids only
    * grow), old files still carry the bytes for time travel. */
  def dropColumn(spark: SparkSession, table: String, name: String): Long = {
    val cur = requireSchema(spark, table)
    require(cur.fields.exists(_.name == name), s"no column '$name'")
    commitSchema(spark, table, cur.sid,
      cur.fields.filterNot(_.name == name), cur.lastId)
  }

  /** Read `version` (current if None) under the schema THAT VERSION
    * had: files group by the schema they were written under, each
    * group projects by field id into the version's schema, groups
    * union. Untagged files (written outside this API) are assumed to
    * already carry the version-schema names. */
  def read(spark: SparkSession, table: String,
      version: Option[Long] = None): DataFrame =
    projected(spark, table, version, keepIds = false)

  /** [[read]] for a table that also carries POSITION deletes: the
    * per-group field-id projection keeps each row's physical identity
    * beside it, and the version's posdel tuples are subtracted after
    * the union — one broadcast-able anti join, schema-independent.
    * Refuses on live equality deletes — use [[readMorEvolved]] (which
    * re-resolves delete keys by field id) or [[compactEvolved]]. */
  def readWithPositionDeletes(spark: SparkSession, table: String,
      version: Option[Long] = None): DataFrame =
    readWithPositionDeletesCore(spark, table, version, keepIds = false)

  /** The ids-preserving core: with `keepIds` the surviving rows carry
    * `__fk`/`__pos` — what the merge-on-read MERGE writer joins
    * against on an evolved table. */
  private[sources] def readWithPositionDeletesCore(spark: SparkSession,
      table: String, version: Option[Long],
      keepIds: Boolean): DataFrame = {
    val v = version.orElse(CommitLog.currentVersion(spark, table))
      .getOrElse(throw new IllegalArgumentException(
        s"no committed version at $table"))
    val m = CommitLog.readManifest(spark, table, v)
    require(!m.files.exists(_.startsWith("deletes-")),
      s"$table@$v carries equality deletes — use readMorEvolved, or compactEvolved first")
    val posFiles = m.files.filter(_.startsWith("posdel-"))
    val df = projected(spark, table, version,
      keepIds = keepIds || posFiles.nonEmpty)
    if (posFiles.isEmpty) df
    else {
      val root = CommitLog.dataRoot(table)
      val pd = spark.read.parquet(posFiles.map(f => s"$root/$f"): _*)
        .select(col("file_key").as("__fk"), col("pos").as("__pos"))
      val alive = df.join(pd, Seq("__fk", "__pos"), "left_anti")
      if (keepIds) alive else alive.drop("__fk", "__pos")
    }
  }

  /** Commit EQUALITY deletes on an evolved table: the key frame's
    * columns resolve against the CURRENT schema and the staged delete
    * file is schema-TAGGED like a data file, so
    * [[readMorEvolved]] can re-resolve its key columns by field id
    * after any later rename — the Iceberg answer to "delete files
    * carry schema too". Keys must include only schema columns; the
    * data side must carry a `data_seq` column (part of the schema)
    * for the `data_seq < delete_seq` sequencing rule. */
  def commitEqualityDeletes(spark: SparkSession, table: String,
      keys: DataFrame, seq: Long): Long = {
    val cur = requireSchema(spark, table)
    keys.columns.foreach(c => require(cur.fields.exists(_.name == c),
      s"delete key column '$c' is not in the current schema"))
    val staged = CommitLog.stageUnder(spark,
      keys.distinct().withColumn("delete_seq", lit(seq)), table, "deletes")
    // fileSchemas tag the delete file with the schema its keys were
    // RESOLVED under; the table-level schema id stays sticky (forcing
    // cur.sid here would let a CAS retry racing a rename reset it).
    CommitLog.commit(spark, table, adds = staged,
      fileSchemas = staged.map(_ -> cur.sid).toMap)
  }

  /** Full merge-on-read over an EVOLVED table: field-id projection,
    * then position deletes (schema-independent), then equality
    * deletes whose key columns are themselves re-resolved by field id
    * into the version's names — so deletes written before a rename
    * keep applying after it. `keyCols` are the CURRENT names; the
    * schema must carry `data_seq`. */
  def readMorEvolved(spark: SparkSession, table: String,
      keyCols: Seq[String], version: Option[Long] = None): DataFrame = {
    val v = version.orElse(CommitLog.currentVersion(spark, table))
      .getOrElse(throw new IllegalArgumentException(
        s"no committed version at $table"))
    val m = CommitLog.readManifest(spark, table, v)
    require(m.schemaId.nonEmpty,
      s"$table@$v has no evolved schema — use MorTable.readMor")
    val target = load(spark, table, m.schemaId)
    val root = CommitLog.dataRoot(table)
    val eqFiles = m.files.filter(_.startsWith("deletes-"))
    val posFiles = m.files.filter(_.startsWith("posdel-"))
    val data0 = projected(spark, table, Some(v),
      keepIds = posFiles.nonEmpty)
    val afterPos =
      if (posFiles.isEmpty) data0
      else {
        val pd = spark.read.parquet(posFiles.map(f => s"$root/$f"): _*)
          .select(col("file_key").as("__fk"), col("pos").as("__pos"))
        data0.join(pd, Seq("__fk", "__pos"), "left_anti")
          .drop("__fk", "__pos")
      }
    if (eqFiles.isEmpty) afterPos
    else {
      val targetById = target.fields.map(f => f.id -> f.name).toMap
      val dels = eqFiles
        .groupBy(f => m.fileSchemas.getOrElse(f, m.schemaId))
        .toSeq.sortBy(_._1)
        .map { case (sid, files) =>
          val written = load(spark, table, sid)
          val raw = spark.read.parquet(files.map(f => s"$root/$f"): _*)
          val proj = raw.columns.toSeq.map {
            case "delete_seq" => col("delete_seq")
            case c =>
              val wf = written.fields.find(_.name == c).getOrElse(
                throw new IllegalStateException(
                  s"delete file column '$c' unknown to its schema $sid"))
              val now = targetById.getOrElse(wf.id,
                throw new IllegalStateException(
                  s"delete key '$c' (field ${wf.id}) was dropped from " +
                    "the current schema — compactEvolved the delete debt first"))
              col(c).as(now)
          }
          raw.select(proj: _*)
        }
        .reduce(_ unionByName _)
        .select(keyCols.map(c => col(c).as(s"__del_$c"))
          :+ col("delete_seq"): _*)
      val cond = keyCols.map(c => afterPos(c) === dels(s"__del_$c"))
        .reduce(_ && _) && afterPos("data_seq") < dels("delete_seq")
      afterPos.join(dels, cond, "left_anti")
    }
  }

  /** Commit position deletes against the EVOLVED view: the predicate
    * is evaluated under the CURRENT schema (each file group projected
    * by field id first — a predicate on a renamed column hits old
    * files correctly), and the matching rows' physical identities land
    * as one posdel commit, exactly like
    * [[MorTable.commitPositionDeletes]] on a flat table. */
  def commitPositionDeletes(spark: SparkSession, table: String,
      predicate: Column): Long = {
    val v = CommitLog.currentVersion(spark, table)
      .getOrElse(throw new IllegalArgumentException(
        s"no committed version at $table"))
    val m = CommitLog.readManifest(spark, table, v)
    val dataFiles = m.files.filterNot(f =>
      f.startsWith("posdel-") || f.startsWith("deletes-"))
    val dels = projected(spark, table, Some(v), keepIds = true)
      .filter(predicate)
      .select(col("__fk").as("file_key"), col("__pos").as("pos"))
    CommitLog.commit(spark, table,
      adds = CommitLog.stageUnder(spark, dels, table, "posdel"),
      // tuples are keyed by v's file paths — conflict rather than
      // silently no-op if a concurrent rewrite retired any of them
      validateLive = MorTable.requireStillLive(table, dataFiles))
  }

  /** [[MorTable.compact]] for an EVOLVED table: materialize
    * [[readMorEvolved]] (field-id projection + both delete flavors)
    * as fresh CURRENT-schema files and retire the old data AND delete
    * files in one conflict-guarded rewrite. This — not the
    * schema-oblivious [[MorTable.compact]], which would null-fork
    * renamed columns — is the remediation for eq-delete debt on a
    * renamed table. */
  def compactEvolved(spark: SparkSession, table: String,
      keyCols: Seq[String]): Long = {
    val v = CommitLog.currentVersion(spark, table)
      .getOrElse(throw new IllegalArgumentException(
        s"no committed version at $table"))
    val m = CommitLog.readManifest(spark, table, v)
    val cur = requireSchema(spark, table)
    val knownDeletes = m.files.filter(f => f.startsWith("posdel-") ||
      f.startsWith("deletes-")).toSet
    val staged = CommitLog.stage(spark,
      readMorEvolved(spark, table, keyCols, Some(v)), table)
    CommitLog.rewrite(spark, table, adds = staged, removes = m.files,
      fileSchemas = staged.map(_ -> cur.sid).toMap,
      validateLive = MorTable.noNewDeletes(table, knownDeletes),
      // the materialization was rendered under cur.sid — a concurrent
      // evolution would make the swapped-in files stale-shaped, so
      // conflict rather than publish (re-read and recompact)
      validateManifest = requireSchemaStill(table, cur.sid))
  }

  private def projected(spark: SparkSession, table: String,
      version: Option[Long], keepIds: Boolean): DataFrame = {
    val v = version.orElse(CommitLog.currentVersion(spark, table))
      .getOrElse(throw new IllegalArgumentException(
        s"no committed version at $table"))
    val m = CommitLog.readManifest(spark, table, v)
    require(m.schemaId.nonEmpty,
      s"$table@$v has no evolved schema — use CommitLog.readVersion")
    val dataFiles = m.files.filterNot(f =>
      f.startsWith("posdel-") || f.startsWith("deletes-"))
    projectFiles(spark, table, m, dataFiles, keepIds)
  }

  /** Project an arbitrary SUBSET of a manifest's data files into the
    * manifest's current schema (per-group field-id resolution) — the
    * read kernel [[TableFeed]] uses when tailing an evolving table, so
    * a feed range that spans a rename unifies under one set of names
    * instead of silently forking columns. Empty subset → typed empty. */
  private[sources] def projectFiles(spark: SparkSession, table: String,
      m: CommitLog.Manifest, files: Seq[String],
      keepIds: Boolean = false): DataFrame = {
    val target = load(spark, table, m.schemaId)
    val root = CommitLog.dataRoot(table)
    val groups = files.groupBy(f => m.fileSchemas.getOrElse(f, m.schemaId))
    val frames = groups.toSeq.sortBy(_._1).map { case (sid, fs) =>
      val written = load(spark, table, sid).fields.map(f => f.id -> f).toMap
      val proj: Seq[Column] = target.fields.map { tf =>
        written.get(tf.id) match {
          case Some(wf) => col(wf.name).cast(tf.dataType).as(tf.name)
          case None => lit(null).cast(tf.dataType).as(tf.name)
        }
      }
      val raw = spark.read.parquet(fs.map(f => s"$root/$f"): _*)
      val withIds =
        if (!keepIds) proj
        else proj :+ MorTable.fileKey(col("_metadata.file_path"))
          .as("__fk") :+
          col("_metadata.row_index").as("__pos")
      raw.select(withIds: _*)
    }
    frames.reduceOption(_ unionAll _).getOrElse {
      // keepIds adds the physical-identity columns so an empty data
      // subset still anti-joins against posdel tuples (ADVICE r12 #4:
      // a posdel-only manifest must read as empty, not error).
      val fields = target.fields.map(f =>
        org.apache.spark.sql.types.StructField(f.name,
          org.apache.spark.sql.catalyst.parser.CatalystSqlParser
            .parseDataType(f.dataType))) ++
        (if (!keepIds) Seq.empty
         else Seq(
           org.apache.spark.sql.types.StructField("__fk",
             org.apache.spark.sql.types.StringType),
           org.apache.spark.sql.types.StructField("__pos",
             org.apache.spark.sql.types.LongType)))
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(fields))
    }
  }
}
