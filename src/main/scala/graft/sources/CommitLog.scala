package graft.sources

import java.util.UUID

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Atomic table commits over plain parquet — the manifest/commit-log
  * layer that makes the engine's at-rest housekeeping ops
  * (compaction, vacuum, CDC swap, incremental appends) transactional
  * (round-10 directive #6, the mini-Delta shape).
  *
  * Layout:
  * {{{
  * table/
  *   stage-<uuid>/part-*.parquet     data files, written FIRST, invisible
  *   _log/00000000000000000001.manifest   one JSON per version: the live file list
  *   _log/.tmp-<uuid>                in-flight manifest (ignored by readers)
  * }}}
  *
  * Protocol — the order IS the correctness argument:
  *  1. Writers land data files under a fresh `stage-<uuid>/` dir. A
  *     file on disk is DEAD until a manifest names it, so arbitrarily
  *     many writers/compactors can stage concurrently, and a crash
  *     mid-stage leaves only unreferenced files (vacuum's problem,
  *     never a reader's).
  *  2. The commit is ONE atomic rename: manifest JSON written to
  *     `_log/.tmp-*`, then renamed to `_log/<version>.manifest`.
  *     Hadoop `rename` will not clobber an existing destination, so
  *     the rename doubles as compare-and-swap on the version number:
  *     of two racing committers exactly one wins; the loser re-reads
  *     the log and retries against the next version (true on file://
  *     and hdfs://; on S3 this is the documented seam for a commit
  *     coordinator, exactly as in Delta/Iceberg).
  *  3. Readers resolve the HIGHEST complete manifest and read exactly
  *     the files it lists — a reader racing a compaction or CDC swap
  *     sees wholly the old version or wholly the new one, never a mix
  *     and never a partial write.
  *
  * Scale shape: a manifest holds file paths, not data — O(files), read
  * once per query by the driver; the listing never touches executors
  * and replaces the eventually-consistent directory glob that makes
  * racing readers double-count. Old versions stay readable (time
  * travel via `readVersion`) until [[vacuumUnreferenced]] retires them.
  */
object CommitLog {

  private val ManifestSuffix = ".manifest"

  /** A table ref is `path` (the main branch) or `path#branch`. The
    * branch shares the main table's DATA directory — every manifest
    * path is relative to the same root, so branching is zero-copy —
    * but resolves and commits through its own `_log@branch` directory.
    * Any function here accepts a ref wherever it takes a table. */
  private[sources] def dataRoot(table: String): String = {
    val i = table.indexOf('#')
    if (i < 0) table else table.substring(0, i)
  }

  private def branchOf(table: String): Option[String] = {
    val i = table.indexOf('#')
    if (i < 0) None else Some(table.substring(i + 1))
  }

  private def fs(spark: SparkSession, path: String): FileSystem =
    new Path(dataRoot(path))
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def logDir(table: String) = branchOf(table) match {
    case None => new Path(dataRoot(table), "_log")
    case Some(b) =>
      require(b.nonEmpty && b.forall(c => c.isLetterOrDigit || c == '_' ||
        c == '-'), s"branch name must be [A-Za-z0-9_-]+: '$b'")
      new Path(dataRoot(table), s"_log@$b")
  }

  private def manifestPath(table: String, version: Long): Path =
    new Path(logDir(table), f"$version%020d$ManifestSuffix")

  /** Versions with a COMPLETE (fully renamed) manifest, ascending. */
  def versions(spark: SparkSession, table: String): Seq[Long] = {
    val f = fs(spark, table)
    val dir = logDir(table)
    if (!f.exists(dir)) Seq.empty
    else f.listStatus(dir).toSeq
      .map(_.getPath.getName)
      .filter(n => n.endsWith(ManifestSuffix) && !n.startsWith("."))
      .map(_.stripSuffix(ManifestSuffix).toLong)
      .sorted
  }

  def currentVersion(spark: SparkSession, table: String): Option[Long] =
    versions(spark, table).lastOption

  /** A resolved manifest: the live file set, the transaction id that
    * produced it (streaming exactly-once; empty for plain commits),
    * and optional per-file zone-map stats — integer [min, max] of
    * `statsCol` per live file, carried FORWARD across commits so a
    * reader prunes at the manifest, before any footer is opened. */
  final case class Manifest(
      version: Long,
      txn: String,
      statsCol: String,
      files: Seq[String],
      stats: Map[String, (Long, Long)],
      /** Current schema id ("" = table has no evolved schema) and the
        * sparse per-file map of the schema id each data file was
        * WRITTEN under — the field-id indirection that lets
        * add/rename/drop evolve without rewriting data files
        * ([[SchemaEvolution]]). */
      schemaId: String = "",
      fileSchemas: Map[String, String] = Map.empty)

  /** Live file list of `version` (paths relative to the table root). */
  def liveFiles(spark: SparkSession, table: String, version: Long): Seq[String] =
    readManifest(spark, table, version).files

  def readManifest(spark: SparkSession, table: String, version: Long): Manifest = {
    val f = fs(spark, table)
    val in = try f.open(manifestPath(table, version))
    catch {
      case _: java.io.FileNotFoundException =>
        // Surface the retention contract instead of a bare FNF: a
        // TableFeed cursor (or time-travel reader) older than
        // vacuumUnreferenced's keepVersions lands here.
        throw new IllegalStateException(
          s"version $version of $table is gone (vacuumed or never " +
            "committed) — feeds and time travel must stay inside the " +
            "vacuum retention window")
    }
    val body = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
    parseManifest(body)
  }

  private def esc(s: String): String = s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  /** One JSON object per manifest; file order is canonicalized (and
    * statsFiles/mins/maxs aligned to it) so two manifests with the
    * same live set are byte-comparable. Stats are SPARSE: only the
    * files that have an entry are serialized (as `statsFiles` with
    * aligned mins/maxs), so one stats-less add — a plain [[append]]
    * onto a stats-carrying table, or an all-NULL stats batch — never
    * erases the carried stats of the surviving files. Readers treat
    * absent entries conservatively ([[prunedFiles]] keeps them;
    * [[replaceWhere]] throws on them, its documented contract). */
  private def renderManifest(m: Manifest): String = {
    val ordered = m.files.sorted
    val fileJson = ordered.map(f => "\"" + esc(f) + "\"").mkString(",")
    val withStats = ordered.filter(m.stats.contains)
    val statsJson =
      if (m.statsCol.isEmpty || withStats.isEmpty) ""
      else {
        val sfiles = withStats.map(f => "\"" + esc(f) + "\"").mkString(",")
        val mins = withStats.map(f => m.stats(f)._1).mkString(",")
        val maxs = withStats.map(f => m.stats(f)._2).mkString(",")
        s""","statsCol":"${esc(m.statsCol)}","statsFiles":[$sfiles],"mins":[$mins],"maxs":[$maxs]"""
      }
    val withSchema = ordered.filter(m.fileSchemas.contains)
    val schemaJson =
      if (m.schemaId.isEmpty) ""
      else {
        val sf = withSchema.map(f => "\"" + esc(f) + "\"").mkString(",")
        val ids = withSchema.map(f => "\"" + esc(m.fileSchemas(f)) + "\"")
          .mkString(",")
        s""","schemaId":"${esc(m.schemaId)}","schemaFiles":[$sf],"fileSchemaIds":[$ids]"""
      }
    s"""{"version":${m.version},"txn":"${esc(m.txn)}","files":[$fileJson]$statsJson$schemaJson}"""
  }

  // Minimal JSON field extraction (no JSON lib on the unmanaged
  // classpath contract); the renderer above is the only writer, so the
  // grammar is fixed: string scalars, string arrays, long arrays.

  private def parseStrings(arr: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val sb = new StringBuilder
    var inStr = false
    var i = 0
    while (i < arr.length) {
      val c = arr.charAt(i)
      if (!inStr) { if (c == '"') inStr = true }
      else c match {
        case '"' => out += sb.result(); sb.clear(); inStr = false
        case '\\' =>
          i += 1
          arr.charAt(i) match {
            case 'u' => sb += Integer.parseInt(arr.substring(i + 1, i + 5), 16).toChar; i += 4
            case e => sb += e
          }
        case _ => sb += c
      }
      i += 1
    }
    out.toSeq
  }

  /** The bracketed body of `"key":[...]`, or None. Safe because the
    * renderer emits keys in fixed order and paths cannot inject a
    * `","key":[` sequence without its quote being escaped. */
  private def arrayField(body: String, key: String): Option[String] = {
    val tag = "\"" + key + "\":["
    val at = body.indexOf(tag)
    if (at < 0) None
    else {
      val start = at + tag.length
      var depth = 1
      var inStr = false
      var i = start
      while (depth > 0) {
        val c = body.charAt(i)
        if (inStr) { if (c == '\\') i += 1 else if (c == '"') inStr = false }
        else c match {
          case '"' => inStr = true
          case '[' => depth += 1
          case ']' => depth -= 1
          case _ =>
        }
        i += 1
      }
      Some(body.substring(start, i - 1))
    }
  }

  private def stringField(body: String, key: String): String = {
    val tag = "\"" + key + "\":\""
    val at = body.indexOf(tag)
    if (at < 0) "" else parseStrings(body.substring(at + tag.length - 1)).headOption.getOrElse("")
  }

  private def parseManifest(body: String): Manifest = {
    val version = {
      val tag = "\"version\":"
      val at = body.indexOf(tag) + tag.length
      body.substring(at, body.indexWhere(c => c == ',' || c == '}', at)).trim.toLong
    }
    val files = arrayField(body, "files").map(parseStrings).getOrElse(Seq.empty)
    def longs(key: String): Seq[Long] = arrayField(body, key)
      .map(a => if (a.trim.isEmpty) Seq.empty[Long]
                else a.split(',').toSeq.map(_.trim.toLong))
      .getOrElse(Seq.empty)
    val mins = longs("mins")
    val maxs = longs("maxs")
    // Sparse format carries its own statsFiles list; the legacy dense
    // format aligned mins/maxs to the full sorted file list.
    val statted = arrayField(body, "statsFiles").map(parseStrings)
      .getOrElse(files.sorted)
    val stats =
      if (mins.size == statted.size && maxs.size == statted.size && statted.nonEmpty)
        statted.zip(mins.zip(maxs)).toMap
      else Map.empty[String, (Long, Long)]
    val schemaFiles = arrayField(body, "schemaFiles").map(parseStrings)
      .getOrElse(Seq.empty)
    val schemaIds = arrayField(body, "fileSchemaIds").map(parseStrings)
      .getOrElse(Seq.empty)
    val fileSchemas =
      if (schemaFiles.size == schemaIds.size) schemaFiles.zip(schemaIds).toMap
      else Map.empty[String, String]
    Manifest(version, stringField(body, "txn"), stringField(body, "statsCol"),
      files, stats, stringField(body, "schemaId"), fileSchemas)
  }

  /** Publish the fully-written `tmp` manifest at `dst` iff `dst` does
    * not exist — the compare-and-swap under every commit. On file://
    * Hadoop's rename bottoms out in POSIX rename(2), which CLOBBERS an
    * existing destination, so we use link(2) instead: hardlink-create
    * fails with EEXIST *atomically* when the destination appears
    * first. Elsewhere (hdfs://) rename is the real no-clobber atomic
    * primitive; object stores without one are the documented commit-
    * coordinator seam (as in Delta/Iceberg on S3). */
  private def atomicPublish(f: FileSystem, tmp: Path, dst: Path): Boolean =
    if ("file".equalsIgnoreCase(f.getUri.getScheme)) {
      try {
        // Qualify first: a relative Path's URI path is itself relative
        // and java.nio would resolve it against the JVM cwd, not the
        // filesystem's working directory.
        java.nio.file.Files.createLink(
          java.nio.file.Paths.get(f.makeQualified(dst).toUri.getPath),
          java.nio.file.Paths.get(f.makeQualified(tmp).toUri.getPath))
        f.delete(tmp, false)
        true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException => false
      }
    } else !f.exists(dst) && f.rename(tmp, dst)

  /** Atomically publish a new version whose live set is
    * `currentLive -- removes ++ adds` (paths relative to the table
    * root). CAS loop: the manifest rename fails if another committer
    * took the version first; re-resolve and retry. Returns the
    * committed version. */
  def commit(
      spark: SparkSession,
      table: String,
      adds: Seq[String],
      removes: Seq[String] = Seq.empty,
      txn: String = "",
      statsCol: String = "",
      stats: Map[String, (Long, Long)] = Map.empty,
      maxAttempts: Int = 200,
      schemaId: String = "",
      fileSchemas: Map[String, String] = Map.empty,
      validateLive: Seq[String] => Unit = _ => ()): Long =
    commitInternal(spark, table, adds, removes, txn, statsCol, stats,
      maxAttempts, requireRemovesLive = false, schemaId, fileSchemas,
      validateLive)

  /** Thrown by [[rewrite]] when a file it meant to replace was already
    * removed by a concurrent commit — proceeding would re-add the
    * file's content beside its replacement (silent duplication). */
  final class ConcurrentRewriteException(table: String, gone: Seq[String])
    extends java.util.ConcurrentModificationException(
      s"rewrite conflict at $table: ${gone.size} file(s) no longer live " +
        s"(first: ${gone.headOption.getOrElse("")}) — rebase on the new " +
        "version and restage")

  /** REWRITE commit (compaction, z-order, CDC swap — any commit that
    * REPLACES data): like [[commit]], but the CAS loop additionally
    * verifies every `removes` entry is STILL LIVE at the version being
    * replaced, and throws [[ConcurrentRewriteException]] otherwise —
    * the Delta/Iceberg concurrent-delete conflict rule. The blind
    * [[commit]] stays correct for appends (its retry recomputes the
    * live set), but a rewrite that lost its read-set must NOT retry:
    * its staged output duplicates content whose original rows were
    * already rewritten or deleted by the winner. Losers rebase (re-read
    * the new version, restage) rather than re-commit.
    */
  def rewrite(
      spark: SparkSession,
      table: String,
      adds: Seq[String],
      removes: Seq[String],
      txn: String = "",
      statsCol: String = "",
      stats: Map[String, (Long, Long)] = Map.empty,
      maxAttempts: Int = 200,
      schemaId: String = "",
      fileSchemas: Map[String, String] = Map.empty,
      validateLive: Seq[String] => Unit = _ => ()): Long =
    commitInternal(spark, table, adds, removes, txn, statsCol, stats,
      maxAttempts, requireRemovesLive = true, schemaId, fileSchemas,
      validateLive)

  private def commitInternal(
      spark: SparkSession,
      table: String,
      adds: Seq[String],
      removes: Seq[String],
      txn: String,
      statsCol: String,
      stats: Map[String, (Long, Long)],
      maxAttempts: Int,
      requireRemovesLive: Boolean,
      schemaId: String = "",
      fileSchemas: Map[String, String] = Map.empty,
      // Re-evaluated against the FRESH live set on every CAS attempt
      // (a commit landing between validate and publish fails our
      // rename, and the retry validates again) — the hook rewrite-
      // style ops use to conflict on read-set changes beyond removes,
      // e.g. a delete file that appeared since the snapshot was read.
      validateLive: Seq[String] => Unit = _ => ()): Long = {
    val f = fs(spark, table)
    f.mkdirs(logDir(table))
    var attempt = 0
    while (attempt < maxAttempts) {
      val base = currentVersion(spark, table)
        .map(v => readManifest(spark, table, v))
      val live = base.map(_.files).getOrElse(Seq.empty)
      if (requireRemovesLive) {
        val gone = removes.filterNot(live.toSet)
        if (gone.nonEmpty) throw new ConcurrentRewriteException(table, gone)
      }
      validateLive(live)
      val next = base.map(_.version).getOrElse(0L) + 1
      val newLive = (live.filterNot(removes.toSet) ++ adds).distinct
      // Surviving files keep their recorded stats; removed files drop
      // out; the adds bring their own. The stats column is sticky
      // across commits unless this commit sets one.
      val col = if (statsCol.nonEmpty) statsCol else base.map(_.statsCol).getOrElse("")
      val carried = base.map(_.stats).getOrElse(Map.empty) -- removes
      // Schema id is sticky like the stats column; per-file schema
      // tags carry forward sparsely like stats.
      val sid = if (schemaId.nonEmpty) schemaId
        else base.map(_.schemaId).getOrElse("")
      val carriedSchemas =
        base.map(_.fileSchemas).getOrElse(Map.empty) -- removes
      val tmp = new Path(logDir(table), s".tmp-${UUID.randomUUID()}")
      val out = f.create(tmp, false)
      try out.write(renderManifest(
        Manifest(next, txn, col, newLive, carried ++ stats,
          sid, carriedSchemas ++ fileSchemas)).getBytes("UTF-8"))
      finally out.close()
      if (atomicPublish(f, tmp, manifestPath(table, next))) return next
      f.delete(tmp, false) // lost the race — retry against the new head
      attempt += 1
    }
    throw new IllegalStateException(
      s"commit lost the version race $maxAttempts times at $table")
  }

  /** Stage `df` as parquet under a fresh `stage-<uuid>/` dir WITHOUT
    * committing. Returns the staged file paths (relative) for a later
    * [[commit]] — the two halves of every transactional write, split
    * so compaction/CDC can stage long before their swap. */
  def stage(
      spark: SparkSession,
      df: DataFrame,
      table: String,
      partitionBy: Seq[String] = Seq.empty): Seq[String] =
    stageUnder(spark, df, table, "stage", partitionBy)

  /** [[stage]] with a caller-chosen dir prefix — the prefix is how
    * multi-ROLE manifests (data files vs delete files, [[MorTable]])
    * tell file kinds apart without a manifest schema change. */
  private[sources] def stageUnder(
      spark: SparkSession,
      df: DataFrame,
      table: String,
      prefix: String,
      partitionBy: Seq[String] = Seq.empty): Seq[String] = {
    val sub = s"$prefix-${UUID.randomUUID()}"
    val w = df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .parquet(s"${dataRoot(table)}/$sub")
    val f = fs(spark, table)
    // Relativize against the FULLY-QUALIFIED root: listStatus returns
    // qualified paths, so substringing an unqualified (possibly
    // relative) dataRoot would compute a wrong offset and record
    // garbage paths in the manifest.
    val qualifiedRoot = f.makeQualified(new Path(dataRoot(table)))
    val rootLen = qualifiedRoot.toUri.getPath.length
    val root = f.makeQualified(new Path(qualifiedRoot, sub))
    def walk(p: Path): Seq[String] = f.listStatus(p).toSeq.flatMap { st =>
      val n = st.getPath.getName
      if (st.isDirectory) walk(st.getPath)
      else if (n.endsWith(".parquet") && !n.startsWith("_") && !n.startsWith("."))
        Seq(st.getPath.toUri.getPath.substring(rootLen + 1))
      else Seq.empty
    }
    walk(root)
  }

  /** Transactional append: stage + commit(adds). */
  def append(spark: SparkSession, df: DataFrame, table: String): Long =
    commit(spark, table, adds = stage(spark, df, table))

  /** Append with manifest-level ZONE MAPS: after staging, ONE pass
    * over the staged batch collects integer [min, max] of `statsCol`
    * per file (keyed by input_file_name — the batch, never the table,
    * is rescanned) and the commit records them beside the file list.
    * [[readPruned]] then skips dead files at the MANIFEST — the driver
    * never lists, opens, or footers a pruned file, which on a 100 TB
    * table is the difference between planning over every object-store
    * key and planning over a byte-sized JSON. (A production committer
    * would fold the stats into the write task itself; the one extra
    * batch-local pass keeps this engine's writer stock.) */
  def appendWithStats(
      spark: SparkSession, df: DataFrame, table: String, statsCol: String): Long = {
    val staged = stage(spark, df, table)
    commit(spark, table, adds = staged, statsCol = statsCol,
      stats = statsFor(spark, table, staged, statsCol))
  }

  /** Integer [min, max] of `statsCol` per staged file, in one scan of
    * just those files. Files with no non-null values get no entry
    * (readers keep them conservatively). */
  private def statsFor(
      spark: SparkSession, table: String, staged: Seq[String],
      statsCol: String): Map[String, (Long, Long)] = {
    import org.apache.spark.sql.functions.{col, input_file_name, max, min}
    if (staged.isEmpty) Map.empty
    else {
      // Key on the path from its LAST stage-* segment down — unique
      // within a commit (each stage dir is a fresh uuid) and stable
      // across the partitioned layout's bk=<v> subdirs, where bare
      // file names can repeat between sibling dirs. lastIndexOf, not
      // indexOf: an ancestor directory containing "stage-" must not
      // shift the key off the staged-relative form.
      def key(p: String): String = p.substring(p.lastIndexOf("stage-"))
      val byKey = staged.map(rel => key(rel) -> rel).toMap
      spark.read.parquet(staged.map(rel => s"${dataRoot(table)}/$rel"): _*)
        .groupBy(input_file_name().as("__f"))
        .agg(min(col(statsCol).cast("long")).as("mn"),
          max(col(statsCol).cast("long")).as("mx"))
        .collect()
        .flatMap { r =>
          if (r.isNullAt(1)) None
          else byKey.get(key(r.getString(0)))
            .map(rel => rel -> (r.getLong(1), r.getLong(2)))
        }.toMap
    }
  }

  /** Publish `df` as a RANGE-CLUSTERED table in ONE shuffle: hive-
    * partition the stage by `bucketCol` (year, month, hash bucket — a
    * bounded vocabulary), record each file's exact [min, max] of
    * `statsCol`, and swap the previous live set in one commit. The
    * layout [[readPruned]] and [[replaceWhere]] are built for; the
    * bucket column itself lives only in the directory names, so
    * readers see the data columns unchanged. One write job + one
    * stats scan of the staged batch, regardless of bucket count.
    */
  def replaceClustered(
      spark: SparkSession,
      df: DataFrame,
      table: String,
      bucketCol: String,
      statsCol: String): Long = {
    import org.apache.spark.sql.functions.col
    val staged = stage(spark, df.repartition(col(bucketCol)), table, Seq(bucketCol))
    val st = statsFor(spark, table, staged, statsCol)
    val prev = currentVersion(spark, table)
      .map(v => liveFiles(spark, table, v)).getOrElse(Seq.empty)
    commit(spark, table, adds = staged, removes = prev,
      statsCol = statsCol, stats = st)
  }

  /** The head manifest's live files whose recorded [min, max] range
    * intersects [lo, hi] on the manifest's stats column — files
    * without stats are kept (pruning must never lose rows). Returns
    * (liveTotal, selected). */
  def prunedFiles(
      spark: SparkSession, table: String, lo: Long, hi: Long): (Int, Seq[String]) = {
    val v = currentVersion(spark, table).getOrElse(
      throw new IllegalArgumentException(s"no committed version at $table"))
    val m = readManifest(spark, table, v)
    val sel = m.files.filter(f => m.stats.get(f) match {
      case Some((mn, mx)) => mx >= lo && mn <= hi
      case None => true
    })
    (m.files.size, sel)
  }

  /** Read only the manifest-pruned files for a [lo, hi] range on the
    * stats column. File granularity: callers still apply the residual
    * row predicate. An all-pruned range yields an empty frame with the
    * table's schema (resolved from one live file). */
  def readPruned(
      spark: SparkSession, table: String, lo: Long, hi: Long): DataFrame = {
    val (_, sel) = prunedFiles(spark, table, lo, hi)
    if (sel.nonEmpty) spark.read.parquet(sel.map(f => s"${dataRoot(table)}/$f"): _*)
    else read(spark, table).limit(0)
  }

  /** WRITE-AUDIT-PUBLISH (the Iceberg WAP pattern on this log): stage
    * the batch, run the audit against the STAGED FILES — the bytes
    * that would actually be published, so writer bugs are caught too,
    * not just logical bad rows — and only a passing batch gets a
    * manifest. A failing batch never becomes visible: its files stay
    * dead on disk (vacuum's problem) and readers cannot have seen a
    * partial or dirty state at any point. Returns Right(version) or
    * Left(reason) from the audit.
    *
    * `audit` receives the staged batch as a DataFrame and returns
    * None to publish or Some(reason) to reject — expectation suites
    * (null checks, ranges, FK counts) compose as one boolean
    * aggregate, which is one scan of the BATCH, never the table.
    */
  def writeAuditPublish(
      spark: SparkSession,
      df: DataFrame,
      table: String,
      audit: DataFrame => Option[String],
      statsCol: String = "",
      txn: String = ""): Either[String, Long] = {
    if (txn.nonEmpty) {
      val existing = findTxn(spark, table, txn)
      if (existing.isDefined) return Right(existing.get)
    }
    val staged = stage(spark, df, table)
    val stagedDf = spark.read.parquet(staged.map(f => s"${dataRoot(table)}/$f"): _*)
    audit(stagedDf) match {
      case Some(reason) => Left(reason)
      case None =>
        val st = if (statsCol.isEmpty) Map.empty[String, (Long, Long)]
          else statsFor(spark, table, staged, statsCol)
        Right(commit(spark, table, adds = staged, txn = txn,
          statsCol = statsCol, stats = st))
    }
  }

  /** Transactional small-file compaction ([[Compaction]] lifted onto
    * the log): rewrite the live set into ~`targetRecordsPerFile`-row
    * files and swap them in ONE commit — a reader racing the
    * compaction resolves the old manifest and never sees half a
    * rewrite. When the table carries zone maps the rewrite
    * repartitions BY RANGE on the stats column, so compaction
    * tightens per-file [min, max] instead of smearing each file
    * across the full domain the way round-robin would — compaction
    * and data-skipping stay friends. */
  def compactTable(
      spark: SparkSession, table: String, targetRecordsPerFile: Long): Long = {
    import org.apache.spark.sql.functions.col
    require(targetRecordsPerFile > 0, "target must be positive")
    val v = currentVersion(spark, table).getOrElse(
      throw new IllegalArgumentException(s"no committed version at $table"))
    val m = readManifest(spark, table, v)
    val df = readVersion(spark, table, v)
    val n = df.count()
    val nFiles = math.max(1L, math.ceil(n.toDouble / targetRecordsPerFile).toLong).toInt
    val shaped =
      if (m.statsCol.nonEmpty) df.repartitionByRange(nFiles, col(m.statsCol))
      else df.repartition(nFiles)
    val staged = stage(spark, shaped, table)
    val st = if (m.statsCol.isEmpty) Map.empty[String, (Long, Long)]
      else statsFor(spark, table, staged, m.statsCol)
    commit(spark, table, adds = staged, removes = m.files,
      statsCol = m.statsCol, stats = st)
  }

  /** PARTIAL OVERWRITE by range predicate (Delta's replaceWhere): one
    * commit swaps exactly the live files whose stats column lies
    * wholly inside [lo, hi] for the staged replacement — the monthly
    * re-statement / backfill primitive, at file granularity through
    * the manifest. LOUD on the two states that would otherwise corrupt
    * silently: a file OVERLAPPING but not contained in the range (its
    * out-of-range rows would be dropped with it) and a file with no
    * stats at all (can't prove either way) both throw — on a
    * range-clustered table (the [[appendWithStats]] +
    * [[writeAuditPublish]] layouts) neither occurs. The replacement
    * batch itself must sit inside [lo, hi]; its stats are recorded so
    * the table stays prunable.
    */
  def replaceWhere(
      spark: SparkSession,
      df: DataFrame,
      table: String,
      lo: Long,
      hi: Long): Long = {
    val v = currentVersion(spark, table).getOrElse(
      throw new IllegalArgumentException(s"no committed version at $table"))
    val m = readManifest(spark, table, v)
    require(m.statsCol.nonEmpty, s"replaceWhere needs a stats column at $table")
    val (contained, overlapping) = m.files
      .map(f => f -> m.stats.getOrElse(f,
        throw new IllegalStateException(s"file without stats: $f")))
      .filter { case (_, (mn, mx)) => mx >= lo && mn <= hi }
      .partition { case (_, (mn, mx)) => mn >= lo && mx <= hi }
    if (overlapping.nonEmpty)
      throw new IllegalStateException(
        s"files straddle [$lo, $hi] — rewrite them first: ${overlapping.map(_._1)}")
    val staged = stage(spark, df, table)
    val st = statsFor(spark, table, staged, m.statsCol)
    st.values.foreach { case (mn, mx) =>
      require(mn >= lo && mx <= hi,
        s"replacement rows [$mn, $mx] escape the replaced range [$lo, $hi]")
    }
    commit(spark, table, adds = staged, removes = contained.map(_._1),
      statsCol = m.statsCol, stats = st)
  }

  // ---- Schema files ([[SchemaEvolution]]'s storage) ---------------
  //
  // One immutable, content-addressed JSON file per schema version in
  // the log dir: `_log/schema-<id>.json`, where <id> is the md5 of the
  // canonical field list. Written BEFORE the manifest that references
  // it (the Iceberg metadata-file order): a crash in between leaves an
  // orphan schema file, never a manifest pointing at nothing; two
  // writers racing on the same id write identical bytes, so the lost
  // CAS is benign.

  private def schemaPath(table: String, sid: String): Path =
    new Path(logDir(table), s"schema-$sid.json")

  /** Persist fields as `_log/schema-<sid>.json` (no-op if present).
    * `lastId` is the highest field id EVER assigned in this schema's
    * lineage — it only grows, so a dropped id is never reused and a
    * re-added column of the same name cannot resurrect old bytes. */
  private[sources] def writeSchemaFile(spark: SparkSession, table: String,
      sid: String, fields: Seq[(Int, String, String)],
      lastId: Int): Unit = {
    val f = fs(spark, table)
    f.mkdirs(logDir(table))
    val dst = schemaPath(table, sid)
    if (f.exists(dst)) return
    val body = fields
      .map { case (id, n, t) => "\"" + esc(s"$id:$n:$t") + "\"" }
      .mkString(s"""{"sid":"${esc(sid)}","lastId":"$lastId","fields":[""",
        ",", "]}")
    val tmp = new Path(logDir(table), s".tmp-${UUID.randomUUID()}")
    val out = f.create(tmp, false)
    try out.write(body.getBytes("UTF-8")) finally out.close()
    if (!atomicPublish(f, tmp, dst)) f.delete(tmp, false)
  }

  /** (fields, lastId) of `_log/schema-<sid>.json`. */
  private[sources] def readSchemaFile(spark: SparkSession, table: String,
      sid: String): (Seq[(Int, String, String)], Int) = {
    val f = fs(spark, table)
    val in = f.open(schemaPath(table, sid))
    val body = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
    val fields = arrayField(body, "fields").map(parseStrings)
      .getOrElse(Seq.empty)
      .map { s =>
        val Array(id, n, t) = s.split(":", 3)
        (id.toInt, n, t)
      }
    val lastId = stringField(body, "lastId") match {
      case "" => fields.map(_._1).maxOption.getOrElse(0)
      case v => v.toInt
    }
    (fields, lastId)
  }

  /** The committed version carrying `txn`, newest first, if any. */
  def findTxn(spark: SparkSession, table: String, txn: String): Option[Long] =
    versions(spark, table).reverse
      .find(v => readManifest(spark, table, v).txn == txn)

  /** EXACTLY-ONCE streaming append: the foreachBatch sink body. A
    * batch replayed after a sink failure (same stream, same epoch →
    * same `txn`) finds its id already in the log and returns the
    * existing version without staging twice — the Delta
    * txnAppId/txnVersion idempotence contract on this log. Single
    * committer per txn id by contract (a restarted stream IS that:
    * microbatch epochs never run concurrently for one query). The
    * txn scan walks manifests newest-first and a replayed epoch is
    * near the head, so the common probe is O(1) manifest reads. */
  def transactionalAppend(
      spark: SparkSession, df: DataFrame, table: String, txn: String,
      statsCol: String = ""): Long = {
    require(txn.nonEmpty, "transactionalAppend needs a non-empty txn id")
    findTxn(spark, table, txn).getOrElse {
      val staged = stage(spark, df, table)
      val st = if (statsCol.isEmpty) Map.empty[String, (Long, Long)]
        else statsFor(spark, table, staged, statsCol)
      commit(spark, table, adds = staged, txn = txn, statsCol = statsCol, stats = st)
    }
  }

  /** Transactional full rewrite (compaction / CDC swap): stage the
    * replacement, then ONE commit removes every previously-live file
    * and adds the staged set. Old files stay on disk (old versions
    * remain readable) until [[vacuumUnreferenced]]. */
  def replace(spark: SparkSession, df: DataFrame, table: String): Long = {
    val staged = stage(spark, df, table)
    val live = currentVersion(spark, table)
      .map(v => liveFiles(spark, table, v)).getOrElse(Seq.empty)
    commit(spark, table, adds = staged, removes = live)
  }

  /** Read the table at its current version ([[readVersion]] of head);
    * empty-but-typed is impossible — an uncommitted table is an error
    * surfaced to the caller, not an empty frame. */
  def read(spark: SparkSession, table: String): DataFrame = {
    val v = currentVersion(spark, table).getOrElse(
      throw new IllegalArgumentException(s"no committed version at $table"))
    readVersion(spark, table, v)
  }

  /** Time travel: read exactly `version`'s live set. */
  def readVersion(spark: SparkSession, table: String, version: Long): DataFrame = {
    val files = liveFiles(spark, table, version).map(f => s"${dataRoot(table)}/$f")
    spark.read.parquet(files: _*)
  }

  /** CDC read feed: the rows ADDED between `fromVersion` (exclusive)
    * and `toVersion` (inclusive) — the union of files live at `to` but
    * not at `from`, read directly; a downstream consumer incrementally
    * syncs by remembering the last version it saw, never rescanning
    * the table. File-granular like Delta's change feed without delete
    * vectors: on an APPEND-ONLY table this is exactly the new rows;
    * after a replace/compaction the rewritten files' rows reappear
    * (callers see that as `to`'s manifest listing rewritten files).
    */
  def changesBetween(
      spark: SparkSession, table: String,
      fromVersion: Long, toVersion: Long): DataFrame = {
    require(fromVersion <= toVersion, "fromVersion must be <= toVersion")
    val before = readManifest(spark, table, fromVersion).files.toSet
    val added = readManifest(spark, table, toVersion).files.filterNot(before)
    if (added.nonEmpty) spark.read.parquet(added.map(f => s"${dataRoot(table)}/$f"): _*)
    else readVersion(spark, table, toVersion).limit(0)
  }

  /** Retire history: delete data files referenced by NO manifest among
    * the newest `keepVersions`, then the older manifests themselves.
    * Returns deleted data-file count. Safe order — files first would
    * break a concurrent old-version reader that already resolved its
    * manifest; deleting the manifest first (newest-boundary readers
    * re-resolve) then files matches the vacuum contract of the
    * directory [[Vacuum]]. */
  def vacuumUnreferenced(
      spark: SparkSession, table: String, keepVersions: Int = 1): Int = {
    val f = fs(spark, table)
    val vs = versions(spark, table)
    val (drop, keep) = vs.splitAt(math.max(0, vs.length - keepVersions))
    // Branch safety: data files are SHARED across every ref of this
    // root (zero-copy branching), so liveness is the union over every
    // OTHER ref's full manifest history — a vacuum on main must never
    // delete a file a dev branch still resolves, and vice versa.
    val others = refs(spark, table).filterNot(_ == table)
    val shared = others.flatMap(r =>
      versions(spark, r).flatMap(v => liveFiles(spark, r, v))).toSet
    val keepSet = keep.flatMap(v => liveFiles(spark, table, v)).toSet ++ shared
    val dropSet = drop.flatMap(v => liveFiles(spark, table, v)).toSet -- keepSet
    drop.foreach(v => f.delete(manifestPath(table, v), false))
    dropSet.foreach(rel => f.delete(new Path(dataRoot(table), rel), false))
    // Prune now-empty stage dirs (cosmetic; readers never glob).
    f.listStatus(new Path(dataRoot(table))).foreach { st =>
      if (st.isDirectory && st.getPath.getName.startsWith("stage-") &&
        f.listStatus(st.getPath).isEmpty) f.delete(st.getPath, false)
    }
    dropSet.size
  }

  // ----- branches (git-like refs over the shared data directory) -----

  /** Every ref of `table`'s root: the main ref first, then each
    * `#branch` ref that has a log directory, sorted by name. */
  def refs(spark: SparkSession, table: String): Seq[String] = {
    val root = dataRoot(table)
    val f = fs(spark, table)
    val branches =
      if (!f.exists(new Path(root))) Seq.empty
      else f.listStatus(new Path(root)).toSeq
        .filter(st => st.isDirectory && st.getPath.getName.startsWith("_log@"))
        .map(st => s"$root#${st.getPath.getName.stripPrefix("_log@")}")
        .sorted
    root +: branches
  }

  /** Create branch `branch` at `from`'s current version — a ZERO-COPY
    * fork: the new ref's first manifest lists exactly `from`'s live
    * files (version number preserved, so cross-ref diffs line up).
    * `from` may itself be a branch ref. Fails if the branch exists.
    * Returns the branch ref string to use with every other function
    * here. */
  def createBranch(spark: SparkSession, from: String, branch: String): String = {
    val ref = s"${dataRoot(from)}#$branch"
    val f = fs(spark, from)
    require(versions(spark, ref).isEmpty, s"branch exists: $ref")
    val v = currentVersion(spark, from).getOrElse(
      throw new IllegalArgumentException(s"no committed version at $from"))
    val m = readManifest(spark, from, v)
    f.mkdirs(logDir(ref))
    val tmp = new Path(logDir(ref), s".tmp-${UUID.randomUUID()}")
    val out = f.create(tmp, false)
    try out.write(renderManifest(m).getBytes("UTF-8")) finally out.close()
    if (!atomicPublish(f, tmp, manifestPath(ref, v))) {
      f.delete(tmp, false)
      throw new IllegalStateException(s"branch creation race at $ref")
    }
    ref
  }

  /** Adopt `branch`'s current snapshot as a new commit on `into`
    * (snapshot merge — the branch's live set wins wholesale, the
    * Nessie/Iceberg "commit the branch head" shape; both refs keep
    * their histories). Returns the new version on `into`. */
  def mergeBranch(spark: SparkSession, into: String, branch: String): Long = {
    require(dataRoot(into) == dataRoot(branch),
      s"refs of different tables: $into vs $branch")
    val bv = currentVersion(spark, branch).getOrElse(
      throw new IllegalArgumentException(s"no committed version at $branch"))
    val bLive = liveFiles(spark, branch, bv)
    val iLive = currentVersion(spark, into)
      .map(v => liveFiles(spark, into, v)).getOrElse(Seq.empty)
    commit(spark, into,
      adds = bLive.filterNot(iLive.toSet),
      removes = iLive.filterNot(bLive.toSet))
  }
}
