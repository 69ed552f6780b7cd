package graft.sources

import java.util.UUID

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Atomic table commits over plain parquet — the manifest/commit-log
  * layer that makes the engine's at-rest housekeeping ops
  * (compaction, vacuum, CDC swap, incremental appends) transactional
  * (round-10 directive #6, the mini-Delta shape).
  *
  * Layout (round-13: SHARDED manifests, the Iceberg manifest-list
  * shape — commit cost is O(touched files), not O(table files)):
  * {{{
  * table/
  *   stage-<uuid>/part-*.parquet          data files, written FIRST, invisible
  *   _log/group-<md5>.json                IMMUTABLE file-group manifest:
  *                                        a file list + its per-file stats /
  *                                        schema-id / partition-spec entries,
  *                                        content-addressed (same content =
  *                                        same name), shared across versions
  *                                        and branches BY REFERENCE
  *   _log/00000000000000000001.manifest   one small JSON per version: txn id,
  *                                        sticky stats/schema/spec ids, and
  *                                        the ordered list of group refs
  *   _log/.tmp-<uuid>                     in-flight file (ignored by readers)
  * }}}
  *
  * Protocol — the order IS the correctness argument:
  *  1. Writers land data files under a fresh `stage-<uuid>/` dir. A
  *     file on disk is DEAD until a manifest names it, so arbitrarily
  *     many writers/compactors can stage concurrently, and a crash
  *     mid-stage leaves only unreferenced files (vacuum's problem,
  *     never a reader's).
  *  2. Group files are written BEFORE the list that references them
  *     (the Iceberg metadata-file order): a crash in between leaves an
  *     orphan group, never a list pointing at nothing. They are
  *     content-addressed and immutable, so two writers racing on the
  *     same content write identical bytes — a lost CAS is benign.
  *  3. The commit is ONE atomic rename of the version list: JSON to
  *     `_log/.tmp-*`, then renamed to `_log/<version>.manifest`.
  *     Hadoop `rename` will not clobber an existing destination, so
  *     the rename doubles as compare-and-swap on the version number:
  *     of two racing committers exactly one wins; the loser re-reads
  *     the log and retries against the next version (true on file://
  *     and hdfs://; on S3 this is the documented seam for a commit
  *     coordinator, exactly as in Delta/Iceberg).
  *  4. Readers resolve the HIGHEST complete list and read exactly the
  *     files its groups name — a reader racing a compaction or CDC
  *     swap sees wholly the old version or wholly the new one, never
  *     a mix and never a partial write.
  *
  * Scale shape: an APPEND writes one new group (its own files) plus
  * one tiny list — untouched groups are reused by reference, so a
  * million-file table pays O(batch) serialization per commit, not
  * O(10⁶). A REWRITE rewrites only the groups it touches. Groups are
  * immutable, so the driver caches them across commits and queries;
  * a cold read costs O(groups) small JSON reads once per process.
  * When a table accumulates more than [[MaxGroups]] groups, the next
  * commit folds them into one (amortized-O(1/MaxGroups) manifest
  * compaction, as Iceberg's rewrite-manifests). Old versions stay
  * readable (time travel via `readVersion`) until
  * [[vacuumUnreferenced]] retires them — which also deletes group
  * files no kept version of any ref references.
  */
object CommitLog {

  private val ManifestSuffix = ".manifest"

  /** Fold the group list into one group when a commit would exceed
    * this — bounds a reader's group fan-in at the cost of one
    * amortized metadata rewrite every MaxGroups commits. */
  private val MaxGroups = 64

  /** A table ref is `path` (the main branch) or `path#branch`. The
    * branch shares the main table's DATA directory — every manifest
    * path is relative to the same root, so branching is zero-copy —
    * but resolves and commits through its own `_log@branch` directory.
    * Any function here accepts a ref wherever it takes a table. */
  private[sources] def dataRoot(table: String): String = {
    val i = table.indexOf('#')
    if (i < 0) table else table.substring(0, i)
  }

  /** The ref's data root (the `#branch` suffix stripped) — the path
    * every manifest entry is relative to. Public so planner rules
    * ([[graft.plans.ManifestSkip]]) can map a scan's file paths back
    * to manifest-relative form. */
  def tableRoot(table: String): String = dataRoot(table)

  private def branchOf(table: String): Option[String] = {
    val i = table.indexOf('#')
    if (i < 0) None else Some(table.substring(i + 1))
  }

  private def fs(spark: SparkSession, path: String): FileSystem =
    new Path(dataRoot(path))
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private[sources] def logDir(table: String) = branchOf(table) match {
    case None => new Path(dataRoot(table), "_log")
    case Some(b) =>
      require(b.nonEmpty && b.forall(c => c.isLetterOrDigit || c == '_' ||
        c == '-'), s"branch name must be [A-Za-z0-9_-]+: '$b'")
      new Path(dataRoot(table), s"_log@$b")
  }

  /** This ref's log dir as a root-relative prefix ("_log" or
    * "_log@b") — group refs are stored root-relative so a branch list
    * can reference the parent ref's groups zero-copy. */
  private def logRel(table: String): String = branchOf(table) match {
    case None => "_log"
    case Some(b) => s"_log@$b"
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
    * and the per-file metadata the groups carry —
    *  - `colStats`: per-COLUMN sparse zone maps, integer [min, max]
    *    of each stats column per live file, carried FORWARD across
    *    commits so a reader prunes at the manifest, before any footer
    *    is opened; `statsCol`/`stats` expose the PRIMARY column's view
    *    (what [[replaceWhere]] / [[compactTable]] key on);
    *  - `fileSchemas`: the schema id each data file was WRITTEN under
    *    (field-id evolution, [[SchemaEvolution]]);
    *  - `fileSpecs`: the partition-spec id each file was written
    *    under (partition-spec evolution, [[PartitionSpecs]]);
    *  - `groups`: the raw group refs this version resolves through
    *    (root-relative; empty for a legacy monolithic manifest). */
  final case class Manifest(
      version: Long,
      txn: String,
      statsCol: String,
      files: Seq[String],
      stats: Map[String, (Long, Long)],
      schemaId: String = "",
      fileSchemas: Map[String, String] = Map.empty,
      colStats: Map[String, Map[String, (Long, Long)]] = Map.empty,
      specId: String = "",
      fileSpecs: Map[String, String] = Map.empty,
      groups: Seq[String] = Seq.empty,
      /** Per-column sparse zone maps for STRING-typed columns
        * (lexicographic [min, max] per file — dates-as-strings,
        * categorical codes, URL prefixes): collected by the same
        * single stats pass, probed via [[prunedFilesByString]]. */
      strStats: Map[String, Map[String, (String, String)]] = Map.empty,
      /** Id of the table's CHECK-constraint set (`_log/checks-<id>
        * .json`, [[Constraints]]) — sticky across commits like
        * `schemaId`/`specId`, so constraints time-travel with the
        * version that declared them. Empty = unconstrained. */
      checksId: String = "")

  /** The per-file metadata of one immutable group file. */
  private[sources] final case class GroupData(
      files: Seq[String],
      colStats: Map[String, Map[String, (Long, Long)]],
      fileSchemas: Map[String, String],
      fileSpecs: Map[String, String],
      strStats: Map[String, Map[String, (String, String)]] = Map.empty) {
    def restrictTo(keep: Set[String]): GroupData = GroupData(
      files.filter(keep),
      colStats.map { case (c, m) => c -> m.filter(e => keep(e._1)) }
        .filter(_._2.nonEmpty),
      fileSchemas.filter(e => keep(e._1)),
      fileSpecs.filter(e => keep(e._1)),
      strStats.map { case (c, m) => c -> m.filter(e => keep(e._1)) }
        .filter(_._2.nonEmpty))
  }

  private def mergeGroups(gs: Seq[GroupData]): GroupData = GroupData(
    gs.flatMap(_.files),
    gs.flatMap(_.colStats.keys).distinct.map { c =>
      c -> gs.flatMap(_.colStats.getOrElse(c, Map.empty)).toMap
    }.filter(_._2.nonEmpty).toMap,
    gs.flatMap(_.fileSchemas).toMap,
    gs.flatMap(_.fileSpecs).toMap,
    gs.flatMap(_.strStats.keys).distinct.map { c =>
      c -> gs.flatMap(_.strStats.getOrElse(c, Map.empty)).toMap
    }.filter(_._2.nonEmpty).toMap)

  /** Live file list of `version` (paths relative to the table root). */
  def liveFiles(spark: SparkSession, table: String, version: Long): Seq[String] =
    readManifest(spark, table, version).files

  def readManifest(spark: SparkSession, table: String, version: Long): Manifest = {
    val f = fs(spark, table)
    val body = try readText(f, manifestPath(table, version))
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
    parseManifest(spark, table, body)
  }

  private[sources] def readText(f: FileSystem, p: Path): String = {
    val in = f.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
  }

  private[sources] def esc(s: String): String = s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  // ---- group files (immutable, content-addressed) ------------------

  /** One JSON object per group; file order is canonicalized (and every
    * per-file array aligned to it) so two groups with the same content
    * are byte-identical — which makes the md5 content address stable
    * and racing writers of equal content benign. Stats are SPARSE per
    * column: only files with an entry are serialized, so a stats-less
    * add in a LATER group never erases a carried zone map here. */
  private def renderGroup(g: GroupData): String = {
    val ordered = g.files.sorted
    def arr(xs: Seq[String]) = xs.map(x => "\"" + esc(x) + "\"").mkString(",")
    val sb = new StringBuilder(s"""{"files":[${arr(ordered)}]""")
    val cols = g.colStats.keys.toSeq.sorted
    if (cols.nonEmpty) {
      sb ++= s""","statsCols":[${arr(cols)}]"""
      cols.foreach { c =>
        val m = g.colStats(c)
        val withStats = ordered.filter(m.contains)
        sb ++= s""","stats:${esc(c)}:files":[${arr(withStats)}]"""
        sb ++= s""","stats:${esc(c)}:mins":[${withStats.map(f => m(f)._1).mkString(",")}]"""
        sb ++= s""","stats:${esc(c)}:maxs":[${withStats.map(f => m(f)._2).mkString(",")}]"""
      }
    }
    val sCols = g.strStats.keys.toSeq.sorted
    if (sCols.nonEmpty) {
      sb ++= s""","sstatsCols":[${arr(sCols)}]"""
      sCols.foreach { c =>
        val m = g.strStats(c)
        val withStats = ordered.filter(m.contains)
        sb ++= s""","sstats:${esc(c)}:files":[${arr(withStats)}]"""
        sb ++= s""","sstats:${esc(c)}:mins":[${arr(withStats.map(f => m(f)._1))}]"""
        sb ++= s""","sstats:${esc(c)}:maxs":[${arr(withStats.map(f => m(f)._2))}]"""
      }
    }
    val withSchema = ordered.filter(g.fileSchemas.contains)
    if (withSchema.nonEmpty) {
      sb ++= s""","schemaFiles":[${arr(withSchema)}]"""
      sb ++= s""","fileSchemaIds":[${arr(withSchema.map(g.fileSchemas))}]"""
    }
    val withSpec = ordered.filter(g.fileSpecs.contains)
    if (withSpec.nonEmpty) {
      sb ++= s""","specFiles":[${arr(withSpec)}]"""
      sb ++= s""","fileSpecIds":[${arr(withSpec.map(g.fileSpecs))}]"""
    }
    sb ++= "}"
    sb.toString
  }

  private def parseGroup(body: String): GroupData = {
    val files = arrayField(body, "files").map(parseStrings).getOrElse(Seq.empty)
    val cols = arrayField(body, "statsCols").map(parseStrings).getOrElse(Seq.empty)
    val colStats = cols.map { c =>
      val sf = arrayField(body, s"stats:$c:files").map(parseStrings)
        .getOrElse(Seq.empty)
      val mins = longsField(body, s"stats:$c:mins")
      val maxs = longsField(body, s"stats:$c:maxs")
      c -> (if (mins.size == sf.size && maxs.size == sf.size)
        sf.zip(mins.zip(maxs)).toMap else Map.empty[String, (Long, Long)])
    }.filter(_._2.nonEmpty).toMap
    val sCols = arrayField(body, "sstatsCols").map(parseStrings)
      .getOrElse(Seq.empty)
    val strStats = sCols.map { c =>
      val sf = arrayField(body, s"sstats:$c:files").map(parseStrings)
        .getOrElse(Seq.empty)
      val mins = arrayField(body, s"sstats:$c:mins").map(parseStrings)
        .getOrElse(Seq.empty)
      val maxs = arrayField(body, s"sstats:$c:maxs").map(parseStrings)
        .getOrElse(Seq.empty)
      c -> (if (mins.size == sf.size && maxs.size == sf.size)
        sf.zip(mins.zip(maxs)).toMap else Map.empty[String, (String, String)])
    }.filter(_._2.nonEmpty).toMap
    GroupData(files, colStats,
      zipped(body, "schemaFiles", "fileSchemaIds"),
      zipped(body, "specFiles", "fileSpecIds"), strStats)
  }

  private def zipped(body: String, k1: String, k2: String): Map[String, String] = {
    val a = arrayField(body, k1).map(parseStrings).getOrElse(Seq.empty)
    val b = arrayField(body, k2).map(parseStrings).getOrElse(Seq.empty)
    if (a.size == b.size) a.zip(b).toMap else Map.empty
  }

  /** Groups are immutable → cache entries never invalidate. Keyed by
    * the group file's qualified absolute path. Bounded crudely: the
    * whole map is dropped past 8192 entries (a process touching that
    * many distinct groups is re-reading history; correctness is
    * unaffected). */
  private val groupCache =
    new java.util.concurrent.ConcurrentHashMap[String, GroupData]()

  private def loadGroup(spark: SparkSession, table: String,
      ref: String): GroupData = {
    val f = fs(spark, table)
    val p = f.makeQualified(new Path(dataRoot(table), ref))
    val key = p.toString
    val hit = groupCache.get(key)
    if (hit != null) hit
    else {
      val gd = parseGroup(readText(f, p))
      if (groupCache.size > 8192) groupCache.clear()
      groupCache.put(key, gd)
      gd
    }
  }

  /** Persist `g` as `<logRel>/group-<md5>.json` (no-op when the
    * content address already exists) and return its root-relative
    * ref. Written BEFORE any list that references it. */
  private def writeGroup(spark: SparkSession, table: String,
      g: GroupData): String = {
    val body = renderGroup(g)
    val gid = java.security.MessageDigest.getInstance("MD5")
      .digest(body.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    val rel = s"${logRel(table)}/group-$gid.json"
    val f = fs(spark, table)
    val dst = new Path(dataRoot(table), rel)
    if (!f.exists(dst)) {
      f.mkdirs(logDir(table))
      val tmp = new Path(logDir(table), s".tmp-${UUID.randomUUID()}")
      val out = f.create(tmp, false)
      try out.write(body.getBytes("UTF-8")) finally out.close()
      if (!atomicPublish(f, tmp, dst)) f.delete(tmp, false)
    }
    val key = f.makeQualified(dst).toString
    groupCache.putIfAbsent(key, g.copy(files = g.files.sorted))
    rel
  }

  // ---- version list (the per-version manifest) ----------------------

  /** The tiny per-version JSON: txn + sticky ids + ordered group refs.
    * O(groups) bytes, never O(files). */
  private def renderList(m: Manifest): String = {
    val gs = m.groups.map(g => "\"" + esc(g) + "\"").mkString(",")
    val extra = new StringBuilder
    if (m.statsCol.nonEmpty) extra ++= s""","statsCol":"${esc(m.statsCol)}""""
    if (m.schemaId.nonEmpty) extra ++= s""","schemaId":"${esc(m.schemaId)}""""
    if (m.specId.nonEmpty) extra ++= s""","specId":"${esc(m.specId)}""""
    if (m.checksId.nonEmpty) extra ++= s""","checksId":"${esc(m.checksId)}""""
    s"""{"version":${m.version},"txn":"${esc(m.txn)}"$extra,"groups":[$gs]}"""
  }

  // Minimal JSON field extraction (no JSON lib on the unmanaged
  // classpath contract); the renderers above are the only writers, so
  // the grammar is fixed: string scalars, string arrays, long arrays.

  private[sources] def parseStrings(arr: String): Seq[String] = {
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
    * renderers emit keys in fixed order and paths cannot inject a
    * `","key":[` sequence without its quote being escaped. */
  private[sources] def arrayField(body: String, key: String): Option[String] = {
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

  private def longsField(body: String, key: String): Seq[Long] =
    arrayField(body, key)
      .map(a => if (a.trim.isEmpty) Seq.empty[Long]
                else a.split(',').toSeq.map(_.trim.toLong))
      .getOrElse(Seq.empty)

  private def stringField(body: String, key: String): String = {
    val tag = "\"" + key + "\":\""
    val at = body.indexOf(tag)
    if (at < 0) "" else parseStrings(body.substring(at + tag.length - 1)).headOption.getOrElse("")
  }

  private def parseManifest(spark: SparkSession, table: String,
      body: String): Manifest = {
    val version = {
      val tag = "\"version\":"
      val at = body.indexOf(tag) + tag.length
      body.substring(at, body.indexWhere(c => c == ',' || c == '}', at)).trim.toLong
    }
    val txn = stringField(body, "txn")
    val statsCol = stringField(body, "statsCol")
    arrayField(body, "groups") match {
      case Some(gs) =>
        val refs = parseStrings(gs)
        val g = mergeGroups(refs.map(r => loadGroup(spark, table, r)))
        Manifest(version, txn, statsCol, g.files,
          g.colStats.getOrElse(statsCol, Map.empty),
          stringField(body, "schemaId"), g.fileSchemas, g.colStats,
          stringField(body, "specId"), g.fileSpecs, refs, g.strStats,
          stringField(body, "checksId"))
      case None =>
        // Legacy monolithic manifest (pre-sharding): inline files +
        // single-column stats + schema tags.
        val files = arrayField(body, "files").map(parseStrings).getOrElse(Seq.empty)
        val mins = longsField(body, "mins")
        val maxs = longsField(body, "maxs")
        val statted = arrayField(body, "statsFiles").map(parseStrings)
          .getOrElse(files.sorted)
        val stats =
          if (mins.size == statted.size && maxs.size == statted.size && statted.nonEmpty)
            statted.zip(mins.zip(maxs)).toMap
          else Map.empty[String, (Long, Long)]
        val colStats = if (statsCol.nonEmpty && stats.nonEmpty)
          Map(statsCol -> stats) else Map.empty[String, Map[String, (Long, Long)]]
        Manifest(version, txn, statsCol, files, stats,
          stringField(body, "schemaId"),
          zipped(body, "schemaFiles", "fileSchemaIds"), colStats,
          checksId = stringField(body, "checksId"))
    }
  }

  /** Publish the fully-written `tmp` manifest at `dst` iff `dst` does
    * not exist — the compare-and-swap under every commit. On file://
    * Hadoop's rename bottoms out in POSIX rename(2), which CLOBBERS an
    * existing destination, so we use link(2) instead: hardlink-create
    * fails with EEXIST *atomically* when the destination appears
    * first. Elsewhere (hdfs://) rename is the real no-clobber atomic
    * primitive; object stores without one are the documented commit-
    * coordinator seam (as in Delta/Iceberg on S3). */
  private[sources] def atomicPublish(f: FileSystem, tmp: Path, dst: Path): Boolean =
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
      validateLive: Seq[String] => Unit = _ => (),
      colStats: Map[String, Map[String, (Long, Long)]] = Map.empty,
      specId: String = "",
      fileSpecs: Map[String, String] = Map.empty,
      validateManifest: Option[Manifest] => Unit = _ => (),
      strColStats: Map[String, Map[String, (String, String)]] = Map.empty,
      checksId: String = ""): Long =
    commitInternal(spark, table, adds, removes, txn, statsCol, stats,
      maxAttempts, requireRemovesLive = false, schemaId, fileSchemas,
      validateLive, colStats, specId, fileSpecs, validateManifest,
      strColStats, checksId)

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
      validateLive: Seq[String] => Unit = _ => (),
      colStats: Map[String, Map[String, (Long, Long)]] = Map.empty,
      specId: String = "",
      fileSpecs: Map[String, String] = Map.empty,
      validateManifest: Option[Manifest] => Unit = _ => (),
      strColStats: Map[String, Map[String, (String, String)]] = Map.empty): Long =
    commitInternal(spark, table, adds, removes, txn, statsCol, stats,
      maxAttempts, requireRemovesLive = true, schemaId, fileSchemas,
      validateLive, colStats, specId, fileSpecs, validateManifest,
      strColStats)

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
      validateLive: Seq[String] => Unit = _ => (),
      colStats: Map[String, Map[String, (Long, Long)]] = Map.empty,
      specId: String = "",
      fileSpecs: Map[String, String] = Map.empty,
      // Like validateLive but sees the WHOLE fresh base manifest
      // (None on a fresh table) — what schema/spec evolution uses to
      // conflict when the id it computed against moved underneath it
      // (the read-modify-write hole a list-only validate can't see).
      validateManifest: Option[Manifest] => Unit = _ => (),
      strColStats: Map[String, Map[String, (String, String)]] = Map.empty,
      checksId: String = ""): Long = {
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
      validateManifest(base)
      val next = base.map(_.version).getOrElse(0L) + 1
      val rmSet = removes.toSet
      // Base groups survive by reference unless a remove touches them;
      // a legacy (monolithic) base materializes as one group here.
      val baseGroups: Seq[(String, GroupData)] = base match {
        case None => Seq.empty
        case Some(b) if b.groups.nonEmpty =>
          b.groups.map(r => r -> loadGroup(spark, table, r))
        case Some(b) if b.files.nonEmpty =>
          val g = GroupData(b.files, b.colStats, b.fileSchemas,
            b.fileSpecs, b.strStats)
          Seq(writeGroup(spark, table, g) -> g)
        case _ => Seq.empty
      }
      val survivingLive = live.filterNot(rmSet).toSet
      val survived: Seq[(String, GroupData)] = baseGroups.flatMap {
        case (ref, gd) =>
          if (!gd.files.exists(rmSet)) Some(ref -> gd)
          else {
            val rest = gd.restrictTo(gd.files.filterNot(rmSet).toSet)
            if (rest.files.isEmpty) None
            else Some(writeGroup(spark, table, rest) -> rest)
          }
      }
      // Sticky ids: the stats column, schema id and spec id carry
      // forward from the base unless this commit sets one.
      val col = if (statsCol.nonEmpty) statsCol else base.map(_.statsCol).getOrElse("")
      // The legacy single-map `stats` param attaches to the (possibly
      // sticky) primary stats column.
      val addColStats =
        if (col.nonEmpty && stats.nonEmpty) colStats.updated(col,
          colStats.getOrElse(col, Map.empty) ++ stats)
        else colStats
      val addsNew = adds.distinct.filterNot(survivingLive)
      val addGroup: Seq[(String, GroupData)] =
        if (addsNew.isEmpty) Seq.empty
        else {
          val aset = addsNew.toSet
          val g = GroupData(addsNew,
            addColStats.map { case (c, m) => c -> m.filter(e => aset(e._1)) }
              .filter(_._2.nonEmpty),
            fileSchemas.filter(e => aset(e._1)),
            fileSpecs.filter(e => aset(e._1)),
            strColStats.map { case (c, m) => c -> m.filter(e => aset(e._1)) }
              .filter(_._2.nonEmpty))
          Seq(writeGroup(spark, table, g) -> g)
        }
      val all = survived ++ addGroup
      val groups =
        if (all.size <= MaxGroups) all.map(_._1)
        else Seq(writeGroup(spark, table, mergeGroups(all.map(_._2))))
      val sid = if (schemaId.nonEmpty) schemaId
        else base.map(_.schemaId).getOrElse("")
      val pid = if (specId.nonEmpty) specId
        else base.map(_.specId).getOrElse("")
      val cid = if (checksId == ClearChecksSentinel) ""
        else if (checksId.nonEmpty) checksId
        else base.map(_.checksId).getOrElse("")
      val tmp = new Path(logDir(table), s".tmp-${UUID.randomUUID()}")
      val out = f.create(tmp, false)
      try out.write(renderList(Manifest(next, txn, col, Seq.empty,
        Map.empty, sid, Map.empty, Map.empty, pid, Map.empty, groups,
        checksId = cid))
        .getBytes("UTF-8"))
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
      spark: SparkSession, df: DataFrame, table: String, statsCol: String): Long =
    appendWithStats(spark, df, table, Seq(statsCol))

  /** Reserved pseudo-column carrying per-file ROW COUNTS inside the
    * sparse zone-map family (Delta's `numRecords` in its stats JSON):
    * an entry `__nrows -> file -> (n, n)` rides every existing
    * manifest path — group reuse, restrictTo, merges, branches,
    * compaction folds — with no dedicated machinery. Never a real
    * column name (stats collection refuses it), never probed by
    * pruning (predicates can't name it), exposed via
    * [[fileRowCounts]] / [[tableRowCount]] and consumed by the
    * metadata-only aggregate rule ([[graft.plans.MetadataAgg]]). */
  val RowCountCol = "__nrows"

  /** Reserved pseudo-column prefix for per-file NULL counts of one
    * statted column: `__nnulls:<col> -> file -> (n, n)` rides the
    * numeric family like [[RowCountCol]]. With a row count beside it,
    * `count(col)` becomes metadata-answerable (Σ rows − nulls,
    * [[graft.plans.MetadataAgg]]) and IS NULL / IS NOT NULL prune
    * all-null / no-null files ([[graft.plans.ManifestSkip]]). */
  val NullCountPrefix = "__nnulls:"

  /** Null-count key for a column. */
  def nullCountCol(c: String): String = s"$NullCountPrefix$c"

  /** Reserved STRING-stats pseudo-column prefix carrying a per-file
    * BLOOM SIDECAR reference for one column: `__bloom:<col> -> file ->
    * (ref, ref)` where ref is the root-relative path of an immutable,
    * content-addressed filter file under `_bloom/` ([[BloomStats]]).
    * Rides the manifest exactly as row/null counts do — group reuse,
    * restrictTo, branches, folds — so equality/IN probes can consult
    * the filter where the zone map is wide (hash-ordered layouts). */
  /** Passing this as `checksId` to a commit CLEARS the (otherwise
    * sticky) constraint set — the DROP-last-CONSTRAINT path. A NUL
    * byte keeps it out of any legal user-supplied id. */
  private[sources] val ClearChecksSentinel = "\u0000clear"

  val BloomPrefix = "__bloom:"

  /** Bloom-ref key for a column. */
  def bloomCol(c: String): String = s"$BloomPrefix$c"

  /** The REAL statted columns of a manifest — every zone-map key
    * minus the reserved `__`-prefixed pseudo-columns. What
    * maintenance rewrites (compaction, replaceWhere) re-collect stats
    * for; the stats pass regenerates the pseudo-columns itself. */
  private[sources] def statColsOf(m: Manifest): Seq[String] =
    (m.colStats.keys ++ m.strStats.keys).toSeq.distinct
      .filterNot(_.startsWith("__")).sorted

  /** Per-file row counts recorded at `version` (head by default) —
    * SPARSE: only files written through a stats-collecting path have
    * an entry. */
  def fileRowCounts(spark: SparkSession, table: String,
      version: Long = -1L): Map[String, Long] = {
    val v = if (version >= 0) version
      else currentVersion(spark, table).getOrElse(
        throw new IllegalArgumentException(s"no committed version at $table"))
    readManifest(spark, table, v).colStats
      .getOrElse(RowCountCol, Map.empty).map { case (f, (n, _)) => f -> n }
  }

  /** Exact row count of the table at head answered from METADATA
    * alone — Some(Σ per-file counts) when every live file carries
    * one, None otherwise (a plain `append` doesn't collect stats, so
    * a mixed table refuses rather than undercounts). */
  def tableRowCount(spark: SparkSession, table: String): Option[Long] = {
    val v = currentVersion(spark, table).getOrElse(
      throw new IllegalArgumentException(s"no committed version at $table"))
    val m = readManifest(spark, table, v)
    val rc = m.colStats.getOrElse(RowCountCol, Map.empty)
    if (m.files.forall(rc.contains)) Some(m.files.map(f => rc(f)._1).sum)
    else None
  }

  /** Multi-column [[appendWithStats]]: ONE pass over the staged batch
    * collects [min, max] for EVERY listed column per file (Delta
    * collects its first-32-columns stats the same way), so a reader
    * can prune on any of them via [[prunedFilesBy]]. The FIRST column
    * is the table's primary stats column (what [[replaceWhere]] and
    * [[compactTable]] key on). */
  def appendWithStats(
      spark: SparkSession, df: DataFrame, table: String,
      statsCols: Seq[String]): Long = {
    require(statsCols.nonEmpty, "at least one stats column")
    val staged = stage(spark, df, table)
    val (nums, strs) = fullStatsFor(spark, table, staged, statsCols)
    commit(spark, table, adds = staged, statsCol = statsCols.head,
      colStats = nums, strColStats = strs)
  }

  /** [min, max] of each of `statsCols` per staged file, in one scan of
    * just those files — TYPE-AWARE: string columns get lexicographic
    * string zone maps, everything else integer ones (the Delta
    * any-column stats shape). (file, column) cells with no non-null
    * values get no entry (readers keep them conservatively). */
  private def fullStatsFor(
      spark: SparkSession, table: String, staged: Seq[String],
      statsCols: Seq[String])
      : (Map[String, Map[String, (Long, Long)]],
         Map[String, Map[String, (String, String)]]) = {
    val p = stagedPass(spark, table, staged, statsCols)
    (p.nums, p.strs)
  }

  /** Result of ONE fused scan of a staged batch: the zone-map stats
    * family ([[fullStatsFor]] shape, bloom sidecar refs already merged
    * into `strs`) plus per-CHECK violating-row counts. */
  private[sources] final case class StagedPassResult(
      nums: Map[String, Map[String, (Long, Long)]],
      strs: Map[String, Map[String, (String, String)]],
      violations: Seq[(String, Long)]) {
    def badChecks: Seq[(String, Long)] = violations.filter(_._2 > 0)
  }

  /** EVERYTHING a commit verb needs from its staged batch, in ONE
    * grouped aggregation over the staged files (optimization r16,
    * guide §1.2 "remove unnecessary passes"): the type-aware zone-map
    * stats of [[fullStatsFor]], per-file bloom sidecars for
    * `bloomCols` ([[BloomStats]]' aggregate, previously a second full
    * scan), and per-CHECK violation counts ([[Constraints]]' audit,
    * previously a third). Per DML/merge/maintenance statement this
    * replaces up to three jobs reading every staged byte with one —
    * at 100 TB, one pass over the written bytes instead of three.
    *
    * Contract parity with the unfused paths it replaces:
    *  - bloom columns absent from the staged schema are skipped (an
    *    absent bloom cell answers "possible" — restatBlooms' rule);
    *  - sidecars are only PERSISTED when the audit is clean, so a
    *    rejected batch leaves no sidecar orphans (the audit used to
    *    throw before the bloom pass ran);
    *  - with `statsCols` empty no row-count pseudo-column is recorded
    *    (a stats-less write verb must not start minting counts);
    *  - violation semantics are SQL CHECK's: FALSE violates, NULL
    *    passes (identical expression to Constraints.violationCounts).
    */
  private[sources] def stagedPass(
      spark: SparkSession, table: String, staged: Seq[String],
      statsCols: Seq[String],
      bloomCols: Seq[String] = Seq.empty,
      checks: Seq[Constraints.Check] = Seq.empty,
      bloomItems: Long = 1000000L,
      bloomFpp: Double = 0.03): StagedPassResult = {
    import org.apache.spark.sql.functions.{col, count, expr, input_file_name, lit, max, min, sum, when}
    require(statsCols.forall(!_.startsWith("__")),
      "the __ stats-column namespace is reserved (row/null-count " +
        "pseudo-columns)")
    if (staged.isEmpty)
      StagedPassResult(Map.empty, Map.empty, checks.map(_.name -> 0L))
    else {
      // Key on the path from its LAST stage-* segment down — unique
      // within a commit (each stage dir is a fresh uuid) and stable
      // across the partitioned layout's bk=<v> subdirs, where bare
      // file names can repeat between sibling dirs. lastIndexOf, not
      // indexOf: an ancestor directory containing "stage-" must not
      // shift the key off the staged-relative form. ADOPTED files
      // (r16 — [[adoptParquet]] lists in place, no stage dir) resolve
      // by basename, falling to a path-suffix match only when two
      // rels share one; paths come back URI-encoded from
      // input_file_name, so both sides compare decoded.
      def stageKey(p: String): Option[String] = {
        val i = p.lastIndexOf("stage-")
        if (i >= 0) Some(p.substring(i)) else None
      }
      val byStage: Map[String, String] =
        staged.flatMap(r => stageKey(r).map(_ -> r)).toMap
      val byBase: Map[String, Seq[String]] =
        staged.filter(r => stageKey(r).isEmpty)
          .groupBy(r => r.substring(r.lastIndexOf('/') + 1))
      def relFor(raw: String): Option[String] = {
        // URI percent-decoding ONLY — URLDecoder would turn a literal
        // '+' in a path into a space and silently drop that file's
        // stats
        val p = try new java.net.URI(raw).getPath catch {
          case _: java.net.URISyntaxException => raw
        }
        stageKey(p).flatMap(byStage.get).orElse {
          byBase.get(p.substring(p.lastIndexOf('/') + 1)).flatMap {
            case Seq(one) => Some(one)
            case many =>
              // LONGEST matching suffix: `sub/part-0.parquet` must
              // not resolve to a sibling `part-0.parquet` that also
              // suffix-matches
              many.filter(r => p.endsWith("/" + r))
                .sortBy(-_.length).headOption
          }
        }
      }
      val df = spark.read.parquet(staged.map(rel => s"${dataRoot(table)}/$rel"): _*)
      // bloom columns the staged schema actually carries (absent ones
      // are skipped — an absent bloom cell answers "possible")
      val bCols = bloomCols.filter(df.columns.contains)
      val isStr = statsCols.map(c => c ->
        (df.schema(c).dataType == org.apache.spark.sql.types.StringType)).toMap
      val aggs = statsCols.zipWithIndex.flatMap { case (c, i) =>
        // Temporal columns join the NUMERIC zone-map family in their
        // Catalyst physical unit — days (date) / micros (timestamp) —
        // which is exactly what a folded date/timestamp literal
        // carries, so readers and the ManifestSkip rule compare
        // without any timezone arithmetic.
        val probe = df.schema(c).dataType match {
          case org.apache.spark.sql.types.StringType => col(c)
          case org.apache.spark.sql.types.DateType =>
            org.apache.spark.sql.functions.unix_date(col(c)).cast("long")
          case org.apache.spark.sql.types.TimestampType =>
            org.apache.spark.sql.functions.unix_micros(col(c)).cast("long")
          case _ => col(c).cast("long")
        }
        Seq(min(probe).as(s"mn$i"), max(probe).as(s"mx$i"),
          // per-file null count of the statted column, same pass
          sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nl$i"))
      } :+ count(lit(1)).as("__cnt") // per-file row count, same pass
      // bloom filters and CHECK-violation counts ride the SAME grouped
      // aggregate — the whole point of the fused pass
      val bloomAggs = bCols.map(c => BloomStats.bloomAgg(c, bloomItems,
        bloomFpp).as(s"__b_$c"))
      val checkAggs = checks.map(c =>
        sum(when(expr(c.expr) === false, 1L).otherwise(0L))
          .as(s"__v_${c.name}"))
      val allAggs = aggs ++ bloomAggs ++ checkAggs
      val rows = df
        .groupBy(input_file_name().as("__f"))
        .agg(allAggs.head, allAggs.tail: _*)
        .collect() // bounded: one row per staged file, never corpus rows
      def cells[T](c: String, i: Int, get: (org.apache.spark.sql.Row, Int) => T)
          : Map[String, (T, T)] =
        rows.flatMap { r =>
          val mnAt = 1 + 3 * i
          if (r.isNullAt(mnAt)) None
          else relFor(r.getString(0))
            .map(rel => rel -> (get(r, mnAt), get(r, mnAt + 1)))
        }.toMap
      // Null counts are recorded for EVERY file — including all-null
      // ones, whose zone-map cell is absent by design.
      def nullCells(i: Int): Map[String, (Long, Long)] =
        rows.flatMap { r =>
          val at = 3 + 3 * i
          relFor(r.getString(0))
            .map(rel => rel -> (r.getLong(at), r.getLong(at)))
        }.toMap
      val nums = statsCols.zipWithIndex.collect { case (c, i) if !isStr(c) =>
        c -> cells[Long](c, i, (r, at) => r.getLong(at))
      }.filter(_._2.nonEmpty).toMap
      val nulls = statsCols.zipWithIndex.map { case (c, i) =>
        nullCountCol(c) -> nullCells(i)
      }.filter(_._2.nonEmpty).toMap
      val strs = statsCols.zipWithIndex.collect { case (c, i) if isStr(c) =>
        c -> cells[String](c, i, (r, at) => r.getString(at))
      }.filter(_._2.nonEmpty).toMap
      // Row counts ride the numeric family as (n, n) under the
      // reserved pseudo-column — every file gets one (count never
      // nulls out), so a stats-collecting write is always countable.
      // Only when the verb collects stats at all: a stats-less write
      // path must not start minting counts (manifest-content parity
      // with the unfused passes).
      val cntAt = 1 + 3 * statsCols.size
      val counts = rows.flatMap { r =>
        relFor(r.getString(0))
          .map(rel => rel -> (r.getLong(cntAt), r.getLong(cntAt)))
      }.toMap
      val numsOut =
        if (statsCols.isEmpty) nums ++ nulls
        else nums ++ nulls + (RowCountCol -> counts)
      // per-CHECK violation totals (sum of the per-file sums)
      val checkBase = cntAt + 1 + bCols.size
      val violations = checks.zipWithIndex.map { case (c, i) =>
        c.name -> rows.map { r =>
          if (r.isNullAt(checkBase + i)) 0L else r.getLong(checkBase + i)
        }.sum
      }
      // sidecars persist only for a CLEAN batch — a rejected batch's
      // staged files stay dead on disk with no sidecar orphans
      val bloomRefs =
        if (bCols.isEmpty || violations.exists(_._2 > 0)) Map.empty
        else {
          val root = dataRoot(table)
          val fsys = new Path(root).getFileSystem(
            spark.sparkContext.hadoopConfiguration)
          bCols.zipWithIndex.map { case (c, j) =>
            val cells = rows.flatMap { r =>
              val at = cntAt + 1 + j
              val bytes = if (r.isNullAt(at)) null
                else r.getAs[Array[Byte]](at)
              if (bytes == null) None // an all-null file: no filter
              else relFor(r.getString(0)).map { rel =>
                val ref = BloomStats.persistSidecar(fsys, root, bytes)
                rel -> (ref, ref)
              }
            }.toMap
            bloomCol(c) -> cells
          }.filter(_._2.nonEmpty).toMap
        }
      StagedPassResult(numsOut, strs ++ bloomRefs, violations)
    }
  }

  /** [[fullStatsFor]] for sibling write verbs in this package
    * ([[Constraints.checkedAppend]]). */
  private[sources] def statsPassFor(
      spark: SparkSession, table: String, staged: Seq[String],
      statsCols: Seq[String])
      : (Map[String, Map[String, (Long, Long)]],
         Map[String, Map[String, (String, String)]]) =
    fullStatsFor(spark, table, staged, statsCols)

  /** Integer-column view of [[fullStatsFor]] (legacy single-map call
    * sites). */
  private def statsFor(
      spark: SparkSession, table: String, staged: Seq[String],
      statsCols: Seq[String]): Map[String, Map[String, (Long, Long)]] =
    fullStatsFor(spark, table, staged, statsCols)._1

  /** Publish `df` as a RANGE-CLUSTERED table in ONE shuffle: hive-
    * partition the stage by `bucketCol` (year, month, hash bucket — a
    * bounded vocabulary), record each file's exact [min, max] of the
    * stats column(s), and swap the previous live set in one commit.
    * The layout [[readPruned]] and [[replaceWhere]] are built for; the
    * bucket column itself lives only in the directory names, so
    * readers see the data columns unchanged. One write job + one
    * stats scan of the staged batch, regardless of bucket count.
    */
  def replaceClustered(
      spark: SparkSession,
      df: DataFrame,
      table: String,
      bucketCol: String,
      statsCol: String): Long =
    replaceClustered(spark, df, table, bucketCol, Seq(statsCol))

  /** Multi-stats [[replaceClustered]]: the first column is primary. */
  def replaceClustered(
      spark: SparkSession,
      df: DataFrame,
      table: String,
      bucketCol: String,
      statsCols: Seq[String]): Long = {
    import org.apache.spark.sql.functions.col
    require(statsCols.nonEmpty, "at least one stats column")
    val staged = stage(spark, df.repartition(col(bucketCol)), table, Seq(bucketCol))
    val prevV = currentVersion(spark, table)
    val prev = prevV.map(v => liveFiles(spark, table, v)).getOrElse(Seq.empty)
    // bloom-carrying tables keep their sidecars through the swap
    // (zone maps + blooms in ONE staged scan — r16 fusion), and the
    // data-REPLACING commit takes the rewrite path (a concurrently
    // removed file aborts rather than silently duplicating)
    val bloomCols = prevV
      .map(v => BloomStats.bloomColsOf(readManifest(spark, table, v)))
      .getOrElse(Seq.empty)
    val p = stagedPass(spark, table, staged, statsCols,
      bloomCols = bloomCols)
    rewrite(spark, table, adds = staged, removes = prev,
      statsCol = statsCols.head, colStats = p.nums,
      strColStats = p.strs)
  }

  /** The head manifest's live files whose recorded [min, max] range on
    * the PRIMARY stats column intersects [lo, hi] — files without
    * stats are kept (pruning must never lose rows). Returns
    * (liveTotal, selected). */
  def prunedFiles(
      spark: SparkSession, table: String, lo: Long, hi: Long): (Int, Seq[String]) =
    prunedFilesBy(spark, table, "", lo, hi)

  /** [[prunedFiles]] on ANY stats-carrying column ("" = the primary) —
    * the multi-column zone maps mean one table layout serves
    * predicates on every statted column, not just the cluster key. */
  def prunedFilesBy(
      spark: SparkSession, table: String, column: String,
      lo: Long, hi: Long): (Int, Seq[String]) = {
    val v = currentVersion(spark, table).getOrElse(
      throw new IllegalArgumentException(s"no committed version at $table"))
    val m = readManifest(spark, table, v)
    val c = if (column.nonEmpty) column else m.statsCol
    val st = m.colStats.getOrElse(c, Map.empty)
    val sel = m.files.filter(f => st.get(f) match {
      case Some((mn, mx)) => mx >= lo && mn <= hi
      case None => true
    })
    (m.files.size, sel)
  }

  /** Read only the manifest-pruned files for a [lo, hi] range on the
    * primary stats column. File granularity: callers still apply the
    * residual row predicate. An all-pruned range yields an empty frame
    * with the table's schema (resolved from one live file). */
  def readPruned(
      spark: SparkSession, table: String, lo: Long, hi: Long): DataFrame =
    readPrunedBy(spark, table, "", lo, hi)

  /** [[readPruned]] on any stats-carrying column ("" = primary). */
  def readPrunedBy(
      spark: SparkSession, table: String, column: String,
      lo: Long, hi: Long): DataFrame = {
    val (_, sel) = prunedFilesBy(spark, table, column, lo, hi)
    if (sel.nonEmpty) spark.read.parquet(sel.map(f => s"${dataRoot(table)}/$f"): _*)
    else read(spark, table).limit(0)
  }

  /** [[prunedFilesBy]] on a STRING-statted column: live files whose
    * lexicographic [min, max] intersects [lo, hi] — date strings,
    * categorical codes, URL prefixes. Files without stats are kept. */
  def prunedFilesByString(
      spark: SparkSession, table: String, column: String,
      lo: String, hi: String): (Int, Seq[String]) = {
    val v = currentVersion(spark, table).getOrElse(
      throw new IllegalArgumentException(s"no committed version at $table"))
    val m = readManifest(spark, table, v)
    val st = m.strStats.getOrElse(column, Map.empty)
    // UTF-8 binary order — the order Spark min/max collected the
    // extrema in (and the order the caller's residual filter compares
    // in); Java String comparison would disagree for supplementary-
    // plane values and could prune a matching file (ADVICE r13).
    import graft.util.Utf8Order
    val sel = m.files.filter(f => st.get(f) match {
      case Some((mn, mx)) => Utf8Order.ge(mx, lo) && Utf8Order.le(mn, hi)
      case None => true
    })
    (m.files.size, sel)
  }

  /** [[readPruned]] for a string-statted column (file granularity;
    * callers apply the residual row predicate). */
  def readPrunedByString(
      spark: SparkSession, table: String, column: String,
      lo: String, hi: String): DataFrame = {
    val (_, sel) = prunedFilesByString(spark, table, column, lo, hi)
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
        val st = if (statsCol.isEmpty) Map.empty[String, Map[String, (Long, Long)]]
          else statsFor(spark, table, staged, Seq(statsCol))
        Right(commit(spark, table, adds = staged, txn = txn,
          statsCol = statsCol, colStats = st))
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
    // size the rewrite from the manifest's per-file row counts when
    // they cover the live set — at scale that's the difference
    // between planning from a byte-sized JSON and a full count scan
    val n = tableRowCount(spark, table).getOrElse(df.count())
    val nFiles = math.max(1L, math.ceil(n.toDouble / targetRecordsPerFile).toLong).toInt
    val shaped =
      if (m.statsCol.nonEmpty) df.repartitionByRange(nFiles, col(m.statsCol))
      else df.repartition(nFiles)
    val staged = stage(spark, shaped, table)
    val allCols = statColsOf(m)
    val wantCols =
      if (allCols.nonEmpty) allCols
      else if (m.statsCol.nonEmpty) Seq(m.statsCol)
      else Seq.empty
    // compaction keeps the bloom sidecars alive for the compacted
    // files (VERDICT r14 #3 — OPTIMIZE must not shed point skipping);
    // zone maps + blooms ride ONE staged scan (r16 fusion); the
    // data-REPLACING commit takes the rewrite path so a
    // concurrently-removed file aborts instead of re-adding its rows
    val bloomCols = BloomStats.bloomColsOf(m)
    val p =
      if (wantCols.isEmpty && bloomCols.isEmpty)
        StagedPassResult(Map.empty, Map.empty, Seq.empty)
      else stagedPass(spark, table, staged, wantCols,
        bloomCols = bloomCols)
    rewrite(spark, table, adds = staged, removes = m.files,
      statsCol = m.statsCol, colStats = p.nums, strColStats = p.strs)
  }

  /** Transactional MULTI-DIMENSIONAL re-clustering (Delta's `OPTIMIZE
    * … ZORDER BY`): rewrite the live set ordered by the interleaved
    * z-value of `dims` ([[ZOrder.zvalue]] — integral/date columns)
    * into ~`targetRecordsPerFile`-row files and swap them in ONE
    * rewrite commit. Each file then covers a tight hyper-box in EVERY
    * dim, so single-dim and conjunctive probes on any of them prune
    * at the manifest — the multi-column zone maps are re-collected on
    * the union of the manifest's stat columns and `dims`, and bloom
    * sidecars survive the swap (the compactTable discipline). */
  def zorderTable(
      spark: SparkSession, table: String, dims: Seq[String],
      bits: Int = 8, targetRecordsPerFile: Long = 1000000L): Long = {
    import org.apache.spark.sql.functions.col
    require(dims.size >= 2, "ZORDER BY needs at least two columns " +
      "(one column is plain range clustering — use compactTable)")
    require(targetRecordsPerFile > 0, "target must be positive")
    val v = currentVersion(spark, table).getOrElse(
      throw new IllegalArgumentException(s"no committed version at $table"))
    val m = readManifest(spark, table, v)
    val df = readVersion(spark, table, v)
    dims.foreach(d => require(df.columns.contains(d),
      s"ZORDER BY column '$d' is not in the table"))
    // manifest row counts size the rewrite without a count scan
    val n = tableRowCount(spark, table).getOrElse(df.count())
    val nFiles = math.max(1L,
      math.ceil(n.toDouble / targetRecordsPerFile).toLong).toInt
    // bucket ranges from the manifest's zone maps when they cover
    // every dim over the whole live set — else one aggregation scan.
    // INTEGRAL dims only: temporal zone maps are stored in Catalyst
    // physical units (days/micros) while the z probe casts raw values
    // to long (seconds for timestamps) — mixing the two would feed
    // wrong bounds, so date/timestamp dims take the scan path whose
    // bounds and probe agree by construction.
    val zcol = {
      import org.apache.spark.sql.types._
      val integral = Set[DataType](ByteType, ShortType, IntegerType,
        LongType)
      val bounds = dims.map { d =>
        val st = m.colStats.getOrElse(d, Map.empty)
        if (integral.contains(df.schema(d).dataType) &&
          m.files.nonEmpty && m.files.forall(st.contains))
          Some((st.values.map(_._1).min, st.values.map(_._2).max))
        else None
      }
      if (bounds.forall(_.isDefined))
        ZOrder.zvalueWithBounds(dims, bits, bounds.map(_.get))
      else ZOrder.zvalue(df, dims, bits)
    }
    val shaped = df.withColumn("__z", zcol)
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
    val staged = stage(spark, shaped, table)
    val statCols = (statColsOf(m) ++ dims).distinct
    // zone maps on every dim + bloom survival in ONE staged scan
    val p = stagedPass(spark, table, staged, statCols,
      bloomCols = BloomStats.bloomColsOf(m))
    rewrite(spark, table, adds = staged, removes = m.files,
      statsCol = if (m.statsCol.nonEmpty) m.statsCol else dims.head,
      colStats = p.nums, strColStats = p.strs)
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
    // stats + bloom survival (the r14 #3 rule: every mutation verb)
    // in ONE staged scan; a data-REPLACING commit takes the rewrite
    // path so a concurrently-removed file aborts instead of silently
    // duplicating its replacement
    val p = stagedPass(spark, table, staged, Seq(m.statsCol),
      bloomCols = BloomStats.bloomColsOf(m))
    p.nums.getOrElse(m.statsCol, Map.empty).values.foreach { case (mn, mx) =>
      require(mn >= lo && mx <= hi,
        s"replacement rows [$mn, $mx] escape the replaced range [$lo, $hi]")
    }
    rewrite(spark, table, adds = staged, removes = contained.map(_._1),
      statsCol = m.statsCol, colStats = p.nums, strColStats = p.strs)
  }

  /** [[replaceWhere]] keyed by a STRING-statted column — the natural
    * form of the monthly-restatement primitive when the partition key
    * is a date string ("2024-02" ≤ ym ≤ "2024-02"): same loud rules
    * (straddling or stats-less files refuse; the replacement batch
    * must sit inside the range), same single-commit swap. */
  def replaceWhereString(
      spark: SparkSession,
      df: DataFrame,
      table: String,
      column: String,
      lo: String,
      hi: String): Long = {
    val v = currentVersion(spark, table).getOrElse(
      throw new IllegalArgumentException(s"no committed version at $table"))
    val m = readManifest(spark, table, v)
    val st = m.strStats.getOrElse(column, Map.empty)
    require(st.nonEmpty,
      s"replaceWhereString needs string stats on '$column' at $table")
    import graft.util.Utf8Order
    val (contained, overlapping) = m.files
      .map(f => f -> st.getOrElse(f,
        throw new IllegalStateException(s"file without stats: $f")))
      .filter { case (_, (mn, mx)) =>
        Utf8Order.ge(mx, lo) && Utf8Order.le(mn, hi) }
      .partition { case (_, (mn, mx)) =>
        Utf8Order.ge(mn, lo) && Utf8Order.le(mx, hi) }
    if (overlapping.nonEmpty)
      throw new IllegalStateException(
        s"files straddle [$lo, $hi] — rewrite them first: ${overlapping.map(_._1)}")
    val staged = stage(spark, df, table)
    // stats + bloom survival in ONE staged scan (r16 fusion)
    val p = stagedPass(spark, table, staged,
      (statColsOf(m) match {
        case s if s.nonEmpty => s
        case _ => Seq(column)
      }), bloomCols = BloomStats.bloomColsOf(m))
    p.strs.getOrElse(column, Map.empty).values.foreach { case (mn, mx) =>
      require(Utf8Order.ge(mn, lo) && Utf8Order.le(mx, hi),
        s"replacement rows [$mn, $mx] escape the replaced range [$lo, $hi]")
    }
    rewrite(spark, table, adds = staged, removes = contained.map(_._1),
      statsCol = m.statsCol, colStats = p.nums, strColStats = p.strs)
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

  /** Read a metadata file from the ref's own log dir, falling back to
    * the MAIN ref's — a branch forked from an evolved table references
    * schema/spec ids whose files live in the parent's `_log` (zero-copy
    * fork); [[mergeBranch]] copies the branch's own ids the other way. */
  private def readMetaWithFallback(spark: SparkSession, table: String,
      path: String => Path): String = {
    val f = fs(spark, table)
    try readText(f, path(table))
    catch {
      case e: java.io.FileNotFoundException =>
        if (branchOf(table).isEmpty) throw e
        else readText(f, path(dataRoot(table)))
    }
  }

  /** (fields, lastId) of `_log/schema-<sid>.json`. */
  private[sources] def readSchemaFile(spark: SparkSession, table: String,
      sid: String): (Seq[(Int, String, String)], Int) = {
    val body = readMetaWithFallback(spark, table, t => schemaPath(t, sid))
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

  // ---- Partition-spec files ([[PartitionSpecs]]'s storage) --------
  //
  // Same discipline as schema files: one immutable, content-addressed
  // `_log/spec-<id>.json` per partition spec, written before any list
  // that references it. A spec is (source column, date_format
  // granularity) — enough for the hive-style `__part=<value>` layout
  // [[stage]]'s partitionBy writes.

  private def specPath(table: String, pid: String): Path =
    new Path(logDir(table), s"spec-$pid.json")

  private[sources] def writeSpecFile(spark: SparkSession, table: String,
      pid: String, column: String, fmt: String): Unit = {
    val f = fs(spark, table)
    f.mkdirs(logDir(table))
    val dst = specPath(table, pid)
    if (f.exists(dst)) return
    val body = s"""{"pid":"${esc(pid)}","col":"${esc(column)}","fmt":"${esc(fmt)}"}"""
    val tmp = new Path(logDir(table), s".tmp-${UUID.randomUUID()}")
    val out = f.create(tmp, false)
    try out.write(body.getBytes("UTF-8")) finally out.close()
    if (!atomicPublish(f, tmp, dst)) f.delete(tmp, false)
  }

  // ---- Check-constraint files ([[Constraints]]'s storage) ---------
  //
  // Same discipline again: one immutable, content-addressed
  // `_log/checks-<id>.json` per constraint SET, written before any
  // manifest that references it. A check is (name, boolean SQL
  // expression); ' ' joins the pair since ':' may appear in
  // expressions.

  private def checksPath(table: String, cid: String): Path =
    new Path(logDir(table), s"checks-$cid.json")

  private[sources] def writeChecksFile(spark: SparkSession, table: String,
      cid: String, checks: Seq[(String, String)]): Unit = {
    val f = fs(spark, table)
    f.mkdirs(logDir(table))
    val dst = checksPath(table, cid)
    if (f.exists(dst)) return
    val arr = checks.map { case (n, e) => "\"" + esc(s"$n $e") + "\"" }
      .mkString(",")
    val body = s"""{"cid":"${esc(cid)}","checks":[$arr]}"""
    val tmp = new Path(logDir(table), s".tmp-${UUID.randomUUID()}")
    val out = f.create(tmp, false)
    try out.write(body.getBytes("UTF-8")) finally out.close()
    if (!atomicPublish(f, tmp, dst)) f.delete(tmp, false)
  }

  /** (name, expression) pairs of `_log/checks-<cid>.json`. */
  private[sources] def readChecksFile(spark: SparkSession, table: String,
      cid: String): Seq[(String, String)] = {
    val body = readMetaWithFallback(spark, table, t => checksPath(t, cid))
    arrayField(body, "checks").map(parseStrings).getOrElse(Seq.empty)
      .map { s =>
        // names are validated space-free at declaration
        // (Constraints.setChecks) — a malformed record is loud, never
        // a silently shifted expression (ADVICE r13)
        val i = s.indexOf(' ')
        require(i > 0, s"malformed check record (no name/expr " +
          s"separator): '$s'")
        (s.substring(0, i), s.substring(i + 1))
      }
  }

  /** (column, fmt) of `_log/spec-<pid>.json`. */
  private[sources] def readSpecFile(spark: SparkSession, table: String,
      pid: String): (String, String) = {
    val body = readMetaWithFallback(spark, table, t => specPath(t, pid))
    (stringField(body, "col"), stringField(body, "fmt"))
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
      val st = if (statsCol.isEmpty) Map.empty[String, Map[String, (Long, Long)]]
        else statsFor(spark, table, staged, Seq(statsCol))
      commit(spark, table, adds = staged, txn = txn, statsCol = statsCol,
        colStats = st)
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

  /** The newest version whose manifest was PUBLISHED at or before
    * `tsMillis` — the `TIMESTAMP AS OF` resolution rule (Delta's):
    * publication time is the atomic rename's file mtime, which is the
    * moment the version became visible to any reader. None when the
    * table has no version that old. Monotonicity caveat, stated:
    * mtimes come from the storage system's clock; a version receives
    * its timestamp once, at publish, so the mapping is stable even if
    * wall clocks later drift. */
  def versionAsOf(spark: SparkSession, table: String,
      tsMillis: Long): Option[Long] = {
    val f = fs(spark, table)
    versions(spark, table).reverseIterator.find { v =>
      f.getFileStatus(manifestPath(table, v)).getModificationTime <= tsMillis
    }
  }

  /** Time travel by TIMESTAMP: read the table as it was at
    * `tsMillis`. An instant before the first commit is an error
    * (there was no table to read), not an empty frame. */
  def readAsOf(spark: SparkSession, table: String, tsMillis: Long): DataFrame =
    versionAsOf(spark, table, tsMillis) match {
      case Some(v) => readVersion(spark, table, v)
      case None => throw new IllegalArgumentException(
        s"no version of $table existed at $tsMillis")
    }

  /** RESTORE: roll the table back to `toVersion` as a NEW commit
    * (history-preserving — the bad versions stay readable until
    * vacuum; Delta's RESTORE semantics). Zero data movement: the
    * target's files are re-listed by reference, its per-file stats /
    * schema tags / spec tags re-attached (a restore must not erase
    * zone maps), and its schema/spec/checks ids restored explicitly —
    * rolling back data while keeping a later schema id would resurrect
    * bytes under the wrong projection. Refuses when any target file
    * was already vacuumed (the restore would publish dead references).
    * Returns the new head version. */
  def restore(spark: SparkSession, table: String, toVersion: Long): Long = {
    val target = readManifest(spark, table, toVersion)
    val f = fs(spark, table)
    val head = currentVersion(spark, table).getOrElse(
      throw new IllegalArgumentException(s"no committed version at $table"))
    val hm = readManifest(spark, table, head)
    // Only files NOT live at head can have been vacuumed — checking
    // just those keeps the existence probe O(changed files).
    val headLive = hm.files.toSet
    val gone = target.files.filterNot(headLive)
      .filterNot(rel => f.exists(new Path(dataRoot(table), rel)))
    if (gone.nonEmpty) throw new IllegalStateException(
      s"cannot restore $table to $toVersion: ${gone.size} file(s) were " +
        s"vacuumed (first: ${gone.head})")
    // Sticky ids cannot be CLEARED by a commit, so restoring to a
    // version from before a schema/spec/checks declaration would keep
    // the later id over the older data — the null-fork/ghost-check
    // footgun. Refuse; re-declare after the restore if that is meant.
    Seq(("schemaId", target.schemaId, hm.schemaId),
      ("specId", target.specId, hm.specId),
      ("checksId", target.checksId, hm.checksId)).foreach {
      case (what, tgt, cur) =>
        if (tgt.isEmpty && cur.nonEmpty) throw new IllegalStateException(
          s"cannot restore $table to $toVersion: the table has a $what " +
            s"('$cur') that version $toVersion predates — sticky ids " +
            "cannot be cleared; restore to a later version or " +
            "re-declare after restoring")
    }
    val live = hm.files
    commit(spark, table,
      adds = target.files, removes = live,
      txn = s"restore:$toVersion",
      statsCol = target.statsCol,
      schemaId = if (target.schemaId.nonEmpty) target.schemaId else "",
      fileSchemas = target.fileSchemas,
      colStats = target.colStats,
      specId = if (target.specId.nonEmpty) target.specId else "",
      fileSpecs = target.fileSpecs,
      strColStats = target.strStats,
      checksId = if (target.checksId.nonEmpty) target.checksId else "")
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
    * the newest `keepVersions`, then the older manifests themselves,
    * then group files no kept manifest of ANY ref references.
    * Returns deleted data-file count. Safe order — files first would
    * break a concurrent old-version reader that already resolved its
    * manifest; deleting the manifest first (newest-boundary readers
    * re-resolve) then files matches the vacuum contract of the
    * directory [[Vacuum]]. */
  /** The (dropped versions, kept versions, data files to retire) a
    * `keepVersions` vacuum would target — the DRY RUN computation,
    * shared with the real verb from ONE versions()/refs() listing so
    * the plan IS the execution's target set (a commit landing between
    * two separate listings must not widen the drop window). */
  def vacuumPlan(spark: SparkSession, table: String,
      keepVersions: Int = 1): (Seq[Long], Seq[Long], Set[String]) = {
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
    (drop, keep, dropSet)
  }

  def vacuumUnreferenced(
      spark: SparkSession, table: String, keepVersions: Int = 1): Int = {
    val f = fs(spark, table)
    val (drop, keep, dropSet) = vacuumPlan(spark, table, keepVersions)
    val others = refs(spark, table).filterNot(_ == table)
    // Group liveness BEFORE deleting anything: every kept version of
    // every ref contributes its group refs.
    val keptGroups = (keep.map(v => readManifest(spark, table, v)) ++
      others.flatMap(r => versions(spark, r)
        .map(v => readManifest(spark, r, v))))
      .flatMap(_.groups).toSet
    // Bloom-sidecar liveness: every kept version of every ref
    // contributes its __bloom:* refs — computed BEFORE deletions.
    val keptBlooms = (keep.map(v => readManifest(spark, table, v)) ++
      others.flatMap(r => versions(spark, r)
        .map(v => readManifest(spark, r, v))))
      .flatMap(_.strStats.collect {
        case (c, m) if c.startsWith(BloomPrefix) => m.values.map(_._1)
      }.flatten).toSet
    // A dropped manifest may carry a COPY INTO txn whose durable
    // marker was never written (crash between commit and marker) —
    // confirm it BEFORE the record is destroyed, or the next copy
    // would re-load those files (duplicates).
    drop.foreach { v =>
      val t = readManifest(spark, table, v).txn
      if (t.startsWith("copy:"))
        CopyInto.confirmMarker(spark, table, t.stripPrefix("copy:"))
    }
    drop.foreach(v => f.delete(manifestPath(table, v), false))
    // Orphaned group files of THIS ref's log dir (other refs' dirs are
    // their own vacuums' responsibility).
    f.listStatus(logDir(table)).foreach { st =>
      val n = st.getPath.getName
      if (n.startsWith("group-") && n.endsWith(".json") &&
        !keptGroups(s"${logRel(table)}/$n")) f.delete(st.getPath, false)
    }
    // Orphaned bloom sidecars (content-addressed, shared by reference
    // like groups; only unreferenced ones are retired).
    val bloomDir = new Path(dataRoot(table), "_bloom")
    if (f.exists(bloomDir)) f.listStatus(bloomDir).foreach { st =>
      if (!keptBlooms(s"_bloom/${st.getPath.getName}"))
        f.delete(st.getPath, false)
    }
    dropSet.foreach(rel => f.delete(new Path(dataRoot(table), rel), false))
    // Prune now-empty stage dirs (cosmetic; readers never glob).
    f.listStatus(new Path(dataRoot(table))).foreach { st =>
      if (st.isDirectory && st.getPath.getName.startsWith("stage-") &&
        f.listStatus(st.getPath).isEmpty) f.delete(st.getPath, false)
    }
    dropSet.size
  }

  /** ZERO-COPY ADOPTION of an existing parquet directory as a
    * commit-log table (Delta's CONVERT TO DELTA): list the data files
    * IN PLACE, collect zone-map stats over them (one pass — the only
    * read), and land version 1 referencing them by relative path —
    * no byte moves, so a 100 TB directory onboards at stats-pass
    * cost. Refusals, loud: a directory already holding a commit log
    * (adoption is a birth, not a merge), an empty directory, and a
    * HIVE-PARTITIONED layout (`k=v` path segments — those partition
    * VALUES live in directory names, which per-file reads would
    * silently drop; read such data through Spark's own reader, or
    * COPY INTO a declared table). Returns the committed version (1).
    * After adoption the directory IS the table root: register/catalog
    * it and every verb — DML, OPTIMIZE, time travel — applies. */
  def adoptParquet(spark: SparkSession, dir: String): Long = {
    require(currentVersion(spark, dir).isEmpty,
      s"$dir already holds a commit log — adoption is a birth, not a merge")
    val root = new Path(dir)
    val f = fs(spark, dir)
    require(f.exists(root), s"adoption source $dir does not exist")
    val rootUri = f.makeQualified(root).toUri
    val it = f.listFiles(root, true)
    val found = Seq.newBuilder[String]
    while (it.hasNext) {
      val st = it.next()
      val name = st.getPath.getName
      if (st.isFile && name.endsWith(".parquet") &&
        !name.startsWith(".") && !name.startsWith("_")) {
        val rel = rootUri.relativize(st.getPath.toUri).getPath
        if (!rel.split('/').exists(seg =>
          seg.startsWith(".") || seg.startsWith("_"))) {
          require(!rel.split('/').exists(_.contains('=')),
            s"$dir is hive-partitioned ('$rel') — partition values " +
              "live in directory names and would be dropped; read it " +
              "through Spark's own reader or COPY INTO a graft table")
          found += rel
        }
      }
    }
    val files = found.result().sorted
    require(files.nonEmpty, s"no parquet files to adopt under $dir")
    val schema = spark.read
      .parquet(files.map(r => s"$dir/$r"): _*).schema
    import org.apache.spark.sql.types._
    val eligible = schema.fields.collect {
      case fl if Seq(ByteType, ShortType, IntegerType, LongType,
        DateType, TimestampType, StringType).contains(fl.dataType) =>
        fl.name
    }.toSeq
    val (nums, strs) =
      if (eligible.nonEmpty) statsPassFor(spark, dir, files, eligible)
      else (Map.empty[String, Map[String, (Long, Long)]],
        Map.empty[String, Map[String, (String, String)]])
    commit(spark, dir, adds = files,
      statsCol = eligible.headOption.getOrElse(""),
      colStats = nums, strColStats = strs)
  }

  /** Explicit manifest compaction (Iceberg's rewrite_manifests): fold
    * the head's group list into ONE group in a metadata-only commit —
    * no data file moves. The automatic fold at [[MaxGroups]] keeps
    * fan-in bounded; this is the operator a maintenance job calls
    * after a burst of small appends to drop a cold reader's group
    * round trips to one. Returns the new version. */
  def compactManifests(spark: SparkSession, table: String): Long = {
    val f = fs(spark, table)
    var attempt = 0
    while (attempt < 200) {
      val v = currentVersion(spark, table).getOrElse(
        throw new IllegalArgumentException(s"no committed version at $table"))
      val m = readManifest(spark, table, v)
      val folded = writeGroup(spark, table,
        GroupData(m.files, m.colStats, m.fileSchemas, m.fileSpecs,
          m.strStats))
      val tmp = new Path(logDir(table), s".tmp-${UUID.randomUUID()}")
      val out = f.create(tmp, false)
      try out.write(renderList(m.copy(version = v + 1, txn = "",
        groups = Seq(folded))).getBytes("UTF-8"))
      finally out.close()
      if (atomicPublish(f, tmp, manifestPath(table, v + 1))) return v + 1
      f.delete(tmp, false) // lost the race — refold against the new head
      attempt += 1
    }
    throw new IllegalStateException(
      s"compactManifests lost the version race 200 times at $table")
  }

  /** Time-based retention ([[vacuumUnreferenced]] keyed by age instead
    * of count): keep every version whose manifest was written within
    * the last `retainMs` (and always the head), retire the rest. The
    * manifest file's own modification time is the commit timestamp —
    * the same clock Delta's RETAIN interval reads. Returns deleted
    * data-file count. */
  def vacuumOlderThan(spark: SparkSession, table: String,
      retainMs: Long, nowMs: Long): Int = {
    val f = fs(spark, table)
    val vs = versions(spark, table)
    if (vs.isEmpty) return 0
    val cutoff = nowMs - retainMs
    val keep = vs.count(v =>
      f.getFileStatus(manifestPath(table, v)).getModificationTime >= cutoff)
    vacuumUnreferenced(spark, table, keepVersions = math.max(1, keep))
  }

  /** Retire ORPHANS: parquet files under the table root that NO
    * manifest of ANY ref has ever referenced — crashed writers'
    * staged-but-uncommitted output and WAP-rejected batches (dead by
    * protocol, invisible to readers, but paying storage). Only files
    * older than `graceMs` (by modification time) are deleted, so an
    * IN-FLIGHT stage racing this vacuum is never swept — a committer
    * older than the grace period that hasn't committed is crashed by
    * contract (choose graceMs above the longest plausible
    * stage-to-commit window, as Delta's vacuum does with its
    * retention check). Returns the number of files deleted. */
  def vacuumOrphans(spark: SparkSession, table: String,
      graceMs: Long, nowMs: Long): Int = {
    val f = fs(spark, table)
    val root = new Path(dataRoot(table))
    if (!f.exists(root)) return 0
    val referenced = refs(spark, table).flatMap(r =>
      versions(spark, r).flatMap(v => liveFiles(spark, r, v))).toSet
    val qualifiedRoot = f.makeQualified(root)
    val rootLen = qualifiedRoot.toUri.getPath.length
    var deleted = 0
    def walk(p: Path): Unit = f.listStatus(p).foreach { st =>
      val n = st.getPath.getName
      if (st.isDirectory) {
        if (!n.startsWith("_log")) walk(st.getPath)
      } else if (n.endsWith(".parquet") && !n.startsWith("_") &&
        !n.startsWith(".")) {
        val rel = f.makeQualified(st.getPath).toUri.getPath
          .substring(rootLen + 1)
        if (!referenced(rel) && st.getModificationTime < nowMs - graceMs) {
          f.delete(st.getPath, false)
          deleted += 1
        }
      }
    }
    walk(root)
    deleted
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
    * fork: the new ref's first manifest references exactly `from`'s
    * GROUPS (version number preserved, so cross-ref diffs line up);
    * with sharded manifests not even the file list is re-serialized.
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
    // A legacy (monolithic) source materializes one group into the
    // BRANCH's log dir; a sharded source is referenced as-is.
    val groups =
      if (m.groups.nonEmpty) m.groups
      else if (m.files.isEmpty) Seq.empty
      else Seq(writeGroup(spark, ref,
        GroupData(m.files, m.colStats, m.fileSchemas, m.fileSpecs,
          m.strStats)))
    val tmp = new Path(logDir(ref), s".tmp-${UUID.randomUUID()}")
    val out = f.create(tmp, false)
    try out.write(renderList(m.copy(groups = groups)).getBytes("UTF-8"))
    finally out.close()
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
    val bm = readManifest(spark, branch, bv)
    val iLive = currentVersion(spark, into)
      .map(v => liveFiles(spark, into, v)).getOrElse(Seq.empty)
    val adds = bm.files.filterNot(iLive.toSet)
    val aset = adds.toSet
    // Schema/spec files referenced by the adopted manifest live in the
    // BRANCH's log dir — copy them (content-addressed, write-if-absent)
    // into the target's so the merged manifest's ids resolve there.
    ((if (bm.schemaId.nonEmpty) Seq(bm.schemaId) else Seq.empty) ++
      bm.fileSchemas.values).distinct.foreach { sid =>
      val (fields, lastId) = readSchemaFile(spark, branch, sid)
      writeSchemaFile(spark, into, sid, fields, lastId)
    }
    ((if (bm.specId.nonEmpty) Seq(bm.specId) else Seq.empty) ++
      bm.fileSpecs.values).distinct.foreach { pid =>
      val (c, fmt) = readSpecFile(spark, branch, pid)
      writeSpecFile(spark, into, pid, c, fmt)
    }
    // A branch's declared CHECK constraints merge with its data — the
    // adopt-the-branch semantics schemaId already follows (a checks-
    // less branch keeps the target's checks via stickiness).
    if (bm.checksId.nonEmpty)
      writeChecksFile(spark, into, bm.checksId,
        readChecksFile(spark, branch, bm.checksId))
    // The adopted files bring their per-file metadata with them — a
    // merge dropping a dev branch's schema tags would make field-id
    // projection read its old-generation files under the WRONG schema
    // (silent null-fork); dropped zone maps would merely degrade
    // pruning, silently.
    commit(spark, into,
      adds = adds,
      removes = iLive.filterNot(bm.files.toSet),
      schemaId = bm.schemaId,
      colStats = bm.colStats.map { case (c, m) =>
        c -> m.filter(e => aset(e._1)) }.filter(_._2.nonEmpty),
      fileSchemas = bm.fileSchemas.filter(e => aset(e._1)),
      specId = bm.specId,
      fileSpecs = bm.fileSpecs.filter(e => aset(e._1)),
      strColStats = bm.strStats.map { case (c, m) =>
        c -> m.filter(e => aset(e._1)) }.filter(_._2.nonEmpty),
      checksId = bm.checksId)
  }
}
