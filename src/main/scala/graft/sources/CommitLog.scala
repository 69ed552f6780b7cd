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

  private def fs(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def logDir(table: String) = new Path(table, "_log")

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

  /** Live file list of `version` (paths relative to the table root). */
  def liveFiles(spark: SparkSession, table: String, version: Long): Seq[String] = {
    val f = fs(spark, table)
    val in = f.open(manifestPath(table, version))
    val body = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
    parseManifest(body)
  }

  /** One JSON object per manifest; file order is canonicalized so two
    * manifests with the same live set are byte-comparable. */
  private def renderManifest(version: Long, files: Seq[String]): String = {
    def esc(s: String) = s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
    files.sorted.map(f => "\"" + esc(f) + "\"")
      .mkString(s"""{"version":$version,"files":[""", ",", "]}")
  }

  private def parseManifest(body: String): Seq[String] = {
    // Minimal JSON array-of-strings extraction (no JSON lib on the
    // unmanaged classpath contract); paths we wrote never contain
    // escapes beyond the renderer's, so unescape mirrors it.
    val arr = body.substring(body.indexOf('[') + 1, body.lastIndexOf(']'))
    if (arr.trim.isEmpty) Seq.empty
    else {
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
        java.nio.file.Files.createLink(
          java.nio.file.Paths.get(dst.toUri.getPath),
          java.nio.file.Paths.get(tmp.toUri.getPath))
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
      maxAttempts: Int = 200): Long = {
    val f = fs(spark, table)
    f.mkdirs(logDir(table))
    var attempt = 0
    while (attempt < maxAttempts) {
      val base = currentVersion(spark, table)
      val live = base.map(v => liveFiles(spark, table, v)).getOrElse(Seq.empty)
      val next = base.getOrElse(0L) + 1
      val newLive = (live.filterNot(removes.toSet) ++ adds).distinct
      val tmp = new Path(logDir(table), s".tmp-${UUID.randomUUID()}")
      val out = f.create(tmp, false)
      try out.write(renderManifest(next, newLive).getBytes("UTF-8"))
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
  def stage(spark: SparkSession, df: DataFrame, table: String): Seq[String] = {
    val sub = s"stage-${UUID.randomUUID()}"
    df.write.mode("overwrite").parquet(s"$table/$sub")
    val f = fs(spark, table)
    f.listStatus(new Path(table, sub)).toSeq
      .map(_.getPath.getName)
      .filter(n => n.endsWith(".parquet") && !n.startsWith("_") && !n.startsWith("."))
      .map(n => s"$sub/$n")
  }

  /** Transactional append: stage + commit(adds). */
  def append(spark: SparkSession, df: DataFrame, table: String): Long =
    commit(spark, table, adds = stage(spark, df, table))

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
    val files = liveFiles(spark, table, version).map(f => s"$table/$f")
    spark.read.parquet(files: _*)
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
    val keepSet = keep.flatMap(v => liveFiles(spark, table, v)).toSet
    val dropSet = drop.flatMap(v => liveFiles(spark, table, v)).toSet -- keepSet
    drop.foreach(v => f.delete(manifestPath(table, v), false))
    dropSet.foreach(rel => f.delete(new Path(table, rel), false))
    // Prune now-empty stage dirs (cosmetic; readers never glob).
    f.listStatus(new Path(table)).foreach { st =>
      if (st.isDirectory && st.getPath.getName.startsWith("stage-") &&
        f.listStatus(st.getPath).isEmpty) f.delete(st.getPath, false)
    }
    dropSet.size
  }
}
