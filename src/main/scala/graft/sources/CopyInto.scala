package graft.sources

import java.util.UUID

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Idempotent bulk file ingest (Delta's `COPY INTO`): load every
  * parquet file under a landing directory into a commit-log table
  * EXACTLY ONCE — the 100 TB ingest workhorse, where upstream keeps
  * dropping files into a prefix and the loader must be safely
  * re-runnable (cron retries, crashed runs, overlapping schedules).
  *
  * Load history is durable and crash-safe: each COPY commit writes
  * the loaded source file names as a content-addressed
  * `_log/copy-<id>.json` sidecar BEFORE its commit, and the manifest
  * `txn` field records `copy:<id>` — history is the union of sidecars
  * referenced from COMMITTED manifests, so a crash between sidecar
  * write and commit leaves an ignored orphan (the retry re-loads,
  * never loses), and a crash after commit is fully recorded (the
  * retry loads nothing). Files are identified by their path RELATIVE
  * to the landing prefix — subdir-partitioned drops work, and
  * same-named part files in different subdirs never collide (landing
  * dirs are append-only by contract; a re-dropped path is the same
  * file).
  *
  * The write itself keeps the enforced-append discipline: schema
  * drift refuses before staging, the persisted CHECK set audits the
  * staged bytes, zone maps are collected on the manifest's stat
  * columns, and bloom sidecars survive ([[Constraints.checkedAppend]]
  * economics, plus the txn record).
  */
object CopyInto {

  /** Thrown inside the commit CAS when a racer already landed the
    * SAME copy batch — caught by [[copyInto]], which backs off to
    * exactly-once instead of duplicating. */
  private final class AlreadyCopied(id: String)
    extends RuntimeException(s"copy batch $id already committed")

  /** Thrown inside the commit CAS when a racer landed an OVERLAPPING
    * (but not equal) batch — some of our fresh files are now loaded.
    * [[copyInto]] catches it and retries from a fresh listing, so the
    * non-overlapping remainder still loads exactly once. */
  private final class ConcurrentCopy(table: String)
    extends RuntimeException(
      s"concurrent COPY INTO landed overlapping files at $table")

  /** Load the not-yet-loaded parquet files under `srcDir` into
    * `table`. Returns (files loaded, committed version) — (0, head)
    * when everything was already loaded (idempotent re-run). Throws
    * [[Constraints.ConstraintViolationException]] on a CHECK-failing
    * batch (nothing commits, nothing is marked loaded — fixing the
    * file and re-running loads it). */
  def copyInto(spark: SparkSession, table: String, srcDir: String)
      : (Long, Long) = {
    val sp = new Path(srcDir)
    val sfs = sp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(sfs.exists(sp), s"COPY INTO source $srcDir does not exist")
    // recursive: landing prefixes are usually partitioned into
    // subdirs; identity is the path RELATIVE to the prefix, so
    // same-named part files in different subdirs never collide
    val rootUri = sfs.makeQualified(sp).toUri
    val it = sfs.listFiles(sp, true)
    val found = Seq.newBuilder[String]
    while (it.hasNext) {
      val st = it.next()
      val name = st.getPath.getName
      if (st.isFile && name.endsWith(".parquet") &&
        !name.startsWith(".") && !name.startsWith("_")) {
        val rel = rootUri.relativize(st.getPath.toUri).getPath
        if (!rel.split('/').exists(seg =>
          seg.startsWith(".") || seg.startsWith("_")))
          found += rel
      }
    }
    val sources = found.result().sorted
    val already = loadedFiles(spark, table)
    val fresh = sources.filterNot(already)
    val head = CommitLog.currentVersion(spark, table).getOrElse(0L)
    if (fresh.isEmpty) return (0L, head)
    val df = spark.read.parquet(fresh.map(n => s"$srcDir/$n"): _*)
    Constraints.driftGate(spark, df, table)
    val staged = CommitLog.stage(spark, df, table)
    val cs = Constraints.checks(spark, table)
    // observed stat columns, else (a freshly CREATEd empty table has
    // no observable cells) the declared schema's eligible columns —
    // the INSERT router's r16 rule, so the first COPY already prunes
    val statCols = CommitLog.currentVersion(spark, table).map { v =>
      val m = CommitLog.readManifest(spark, table, v)
      val observed = (m.colStats.keys ++ m.strStats.keys).toSeq.distinct
        .filterNot(_.startsWith("__")).sorted
      if (observed.nonEmpty) observed
      else {
        import org.apache.spark.sql.types._
        CommitLog.read(spark, table).schema.fields.collect {
          case f if Seq(ByteType, ShortType, IntegerType, LongType,
            DateType, TimestampType, StringType).contains(f.dataType) =>
            f.name
        }.toSeq.sorted
      }
    }.getOrElse(Seq.empty)
    // CHECK audit + zone maps + bloom survival in ONE scan of the
    // staged batch (r16: CommitLog.stagedPass fuses the three jobs)
    val bloomCols = CommitLog.currentVersion(spark, table)
      .map(v => BloomStats.bloomColsOf(
        CommitLog.readManifest(spark, table, v)))
      .getOrElse(Seq.empty)
    val pass =
      if (statCols.isEmpty && bloomCols.isEmpty && cs.isEmpty)
        CommitLog.StagedPassResult(Map.empty, Map.empty, Seq.empty)
      else CommitLog.stagedPass(spark, table, staged, statCols,
        bloomCols = bloomCols, checks = cs)
    val bad = pass.badChecks
    if (bad.nonEmpty)
      throw new Constraints.ConstraintViolationException(table, bad)
    val (nums, strs) = (pass.nums, pass.strs)
    // sidecar BEFORE commit: an orphan is ignored, a referenced one
    // is history
    val id = idOf(fresh)
    writeSidecar(spark, table, id, fresh)
    // exactly-once under RACING copies: an identical fresh set means
    // an identical id — the loser's CAS attempt finds the txn and
    // backs off (its staged files stay dead on disk, vacuumOrphans'
    // problem). An OVERLAPPING-but-different set (the racer saw fewer
    // drops) shares no id, so the CAS additionally re-checks the
    // loaded set: on overlap we abort and retry from a fresh listing
    // — the remainder loads, the overlap never doubles. Disjoint
    // racers both land.
    val freshSet = fresh.toSet
    val v =
      try CommitLog.commit(spark, table, adds = staged,
        txn = s"copy:$id",
        statsCol = statCols.headOption.getOrElse(""),
        colStats = nums, strColStats = strs,
        validateManifest = _ => {
          if (CommitLog.findTxn(spark, table, s"copy:$id").isDefined)
            throw new AlreadyCopied(id)
          if (loadedFiles(spark, table).exists(freshSet))
            throw new ConcurrentCopy(table)
        })
      catch {
        case _: AlreadyCopied =>
          writeMarker(spark, table, id)
          return (0L, CommitLog.findTxn(spark, table, s"copy:$id").get)
        case _: ConcurrentCopy =>
          return copyInto(spark, table, srcDir)
      }
    // durable marker AFTER commit: VACUUM retires old manifests (and
    // their txn records) but never copy sidecars or markers, so load
    // history outlives history retention; the crash window between
    // commit and marker is healed by [[loadedFiles]]' backfill from
    // the still-retained manifest
    writeMarker(spark, table, id)
    (fresh.size.toLong, v)
  }

  /** Every source file name recorded by a COMMITTED copy: the union
    * of marker-confirmed sidecars and sidecars referenced from
    * retained manifests (the latter are marker-backfilled here, so a
    * commit whose marker write crashed is re-confirmed before any
    * VACUUM can retire its manifest). */
  def loadedFiles(spark: SparkSession, table: String): Set[String] = {
    val f = new Path(table)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val ld = CommitLog.logDir(table)
    val marked: Set[String] =
      if (!f.exists(ld)) Set.empty
      else f.listStatus(ld).toSeq.map(_.getPath.getName)
        .filter(_.startsWith("copyok-")).map(_.stripPrefix("copyok-"))
        .toSet
    val referenced: Set[String] = CommitLog.versions(spark, table)
      .map(v => CommitLog.readManifest(spark, table, v).txn)
      .filter(_.startsWith("copy:")).map(_.stripPrefix("copy:")).toSet
    (referenced -- marked).foreach(writeMarker(spark, table, _))
    (marked ++ referenced).toSeq
      .flatMap(readSidecar(spark, table, _)).toSet
  }

  private def writeMarker(spark: SparkSession, table: String,
      id: String): Unit = {
    val f = new Path(table)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dst = new Path(CommitLog.logDir(table), s"copyok-$id")
    if (!f.exists(dst))
      try f.create(dst, false).close()
      catch { case _: java.io.IOException => () } // racer wrote it
  }

  // NUL-joined (escape sequence, not a raw byte, so the source stays
  // plain text for diff/blame — the r13 lesson): no legal file name
  // contains U+0000, so two distinct fresh sets can never hash alike
  private def idOf(names: Seq[String]): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(names.mkString("\u0000").getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString

  /** Durably confirm a committed copy id —
    * [[CommitLog.vacuumUnreferenced]] calls this for any retired
    * manifest whose txn records a copy, so history retention can
    * never erase load history (the crash-between-commit-and-marker
    * window would otherwise reopen on vacuum). */
  private[sources] def confirmMarker(spark: SparkSession, table: String,
      id: String): Unit = writeMarker(spark, table, id)

  private def sidecarPath(table: String, id: String): Path =
    new Path(CommitLog.logDir(table), s"copy-$id.json")

  private def writeSidecar(spark: SparkSession, table: String,
      id: String, names: Seq[String]): Unit = {
    val f = new Path(table)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dst = sidecarPath(table, id)
    if (f.exists(dst)) return // content-addressed: same id, same bytes
    f.mkdirs(dst.getParent)
    val body = names.map(n => "\"" + CommitLog.esc(n) + "\"")
      .mkString("""{"files":[""", ",", "]}")
    val tmp = new Path(dst.getParent, s".tmp-copy-${UUID.randomUUID()}")
    val out = f.create(tmp, false)
    try out.write(body.getBytes("UTF-8")) finally out.close()
    if (!CommitLog.atomicPublish(f, tmp, dst)) f.delete(tmp, false)
  }

  private def readSidecar(spark: SparkSession, table: String,
      id: String): Seq[String] = {
    val f = new Path(table)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val body = CommitLog.readText(f, sidecarPath(table, id))
    CommitLog.arrayField(body, "files")
      .map(CommitLog.parseStrings).getOrElse(Seq.empty)
  }
}
