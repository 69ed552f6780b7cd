package graft.sources

import java.util.UUID

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions.{col, xxhash64}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.util.sketch.BloomFilter

/** MANIFEST-INTEGRATED bloom skipping (VERDICT r13 directive #5): the
  * zone maps answer RANGE probes, but on a hash-ordered or wide-range
  * layout every file's [min, max] spans the domain and an equality/IN
  * probe prunes nothing. [[appendWithBloom]] collects, in ONE extra
  * pass over the staged batch (exactly the [[CommitLog.appendWithStats]]
  * economy, via Spark's own `BloomFilterAggregate` grouped by
  * `input_file_name` — the machinery runtime row-filters use), a
  * per-file bloom filter per listed column, persists each as an
  * immutable content-addressed `_bloom/bloom-<md5>.bin` sidecar, and
  * records the refs in the manifest's reserved `__bloom:<col>` string
  * pseudo-column — riding group reuse, restrictTo, branches, and folds
  * with no manifest schema change, and retired by
  * [[CommitLog.vacuumUnreferenced]] when no kept version references
  * them.
  *
  * The read side is [[graft.plans.ZoneEval.FileStats.bloomPossible]]:
  * inside the same three-valued canMatch walk, an equality/IN leaf
  * that survives the zone map additionally probes the filter — so OR
  * trees compose and unknown shapes still only cost pruning, never
  * rows (blooms have no false negatives). [[graft.plans.ManifestSkip]]
  * wires a cached loader; at 100 TB a point probe on a hash-ordered
  * layout reads the handful of bloom-surviving files instead of every
  * file whose range covers the key.
  *
  * Hashing contract, writer == reader: `xxhash64(col)` (seed 42) at
  * write; `XxHash64(literal)` at probe — same expression class, same
  * seed, so agreement is by construction, not by reimplementation.
  */
object BloomStats {

  /** [[CommitLog.appendWithStats]] plus per-file bloom sidecars on
    * `bloomCols` (each must be one of `statsCols` or any column).
    * `expectedItemsPerFile`/`fpp` size the filters — at the default
    * 3% a million-row file costs ~900 KB of sidecar. */
  def appendWithBloom(
      spark: SparkSession,
      df: DataFrame,
      table: String,
      statsCols: Seq[String],
      bloomCols: Seq[String],
      expectedItemsPerFile: Long = 1000000L,
      fpp: Double = 0.03): Long = {
    require(statsCols.nonEmpty, "at least one stats column")
    require(bloomCols.nonEmpty, "at least one bloom column")
    val staged = CommitLog.stage(spark, df, table)
    // zone maps + bloom sidecars in ONE scan of the staged batch
    // (r16: the two passes fused via CommitLog.stagedPass)
    val p = CommitLog.stagedPass(spark, table, staged, statsCols,
      bloomCols = bloomCols, bloomItems = expectedItemsPerFile,
      bloomFpp = fpp)
    CommitLog.commit(spark, table, adds = staged,
      statsCol = statsCols.head, colStats = p.nums,
      strColStats = p.strs)
  }

  /** The table's bloom-carrying columns as recorded in `m` — what a
    * mutation verb must re-collect sidecars for. */
  private[sources] def bloomColsOf(m: CommitLog.Manifest): Seq[String] =
    m.strStats.keys
      .filter(_.startsWith(CommitLog.BloomPrefix))
      .map(_.stripPrefix(CommitLog.BloomPrefix)).toSeq.sorted

  /** One serialized-bloom aggregate over `xxhash64(col)` — the shared
    * writer-side expression ([[CommitLog.stagedPass]] rides it in the
    * fused per-file aggregate). */
  private[sources] def bloomAgg(c: String, items: Long,
      fpp: Double): org.apache.spark.sql.Column = {
    val numBits = BloomFilter.optimalNumOfBits(items, fpp)
    ColumnBridge.column(new BloomFilterAggregate(
      ColumnBridge.expression(xxhash64(col(c))),
      Literal(items), Literal(numBits)).toAggregateExpression())
  }

  /** SURVIVAL pass (VERDICT r14 directive #3): re-collect the
    * `__bloom:<col>` sidecars for `staged` replacement/append files
    * whenever the manifest ALREADY carries bloom columns — wired into
    * [[CommitDml]] (DELETE/UPDATE rewrites), [[CommitMerge]], SQL
    * INSERT ([[Constraints.checkedAppend]]) and
    * [[CommitLog.compactTable]] (OPTIMIZE), so the first mutation on a
    * bloom-carrying table no longer silently degrades point-probe
    * skipping. Columns the staged schema lacks are skipped (an absent
    * bloom cell answers "possible" — costs pruning, never rows). */
  private[sources] def restatBlooms(
      spark: SparkSession, table: String, m: CommitLog.Manifest,
      staged: Seq[String]): Map[String, Map[String, (String, String)]] = {
    val cols = bloomColsOf(m)
    if (cols.isEmpty || staged.isEmpty) Map.empty
    else CommitLog.stagedPass(spark, table, staged,
      statsCols = Seq.empty, bloomCols = cols).strs
  }

  /** Persist `bytes` as `_bloom/bloom-<md5>.bin` (write-if-absent —
    * content addressing makes racing writers of equal bytes benign)
    * and return the root-relative ref. */
  private[sources] def persistSidecar(f: org.apache.hadoop.fs.FileSystem,
      root: String, bytes: Array[Byte]): String = {
    val id = java.security.MessageDigest.getInstance("MD5")
      .digest(bytes).map(b => f"$b%02x").mkString
    val rel = s"_bloom/bloom-$id.bin"
    val dst = new Path(root, rel)
    if (!f.exists(dst)) {
      f.mkdirs(new Path(root, "_bloom"))
      val tmp = new Path(root, s"_bloom/.tmp-${UUID.randomUUID()}")
      val out = f.create(tmp, false)
      try out.write(bytes) finally out.close()
      if (!f.rename(tmp, dst)) f.delete(tmp, false) // loser: same bytes exist
    }
    rel
  }

  /** Sidecars are immutable and content-addressed → a process-wide
    * cache never invalidates. Bounded crudely like the group cache. */
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, BloomFilter]()

  /** Load a manifest-carried sidecar ref (root-relative) for `table`.
    * None on any failure — the probe then answers "possible", which
    * only costs pruning. */
  def load(spark: SparkSession, table: String, ref: String)
      : Option[BloomFilter] = {
    val root = CommitLog.dataRoot(table)
    val p = new Path(root, ref)
    try {
      val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val k = f.makeQualified(p).toString
      val hit = cache.get(k)
      if (hit != null) Some(hit)
      else {
        val in = f.open(p)
        val bf = try BloomFilter.readFrom(in) finally in.close()
        if (cache.size > 4096) cache.clear()
        cache.put(k, bf)
        Some(bf)
      }
    } catch { case _: java.io.IOException => None }
  }
}
