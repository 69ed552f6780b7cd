package graft.dedup

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import graft.text.TextFunctions

/** SimHash near-duplicate detection: 64-bit locality-sensitive content
  * hash (Charikar '02); near-dup ⟺ small Hamming distance.
  *
  * Signature: for each bit position i, sum +1/−1 over the tokens'
  * 64-bit hashes' bit i; bit i of the simhash = sign of the sum.
  * Computed in one `mapPartitions` JVM pass per row (the same math as
  * 64 Column `aggregate` folds overflows janino codegen and falls back
  * to interpreted eval — 64 array traversals per row).
  *
  * The per-token hash is the first 16 md5 hex digits as an unsigned
  * 64-bit value — md5 is the one hash Spark, the JVM, and DuckDB all
  * expose bit-identically (the same trick that made rollingFingerprint
  * oracle-checkable, TextFunctions.rollingFingerprint), so the entire
  * signature → blocking → Hamming pipeline is reproducible by a SQL
  * oracle.
  *
  * Pair search uses the generalized pigeonhole block trick: split the
  * 64 bits into m = maxDist + q blocks. A pair at Hamming distance
  * ≤ maxDist has differing bits in at most maxDist blocks, so at least
  * q blocks match EXACTLY — hence the pair agrees on at least one
  * q-combination of blocks, and candidates come from an equi-join on
  * (combination id, concatenated block bits). Exact: no true pair can
  * be missed. q = 2 for maxDist ≥ 4: with single-block keys (q = 1) at
  * maxDist = 7, each key is only 64/8 = 8 bits → 256 distinct values
  * per block — at corpus scale every bucket holds n/256 docs and the
  * join degenerates quadratic. Pairing blocks (m = 9, C(9,2) = 36
  * combos, 14-15-bit keys) multiplies the key space to ~6×10⁵
  * ([[bucketKeyspace]]) at the cost of 36 vs 8 bucket rows per doc.
  */
object SimHash {

  /** First 8 md5 bytes of the UTF-8 token, big-endian unsigned —
    * see [[graft.util.Md5Hash]] for the cross-engine contract.
    */
  private[dedup] def tokenHash64(t: String, md: java.security.MessageDigest): Long =
    graft.util.Md5Hash.prefix64(t, md)

  /** JVM kernel: simhash of a token sequence. */
  private[dedup] def simhash64(tokens: Seq[String]): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val votes = new Array[Int](64)
    tokens.foreach { t =>
      val h = tokenHash64(t, md)
      var i = 0
      while (i < 64) {
        if (((h >>> i) & 1L) == 1L) votes(i) += 1 else votes(i) -= 1
        i += 1
      }
    }
    var out = 0L
    var i = 0
    while (i < 64) {
      if (votes(i) > 0) out |= (1L << i)
      i += 1
    }
    out
  }

  /** Append a 64-bit simhash column computed from the whitespace-token
    * stream of `textCol`. One mapPartitions pass, no shuffle.
    */
  def withSimhash(df: DataFrame, textCol: String, outCol: String): DataFrame = {
    val withToks = df.withColumn("__toks", TextFunctions.tokens(col(textCol)))
    val tokIdx = withToks.schema.fieldIndex("__toks")
    val schema = withToks.schema.add(outCol, LongType, nullable = false)
    val enc = Encoders.row(schema)
    withToks.mapPartitions { it =>
      it.map { r =>
        // NULL text → NULL token array; hash as an empty stream.
        val toks = if (r.isNullAt(tokIdx)) Seq.empty[String] else r.getSeq[String](tokIdx)
        Row.fromSeq(r.toSeq :+ simhash64(toks))
      }
    }(enc).drop("__toks")
  }

  /** Hamming distance between two simhash columns. */
  def hamming(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))

  /** Block layout for a given maxDist: per-block bit widths and the
    * q-combinations joined on. q = 2 when maxDist ≥ 4 (wide combined
    * keys), else 1 (the classic maxDist+1 single-block scheme).
    */
  private[dedup] def blocking(maxDist: Int): (Array[Int], Seq[Seq[Int]]) = {
    val q = if (maxDist >= 4) 2 else 1
    val m = maxDist + q
    require(m <= 64, s"maxDist $maxDist needs $m blocks but only 64 bits")
    val widths = Array.tabulate(m)(i => 64 / m + (if (i < 64 % m) 1 else 0))
    (widths, (0 until m).combinations(q).map(_.toSeq).toSeq)
  }

  /** Number of distinct possible bucket keys (over all combinations) —
    * the join's selectivity ceiling. 2048 under the old single-block
    * scheme at maxDist=7; ~6×10⁵ with paired blocks.
    */
  def bucketKeyspace(maxDist: Int): BigInt = {
    val (widths, combos) = blocking(maxDist)
    combos.map(c => BigInt(1) << c.map(widths).sum).sum
  }

  /** One bucket row per (doc, q-combination): combination index + the
    * member blocks' bits concatenated into one key. Columns (id, sh,
    * bucket).
    */
  private def bucketRows(
      df: DataFrame, textCol: String, idCol: String, maxDist: Int): DataFrame = {
    val (widths, combos) = blocking(maxDist)
    val offsets = widths.scanLeft(0)(_ + _)
    val signed = withSimhash(
      graft.util.Partitioning.parallelize(df.select(col(idCol).as("id"), col(textCol))), textCol, "sh")
      .select("id", "sh")

    def blockBits(i: Int): Column = {
      val w = widths(i)
      val mask = if (w == 64) -1L else (1L << w) - 1
      shiftright(col("sh"), offsets(i)).bitwiseAND(lit(mask))
    }
    val comboCols = combos.zipWithIndex.map { case (idxs, cid) =>
      val bits = idxs.tail.foldLeft(blockBits(idxs.head)) { (acc, bi) =>
        shiftleft(acc, widths(bi)).bitwiseOR(blockBits(bi))
      }
      struct(lit(cid).as("blk"), bits.as("bits"))
    }
    signed
      .withColumn("bucket", explode(array(comboCols: _*)))
      .select("id", "sh", "bucket")
  }

  /** Candidate self-join + exact Hamming verify over bucket rows. */
  private def pairsFromBuckets(bucketed: DataFrame, maxDist: Int): DataFrame = {
    // Disjoint column names per join side — a self-join keyed through
    // the SAME attribute (a("bucket") === b("bucket")) resolves both
    // sides to one column, Spark drops the "trivially true" predicate,
    // and the join degenerates to a nested loop over all id pairs.
    val a = bucketed.select(col("id").as("id_a"), col("sh").as("sh_a"), col("bucket").as("bucket_a"))
    val b = bucketed.select(col("id").as("id_b"), col("sh").as("sh_b"), col("bucket").as("bucket_b"))
    a.join(b, col("bucket_a") === col("bucket_b") && col("id_a") < col("id_b"))
      // exact-verify BEFORE distinct: bit_count(xor) per joined row is
      // cheaper than hashing every duplicate candidate into the
      // distinct's aggregation map.
      .withColumn("dist", hamming(col("sh_a"), col("sh_b")))
      .filter(col("dist") <= maxDist)
      .select("id_a", "id_b", "dist")
      .distinct()
  }

  /** All pairs within Hamming distance `maxDist` of each other's
    * simhash. Output: (id_a, id_b, dist), id_a < id_b. Exact — the
    * q-of-m pigeonhole candidate join cannot miss a pair.
    */
  def nearDupPairs(
      df: DataFrame,
      textCol: String,
      idCol: String,
      maxDist: Int = 3): DataFrame =
    pairsFromBuckets(bucketRows(df, textCol, idCol, maxDist), maxDist)

  /** Capped pair search: `pairs` plus the ledger of buckets that were
    * dropped for exceeding the cap (bucket key + member count) and the
    * total bucket rows dropped with them.
    */
  final case class CappedPairs(
      pairs: DataFrame, droppedBuckets: DataFrame, droppedBucketRows: Long)

  /** Beyond this many over-cap buckets the anti-join shuffles instead
    * of broadcasting. #hot ≤ (bucketRows / maxBucket), so this is only
    * reachable on genuinely hostile corpora.
    */
  private val HotBroadcastLimit = 1000000L

  /** [[nearDupPairs]] with a per-bucket size cap — the hostile-corpus
    * guard. A natural-language corpus spreads across the ~6×10⁵-key
    * bucket space, but an adversarial (or boilerplate-heavy) one can
    * pile millions of docs onto one bucket key and the candidate join
    * goes quadratic on it. Capping drops WHOLE buckets over
    * `maxBucket`; a pair is only lost if EVERY one of its ≥ q matching
    * combinations is over-cap, so on benign data recall is unaffected
    * (spec-asserted). The drop is surfaced, not silent: the ledger
    * DataFrame carries every dropped bucket with its size, the total is
    * both returned and logged, and the caller decides whether the loss
    * is acceptable.
    *
    * Cost: one extra aggregate on the same key the pair join shuffles
    * on anyway, and an anti-join that broadcasts the (small) over-cap
    * set. The count is materialized eagerly — the ledger IS the
    * feature — so the bucket rows are persisted for reuse by the pair
    * join; callers should unpersist via `pairs`'s lifecycle ending.
    */
  def nearDupPairsCapped(
      df: DataFrame,
      textCol: String,
      idCol: String,
      maxDist: Int,
      maxBucket: Int): CappedPairs = {
    require(maxBucket > 0, "maxBucket must be positive")
    val bucketed = bucketRows(df, textCol, idCol, maxDist)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val hot = bucketed.groupBy("bucket").agg(count(lit(1)).as("n_members"))
      .filter(col("n_members") > maxBucket)
    val (hotBuckets, dropped) = {
      val agg = hot.agg(count(lit(1)), coalesce(sum("n_members"), lit(0L))).head()
      (agg.getLong(0), agg.getLong(1))
    }
    val kept =
      if (hotBuckets == 0) bucketed
      else if (hotBuckets <= HotBroadcastLimit)
        bucketed.join(broadcast(hot.select("bucket")), Seq("bucket"), "left_anti")
      else bucketed.join(hot.select("bucket"), Seq("bucket"), "left_anti")
    org.slf4j.LoggerFactory.getLogger(getClass)
      .info(s"simhash cap $maxBucket: dropped $hotBuckets buckets / $dropped bucket rows")
    CappedPairs(pairsFromBuckets(kept, maxDist), hot, dropped)
  }
}
