package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.text.TextFunctions

/** Deduplication operators for training-data pipelines (exact +
  * similarity-based). All shapes are shuffle-bounded by design:
  *
  *  - [[exact]] is one hash-groupBy (a single shuffle on the content
  *    fingerprint; partial aggregation map-side);
  *  - [[jaccardPairs]] never does all-pairs: candidates come from an
  *    inverted-index join restricted to each document's *prefix* of
  *    globally-rarest shingles (PPJoin-style prefix filtering, which is
  *    lossless at the given threshold), so the join fans out by prefix
  *    size, not document count;
  *  - [[MinHashLsh]] / [[SimHash]] (separate files) are the sketch-based
  *    scale paths where even prefix joins are too hot.
  */
object Dedup {

  /** Exact dedup: one row per distinct (normalized) content, keeping the
    * smallest id — plus the duplicate count. Equivalent SQL: GROUP BY
    * fingerprint. One shuffle; map-side combine via partial min/count.
    */
  def exact(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.withColumn("fp", TextFunctions.fingerprint(col(textCol)))
      .groupBy(col("fp"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dupes"))

  /** Survivors view of [[exact]]: the kept rows themselves (keep-first
    * semantics via a window, no second join back).
    */
  def exactSurvivors(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val fp = TextFunctions.fingerprint(col(textCol))
    val w = Window.partitionBy(fp).orderBy(col(idCol).asc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** At-rest fingerprint index for INCREMENTAL dedup — the operational
    * shape at 100 TB: the corpus is deduped once and its content
    * fingerprints persist as a table bucketed (and sorted) by `fp`;
    * each arriving batch then dedups against history via
    * [[incrementalSurvivors]] WITHOUT reshuffling the historical index
    * — only the (small) batch side moves. Same at-rest discipline as
    * `IvfFlat.writeIndex` / `BucketedTables`: pay the layout once,
    * every later probe is cheap.
    *
    * Bucket count should match the probing session's
    * `spark.sql.shuffle.partitions` divisor story at production scale
    * (~128 MB–1 GB per bucket); it is baked into the table layout.
    */
  def writeFingerprintIndex(
      df: DataFrame,
      textCol: String,
      idCol: String,
      table: String,
      buckets: Int = 32): Unit =
    graft.sources.BucketedTables.writeBucketed(
      df.select(TextFunctions.fingerprint(col(textCol)).as("fp"),
          col(idCol).as("keep_id"))
        .groupBy("fp").agg(min(col("keep_id")).as("keep_id")),
      table, "fp", buckets, sortCol = Some("fp"))

  /** Dedup a new batch against an at-rest [[writeFingerprintIndex]]
    * table: keep-min-id within the batch (the [[exactSurvivors]]
    * window), then drop every row whose content fingerprint already
    * exists in the corpus index (one left-anti join on `fp`).
    *
    * Plan shape (asserted in DedupSpec): the index side is scanned in
    * its bucket layout with NO Exchange above it; the batch side's
    * window exchange on `fp` is REUSED by the join when the session's
    * shuffle partitioning matches the bucket count, so the whole
    * operation shuffles the batch once and the corpus never.
    */
  def incrementalSurvivors(
      batch: DataFrame,
      textCol: String,
      idCol: String,
      indexTable: String): DataFrame = {
    val idx = batch.sparkSession.table(indexTable).select(col("fp"))
    // fingerprint once into a column shared by the keep-min-id window
    // AND the join key — not exactSurvivors + a second fingerprint,
    // which would tokenize+md5 every batch row twice
    val w = Window.partitionBy(col("fp")).orderBy(col(idCol).asc)
    batch.withColumn("fp", TextFunctions.fingerprint(col(textCol)))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
      .join(idx, Seq("fp"), "left_anti")
      .drop("fp")
  }

  /** Streaming variant of [[incrementalSurvivors]] for continuous
    * ingest: first-arrival-wins within the stream (stateful
    * `dropDuplicates` on the fingerprint — windows don't exist on
    * streams), then a stream-static LEFT ANTI join against the at-rest
    * index, re-planned per micro-batch with the index side still in
    * its bucket layout.
    *
    * State: dedup state on `fp` alone is unbounded; a production
    * stream sets a watermark and passes `withinWatermark = true`
    * (`dropDuplicatesWithinWatermark`) so fingerprint state ages out —
    * exact-once only within the watermark horizon, the standard
    * streaming-dedup contract.
    */
  def incrementalStreamSurvivors(
      stream: DataFrame,
      textCol: String,
      indexTable: String,
      withinWatermark: Boolean = false): DataFrame = {
    val idx = stream.sparkSession.table(indexTable).select(col("fp"))
    val keyed = stream.withColumn("fp", TextFunctions.fingerprint(col(textCol)))
    val deduped =
      if (withinWatermark) keyed.dropDuplicatesWithinWatermark("fp")
      else keyed.dropDuplicates("fp")
    deduped.join(idx, Seq("fp"), "left_anti").drop("fp")
  }

  /** Broadcast-verify guards: beyond either bound the exact-verify
    * stage joins the shingle arrays back per candidate pair
    * (shuffle-safe at any scale); within both, the per-doc shingle
    * sets are broadcast and candidates verify map-side with zero
    * array shuffle. The shingle bound caps driver/broadcast BYTES —
    * a doc-count bound alone would let 100k long documents collect
    * gigabytes onto the driver.
    */
  val BroadcastVerifyDocLimit = 100000L
  val BroadcastVerifyShingleLimit = 20000000L

  /** Exact n-gram Jaccard near-duplicate pairs at `threshold`, without
    * all-pairs comparison.
    *
    * Caching note (applies to every sketch operator here): the shingled
    * intermediate is persisted MEMORY_AND_DISK because several stages
    * consume it; it cannot be unpersisted inside the operator (the
    * returned DataFrame still references it lazily). Spark's
    * ContextCleaner drops it when the result goes out of scope; batch
    * harnesses running many queries can `spark.catalog.clearCache()`
    * between them (Bench does).
    *
    * Plan:
    *  1. per-doc distinct shingle set (array column, stays with the row);
    *  2. global shingle document-frequency → a rank that orders shingles
    *     rarest-first (ties by shingle value, so the order is total and
    *     deterministic);
    *  3. each doc explodes only its prefix — the `floor((1-t)·|S|)+1`
    *     rarest shingles. Two docs with Jaccard ≥ t MUST share at least
    *     one prefix shingle (pigeonhole over the ≤ (1-t)·|S| shingles
    *     either side may lack), so the candidate set is lossless;
    *  4. equi-join on prefix shingle (a real key join, broadcast-able
    *     when the prefix index is small) → distinct candidate pairs;
    *  5. exact verify on the carried shingle arrays:
    *     |A∩B| / |A∪B| ≥ t.
    *
    * At 100 TB the only shuffles are the DF aggregation and the prefix
    * equi-join — both keyed, both combinable; nothing is quadratic in
    * document count (worst case is bounded by prefix-bucket skew, the
    * standard failure mode of prefix joins; raise `n` or `threshold` to
    * shrink buckets).
    */
  def jaccardPairs(
      df: DataFrame,
      textCol: String,
      idCol: String,
      n: Int = 3,
      threshold: Double = 0.5): DataFrame = {
    val spark = df.sparkSession

    val docs = graft.util.Partitioning.parallelize(df)
      .select(col(idCol).as("id"), TextFunctions.shingles(col(textCol), n).as("sh"))
      .filter(size(col("sh")) > 0)

    // Global rarest-first order = (document frequency asc, shingle asc).
    // The (df, s) struct itself is the sort key — no dense integer rank,
    // so no single-partition global window; both shuffles here are keyed
    // (groupBy s, groupBy id) and map-side combinable.
    val shingleDf = docs
      .select(explode(col("sh")).as("s"))
      .groupBy("s").agg(count(lit(1)).as("df"))

    val ranked = docs
      .select(col("id"), explode(col("sh")).as("s"))
      .join(shingleDf, "s")
      .groupBy("id")
      .agg(array_sort(collect_list(struct(col("df"), col("s")))).as("rsh"))
      .withColumn("sh", transform(col("rsh"), _.getField("s")))
      .withColumn("pfx", slice(col("rsh"), lit(1),
        (floor(size(col("rsh")) * (1 - threshold)) + 1).cast("int")))
      .select("id", "sh", "pfx")

    val ranked2 = ranked.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // Skinny candidate join: only (id, set-size, prefix-position,
    // prefix-shingle) rows travel. The shingle arrays re-attach per
    // surviving pair afterwards — dragging both arrays through the
    // join + distinct dominated the runtime of the first cut.
    //
    // Two lossless pruning predicates beyond the equi-join:
    //  - length filter: J(A,B) ≥ t requires min(|A|,|B|) ≥ t·max(|A|,|B|);
    //  - PPJoin positional filter: both sides' arrays share one global
    //    total order, so for a match at 0-based positions (pa, pb),
    //    |A∩B| ≤ min(pa,pb) + 1 + min(|A|−pa−1, |B|−pb−1) (common
    //    elements are before the match in both, the match, or after in
    //    both). J ≥ t ⟺ |A∩B| ≥ t(|A|+|B|)/(1+t); rows whose bound
    //    can't reach that die before the distinct. For a true pair the
    //    row of its first common prefix shingle always passes (its
    //    bound ≥ the actual overlap), so pair recall is exact; the ε
    //    absorbs float error in t·(sa+sb) — slack only ever ADMITS rows.
    // df ≥ 2 prune on both prefixes, lossless: any SHARED prefix
    // shingle is in ≥ 2 docs; df = 1 prefix rows can only self-join
    // (excluded by id_a < id_b anyway) — deleting them shrinks the
    // prefix index before the shuffle at no recall cost.
    val a = ranked2.select(col("id").as("id_a"), size(col("sh")).as("sz_a"),
      posexplode(col("pfx")).as(Seq("pa", "ps")))
      .filter(col("ps.df") >= 2)
      .withColumn("s", col("ps.s"))
    val b = ranked2.select(col("id").as("id_b"), size(col("sh")).as("sz_b"),
      posexplode(col("pfx")).as(Seq("pb", "ps")))
      .filter(col("ps.df") >= 2)
      .withColumn("s", col("ps.s"))
    val overlapBound = least(col("pa"), col("pb")) + lit(1) +
      least(col("sz_a") - col("pa") - 1, col("sz_b") - col("pb") - 1)
    val candidates = a.join(b, a("s") === b("s") && col("id_a") < col("id_b") &&
        col("sz_a") >= col("sz_b") * threshold &&
        col("sz_b") >= col("sz_a") * threshold &&
        overlapBound * (1 + threshold) >= (col("sz_a") + col("sz_b")) * threshold - lit(1e-9))
      .select("id_a", "id_b")
      .distinct()

    verifyPairs(candidates, ranked2.select(col("id"), col("sh")), threshold)
  }

  /** ASYMMETRIC containment pairs: C(A→B) = |A∩B| / |A| ≥ `threshold`
    * — the short-doc-inside-long-doc case symmetric Jaccard
    * structurally misses (a 50-token doc fully quoted inside a
    * 5000-token doc has J ≈ 0.01 but C = 1.0). The training-data use
    * is quote/boilerplate subsumption: drop A when some B contains
    * nearly all of it.
    *
    * Same lossless prefix discipline as [[jaccardPairs]], adapted to
    * the asymmetric overlap bound o ≥ ⌈t·|A|⌉:
    *  - only the PROBE side (A) explodes a prefix — its
    *    |A| − ⌈t·|A|⌉ + 1 rarest shingles (pigeonhole: B holding
    *    ≥ ⌈t·|A|⌉ of A's shingles must hit A's prefix);
    *  - the CANDIDATE side (B) explodes its FULL set (the inverted
    *    index — required for losslessness, and why containment costs
    *    more than Jaccard's prefix×prefix join);
    *  - length filter: |B| ≥ t·|A| (B can't contain what it can't
    *    hold); PPJoin positional bound as in [[jaccardPairs]], against
    *    t·|A|.
    * Exact verify computes |A∩B|/|A| on the carried sets. Pairs are
    * DIRECTED: (id_a, id_b, containment) means A's shingles sit in B;
    * both directions are evaluated independently.
    */
  def containmentPairs(
      df: DataFrame,
      textCol: String,
      idCol: String,
      n: Int = 3,
      threshold: Double = 0.6): DataFrame = {
    require(threshold > 0 && threshold <= 1, "threshold in (0, 1]")
    val docs = graft.util.Partitioning.parallelize(df)
      .select(col(idCol).as("id"), TextFunctions.shingles(col(textCol), n).as("sh"))
      .filter(size(col("sh")) > 0)

    val shingleDf = docs
      .select(explode(col("sh")).as("s"))
      .groupBy("s").agg(count(lit(1)).as("df"))

    val ranked = docs
      .select(col("id"), explode(col("sh")).as("s"))
      .join(shingleDf, "s")
      .groupBy("id")
      .agg(array_sort(collect_list(struct(col("df"), col("s")))).as("rsh"))
      .withColumn("sh", transform(col("rsh"), _.getField("s")))
      .withColumn("pfx", slice(col("rsh"), lit(1),
        (size(col("rsh")) - ceil(size(col("rsh")) * threshold) + 1).cast("int")))
      .select("id", "sh", "rsh", "pfx")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // df ≥ 2 prune on BOTH exploded sides, lossless: a shared shingle
    // is by definition in ≥ 2 docs, and the pigeonhole guarantees a
    // qualifying pair shares at least one PREFIX shingle — which is
    // shared, hence df ≥ 2, hence it survives the prune on both sides.
    // On a mostly-unique corpus this deletes the bulk of the inverted
    // index before the shuffle. Positions come from posexplode BEFORE
    // the prune, so the positional bound still refers to the full
    // order.
    val a = ranked.select(col("id").as("id_a"), size(col("sh")).as("sz_a"),
      posexplode(col("pfx")).as(Seq("pa", "ps")))
      .filter(col("ps.df") >= 2)
      .withColumn("s", col("ps.s"))
    val b = ranked.select(col("id").as("id_b"), size(col("sh")).as("sz_b"),
      posexplode(col("rsh")).as(Seq("pb", "ps")))
      .filter(col("ps.df") >= 2)
      .withColumn("s", col("ps.s"))
    val overlapBound = least(col("pa"), col("pb")) + lit(1) +
      least(col("sz_a") - col("pa") - 1, col("sz_b") - col("pb") - 1)
    val candidates = a.join(b, a("s") === b("s") && col("id_a") =!= col("id_b") &&
        col("sz_b") >= col("sz_a") * threshold - lit(1e-9) &&
        overlapBound >= col("sz_a") * threshold - lit(1e-9))
      .select("id_a", "id_b")
      .distinct()

    // Exact containment verify (join form; broadcast form not needed —
    // the directed candidate set is small by construction of t).
    val pairs = candidates
      .join(ranked.select(col("id").as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(ranked.select(col("id").as("id_b"), col("sh").as("sh_b")), "id_b")
      .withColumn("containment",
        round(size(array_intersect(col("sh_a"), col("sh_b"))).cast("double")
          / size(col("sh_a")), 6))
      .filter(col("containment") >= threshold)
      .select("id_a", "id_b", "containment")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Materialize the (small, t-bounded) pair set eagerly so the
    // expensive postings stage runs EXACTLY ONCE, then release the
    // big per-doc shingle cache — round-8 left `ranked` persisted
    // forever and recomputed the whole join for the survivors view.
    // The returned pairs stay persisted: every downstream view
    // ([[containmentSurvivors]], audits) derives from them without
    // touching the postings again; unpersist when done composing.
    pairs.count()
    ranked.unpersist()
    pairs
  }

  /** The survivors view of containment dedup: drop every document A
    * that is ≥ `threshold` contained in some LARGER document B
    * (more shingles; ties — exact duplicates have C = 1 both ways —
    * keep the smaller id). The canonical subsumption policy: quotes
    * and excerpts train zero times, their containers once. Chains
    * (A ⊂ B ⊂ C) resolve naturally — each doc loses independently to
    * its own container. One anti-join over the directed loser set;
    * the corpus itself never reshuffles.
    *
    * Pass `precomputedPairs` (the persisted output of
    * [[containmentPairs]] with the SAME df/n/threshold) to derive the
    * survivors without re-running the postings stage — the way a user
    * composing both views pays for the pair join once.
    */
  def containmentSurvivors(
      df: DataFrame,
      textCol: String,
      idCol: String,
      n: Int = 3,
      threshold: Double = 0.6,
      precomputedPairs: Option[DataFrame] = None): DataFrame = {
    val pairs = precomputedPairs
      .getOrElse(containmentPairs(df, textCol, idCol, n, threshold))
    val sizes = df
      .select(col(idCol).as("__sid"),
        size(TextFunctions.shingles(col(textCol), n)).as("__sz"))
    val losers = pairs
      .join(sizes.select(col("__sid").as("id_a"), col("__sz").as("__sza")), "id_a")
      .join(sizes.select(col("__sid").as("id_b"), col("__sz").as("__szb")), "id_b")
      .filter(col("__szb") > col("__sza") ||
        (col("__szb") === col("__sza") && col("id_b") < col("id_a")))
      .select(col("id_a"))
      .distinct()
    df.join(losers, df(idCol) === losers("id_a"), "left_anti")
  }

  /** Exact-Jaccard verification of candidate (id_a, id_b) pairs against
    * per-doc shingle sets — broadcast map-side under
    * [[BroadcastVerifyDocLimit]] docs, array-reattach joins above it.
    * Shared by [[jaccardPairs]] and [[MinHashLsh]].
    */
  private[dedup] def verifyPairs(
      candidates: DataFrame,
      sets: DataFrame, // (id, sh)
      threshold: Double): DataFrame = {
    val spark = candidates.sparkSession
    // One job sizes the broadcast decision by rows AND total shingles.
    val stats = sets.agg(count(lit(1)), sum(size(col("sh")))).head()
    val nDocs = stats.getLong(0)
    val nShingles = if (stats.isNullAt(1)) 0L else stats.getLong(1)
    if (nDocs <= BroadcastVerifyDocLimit && nShingles <= BroadcastVerifyShingleLimit) {
      val bcSets = spark.sparkContext.broadcast(
        sets.collect().map(r => r.get(0) -> r.getSeq[String](1).toSet).toMap)
      val schema = candidates.schema.add("jaccard", org.apache.spark.sql.types.DoubleType)
      val enc = org.apache.spark.sql.Encoders.row(schema)
      candidates.mapPartitions { it =>
        val m = bcSets.value
        it.flatMap { r =>
          (m.get(r.get(0)), m.get(r.get(1))) match {
            case (Some(a), Some(b)) =>
              val inter = a.count(b.contains).toDouble
              val raw = inter / (a.size + b.size - inter)
              val j = java.math.BigDecimal.valueOf(raw)
                .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
              if (j >= threshold) Some(org.apache.spark.sql.Row.fromSeq(r.toSeq :+ j)) else None
            case _ => None
          }
        }
      }(enc).select("id_a", "id_b", "jaccard")
    } else {
      candidates
        .join(sets.select(col("id").as("id_a"), col("sh").as("sh_a")), "id_a")
        .join(sets.select(col("id").as("id_b"), col("sh").as("sh_b")), "id_b")
        .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))).cast("double"))
        .withColumn("jaccard",
          round(col("inter") / (size(col("sh_a")) + size(col("sh_b")) - col("inter")), 6))
        .filter(col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    }
  }

  /** Character-edit-distance-verified near-dup pairs: token-n-gram
    * Jaccard ≥ `jaccardFloor` AND Levenshtein distance ≤
    * (distNum/distDen)·max(len) — the two-stage fuzzy dedup that
    * catches what each stage alone misses. Shingle Jaccard accepts
    * SUBSUMPTION pairs (a doc plus a big inserted block keeps Jaccard
    * = |A|/|B| high while the char distance is the whole insertion);
    * the edit stage rejects those. Conversely a pure edit-distance
    * join has no scale-safe blocking here — ed ≤ k blocking needs
    * PassJoin-style positional segments — so the Jaccard floor IS the
    * candidate generator and part of the operator's contract, served
    * by [[jaccardPairs]]'s lossless PPJoin prefix plan; the edit
    * verify is per-candidate O(len²), bounded by the candidate count,
    * with texts reattached by two keyed joins (bodies never enter the
    * candidate shuffle).
    *
    * The distance bound is the integer test dist·distDen ≤
    * max(len)·distNum — no float threshold to sit on a cross-engine
    * rounding boundary. Output is all-integer: (id_a, id_b, dist,
    * len_a, len_b); consumers derive the similarity.
    */
  def editVerifiedPairs(
      df: DataFrame,
      textCol: String,
      idCol: String,
      n: Int = 3,
      jaccardFloor: Double = 0.3,
      distNum: Int = 1,
      distDen: Int = 5): DataFrame = {
    require(distNum >= 0 && distDen > 0, "distance bound must be a ratio")
    val cand = jaccardPairs(df, textCol, idCol, n, jaccardFloor)
      .select("id_a", "id_b")
    val texts = df.select(col(idCol), col(textCol))
    cand
      .join(texts.select(col(idCol).as("id_a"), col(textCol).as("__ta")), "id_a")
      .join(texts.select(col(idCol).as("id_b"), col(textCol).as("__tb")), "id_b")
      .select(col("id_a"), col("id_b"),
        levenshtein(col("__ta"), col("__tb")).cast("long").as("dist"),
        length(col("__ta")).cast("long").as("len_a"),
        length(col("__tb")).cast("long").as("len_b"))
      .filter(col("dist") * distDen <= greatest(col("len_a"), col("len_b")) * distNum)
  }
}
