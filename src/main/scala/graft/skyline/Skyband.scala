package graft.skyline

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._

/** Skyline-family extensions beyond plain dominance: the k-skyband,
  * top-k dominating, and k-dominant skyline queries of the same
  * literature the reference implements (SKY-MR, Park/Min/Shim PVLDB'13,
  * cites the skyband/top-k-dominating family of Papadias et al. TODS'05
  * and the k-dominant relaxation of Chan et al. SIGMOD'06). The
  * reference itself ships only the plain forward skyline
  * (Skyline.java / GlobalSkyline.java); these are the standard
  * companion queries a skyline engine is expected to answer.
  *
  * All three share one scale shape:
  *
  *   phase 1 — embarrassingly parallel per-partition candidate prune
  *             (no shuffle; SFS-sorted, so dominators precede victims);
  *   phase 2 — the small candidate set is broadcast and verified /
  *             counted against ONE streamed pass over the full input,
  *             map-side partial-aggregated down to |candidates| rows.
  *
  * Nothing ever materializes an n×n pair set, and the only driver-side
  * state is the broadcast candidate relation (bounded by the skyband
  * size, the same assumption every skyline merge in this repo makes —
  * guarded by [[Gsky.DefaultMaxBufferSize]]-style caps in phase 1).
  */
object Skyband {

  import SkylineOp.SKY

  private val CID = "__graft_cid"
  private val QV = "__graft_qv"

  /** Per-partition k-skyband prune: keep a point iff it is dominated by
    * fewer than k already-kept points. Sound and complete *locally*
    * because the input arrives SFS-sorted (every dominator precedes its
    * victims, so kept points never gain dominators later) and because a
    * dropped dominator q of p always stands in for ≥ k kept dominators
    * of q, which by transitivity also dominate p — so counting only
    * kept points never under-counts past k. Globally it is a sound
    * over-approximation: local dominators are a subset of global ones.
    */
  private[skyline] def localSkyband(rows: Iterator[Row], skyIdx: Int, k: Int,
      cap: Int = Gsky.DefaultMaxBufferSize): Iterator[Row] = {
    val kept = ArrayBuffer.empty[(Array[Double], Row)]
    rows.flatMap { r =>
      val v = Gsky.vecOf(r, skyIdx)
      var c = 0
      var i = 0
      while (i < kept.length && c < k) {
        if (Dominance.dominates(kept(i)._1, v)) c += 1
        i += 1
      }
      if (c >= k) None
      else {
        if (kept.length >= cap) throw new IllegalStateException(
          s"local k-skyband buffer exceeded $cap points — anti-correlated " +
            "input; raise the cap explicitly if such an output is intended")
        kept += ((v, r))
        Some(r)
      }
    }
  }

  /** Phase-1 candidates with a stable synthetic id. Eagerly
    * local-checkpointed: the synthetic ids must not be recomputed
    * between the two consumers (broadcast probe side and final join) —
    * a lazy cache could be evicted and reassign them — and the
    * checkpoint blocks are released by the ContextCleaner when the
    * frame is garbage-collected (no manual unpersist contract to leak,
    * the GlobalRank round-8 lesson).
    */
  private def candidates(df: DataFrame, spec: SkylineSpec, k: Int): DataFrame = {
    val prep = graft.util.Partitioning.parallelize(SkylineOp.prepare(df, spec))
    val enc = Encoders.row(prep.schema)
    val skyIdx = prep.schema.fieldIndex(SKY)
    SkylineOp.sfsSorted(prep)
      .mapPartitions((it: Iterator[Row]) => localSkyband(it, skyIdx, k))(enc)
      .withColumn(CID, monotonically_increasing_id())
      .localCheckpoint()
  }

  /** Exact per-candidate global dominator count: one streamed pass of
    * the full input against the broadcast candidates; the
    * BroadcastNestedLoopJoin's output is pipelined straight into a
    * map-side partial count, so only |candidates| (cid, count) rows
    * ever shuffle. Join fan-out is bounded: every candidate survived a
    * per-partition <k prune, so it has < k·numPartitions dominators.
    */
  private def dominatorCounts(df: DataFrame, spec: SkylineSpec,
      cands: DataFrame): DataFrame = {
    val probes = SkylineOp.prepare(df, spec).select(col(SKY).as(QV))
    probes
      .join(broadcast(cands.select(col(CID), col(SKY))),
        DominatesExpr(col(QV), col(SKY)))
      .groupBy(CID).agg(count(lit(1)).as("__dom"))
  }

  /** k-skyband: all points dominated by fewer than k other points
    * (k = 1 degenerates to the plain skyline). Output = input columns
    * plus `dom_count`, the exact number of dominators.
    */
  def kSkyband(df: DataFrame, spec: SkylineSpec, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val cands = candidates(df, spec, k)
    val counts = dominatorCounts(df, spec, cands)
    val out = cands.join(counts, Seq(CID), "left")
      .withColumn("dom_count", coalesce(col("__dom"), lit(0L)))
      .filter(col("dom_count") < k)
      .drop(CID, SKY, "__dom")
    out
  }

  /** Top-k dominating (Papadias et al.): the k points with the largest
    * dominance score = |{q : p dominates q}|. Candidate soundness: if p
    * is dominated by j points then each dominator's score strictly
    * exceeds p's (it dominates everything p does, plus p itself —
    * transitivity), so the answer set is always inside the k-skyband.
    * Scoring streams the full input once against the broadcast
    * candidates; ties at the cut are broken by `tieBreak` ascending, so
    * the result is deterministic.
    */
  def topKDominating(df: DataFrame, spec: SkylineSpec, k: Int,
      tieBreak: Seq[String]): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val cands = candidates(df, spec, k)
    val probes = SkylineOp.prepare(df, spec).select(col(SKY).as(QV))
    // candidate dominates probe — the mirror of dominatorCounts.
    val scores = probes
      .join(broadcast(cands.select(col(CID), col(SKY))),
        DominatesExpr(col(SKY), col(QV)))
      .groupBy(CID).agg(count(lit(1)).as("score"))
    val ordered = cands.join(scores, Seq(CID), "left")
      .withColumn("score", coalesce(col("score"), lit(0L)))
      .drop(CID, SKY)
    ordered.orderBy(col("score").desc +: tieBreak.map(col(_).asc): _*).limit(k)
  }

  /** Column predicate: candidate vector `c` is k-dominated by probe
    * vector `q` — q better-or-equal in at least k dims and strictly
    * better in at least one (any k-subset of the ≤-dims containing the
    * strict dim witnesses Chan et al.'s definition, so the subset
    * quantifier reduces to these two counts). Plain codegen'd HOFs over
    * the normalized MIN-convention vectors.
    */
  private[skyline] def kDominatedCol(q: Column, c: Column, k: Int): Column = {
    val le = aggregate(zip_with(q, c, (x, y) => (x <= y).cast("int")),
      lit(0), (acc, x) => acc + x)
    val lt = aggregate(zip_with(q, c, (x, y) => (x < y).cast("int")),
      lit(0), (acc, x) => acc + x)
    le >= k && lt >= 1
  }

  /** k-dominant skyline (Chan et al. SIGMOD'06): points not k-dominated
    * by any other point. k < d relaxes dominance (more dominators →
    * smaller answer); k = d is the plain skyline. k-dominance is not
    * transitive, so phase 1 cannot prune with it — but the answer set
    * is provably inside the PLAIN skyline (full dominance implies
    * k-dominance), which IS transitively prunable. So: plain skyline
    * candidates, then one streamed verification pass of the full input
    * against the broadcast candidates, map-side-deduped to the set of
    * k-dominated candidate ids, anti-joined away.
    */
  def kDominantSkyline(df: DataFrame, spec: SkylineSpec, k: Int): DataFrame = {
    val d = spec.dims.length
    require(k >= 1 && k <= d, s"k must be in [1, $d], got $k")
    val cands = candidates(df, spec, 1)
    val probes = SkylineOp.prepare(df, spec).select(col(SKY).as(QV))
    val dominated = probes
      .join(broadcast(cands.select(col(CID), col(SKY))),
        kDominatedCol(col(QV), col(SKY), k))
      .select(CID).distinct()
    cands.join(dominated, Seq(CID), "left_anti").drop(CID, SKY)
  }

  /** Multi-k [[kDominantSkyline]] (r16 optimization): ONE phase-1
    * candidate pass and ONE streamed verification serve EVERY k in
    * `ks`, where separate calls would repeat both. Soundness of the
    * sharing: for a (probe q, candidate c) pair with a strict-better
    * dim, q k-dominates c for every k ≤ |{i : q_i ≤ c_i}| — so the
    * verification join retains pairs under the WEAKEST condition
    * (min k) and keeps, per candidate, the MAX ≤-count; candidate c
    * is k-dominated iff that max reaches k. Output = the per-k
    * results unioned in `ks` order, each tagged by an appended `k`
    * column — row-identical to unioning individual
    * [[kDominantSkyline]] calls (KDominantSpec pins it).
    */
  def kDominantSkylines(df: DataFrame, spec: SkylineSpec,
      ks: Seq[Int]): DataFrame = {
    val d = spec.dims.length
    require(ks.nonEmpty, "at least one k")
    ks.foreach(k => require(k >= 1 && k <= d, s"k must be in [1, $d], got $k"))
    val kmin = ks.min
    val cands = candidates(df, spec, 1)
    val probes = SkylineOp.prepare(df, spec).select(col(SKY).as(QV))
    val le = aggregate(
      zip_with(col(QV), col(SKY), (x, y) => (x <= y).cast("int")),
      lit(0), (acc, x) => acc + x)
    val maxLe = probes
      .join(broadcast(cands.select(col(CID), col(SKY))),
        kDominatedCol(col(QV), col(SKY), kmin))
      .select(col(CID), le.as("__le"))
      .groupBy(CID).agg(max(col("__le")).as("__maxle"))
      .localCheckpoint() // two+ consumers; phase 2 must run once
    ks.map { k =>
      val dominated = maxLe.filter(col("__maxle") >= k).select(CID)
      cands.join(dominated, Seq(CID), "left_anti").drop(CID, SKY)
        .withColumn("k", lit(k))
    }.reduce(_ unionAll _)
  }
}
