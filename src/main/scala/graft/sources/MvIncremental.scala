package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** INCREMENTAL materialized-view maintenance over the commit log —
  * the missing half of [[graft.plans.MvRewrite]] (which only READS a
  * summary someone else keeps fresh): fold the base-table rows
  * committed since the last refresh into the summary's partial
  * aggregates, as ONE transactional swap of the summary table,
  * exactly-once via the same txn-embedded cursor [[TableFeed]] uses
  * (re-running a refresh after a crash or a duplicate trigger is a
  * no-op; the cursor IS the published summary version's txn id).
  *
  * The partial-aggregate algebra is count/sum re-association (counts
  * and integral sums merge exactly — the [[graft.plans.MvDef]]
  * contract), so a refresh costs one scan of the DELTA plus one
  * |groups|-sized fold of the old summary — never a base rescan. At
  * 100 TB base / 10⁵ groups that is the difference between an MV you
  * refresh per commit and one you rebuild nightly.
  *
  * Append-only contract, enforced LOUDLY: a version range containing
  * a file-REMOVING commit (compaction is safe to skip, but
  * replaceWhere / CDC swaps CHANGE state invisibly to an append walk)
  * or a delete-file add (MoR position/equality deletes) throws
  * [[NonAppendOnlyRangeException]] rather than publish a silently
  * stale summary — the remediation is [[applyChanges]] (signed CDC
  * fold) or a full [[rebuild]]. This is stricter than
  * [[TableFeed.syncOnce]], whose skip-rewrites rule is right for a
  * row FEED but wrong for an AGGREGATE.
  */
object MvIncremental {

  final class NonAppendOnlyRangeException(
      table: String, version: Long, why: String)
    extends IllegalStateException(
      s"incremental MV refresh needs an append-only range, but $table " +
        s"version $version $why — fold a change feed with applyChanges, " +
        "or rebuild(...) from the head snapshot")

  private def tag(feedTag: String) = s"mv-$feedTag"

  /** The base version already folded into `summary` (0 = none). */
  def refreshedThrough(spark: SparkSession, summary: String,
      feedTag: String): Long =
    TableFeed.cursor(spark, summary, tag(feedTag))

  /** The MV's partial-aggregate families: count, sums, and (append-
    * only-foldable) mins/maxes, each base measure → summary column. */
  final case class MvAggs(
      cntCol: String,
      sumCols: Map[String, String],
      minCols: Map[String, String] = Map.empty,
      maxCols: Map[String, String] = Map.empty)

  private def partials(df: DataFrame, groupCols: Seq[String],
      a: MvAggs): DataFrame = {
    val aggs: Seq[Column] = count(lit(1)).as(a.cntCol) +:
      (a.sumCols.toSeq.sortBy(_._1).map { case (m, out) => sum(col(m)).as(out) } ++
        a.minCols.toSeq.sortBy(_._1).map { case (m, out) => min(col(m)).as(out) } ++
        a.maxCols.toSeq.sortBy(_._1).map { case (m, out) => max(col(m)).as(out) })
    df.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Merge `delta` (already partial-aggregated, summary-schema) into
    * the summary as one txn-idempotent swap: counts/sums re-sum,
    * mins/maxes re-min/re-max. */
  private def mergePartials(spark: SparkSession, summary: String,
      delta: DataFrame, groupCols: Seq[String], a: MvAggs,
      txn: String, dropEmpty: Boolean): Long =
    CommitLog.findTxn(spark, summary, txn).getOrElse {
      val merged = CommitLog.currentVersion(spark, summary) match {
        case None => delta
        case Some(_) =>
          val aggs: Seq[Column] = sum(col(a.cntCol)).as(a.cntCol) +:
            (a.sumCols.values.toSeq.sorted.map(c => sum(col(c)).as(c)) ++
              a.minCols.values.toSeq.sorted.map(c => min(col(c)).as(c)) ++
              a.maxCols.values.toSeq.sorted.map(c => max(col(c)).as(c)))
          CommitLog.read(spark, summary).unionByName(delta)
            .groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
      }
      val kept = if (dropEmpty) merged.filter(col(a.cntCol) =!= 0L) else merged
      val staged = CommitLog.stage(spark, kept, summary)
      val live = CommitLog.currentVersion(spark, summary)
        .map(v => CommitLog.liveFiles(spark, summary, v)).getOrElse(Seq.empty)
      // rewrite, not commit: a racing refresher must conflict, not
      // silently re-add rows beside the winner's summary.
      CommitLog.rewrite(spark, summary, adds = staged, removes = live,
        txn = txn)
    }

  /** One refresh round: fold everything `base` appended in
    * (cursor, head] into `summary`. Returns the consumed range, or
    * None when already caught up. First refresh (cursor 0) builds the
    * summary from the head snapshot. */
  def refresh(
      spark: SparkSession,
      base: String,
      summary: String,
      feedTag: String,
      groupCols: Seq[String],
      cntCol: String,
      sumCols: Map[String, String],
      minCols: Map[String, String] = Map.empty,
      maxCols: Map[String, String] = Map.empty,
      /** Boolean SQL over base columns for a FILTERED MV (the
        * [[graft.plans.MvDef.predicateSql]] contract): only rows
        * satisfying it are folded — the summary materializes the
        * predicate slice. Must match the MvDef the rewrite rule
        * consults, exactly as groupCols/sumCols must. */
      predicateSql: String = ""): Option[(Long, Long)] = {
    val a = MvAggs(cntCol, sumCols, minCols, maxCols)
    val head = CommitLog.currentVersion(spark, base).getOrElse(return None)
    val from = refreshedThrough(spark, summary, feedTag)
    if (head <= from) return None
    val root = CommitLog.dataRoot(base)
    val added: Seq[String] =
      if (from == 0L) {
        val m = CommitLog.readManifest(spark, base, head)
        requireNoDeleteFiles(base, head, m.files)
        m.files
      } else {
        var prev = CommitLog.readManifest(spark, base, from).files.toSet
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        ((from + 1) to head).foreach { v =>
          val m = CommitLog.readManifest(spark, base, v)
          val cur = m.files.toSet
          if (!prev.forall(cur))
            throw new NonAppendOnlyRangeException(base, v,
              "removed live files (compaction/replaceWhere/CDC swap)")
          val adds = m.files.filterNot(prev)
          requireNoDeleteFiles(base, v, adds)
          out ++= adds
          prev = cur
        }
        out.toSeq
      }
    def sliced(df: DataFrame): DataFrame =
      if (predicateSql.isEmpty) df else df.filter(expr(predicateSql))
    val delta =
      if (added.nonEmpty)
        partials(sliced(spark.read.parquet(
          added.map(f => s"$root/$f"): _*)), groupCols, a)
      else { // e.g. schema-only commits in range: cursor still advances
        partials(sliced(CommitLog.read(spark, base).limit(0)), groupCols, a)
      }
    mergePartials(spark, summary, delta, groupCols, a,
      s"feed:${tag(feedTag)}:$from-$head", dropEmpty = false)
    Some((from, head))
  }

  private def requireNoDeleteFiles(base: String, v: Long,
      files: Seq[String]): Unit = {
    val del = files.filter(f =>
      f.startsWith("posdel-") || f.startsWith("deletes-"))
    if (del.nonEmpty)
      throw new NonAppendOnlyRangeException(base, v,
        s"added ${del.size} delete file(s) (merge-on-read delete debt)")
  }

  /** Fold one STREAMING micro-batch of raw base rows into the summary
    * — the `foreachBatch` body that keeps an MV fresh as a
    * [[TableFeedSource]] stream lands (the kappa-style MV loop):
    * partial-aggregate the batch, merge, one txn-idempotent swap.
    * Exactly-once twice over: Spark's checkpoint replays a batch only
    * after a crash, and a replayed (txn-duplicate) fold is a no-op.
    * Append-only rows in, by the feed source's own contract. */
  def foldBatch(
      spark: SparkSession,
      summary: String,
      batch: DataFrame,
      txn: String,
      groupCols: Seq[String],
      cntCol: String,
      sumCols: Map[String, String],
      minCols: Map[String, String] = Map.empty,
      maxCols: Map[String, String] = Map.empty): Long = {
    val a = MvAggs(cntCol, sumCols, minCols, maxCols)
    mergePartials(spark, summary, partials(batch, groupCols, a),
      groupCols, a, txn, dropEmpty = false)
  }

  /** Fold a SIGNED change feed (insert/delete rows, the
    * [[MorTable.changeFeed]] shape) into the summary: deletes subtract
    * what inserts added, groups whose count reaches zero are dropped.
    * The caller owns the cursor (pass a txn unique per consumed range
    * — duplicate txns are no-ops, preserving exactly-once). An update
    * flows as its delete+insert pair. Counts and sums only: a deleted
    * row can't un-take a MIN/MAX (non-invertible), so min/max MVs
    * refuse this path and rebuild instead. */
  def applyChanges(
      spark: SparkSession,
      summary: String,
      changes: DataFrame,
      txn: String,
      groupCols: Seq[String],
      cntCol: String,
      sumCols: Map[String, String],
      changeTypeCol: String = "_change_type"): Long = {
    // A summary carrying columns beyond (groups, count, sums) holds
    // partials this signed fold cannot maintain — min/max most of
    // all. Refuse before touching it.
    CommitLog.currentVersion(spark, summary).foreach { v =>
      val known = (groupCols :+ cntCol) ++ sumCols.values
      val extra = CommitLog.readVersion(spark, summary, v)
        .schema.fieldNames.filterNot(known.contains)
      require(extra.isEmpty,
        s"summary $summary carries non-invertible partials " +
          s"${extra.toSeq.sorted} — a delete cannot un-take a min/max; " +
          "rebuild(...) instead of applyChanges")
    }
    val sign = when(col(changeTypeCol) === "delete", lit(-1L)).otherwise(lit(1L))
    val aggs: Seq[Column] = sum(sign).as(cntCol) +:
      sumCols.toSeq.sortBy(_._1).map { case (m, out) =>
        sum(sign * col(m)).as(out)
      }
    val delta = changes.groupBy(groupCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
    mergePartials(spark, summary, delta, groupCols,
      MvAggs(cntCol, sumCols), txn, dropEmpty = true)
  }

  /** Full rebuild from the base head (the refusal's remediation):
    * recompute every partial from the CURRENT table read — which,
    * unlike the incremental walk, sees through deletes and rewrites —
    * and swap it in with the cursor advanced to head. */
  def rebuild(
      spark: SparkSession,
      base: String,
      summary: String,
      feedTag: String,
      groupCols: Seq[String],
      cntCol: String,
      sumCols: Map[String, String],
      minCols: Map[String, String] = Map.empty,
      maxCols: Map[String, String] = Map.empty): Long = {
    val head = CommitLog.currentVersion(spark, base).getOrElse(
      throw new IllegalArgumentException(s"no committed version at $base"))
    mergeReplace(spark, summary,
      partials(CommitLog.read(spark, base), groupCols,
        MvAggs(cntCol, sumCols, minCols, maxCols)),
      s"feed:${tag(feedTag)}:rebuild-$head")
  }

  private def mergeReplace(spark: SparkSession, summary: String,
      fresh: DataFrame, txn: String): Long =
    CommitLog.findTxn(spark, summary, txn).getOrElse {
      val staged = CommitLog.stage(spark, fresh, summary)
      val live = CommitLog.currentVersion(spark, summary)
        .map(v => CommitLog.liveFiles(spark, summary, v)).getOrElse(Seq.empty)
      CommitLog.rewrite(spark, summary, adds = staged, removes = live,
        txn = txn)
    }
}
