package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Latest-version-wins merge of a change batch into a base table — the
  * MERGE INTO / CDC-apply shape every incrementally-maintained corpus
  * needs (re-crawled documents replacing stale rows, label fixes
  * landing over training shards).
  *
  * Execution: union the two inputs (no join) and keep the max-version
  * row per key with one keyed window pass — a single shuffle on the
  * key, map-side-combinable nothing-else. At 100 TB the updates batch
  * is typically ≪ base; the union keeps base unshuffled columns
  * untouched and the window's partial sort is per-key (bounded by the
  * duplicate count per key, usually 2).
  *
  * Determinism contract: `versionCol` must be a total order per key
  * (unique within a key) — ties would make the survivor
  * partitioning-dependent, so prefer a unique change id (the
  * q_upsert oracle versions updates by order key, base rows by −1).
  */
object Upsert {

  /** Rows of `base ∪ updates` keeping, per `keyCols`, only the row
    * with the highest `versionCol`. Inputs must be union-compatible
    * by name.
    */
  def latestWins(
      base: DataFrame,
      updates: DataFrame,
      keyCols: Seq[String],
      versionCol: String): DataFrame = {
    require(keyCols.nonEmpty, "at least one key column")
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(versionCol).desc)
    base.unionByName(updates)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Full CDC apply: like [[latestWins]] but `changes` also carries
    * `opCol` — 'I'/'U' upsert the row, 'D' is a delete tombstone. The
    * HIGHEST-version change per key decides the key's fate: a winning
    * tombstone erases the key (base row included); a later re-insert
    * naturally resurrects it, because only the winner is consulted —
    * the standard latest-wins CDC semantics (Debezium-style op
    * streams). Same single keyed-window shuffle as [[latestWins]]; no
    * join, tombstones never fan out.
    */
  def applyCdc(
      base: DataFrame,
      changes: DataFrame,
      keyCols: Seq[String],
      versionCol: String,
      opCol: String): DataFrame = {
    require(keyCols.nonEmpty, "at least one key column")
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(versionCol).desc)
    base.withColumn(opCol, lit("I"))
      .unionByName(changes)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 && col(opCol) =!= "D")
      .drop("__rn", opCol)
  }

  /** NET-CHANGE COLLAPSE of a CDC batch (the Debezium-consumer /
    * MERGE-writer primitive that minimizes write amplification):
    * per key, the batch's first and last ops decide its net effect —
    * first=I & last=D → `none` (the key flickered into and out of
    * existence inside the batch); last=D otherwise → net `delete`;
    * last≠D & first=I → net `insert` carrying the LAST payload;
    * otherwise → net `update` with the last payload. One keyed
    * min/max-struct aggregate — no window, no sort, tombstones never
    * fan out; a 10⁶-change batch touching 10³ keys shrinks to ≤10³
    * writes before it ever reaches the table.
    *
    * Output: keyCols + net_op + the last payload columns (NULL
    * payload on `delete`/`none` rows).
    */
  def netChanges(
      changes: DataFrame,
      keyCols: Seq[String],
      versionCol: String,
      opCol: String,
      payloadCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "at least one key column")
    val firstOp = min(struct(col(versionCol), col(opCol))).as("__f")
    val lastRow = max(struct(col(versionCol) +: col(opCol) +:
      payloadCols.map(col): _*)).as("__l")
    val g = changes.groupBy(keyCols.map(col): _*).agg(firstOp, lastRow)
    val fOp = col("__f").getField(opCol)
    val lOp = col("__l").getField(opCol)
    val netOp = when(fOp === "I" && lOp === "D", "none")
      .when(lOp === "D", "delete")
      .when(fOp === "I", "insert")
      .otherwise("update")
    g.select(keyCols.map(col) ++ Seq(netOp.as("net_op")) ++
      payloadCols.map(p =>
        when(netOp.isin("insert", "update"), col("__l").getField(p))
          .as(p)): _*)
  }
}
