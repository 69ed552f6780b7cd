package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Snapshot diff — the table-versioning primitive of a curated-corpus
  * warehouse: given two snapshots of the same keyed table, classify
  * every key as `added` (new only), `removed` (old only), or `changed`
  * (both, differing payload), with unchanged keys dropped. This is the
  * audit a pipeline runs between ingestion runs ("what did this crawl
  * refresh actually do?") and the input to incremental downstream
  * recompute (only `added`/`changed` keys need re-processing).
  *
  * Plan shape (the [[Upsert]] discipline — union + ONE keyed
  * aggregation, never a full-outer join): each side is reduced to
  * (key, side-tag, payload-hash) — a skinny projection, document
  * bodies never move — then a single groupBy(key) folds the two tags
  * into per-side hash slots and the change class falls out of
  * NULL-ness and hash equality. At 100 TB that is one shuffle of
  * (key + 32-byte hash) rows; a full-outer join would shuffle the
  * same bytes but pay join-state buffering, and MERGE-style
  * implementations rewrite data files this audit never touches.
  *
  * Contract: `keyCols` must be unique per snapshot (enforced — the
  * one-row-per-side fold is otherwise ill-defined, same loud-require
  * discipline as Upsert's version contract); payload comparison is
  * md5 over the concatenated `compareCols` with a NUL separator and a
  * NULL sentinel, so NULL vs empty-string differs and column
  * boundaries can't alias ("ab","c" vs "a","bc").
  */
object TableDiff {

  private def payloadHash(compareCols: Seq[String]): Column =
    md5(concat_ws("\u0000",
      compareCols.map(c => coalesce(col(c).cast("string"), lit("\u0001"))): _*))

  /** Rows (keyCols…, change, old_hash, new_hash) for every key whose
    * payload differs between snapshots; `change` ∈ added | removed |
    * changed. Hash columns are NULL on the absent side — downstream
    * consumers route on them (e.g. re-embed `added`+`changed` only).
    */
  def diff(
      oldSnap: DataFrame,
      newSnap: DataFrame,
      keyCols: Seq[String],
      compareCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "at least one key column")
    require(compareCols.nonEmpty, "at least one compare column")
    val keys = keyCols.map(col)

    def side(df: DataFrame, tag: String): DataFrame = {
      val g = df.groupBy(keys: _*)
        .agg(count(lit(1)).as("__n"), max(payloadHash(compareCols)).as("__h"))
      // Loud uniqueness contract: a duplicate key makes "the row for
      // this key" ill-defined on that side.
      g.select((keys :+
        when(col("__n") > 1,
          raise_error(concat(lit(s"TableDiff: duplicate key in $tag snapshot: "),
            concat_ws(",", keys: _*))))
          .otherwise(col("__h")).as("__h") :+
        lit(tag).as("__side")): _*)
    }

    side(oldSnap, "old").unionByName(side(newSnap, "new"))
      .groupBy(keys: _*)
      .agg(
        max(when(col("__side") === "old", col("__h"))).as("old_hash"),
        max(when(col("__side") === "new", col("__h"))).as("new_hash"))
      .withColumn("change",
        when(col("old_hash").isNull, lit("added"))
          .when(col("new_hash").isNull, lit("removed"))
          .when(col("old_hash") =!= col("new_hash"), lit("changed")))
      .filter(col("change").isNotNull)
  }
}
