package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Referential-integrity audit across a star/snowflake schema — the
  * warehouse gate that runs before anyone trusts a join: for each
  * declared FK edge child.key → parent.key, how many child rows point
  * at nothing? (Schema-on-read lakes have no enforced constraints, so
  * orphan counts ARE the constraint check.)
  *
  * Scale shape per edge: the child collapses to per-key counts FIRST
  * (one keyed aggregate), then a left-anti join of that ≤|distinct
  * keys| frame against the parent's distinct keys — child ROWS never
  * join anything, and a 100 TB fact table audits through its key
  * cardinality. Output: one row per FK edge, unioned.
  */
object FkAudit {

  /** One audit row: (fk, child_rows, null_keys, orphan_rows,
    * orphan_keys) for the edge child(childKey) → parent(parentKey).
    */
  def auditOne(fk: String, child: DataFrame, childKey: String,
      parent: DataFrame, parentKey: String): DataFrame = {
    val counts = child
      .select(col(childKey).as("__k"))
      .groupBy("__k").agg(count(lit(1)).as("__n"))
    val nulls = counts.where(col("__k").isNull)
      .select(coalesce(sum(col("__n")), lit(0L)).as("null_keys"))
    val orphans = counts.where(col("__k").isNotNull)
      .join(parent.select(col(parentKey).as("__k")).distinct(),
        Seq("__k"), "left_anti")
      .agg(coalesce(sum(col("__n")), lit(0L)).as("orphan_rows"),
        count(lit(1)).as("orphan_keys"))
    val total = counts
      .agg(coalesce(sum(col("__n")), lit(0L)).as("child_rows"))
    total.crossJoin(nulls).crossJoin(orphans)
      .select(lit(fk).as("fk"), col("child_rows"), col("null_keys"),
        col("orphan_rows"), col("orphan_keys"))
  }

  /** Audit of several FK edges: (name, child, childKey, parent,
    * parentKey) tuples → one row each.
    */
  def audit(edges: Seq[(String, DataFrame, String, DataFrame, String)]): DataFrame = {
    require(edges.nonEmpty, "at least one FK edge")
    edges.map { case (n, c, ck, p, pk) => auditOne(n, c, ck, p, pk) }
      .reduce(_.unionAll(_))
  }
}
