package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hierarchical (BOM-style) subtree rollup for FORMULA hierarchies —
  * trees whose parent is computable from the key (fixed-fanout id
  * spaces, materialized-path prefixes, org codes): every node's
  * subtree total of every descendant's measures.
  *
  * The naive plan is a recursive self-join per level (depth × shuffle
  * × join). Because parent(k) = k DIV fanout is a formula, the
  * ancestor CLOSURE of a row is a ≤`levels`-element array computed in
  * the row itself — so the whole rollup is explode(ancestors) → ONE
  * keyed aggregate. Closure size is depth × |rows|, the shuffle key
  * is the ancestor id, and nothing iterates. The same shape covers
  * path-prefix hierarchies (explode the prefixes) — the formula is
  * the point, not the base 7.
  */
object Hierarchy {

  /** Distinct ancestor ids of `node` under parent(k) = k DIV fanout
    * (self included; root 0 always present once `levels` clears the
    * id space: fanout^levels > max id). Non-negative ids only;
    * node/fanout^j stays double-exact below 2^53. */
  def ancestors(node: Column, fanout: Int, levels: Int): Column = {
    require(fanout >= 2 && levels >= 1)
    array_distinct(array((0 until levels).map { j =>
      val f = math.pow(fanout, j).toLong
      floor(node / lit(f)).cast("long")
    }: _*))
  }

  /** Subtree rollup: one row per ancestor with the count of
    * measure-carrying descendant nodes (self included) and the sums
    * of `measures`. ONE explode + ONE keyed aggregate. */
  def rollup(nodeValues: DataFrame, nodeCol: String, fanout: Int,
      levels: Int, measures: Seq[String]): DataFrame = {
    val a = nodeValues.select(
      explode(ancestors(col(nodeCol), fanout, levels)).as("anc") +:
        measures.map(col): _*)
    val aggs = count(lit(1)).as("n_desc") +:
      measures.map(m => sum(col(m)).as(s"subtree_$m"))
    a.groupBy("anc").agg(aggs.head, aggs.tail: _*)
  }
}
