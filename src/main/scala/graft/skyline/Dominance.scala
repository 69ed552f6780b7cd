package graft.skyline

import org.apache.spark.sql.Column

/** Pareto-dominance primitives (MIN-convention vectors).
  *
  * Mirrors the reference's dominance library: `Point.dominates`
  * (Point.java:63-70) and the one-pass 3-way `Point.compare`
  * (Point.java:76-84). All vectors here are already normalized
  * (direction sign multiplied in), so "smaller is better" in every dim.
  */
object Dominance {

  /** One-pass 3-way comparison.
    * @return -1 if `a` dominates `b`; 1 if `b` dominates `a`;
    *         0 if incomparable (including equal vectors — ties kept).
    */
  def compare(a: Array[Double], b: Array[Double]): Int = {
    var aBetter = false
    var bBetter = false
    var i = 0
    val n = a.length
    while (i < n) {
      val x = a(i); val y = b(i)
      if (x < y) aBetter = true
      else if (x > y) bBetter = true
      i += 1
    }
    if (aBetter && !bBetter) -1
    else if (bBetter && !aBetter) 1
    else 0
  }

  /** Strict Pareto dominance: a <= b in all dims AND a < b in some dim. */
  def dominates(a: Array[Double], b: Array[Double]): Boolean =
    compare(a, b) == -1

  /** `a` weakly dominates `b`: a <= b in every dim (used for VPn bound
    * tests — GSkyMapper.java:91-93). */
  def weaklyDominates(a: Array[Double], b: Array[Double]): Boolean = {
    var i = 0
    val n = a.length
    while (i < n) {
      if (a(i) > b(i)) return false
      i += 1
    }
    true
  }

  /** Column form of strict dominance, for declarative (anti-join style)
    * skyline plans and for documentation of the SQL-expressible oracle:
    * `a` dominates `b` iff all(a_i <= b_i) and any(a_i < b_i).
    * Catalyst codegens this — it is a plain boolean expression tree.
    */
  def dominatesCol(a: Seq[Column], b: Seq[Column]): Column = {
    require(a.length == b.length)
    val le = a.zip(b).map { case (x, y) => x <= y }.reduce(_ && _)
    val lt = a.zip(b).map { case (x, y) => x < y }.reduce(_ || _)
    le && lt
  }
}
