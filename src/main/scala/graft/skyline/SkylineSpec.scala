package graft.skyline

/** Per-column optimization direction for a skyline query.
  *
  * The reference engine hardcodes direction as a sign vector
  * (`value_type = {-1,...,1,...}`, Skyline.java:31) multiplied in at parse
  * time (Point.java:29) so all internal comparisons are MIN-convention.
  * We keep that normalize-at-ingest design but make it a runtime spec.
  */
sealed trait Direction extends Serializable { def sign: Double }
case object Min extends Direction { val sign = 1.0 }
case object Max extends Direction { val sign = -1.0 }

/** One skyline dimension: a column, a direction, and an optional
  * missing-value sentinel (reference: Range.java:20 — e.g. 9999.9 for
  * GSOD TEMP). Sentinel values are treated as NULL; rows with any NULL
  * dim are excluded from the skyline (the reference's Job-1 strict
  * `c_no_missing` notion, Map.java:15-17 — Job 2's parser skips the
  * check, an inconsistency we resolve in favor of the strict policy).
  */
final case class SkyDim(
    col: String,
    dir: Direction = Min,
    missing: Option[Double] = None)

/** A skyline query spec: the dimensions and their directions.
  *
  * Semantics (matching the reference, Point.java:63-70): strict Pareto
  * dominance — `a` dominates `b` iff `a` is no worse in every dim and
  * strictly better in at least one. Points with equal vectors are
  * incomparable and are BOTH kept.
  */
final case class SkylineSpec(dims: Seq[SkyDim]) {
  require(dims.nonEmpty, "skyline needs at least one dimension")
  def d: Int = dims.size
}

object SkylineSpec {
  def min(cols: String*): SkylineSpec = SkylineSpec(cols.map(SkyDim(_, Min)))
  def of(dims: (String, Direction)*): SkylineSpec =
    SkylineSpec(dims.map { case (c, dir) => SkyDim(c, dir) })
}
