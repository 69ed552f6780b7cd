package graft.plans

import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{
  And, AttributeReference, EqualNullSafe, EqualTo, Expression,
  GreaterThan, GreaterThanOrEqual, In, IsNotNull, LessThan,
  LessThanOrEqual, Literal}

import graft.util.Utf8Order

/** Conjunctive-range predicate implication — the subsumption test
  * behind the filtered-MV rewrite ([[MvRewrite]]): does every row
  * satisfying the QUERY predicate satisfy the MV's stored predicate?
  *
  * Both predicates are modeled as per-column closed/open INTERVALS
  * over a per-column domain (integral/temporal longs, or strings in
  * UTF-8 binary order — the [[ZoneEval]] discipline). The query side
  * is parsed LENIENTLY: an unparseable CONJUNCT only strengthens the
  * query, so ignoring it is sound (the full predicate is still
  * re-applied as the residual filter). The MV side is parsed
  * STRICTLY: an unparseable conjunct there means the implication
  * cannot be proven — the rewrite declines, which only costs the
  * optimization. OR/NOT on either side declines.
  *
  * `IN (…)` on the query side collapses to its envelope interval —
  * exact for implication INTO an interval constraint, since an
  * interval contains a finite set iff it contains its extremes.
  */
private[plans] object PredImply {

  /** A domain value: integral long or UTF-8-ordered string. */
  sealed trait V { def cmp(o: V): Int }
  private final case class VL(v: Long) extends V {
    def cmp(o: V): Int = o match {
      case VL(w) => java.lang.Long.compare(v, w)
      case _ => throw new IllegalStateException("mixed domains")
    }
  }
  private final case class VS(v: String) extends V {
    def cmp(o: V): Int = o match {
      case VS(w) => Utf8Order.compare(v, w)
      case _ => throw new IllegalStateException("mixed domains")
    }
  }

  /** [lo, hi] with per-bound inclusivity; None = unbounded. */
  final case class Iv(
      lo: Option[(V, Boolean)], hi: Option[(V, Boolean)]) {
    def intersect(o: Iv): Iv = {
      def tightLo(a: Option[(V, Boolean)], b: Option[(V, Boolean)]) =
        (a, b) match {
          case (None, x) => x
          case (x, None) => x
          case (Some((av, ai)), Some((bv, bi))) =>
            val c = av.cmp(bv)
            if (c > 0) a else if (c < 0) b else Some((av, ai && bi))
        }
      def tightHi(a: Option[(V, Boolean)], b: Option[(V, Boolean)]) =
        (a, b) match {
          case (None, x) => x
          case (x, None) => x
          case (Some((av, ai)), Some((bv, bi))) =>
            val c = av.cmp(bv)
            if (c < 0) a else if (c > 0) b else Some((av, ai && bi))
        }
      Iv(tightLo(lo, o.lo), tightHi(hi, o.hi))
    }

    /** this ⊆ o (every value in this interval lies in o). */
    def within(o: Iv): Boolean = {
      val loOk = o.lo.forall { case (ov, oi) =>
        lo.exists { case (v, i) =>
          val c = v.cmp(ov)
          c > 0 || (c == 0 && (oi || !i))
        }
      }
      val hiOk = o.hi.forall { case (ov, oi) =>
        hi.exists { case (v, i) =>
          val c = v.cmp(ov)
          c < 0 || (c == 0 && (oi || !i))
        }
      }
      loOk && hiOk
    }
  }

  private val Full = Iv(None, None)

  private def nameOf(e: Expression): Option[String] = e match {
    case a: AttributeReference => Some(a.name.toLowerCase)
    case u: UnresolvedAttribute => Some(u.nameParts.last.toLowerCase)
    case _ => None
  }

  private def valOf(l: Literal): Option[V] =
    ZoneEval.asLong(l).map(VL(_): V)
      .orElse(ZoneEval.asStr(l).map(VS(_): V))

  /** Per-column interval map of a conjunction, or None when the shape
    * cannot be modeled soundly. `lenient` ignores unknown conjuncts
    * (query side); strict mode fails on them (MV side). */
  def intervals(e: Expression, lenient: Boolean)
      : Option[Map[String, Iv]] = {
    def merge(a: Map[String, Iv], b: Map[String, Iv]): Map[String, Iv] =
      (a.keySet ++ b.keySet).map { k =>
        k -> a.getOrElse(k, Full).intersect(b.getOrElse(k, Full))
      }.toMap
    def leaf(c: String, iv: Iv) = Some(Map(c -> iv))
    def pt(v: V) = Iv(Some((v, true)), Some((v, true)))
    e match {
      case And(l, r) =>
        for (a <- intervals(l, lenient); b <- intervals(r, lenient))
          yield merge(a, b)
      case EqualTo(a, l: Literal) if nameOf(a).isDefined =>
        valOf(l) match {
          case Some(v) => leaf(nameOf(a).get, pt(v))
          case None => if (lenient) Some(Map.empty) else None
        }
      case EqualTo(l: Literal, a) if nameOf(a).isDefined =>
        intervals(EqualTo(a, l), lenient)
      case EqualNullSafe(a, l: Literal)
          if nameOf(a).isDefined && l.value != null =>
        intervals(EqualTo(a, l), lenient)
      case GreaterThan(a, l: Literal) if nameOf(a).isDefined =>
        valOf(l) match {
          case Some(v) => leaf(nameOf(a).get, Iv(Some((v, false)), None))
          case None => if (lenient) Some(Map.empty) else None
        }
      case GreaterThan(l: Literal, a) if nameOf(a).isDefined => // v > a
        intervals(LessThan(a, l), lenient)
      case GreaterThanOrEqual(a, l: Literal) if nameOf(a).isDefined =>
        valOf(l) match {
          case Some(v) => leaf(nameOf(a).get, Iv(Some((v, true)), None))
          case None => if (lenient) Some(Map.empty) else None
        }
      case GreaterThanOrEqual(l: Literal, a) if nameOf(a).isDefined =>
        intervals(LessThanOrEqual(a, l), lenient)
      case LessThan(a, l: Literal) if nameOf(a).isDefined =>
        valOf(l) match {
          case Some(v) => leaf(nameOf(a).get, Iv(None, Some((v, false))))
          case None => if (lenient) Some(Map.empty) else None
        }
      case LessThan(l: Literal, a) if nameOf(a).isDefined => // v < a
        intervals(GreaterThan(a, l), lenient)
      case LessThanOrEqual(a, l: Literal) if nameOf(a).isDefined =>
        valOf(l) match {
          case Some(v) => leaf(nameOf(a).get, Iv(None, Some((v, true))))
          case None => if (lenient) Some(Map.empty) else None
        }
      case LessThanOrEqual(l: Literal, a) if nameOf(a).isDefined =>
        intervals(GreaterThanOrEqual(a, l), lenient)
      case In(a, vs) if nameOf(a).isDefined &&
          vs.nonEmpty && vs.forall(_.isInstanceOf[Literal]) =>
        val values = vs.map(v => valOf(v.asInstanceOf[Literal]))
        if (values.exists(_.isEmpty))
          (if (lenient) Some(Map.empty) else None)
        else {
          val vv = values.flatten
          val lo = vv.reduce((x, y) => if (x.cmp(y) <= 0) x else y)
          val hi = vv.reduce((x, y) => if (x.cmp(y) >= 0) x else y)
          // The [lo, hi] envelope is one-sided (ADVICE r14 high): it
          // is a sound WEAKENING only of the QUERY predicate (a larger
          // query set makes `within` harder, never easier). On the
          // strict MV side the envelope would ENLARGE the stored set
          // and prove containment that does not hold (MV `c IN (1,5)`
          // + query `c = 3` must NOT rewrite). Strict mode therefore
          // models the set exactly — a singleton, or a set of
          // integral values whose envelope IS the set (|set| ==
          // hi - lo + 1, e.g. IN (1,2,3)) — and declines otherwise.
          try {
            val exact = vv.distinct match {
              case Seq(_) => true
              case ds => (lo, hi) match {
                case (VL(l), VL(h)) => h - l + 1 == ds.size
                case _ => false // string sets: never interval-exact
              }
            }
            if (lenient || exact)
              leaf(nameOf(a).get, Iv(Some((lo, true)), Some((hi, true))))
            else None
          } catch { case _: IllegalStateException =>
            if (lenient) Some(Map.empty) else None }
        }
      case IsNotNull(a) if nameOf(a).isDefined =>
        // query side: constraint-free (only strengthens). MV side: the
        // MV excludes NULL rows of this column, so the query must
        // carry SOME comparison on it (a satisfied comparison implies
        // non-null) — modeled as a full-interval entry that containment
        // satisfies with any query entry and fails without one.
        if (lenient) Some(Map.empty) else leaf(nameOf(a).get, Full)
      case _ => if (lenient) Some(Map.empty) else None
    }
  }

  /** query ⇒ mv — provable containment per MV-constrained column.
    * Columns the MV does not constrain are vacuous; a column the MV
    * constrains but the query does not (or in a different domain)
    * fails. Comparisons across domains (string vs long) decline. */
  def implies(query: Expression, mvPred: Expression): Boolean =
    // the try spans interval CONSTRUCTION too (ADVICE r14): two
    // conjuncts constraining the same lower-cased name in different
    // domains make Iv.intersect throw from inside intervals() — a
    // domain mismatch anywhere degrades to "not proven", never to a
    // crashed optimizer rule
    try {
      (intervals(query, lenient = true),
        intervals(mvPred, lenient = false)) match {
        case (Some(q), Some(m)) =>
          m.forall { case (c, ivM) => q.get(c).exists(_.within(ivM)) }
        case _ => false
      }
    } catch { case _: IllegalStateException => false }
}
