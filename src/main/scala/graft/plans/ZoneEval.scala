package graft.plans

import org.apache.spark.sql.catalyst.expressions.{
  And, AttributeReference, EqualNullSafe, EqualTo, Expression,
  GreaterThan, GreaterThanOrEqual, In, IsNotNull, IsNull, LessThan,
  LessThanOrEqual, Literal, Not, Or, StartsWith}
import org.apache.spark.sql.types.{
  ByteType, DateType, IntegerType, LongType, ShortType, StringType,
  TimestampType}

import graft.sources.CommitLog
import graft.util.Utf8Order

/** Three-valued zone-map evaluation of a predicate against ONE file's
  * manifest stats — the shared brain of [[ManifestSkip]] (which needs
  * "could any row match?") and [[MetadataAgg]]'s filtered counts
  * (which additionally need the dual, "do ALL rows match?").
  *
  * Soundness contract, both directions conservative:
  *  - [[canMatch]] === false only when NO row of the file can satisfy
  *    the predicate (safe to prune); unknown shapes answer true.
  *  - [[mustMatch]] === true only when EVERY row of the file
  *    satisfies it (safe to count blind); unknown shapes answer
  *    false. NULL rows fail every comparison, so mustMatch of a
  *    comparison additionally requires a zero null count.
  * A file where canMatch && !mustMatch is PARTIAL — scanned by the
  * skip rule, undecidable for a metadata count.
  */
private[graft] object ZoneEval {

  /** Integral AND temporal literals: a folded date literal carries
    * epoch DAYS (Int), a timestamp literal epoch MICROS (Long) — the
    * same units the stats pass records temporal zone maps in. */
  def asLong(l: Literal): Option[Long] = l.dataType match {
    case ByteType | ShortType | IntegerType | LongType | DateType |
        TimestampType =>
      Option(l.value).map(_.asInstanceOf[Number].longValue)
    case _ => None
  }

  def asStr(l: Literal): Option[String] = l.dataType match {
    case StringType => Option(l.value).map(_.toString)
    case _ => None
  }

  // String zone maps are collected by Spark min/max — UTF-8 BINARY
  // order — so every comparison against them goes through
  // [[Utf8Order]] (Java String ordering diverges for supplementary-
  // plane code points; comparing in the wrong order can prune a file
  // that contains a matching row — ADVICE r13). The prefix successor
  // for StartsWith operates in the same byte order
  // (Utf8Order.prefixSuccessor).

  /** Does `e` contain at least one leaf these evaluators can act on?
    * Cheap pre-check so unprunable filters never read a manifest. */
  def hasUsableLeaf(e: Expression): Boolean = e match {
    case And(l, r) => hasUsableLeaf(l) || hasUsableLeaf(r)
    case Or(l, r) => hasUsableLeaf(l) || hasUsableLeaf(r)
    case EqualTo(_: AttributeReference, _: Literal) => true
    case EqualTo(_: Literal, _: AttributeReference) => true
    case EqualNullSafe(_: AttributeReference, _: Literal) => true
    case EqualNullSafe(_: Literal, _: AttributeReference) => true
    case GreaterThan(_: AttributeReference, _: Literal) => true
    case GreaterThan(_: Literal, _: AttributeReference) => true
    case GreaterThanOrEqual(_: AttributeReference, _: Literal) => true
    case GreaterThanOrEqual(_: Literal, _: AttributeReference) => true
    case LessThan(_: AttributeReference, _: Literal) => true
    case LessThan(_: Literal, _: AttributeReference) => true
    case LessThanOrEqual(_: AttributeReference, _: Literal) => true
    case LessThanOrEqual(_: Literal, _: AttributeReference) => true
    case In(_: AttributeReference, vs) => vs.forall(_.isInstanceOf[Literal])
    case IsNull(_: AttributeReference) => true
    case IsNotNull(_: AttributeReference) => true
    case StartsWith(_: AttributeReference, _: Literal) => true
    case _ => false
  }

  /** Per-file stat access for one (manifest, file) pair; `outNames`
    * guards against columns of some OTHER relation. `bloomLoad`
    * resolves a manifest-carried bloom-sidecar ref to a loaded filter
    * (None by default — zone maps only). */
  final class FileStats(m: CommitLog.Manifest, outNames: Set[String],
      rel: String,
      bloomLoad: String => Option[org.apache.spark.util.sketch.BloomFilter]
        = _ => None) {
    def numRange(c: String): Option[(Long, Long)] =
      if (!outNames(c)) None else m.colStats.get(c).flatMap(_.get(rel))
    def strRange(c: String): Option[(String, String)] =
      if (!outNames(c)) None else m.strStats.get(c).flatMap(_.get(rel))
    def nullCnt(c: String): Option[Long] =
      if (!outNames(c)) None
      else m.colStats.get(CommitLog.nullCountCol(c)).flatMap(_.get(rel))
        .map(_._1)
    def rowCnt: Option[Long] =
      m.colStats.get(CommitLog.RowCountCol).flatMap(_.get(rel)).map(_._1)
    /** Could the file contain value `l` in column `c`, per its bloom
      * sidecar? True when no sidecar/filter is available (sound
      * default); no false negatives by the bloom contract. The probe
      * hashes the literal exactly as the writer hashed the column
      * ([[graft.sources.BloomStats]]: xxhash64, seed 42). */
    def bloomPossible(c: String, l: Literal): Boolean =
      if (!outNames(c) || l.value == null) true
      else m.strStats.get(CommitLog.bloomCol(c)).flatMap(_.get(rel)) match {
        case None => true
        case Some((ref, _)) => bloomLoad(ref) match {
          case None => true
          case Some(bf) =>
            val h = new org.apache.spark.sql.catalyst.expressions.XxHash64(
              Seq(l)).eval(null).asInstanceOf[Long]
            bf.mightContainLong(h)
        }
      }
  }

  /** Could ANY row of the file satisfy `e`? Unknown → true. */
  def canMatch(st: FileStats, e: Expression): Boolean = {
    def cmp(a: AttributeReference, l: Literal,
        num: (Long, Long, Long) => Boolean,
        str: (String, String, String) => Boolean): Boolean =
      asLong(l) match {
        case Some(v) => st.numRange(a.name).forall { case (mn, mx) =>
          num(mn, mx, v) }
        case None => asStr(l) match {
          case Some(v) => st.strRange(a.name).forall { case (mn, mx) =>
            str(mn, mx, v) }
          case None => true
        }
      }
    e match {
      case And(l, r) => canMatch(st, l) && canMatch(st, r)
      case Or(l, r) => canMatch(st, l) || canMatch(st, r)
      case EqualTo(a: AttributeReference, l: Literal) =>
        cmp(a, l, (mn, mx, v) => mn <= v && v <= mx,
          (mn, mx, v) => Utf8Order.le(mn, v) && Utf8Order.le(v, mx)) &&
          st.bloomPossible(a.name, l) // zone wide ≠ value present
      case EqualTo(l: Literal, a: AttributeReference) =>
        canMatch(st, EqualTo(a, l))
      case EqualNullSafe(a: AttributeReference, l: Literal) =>
        if (l.value == null) canMatch(st, IsNull(a))
        else canMatch(st, EqualTo(a, l))
      case EqualNullSafe(l: Literal, a: AttributeReference) =>
        canMatch(st, EqualNullSafe(a, l))
      case GreaterThan(a: AttributeReference, l: Literal) =>
        cmp(a, l, (_, mx, v) => mx > v, (_, mx, v) => Utf8Order.gt(mx, v))
      case GreaterThan(l: Literal, a: AttributeReference) => // v > a
        cmp(a, l, (mn, _, v) => mn < v, (mn, _, v) => Utf8Order.lt(mn, v))
      case GreaterThanOrEqual(a: AttributeReference, l: Literal) =>
        cmp(a, l, (_, mx, v) => mx >= v, (_, mx, v) => Utf8Order.ge(mx, v))
      case GreaterThanOrEqual(l: Literal, a: AttributeReference) =>
        cmp(a, l, (mn, _, v) => mn <= v, (mn, _, v) => Utf8Order.le(mn, v))
      case LessThan(a: AttributeReference, l: Literal) =>
        cmp(a, l, (mn, _, v) => mn < v, (mn, _, v) => Utf8Order.lt(mn, v))
      case LessThan(l: Literal, a: AttributeReference) => // v < a
        cmp(a, l, (_, mx, v) => mx > v, (_, mx, v) => Utf8Order.gt(mx, v))
      case LessThanOrEqual(a: AttributeReference, l: Literal) =>
        cmp(a, l, (mn, _, v) => mn <= v, (mn, _, v) => Utf8Order.le(mn, v))
      case LessThanOrEqual(l: Literal, a: AttributeReference) =>
        cmp(a, l, (_, mx, v) => mx >= v, (_, mx, v) => Utf8Order.ge(mx, v))
      case In(a: AttributeReference, vs)
          if vs.nonEmpty && vs.forall(_.isInstanceOf[Literal]) =>
        vs.exists(v => canMatch(st, EqualTo(a, v.asInstanceOf[Literal])))
      case IsNull(a: AttributeReference) =>
        st.nullCnt(a.name).forall(_ > 0)
      case IsNotNull(a: AttributeReference) =>
        !(for { nc <- st.nullCnt(a.name); rc <- st.rowCnt }
          yield nc == rc && rc > 0L).getOrElse(false)
      case StartsWith(a: AttributeReference, l: Literal) =>
        asStr(l) match {
          case Some(p) => st.strRange(a.name).forall { case (mn, mx) =>
            Utf8Order.ge(mx, p) &&
              Utf8Order.prefixSuccessor(p).forall(Utf8Order.ltBytes(mn, _))
          }
          case None => true
        }
      case Not(child) => child match {
        case EqualTo(a: AttributeReference, l: Literal) =>
          cmp(a, l, (mn, mx, v) => !(mn == v && mx == v),
            (mn, mx, v) => !(mn == v && mx == v))
        case _ => true
      }
      case _ => true
    }
  }

  /** Does EVERY row of the file satisfy `e`? Unknown → false. A
    * comparison leaf additionally needs nulls == 0 — a NULL row
    * fails every comparison. */
  def mustMatch(st: FileStats, e: Expression): Boolean = {
    def noNulls(c: String): Boolean = st.nullCnt(c).contains(0L)
    def cmp(a: AttributeReference, l: Literal,
        num: (Long, Long, Long) => Boolean,
        str: (String, String, String) => Boolean): Boolean =
      noNulls(a.name) && (asLong(l) match {
        case Some(v) => st.numRange(a.name).exists { case (mn, mx) =>
          num(mn, mx, v) }
        case None => asStr(l) match {
          case Some(v) => st.strRange(a.name).exists { case (mn, mx) =>
            str(mn, mx, v) }
          case None => false
        }
      })
    e match {
      case And(l, r) => mustMatch(st, l) && mustMatch(st, r)
      case Or(l, r) => mustMatch(st, l) || mustMatch(st, r)
      case EqualTo(a: AttributeReference, l: Literal) =>
        cmp(a, l, (mn, mx, v) => mn == v && mx == v,
          (mn, mx, v) => mn == v && mx == v)
      case EqualTo(l: Literal, a: AttributeReference) =>
        mustMatch(st, EqualTo(a, l))
      case EqualNullSafe(a: AttributeReference, l: Literal) =>
        if (l.value == null) mustMatch(st, IsNull(a))
        else mustMatch(st, EqualTo(a, l))
      case EqualNullSafe(l: Literal, a: AttributeReference) =>
        mustMatch(st, EqualNullSafe(a, l))
      case GreaterThan(a: AttributeReference, l: Literal) =>
        cmp(a, l, (mn, _, v) => mn > v, (mn, _, v) => Utf8Order.gt(mn, v))
      case GreaterThan(l: Literal, a: AttributeReference) => // v > a
        cmp(a, l, (_, mx, v) => mx < v, (_, mx, v) => Utf8Order.lt(mx, v))
      case GreaterThanOrEqual(a: AttributeReference, l: Literal) =>
        cmp(a, l, (mn, _, v) => mn >= v, (mn, _, v) => Utf8Order.ge(mn, v))
      case GreaterThanOrEqual(l: Literal, a: AttributeReference) =>
        cmp(a, l, (_, mx, v) => mx <= v, (_, mx, v) => Utf8Order.le(mx, v))
      case LessThan(a: AttributeReference, l: Literal) =>
        cmp(a, l, (_, mx, v) => mx < v, (_, mx, v) => Utf8Order.lt(mx, v))
      case LessThan(l: Literal, a: AttributeReference) => // v < a
        cmp(a, l, (mn, _, v) => mn > v, (mn, _, v) => Utf8Order.gt(mn, v))
      case LessThanOrEqual(a: AttributeReference, l: Literal) =>
        cmp(a, l, (_, mx, v) => mx <= v, (_, mx, v) => Utf8Order.le(mx, v))
      case LessThanOrEqual(l: Literal, a: AttributeReference) =>
        cmp(a, l, (mn, _, v) => mn >= v, (mn, _, v) => Utf8Order.ge(mn, v))
      case In(a: AttributeReference, vs)
          if vs.nonEmpty && vs.forall(_.isInstanceOf[Literal]) =>
        vs.exists(v => mustMatch(st, EqualTo(a, v.asInstanceOf[Literal])))
      case IsNull(a: AttributeReference) =>
        (for { nc <- st.nullCnt(a.name); rc <- st.rowCnt }
          yield nc == rc).getOrElse(false)
      case IsNotNull(a: AttributeReference) => noNulls(a.name)
      case StartsWith(a: AttributeReference, l: Literal) =>
        asStr(l) match {
          case Some(p) => noNulls(a.name) &&
            st.strRange(a.name).exists { case (mn, mx) =>
              mn.startsWith(p) && mx.startsWith(p)
            }
          case None => false
        }
      case _ => false
    }
  }
}
