package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Full conditional MERGE (ANSI/Delta `MERGE INTO` semantics) — the
  * multi-clause generalization of [[Upsert]]: per target row, the
  * FIRST matching clause in declaration order fires, across the three
  * match categories
  *
  *   WHEN MATCHED [AND cond]            THEN UPDATE SET … | DELETE
  *   WHEN NOT MATCHED [AND cond]        THEN INSERT …
  *   WHEN NOT MATCHED BY SOURCE [AND c] THEN UPDATE SET … | DELETE
  *
  * with unmatched-by-any-clause rows keeping their base values
  * (matched / by-source categories) or being dropped (insert
  * category) — exactly the standard's fall-through rules.
  *
  * Execution shape: ONE full-outer join on the key (broadcast when
  * the source is a small change batch — Catalyst/AQE decide), then a
  * single projection whose per-column when-chains encode clause
  * order, and one row-level filter for the delete clauses. No second
  * pass, no driver-side clause loop, everything inside whole-stage
  * codegen. The source is expected deduplicated per key (the
  * standard's "cannot update the same row twice" rule is the
  * caller's contract — pre-aggregate or [[Upsert.latestWins]] it).
  *
  * Column addressing: conditions and set/insert expressions see the
  * joined row with base columns as `t_<name>` and source columns as
  * `s_<name>` (both always non-ambiguous, NULL on the absent side).
  */
object MergeInto {

  sealed trait Action
  /** SET map: output column name → expression over t_/s_ columns. */
  final case class Update(set: Map[String, Column]) extends Action
  case object Delete extends Action
  /** VALUES map: every base column must be given (or defaults NULL). */
  final case class Insert(values: Map[String, Column]) extends Action

  /** Merged table with the base's schema. `matched` and `bySource`
    * clauses take Update/Delete; `notMatched` clauses take Insert.
    * A clause condition of `lit(true)` is the unconditional form.
    */
  /** The joined-and-resolved row-fate frame the output projections
    * build on: base columns as `t_<name>`, source columns as
    * `s_<name>`, and `__a` = the id of the FIRST clause (in
    * declaration order) whose category + condition matched —
    * 0 = keep base row; 1000+i = matched clause i; 2000+i = insert
    * clause i; 3000+i = by-source clause i; -1 = drop (unmatched
    * source row). Exposed (package-private) so merge-on-read writers
    * ([[graft.sources.CommitMerge.mergeIntoMor]]) can turn the SAME
    * clause semantics into delete tuples + new rows instead of a
    * rewritten table. */
  private[graft] def resolved(
      base: DataFrame,
      source: DataFrame,
      keyCols: Seq[String],
      matched: Seq[(Column, Action)],
      notMatched: Seq[(Column, Insert)],
      bySource: Seq[(Column, Action)]): DataFrame = {
    require(keyCols.nonEmpty, "at least one key column")
    require(matched.forall(!_._2.isInstanceOf[Insert]),
      "WHEN MATCHED takes UPDATE or DELETE, not INSERT")
    require(bySource.forall(!_._2.isInstanceOf[Insert]),
      "WHEN NOT MATCHED BY SOURCE takes UPDATE or DELETE, not INSERT")
    val t = base.select(
      base.columns.map(c => col(c).as(s"t_$c")).toIndexedSeq: _*)
    val s = source.select(
      source.columns.map(c => col(c).as(s"s_$c")).toIndexedSeq: _*)
    // prefixes make every name unique — no DataFrame-apply needed
    val joinCond = keyCols
      .map(k => col(s"t_$k") <=> col(s"s_$k"))
      .reduce(_ && _)
    // presence flags survive the outer join even for all-NULL rows
    val j = t.withColumn("__t", lit(true))
      .join(s.withColumn("__s", lit(true)), joinCond, "full_outer")
    val isMatch = col("__t").isNotNull && col("__s").isNotNull
    val tOnly = col("__t").isNotNull && col("__s").isNull
    val sOnly = col("__t").isNull && col("__s").isNotNull

    // Row fate: resolve clause order ONCE into an action id, then key
    // every output expression off it — two clauses' conditions both
    // true ⇒ the earlier id wins, the standard's rule.
    def resolve(cat: Column, clauses: Seq[Column], ids: Seq[Int],
        default: Column): Column =
      clauses.zip(ids).foldRight(default) { case ((c, id), acc) =>
        when(cat && c, lit(id)).otherwise(acc)
      }
    var action: Column = lit(0)
    action = resolve(isMatch, matched.map(_._1),
      matched.indices.map(1000 + _), action)
    action = resolve(sOnly, notMatched.map(_._1),
      notMatched.indices.map(2000 + _), when(sOnly, lit(-1)).otherwise(action))
    action = resolve(tOnly, bySource.map(_._1),
      bySource.indices.map(3000 + _), action)
    j.withColumn("__a", action)
  }

  private[graft] def deleteActionIds(matched: Seq[(Column, Action)],
      bySource: Seq[(Column, Action)]): Seq[Int] =
    matched.zipWithIndex.collect { case ((_, Delete), i) => 1000 + i } ++
      bySource.zipWithIndex.collect { case ((_, Delete), i) => 3000 + i }

  def merge(
      base: DataFrame,
      source: DataFrame,
      keyCols: Seq[String],
      matched: Seq[(Column, Action)] = Nil,
      notMatched: Seq[(Column, Insert)] = Nil,
      bySource: Seq[(Column, Action)] = Nil): DataFrame = {
    val outCols = base.columns.toSeq
    val j = resolved(base, source, keyCols, matched, notMatched, bySource)
    val deleteIds = deleteActionIds(matched, bySource)
    val keep =
      if (deleteIds.isEmpty) col("__a") =!= -1
      else col("__a") =!= -1 &&
        !col("__a").isin(deleteIds.map(_.asInstanceOf[Any]): _*)
    val withAction = j.filter(keep)

    // ANSI-MERGE analysis rule: every SET/INSERT expression must
    // up-cast LOSSLESSLY to its target column type — Delta/ANSI MERGE
    // fails analysis on e.g. a double expression into a long column;
    // a silent Cast here would truncate data instead. One driver-side
    // schema probe, no execution.
    val typed: Seq[(String, String, Column)] =
      (matched.collect { case (_, Update(set)) => set } ++
        bySource.collect { case (_, Update(set)) => set } ++
        notMatched.map(_._2.values)).zipWithIndex.flatMap {
        case (m, ci) => m.toSeq.zipWithIndex.collect {
          case ((c, e), ei) if outCols.contains(c) =>
            (c, s"__probe_${ci}_$ei", e)
        }
      }
    if (typed.nonEmpty) {
      val probed = j.select(typed.map { case (_, a, e) => e.as(a) }: _*)
        .schema
      typed.foreach { case (c, a, _) =>
        val from = probed(a).dataType
        val to = base.schema(c).dataType
        require(from == org.apache.spark.sql.types.NullType ||
          org.apache.spark.sql.catalyst.expressions.Cast.canUpCast(from, to),
          s"MERGE type mismatch on column '$c': expression type " +
            s"${from.simpleString} does not up-cast losslessly to " +
            s"${to.simpleString} — add an explicit cast if the " +
            "narrowing is intended")
      }
    }

    val out = outCols.map { c =>
      val updates =
        matched.zipWithIndex.collect { case ((_, Update(set)), i)
          if set.contains(c) => (1000 + i, set(c)) } ++
        bySource.zipWithIndex.collect { case ((_, Update(set)), i)
          if set.contains(c) => (3000 + i, set(c)) } ++
        notMatched.zipWithIndex.collect { case ((_, Insert(vs)), i) =>
          (2000 + i, vs.getOrElse(c, lit(null))) }
      updates.foldRight(col(s"t_$c")) { case ((id, e), acc) =>
        when(col("__a") === id, e).otherwise(acc)
      }.cast(base.schema(c).dataType).as(c)
    }
    withAction.select(out: _*)
  }
}
