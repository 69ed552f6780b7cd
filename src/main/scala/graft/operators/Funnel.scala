package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Funnel analysis — the product-analytics sequence metric: per user,
  * how far did they progress through an ORDERED chain of event types
  * (view → click → purchase), and did the whole chain complete within
  * a time window?
  *
  * Semantics (deterministic, SQL-mirrorable): t₁ = the user's earliest
  * step-1 event; tᵢ₊₁ = the earliest step-(i+1) event STRICTLY after
  * tᵢ. `steps_reached` is the chain length; `completed` additionally
  * requires t_k − t₁ ≤ window. Users with no step-1 event are absent.
  * The earliest-chain greedy is the standard funnel definition and is
  * optimal for reach: if ANY assignment of events completes the chain,
  * the earliest chain does (each greedy tᵢ is ≤ the alternative's, by
  * induction), so greedy never under-reports steps_reached — only the
  * duration window can differ from an arbitrary-assignment reading,
  * and `window` deliberately measures the EARLIEST chain.
  *
  * Plan: k−1 keyed join+aggregate passes (step i+1 events join the
  * step-i frontier on the user key with ts > tᵢ, then min per user) —
  * each pass is one keyed shuffle of that step's events, no window
  * sort over the whole stream, no per-user quadratic work. Funnels are
  * short (k ≤ 5 in practice), so the pass count is a small constant.
  */
object Funnel {

  /** @param windowMicros completion horizon: t_k − t₁ ≤ window (micros
    *                     for timestamp ts columns)
    * @return (userCol, steps_reached, completed, duration_s) — one row
    *         per user with ≥ 1 step-1 event; duration_s NULL unless
    *         the full chain exists
    */
  def funnel(
      df: DataFrame,
      userCol: String,
      typeCol: String,
      tsCol: String,
      steps: Seq[String],
      windowMicros: Long): DataFrame = {
    require(steps.size >= 2, "a funnel needs at least two steps")
    val typed = df.select(col(userCol).as("__u"), col(typeCol).as("__et"),
      col(tsCol).as("__ts"))
    var acc = typed.filter(col("__et") === steps.head)
      .groupBy(col("__u")).agg(min(col("__ts")).as("__t1"))
    for (i <- 1 until steps.size) {
      val prev = s"__t$i"
      val cur = s"__t${i + 1}"
      val accCols = acc.columns
      val nxt = typed.filter(col("__et") === steps(i))
        .select(col("__u").as("__nu"), col("__ts").as("__nts"))
      acc = acc.join(nxt,
          acc("__u") === col("__nu") && col("__nts") > acc(prev), "left")
        .groupBy(accCols.map(acc(_)): _*)
        .agg(min(col("__nts")).as(cur))
    }
    val k = steps.size
    val reached = (2 to k).foldLeft(lit(1L)) { (a, i) =>
      a + when(col(s"__t$i").isNotNull, 1L).otherwise(0L)
    }
    val dur = unix_micros(col(s"__t$k")) - unix_micros(col("__t1"))
    acc.select(
      col("__u").as(userCol),
      reached.as("steps_reached"),
      when(col(s"__t$k").isNotNull && dur <= windowMicros, 1L).otherwise(0L)
        .as("completed"),
      when(col(s"__t$k").isNotNull, (dur / lit(1000000L)).cast("long"))
        .as("duration_s"))
  }
}
