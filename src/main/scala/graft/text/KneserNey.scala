package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interpolated Kneser–Ney bigram language model, trained on one
  * split of the corpus and scored on the held-out split — the actual
  * TRAINING step of the CCNet-style quality gate ([[LmScore]] scores
  * with fixed add-α counts; this learns the discounted/continuation
  * form that wins on real text, Kneser & Ney '95, Chen & Goodman '99).
  *
  * P(w|v) = max(c(vw)−d, 0)/c(v·) + (d·N₁₊(v·)/c(v·))·Pc(w), with the
  * continuation prior smoothed to cover held-out-only tokens:
  * Pc(w) = (N₁₊(·w) + 1)/(B + V); unseen contexts back off to Pc(w).
  *
  * Scale shape: count tables are corpus-count jobs (explode →
  * map-side-combined groupBy, keyspace = vocabulary); the eval pass
  * is three keyed LEFT joins of held-out bigram occurrences against
  * them. Driver state is two scalars (B bigram types, V vocab). The
  * bigram count table is localCheckpoint'ed once and fans out to its
  * three consumers instead of recomputing the shuffle. Counts are
  * exact longs; both engines derive identical per-bigram doubles
  * (identical expression tree), and the per-group mean log-prob is
  * rounded to 6 (the [[LmScore]] float contract).
  */
object KneserNey {

  private def bigrams(df: DataFrame, extra: Seq[String]): DataFrame =
    df.filter(size(col("__toks")) >= 2)
      .select(extra.map(col) :+ explode(arrays_zip(
        slice(col("__toks"), lit(1), size(col("__toks")) - 1),
        slice(col("__toks"), lit(2), size(col("__toks")) - 1))).as("z"): _*)
      .select(extra.map(col) :+ col("z.0").as("v") :+ col("z.1").as("w"): _*)

  /** Per-`groupCol` held-out scores: (group, n_eval_bigrams,
    * n_backoff, kn_logprob). Train split = rows matching `trainPred`;
    * everything else is evaluated.
    */
  def heldOutLogProb(df: DataFrame, textCol: String, groupCol: String,
      trainPred: Column, discount: Double = 0.75): DataFrame = {
    val base = df.filter(col(textCol).isNotNull)
      .select(col(groupCol), trainPred.as("__train"),
        TextFunctions.tokens(col(textCol)).as("__toks"))
    val tr = base.filter(col("__train"))
    val ev = base.filter(!col("__train"))

    val c2 = bigrams(tr, Nil)
      .groupBy("v", "w").agg(count(lit(1)).as("c2"))
      .localCheckpoint()
    val b = c2.count() // distinct bigram types (already materialized)
    val vv = tr.select(explode(col("__toks")).as("t")).distinct().count()
    val ctx = c2.groupBy("v")
      .agg(sum("c2").as("c1"), count(lit(1)).as("n1v"))
    val cw = c2.groupBy("w").agg(count(lit(1)).as("cont"))

    val eocc = bigrams(ev, Seq(groupCol))
    val denom = lit((b + vv).toDouble)
    val pc = (coalesce(col("cont"), lit(0L)) + lit(1.0)) / denom
    val seen = coalesce(col("c1"), lit(0L)) > 0
    // c2 can be NULL under a SEEN context (context in train, this
    // continuation not); NULL-propagation through greatest() differs
    // across engines, so coalesce explicitly.
    val p = when(seen,
      (greatest(coalesce(col("c2"), lit(0L)) - lit(discount), lit(0.0)) /
        col("c1")) +
        (((lit(discount) * col("n1v")) / col("c1")) * pc))
      .otherwise(pc)
    eocc
      .join(c2, Seq("v", "w"), "left")
      .join(ctx, Seq("v"), "left")
      .join(cw, Seq("w"), "left")
      .select(col(groupCol),
        p.as("p"), when(seen, 0L).otherwise(1L).as("backoff"))
      .groupBy(groupCol)
      .agg(count(lit(1)).as("n_eval_bigrams"),
        sum("backoff").as("n_backoff"),
        round(avg(log(col("p"))), 6).as("kn_logprob"))
  }
}
