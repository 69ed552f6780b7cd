package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.dedup.{Decontaminate, Dedup}
import graft.operators.Sampling
import graft.text.{QualityFilters, TextFunctions}

/** End-to-end training-corpus preparation: the composition a user of the
  * individual operators actually runs. Stage order is chosen by cost and
  * shuffle shape, cheapest-first:
  *
  *  1. quality + repetition gate — pure codegen'd predicates, evaluated
  *     AT THE SCAN (no shuffle, rows die before they move);
  *  2. exact-dedup survivors — one window over the content fingerprint
  *     (single keyed shuffle, [[Dedup.exactSurvivors]]);
  *  3. benchmark decontamination — shingle semi-join, broadcast under
  *     [[Decontaminate.BroadcastShingleLimit]] (no corpus shuffle on the
  *     broadcast path);
  *  4. deterministic mixture + split assignment — scan-side hash
  *     filters, layout-invariant ([[Sampling]]).
  *
  * Total shuffle budget on the broadcast path: ONE wide shuffle (the
  * dedup window) plus the bench-side mini-aggregation — everything else
  * rides the scan. At 100 TB the same composition holds; only the
  * decontamination join may switch to its shuffled form.
  *
  * The whole pipeline is oracle-checkable end to end (q_pipeline): every
  * stage is deterministic and SQL-reproducible, so corpus membership of
  * the final mix is auditable row by row — the property that matters
  * when a training run needs its data lineage reproduced months later.
  */
object TrainingPipeline {

  /** Pipeline policy. `weights`/`splits` as in [[Sampling.mixture]] /
    * [[Sampling.assignSplit]]; dyadic values keep the thresholds exact
    * in binary (see q_sample_mix).
    */
  final case class Config(
      minQuality: Double,
      decontamN: Int,
      weights: Map[String, Double],
      splits: Seq[(String, Double)],
      mixSalt: String = "mix",
      splitSalt: String = "split")

  /** Prepare `docs` against an eval/benchmark set: returns the final mix
    * with a `split` column, original columns preserved.
    */
  def prepare(
      docs: DataFrame,
      bench: DataFrame,
      textCol: String,
      idCol: String,
      sourceCol: String,
      cfg: Config): DataFrame = {
    val gated = QualityFilters.withSignals(
      docs.filter(TextFunctions.qualityScore(col(textCol)) >= cfg.minQuality), textCol)
      .filter(col("rep_ok"))
      .drop(QualityFilters.SignalNames: _*)
    val deduped = Dedup.exactSurvivors(gated, textCol, idCol)
    val cleaned = Decontaminate.clean(deduped, bench, textCol, idCol, cfg.decontamN)
    val mixed = Sampling.mixture(cleaned, sourceCol, cfg.weights, idCol, cfg.mixSalt)
    Sampling.assignSplit(mixed, idCol, cfg.splits, cfg.splitSalt)
  }
}
