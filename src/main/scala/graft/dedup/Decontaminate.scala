package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.text.TextFunctions

/** Benchmark decontamination: find (and drop) training documents that
  * share any n-token shingle with an evaluation/benchmark set — the
  * standard n-gram-overlap decontamination step of an LLM training-data
  * pipeline (GPT-3 appendix C / PaLM-style 13-gram overlap, with n a
  * parameter since this fixture's documents are short).
  *
  * The reference has no analogue; this belongs to the engine's
  * training-data extension surface. The shape mirrors the repo's other
  * dedup operators: skinny exploded keys, one equi-join, nothing
  * all-pairs.
  *
  * Plan:
  *  1. benchmark → distinct shingle set (one column — the join key);
  *  2. corpus → (id, shingle) pairs, per-doc distinct;
  *  3. inner equi-join on the shingle, count hits per doc.
  *
  * Scale: a benchmark set is small by construction (eval suites are
  * MB-scale against a 100 TB corpus), so the shingle set is broadcast
  * when it fits [[Dedup.BroadcastVerifyShingleLimit]]-style bounds; the
  * fallback is a plain shuffled equi-join on the shingle string, still
  * skinny (id + shingle, no document bodies move). For corpora where
  * even (id, shingle) traffic dominates, key the join on
  * `Md5Hash.prefix64(shingle)` instead — 8 bytes per key, with a
  * ~n²·2⁻⁶⁴ false-hit probability; kept as the string here so the
  * DuckDB oracle is a literal transcription.
  */
object Decontaminate {

  /** Benchmark shingle count below which the set is broadcast. A 5-token
    * shingle averages well under 100 bytes, so this caps the broadcast
    * at tens of MB — same discipline as Dedup's verify bounds.
    */
  val BroadcastShingleLimit = 300000L

  /** Corpus documents sharing ≥1 n-gram with `bench`:
    * (idCol, n_hits = number of distinct shared shingles), hit docs only.
    */
  def contaminated(
      corpus: DataFrame,
      bench: DataFrame,
      textCol: String,
      idCol: String,
      n: Int,
      broadcastLimit: Long = BroadcastShingleLimit): DataFrame = {
    val benchShingles = bench
      .select(explode(TextFunctions.shingles(col(textCol), n)).as("__g"))
      .distinct()
    val benchKeyed =
      if (benchShingles.count() <= broadcastLimit) broadcast(benchShingles)
      else benchShingles
    corpus
      .select(col(idCol), explode(TextFunctions.shingles(col(textCol), n)).as("__g"))
      .join(benchKeyed, "__g")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_hits"))
  }

  /** Eval-side contamination report — the direction benchmark OWNERS
    * publish ("GSM8K is p% contaminated in corpus X"): for each eval
    * doc, (idCol, n_hit, n_total) where n_hit counts its distinct
    * n-grams found ANYWHERE in the corpus and n_total its distinct
    * n-gram count; the fraction n_hit/n_total is left to the consumer
    * (integer outputs only — the q_gap_stats discipline, no rounded
    * division to sit on a cross-engine boundary).
    *
    * Direction reversed vs [[contaminated]]: there the benchmark side
    * reduces to a (broadcastable) shingle set probed by the corpus;
    * here the CORPUS side reduces — to a distinct-shingle column that
    * is never broadcast (at 100 TB it is itself huge) — and the
    * MB-scale eval set explodes to (id, shingle) rows that semi-join
    * against it. One distinct-aggregate over corpus shingles + one
    * keyed semi-join + two small aggregations; no document bodies
    * move, nothing all-pairs.
    *
    * Eval docs shorter than n tokens have no shingles and are absent
    * from the report (n_total would be 0 — there is nothing to
    * measure).
    */
  def evalContamination(
      corpus: DataFrame,
      bench: DataFrame,
      textCol: String,
      idCol: String,
      n: Int): DataFrame = {
    val corpusShingles = corpus
      .select(explode(TextFunctions.shingles(col(textCol), n)).as("__g"))
      .distinct()
    val evalGrams = bench
      .select(col(idCol), explode(TextFunctions.shingles(col(textCol), n)).as("__g"))
      .distinct()
    val totals = evalGrams.groupBy(col(idCol)).agg(count(lit(1)).as("n_total"))
    val hits = evalGrams.join(corpusShingles, Seq("__g"), "left_semi")
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_hit"))
    totals.join(hits, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("n_hit"), lit(0L)).as("n_hit"),
        col("n_total"))
  }

  /** The clean view: corpus rows with zero benchmark overlap (left-anti
    * join against the contaminated ids — one more keyed shuffle, no
    * document bodies in the join).
    */
  def clean(
      corpus: DataFrame,
      bench: DataFrame,
      textCol: String,
      idCol: String,
      n: Int): DataFrame = {
    val hit = contaminated(corpus, bench, textCol, idCol, n).select(idCol)
    corpus.join(hit, Seq(idCol), "left_anti")
  }
}
