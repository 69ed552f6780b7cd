package graft.text

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/** N-gram language-model quality scoring — the CCNet-style "how much
  * does this document look like the reference corpus" signal (Wenzek
  * et al., "CCNet: Extracting High Quality Monolingual Datasets from
  * Web Crawl Data", LREC'20 — there a KenLM 5-gram; here an add-α
  * bigram, the same signal at SQL-replayable size): documents whose
  * token transitions are improbable under corpus statistics (MT junk,
  * boilerplate soup, lorem ipsum) score low and get gated or
  * down-mixed.
  *
  * score(d) = (1/|bigrams(d)|) · Σ ln( (c(w₁w₂) + α) / (c(w₁) + α·V) )
  * — mean log add-α-smoothed conditional bigram probability, with
  * c(·) corpus counts and V the unigram vocabulary size.
  *
  * Scale shape: one explode → groupBy per n-gram order (map-side
  * combine; the keyspace is the vocabulary, the same as any corpus
  * count job) and two keyed joins of the document's bigram occurrences
  * against those count tables — no driver state beyond the two scalar
  * constants (V, α). Counts are exact longs, so both engines derive
  * identical per-bigram doubles; the per-doc mean is rounded to 6
  * (sum-order noise ~1e-13, same contract as every mean here).
  *
  * Self-scoring (train = score corpus) is the demo wiring; production
  * trains the counts on a held-out reference corpus and scores the
  * crawl against them — same plan, different count source.
  */
object LmScore {

  /** (idCol, n_bigrams, lm_score) per document with ≥ 2 tokens. */
  def bigramLogProb(
      df: DataFrame,
      textCol: String,
      idCol: String,
      alpha: Double = 1.0): DataFrame = {
    val base = df.filter(col(textCol).isNotNull)
      .select(col(idCol), TextFunctions.tokens(col(textCol)).as("__toks"))

    val unigrams = base.select(explode(col("__toks")).as("__w"))
      .groupBy("__w").agg(count(lit(1)).as("__c1"))
    val vocab = unigrams.count()

    // One row per bigram occurrence, carrying its first token: zip the
    // token array (minus its last element) with the 2-gram array.
    val grams = TextFunctions.ngramsOfTokens(col("__toks"), 2)
    val occurrences = base
      .filter(size(col("__toks")) >= 2)
      .select(col(idCol), explode(
        arrays_zip(slice(col("__toks"), lit(1), size(col("__toks")) - 1).as("w1"),
          grams.as("g"))).as("__p"))
      .select(col(idCol), col("__p.w1").as("__w"), col("__p.g").as("__g"))

    val bigramCounts = occurrences.groupBy("__g").agg(count(lit(1)).as("__c2"))

    val lp = log((col("__c2") + lit(alpha)) / (col("__c1") + lit(alpha * vocab)))
    occurrences
      .join(bigramCounts, "__g")
      .join(unigrams, "__w")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"), round(avg(lp), 6).as("lm_score"))
  }
}
