package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.text.TextFunctions

/** Substring-level exact deduplication: find (and optionally strip)
  * token spans that are repeated VERBATIM elsewhere in the corpus —
  * inside otherwise-distinct documents. This is the "exact substring"
  * dedup mode of Lee et al., "Deduplicating Training Data Makes
  * Language Models Better" (ACL'22): document-level dedup (see
  * [[Dedup.exact]] / [[MinHashLsh]]) misses shared boilerplate —
  * headers, footers, license blocks, navigation chrome — which is the
  * most common contamination in web corpora.
  *
  * Algorithm (the shuffle-bounded stand-in for their suffix array,
  * which is inherently single-machine): a token span is duplicated iff
  * EVERY length-`n` token window inside it has another occurrence
  * anywhere in the corpus. So:
  *
  *  1. explode each doc into its n-gram occurrences with start
  *     positions (1-based), fingerprinted to a 60-bit md5 prefix
  *     (the repo-wide cross-engine hash discipline, [[graft.util.Md5Hash]]);
  *  2. one count-over-window on fp marks occurrences of fingerprints
  *     seen ≥ `minOccurrences` times corpus-wide (within-doc repeats
  *     count — a doc that plagiarizes itself is still duplication);
  *  3. a per-doc gaps-and-islands window merges consecutive duplicated
  *     starts into MAXIMAL spans: starts a..b cover tokens a..b+n-1,
  *     so a run of length r spans r+n-1 tokens.
  *
  * Spans shorter than `minSpanTokens` tokens are noise (any common
  * n-gram); the Lee-et-al threshold is ~50 tokens at web scale.
  *
  * Scale shape: ONE keyed shuffle of the gram stream on the
  * fingerprint (the count window; the groupBy+semi-join alternative
  * moves the stream twice — measured >2× slower, tools/SubstrProbe)
  * and one on the doc id (the island window) — never all-pairs, no
  * driver state, candidate volume is n-grams-per-token ≈ 1 row per
  * token. Fingerprints are uniformly hash-distributed by md5; a hot
  * key (a corpus-stopword n-gram) co-locates its occurrences in one
  * task's sort group — at web scale a pre-aggregated heavy-key
  * bypass (count hot fps first, broadcast) would cap that task.
  *
  * The reference has no text surface at all (its only string op is the
  * fixed-width substring parse, Point.java:22-31); this operator is
  * part of the training-data extension surface.
  */
object SubstrDedup {

  /** One row per n-gram occurrence: (`idCol`, pos, fp) with `pos` the
    * 1-based start token index and `fp` the 60-bit md5 prefix of the
    * space-joined gram. Pure column expressions — stays in codegen.
    */
  private def gramOccurrences(
      df: DataFrame, textCol: String, idCol: String, n: Int): DataFrame =
    df.filter(col(textCol).isNotNull)
      .select(col(idCol), posexplode(
        TextFunctions.ngrams(col(textCol), n)).as(Seq("__p0", "__gram")))
      .select(
        col(idCol),
        (col("__p0") + 1).as("pos"),
        conv(substring(md5(col("__gram")), 1, 15), 16, 10)
          .cast("long").as("fp"))

  /** Maximal duplicated token spans per document:
    * (`idCol`, span_start, span_end, span_tokens), positions 1-based
    * inclusive over the whitespace-token sequence (the shared
    * tokenization contract of [[TextFunctions.tokens]]).
    *
    * @param n              window width in tokens (the dedup
    *                       resolution: two docs must share ≥ n
    *                       consecutive tokens to be seen at all)
    * @param minSpanTokens  only report maximal spans at least this many
    *                       tokens long (≥ n)
    * @param minOccurrences corpus-wide occurrence count at which a
    *                       window counts as duplicated (default 2)
    */
  def duplicatedSpans(
      df: DataFrame,
      textCol: String,
      idCol: String,
      n: Int,
      minSpanTokens: Int,
      minOccurrences: Long = 2L): DataFrame = {
    require(n >= 1, "n must be >= 1")
    require(minSpanTokens >= n, s"minSpanTokens ($minSpanTokens) must be >= n ($n)")
    val grams = gramOccurrences(df, textCol, idCol, n)
    // Occurrence-count marking as ONE count-over-window on fp: the
    // gram stream shuffles once (WindowExec's sort), vs the
    // groupBy+semi-join form that moves it twice (combined counts AND
    // the full stream again for the join). Interleaved A/B at sf0.1
    // (tools/SubstrProbe, warm reps): 1.4-1.5 s vs 3.1 s — >2×.
    val wFp = Window.partitionBy(col("fp"))
    val flagged = grams
      .withColumn("__c", count(lit(1)).over(wFp))
      .filter(col("__c") >= minOccurrences)
      .drop("__c")
    // Gaps and islands: consecutive duplicated starts share
    // (pos - row_number), which names the maximal run.
    val w = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    flagged
      .withColumn("__grp", col("pos") - row_number().over(w))
      .groupBy(col(idCol), col("__grp"))
      .agg(
        min(col("pos")).as("span_start"),
        (max(col("pos")) + lit(n - 1)).as("span_end"),
        (max(col("pos")) - min(col("pos")) + lit(n)).as("span_tokens"))
      .filter(col("span_tokens") >= minSpanTokens)
      .drop("__grp")
  }

  /** The corpus with duplicated spans STRIPPED: `textCol` is rewritten
    * to the normalized token sequence (lowercase, single-space — the
    * tokenization contract) minus every token inside a
    * [[duplicatedSpans]] span. Removing ALL occurrences (rather than
    * all-but-one) is the deliberate policy: a span that long repeated
    * verbatim is boilerplate, and boilerplate should train zero times,
    * not once — keep-one would need an arbitrary global "canonical
    * occurrence" tiebreak that re-shuffles every span by fingerprint.
    *
    * One extra shuffle over [[duplicatedSpans]]: spans aggregate per
    * doc (collect_list of a FILTERED span set — bounded by
    * tokens/minSpanTokens per doc, not corpus size) and broadcast- or
    * shuffle-join back to the corpus on the id; the token filter is a
    * per-row higher-order expression, no second pass over text.
    */
  def withoutDuplicatedSpans(
      df: DataFrame,
      textCol: String,
      idCol: String,
      n: Int,
      minSpanTokens: Int,
      minOccurrences: Long = 2L): DataFrame = {
    val spans = duplicatedSpans(df, textCol, idCol, n, minSpanTokens, minOccurrences)
      .groupBy(col(idCol))
      .agg(collect_list(struct(col("span_start"), col("span_end"))).as("__spans"))
    val toks = TextFunctions.tokens(col(textCol))
    val src = df.filter(col(textCol).isNotNull)
    // Keep token i (1-based) iff no span covers it.
    val kept = filter(
      zip_with(toks, sequence(lit(1), size(toks)), (t, i) => struct(t.as("t"), i.as("i"))),
      p => !exists(col("__spans"),
        s => p.getField("i").between(s.getField("span_start"), s.getField("span_end"))))
    // NULL-text rows are dropped (not passed through): the rewritten
    // column is defined over the tokenization contract, and a NULL text
    // has no token stream — passing it through would emit an
    // engine-specific md5(NULL) downstream while SQL oracles filter
    // `text IS NOT NULL`. Align by construction.
    src.join(spans, Seq(idCol), "left")
      .withColumn(textCol,
        when(col("__spans").isNull, col(textCol))
          .otherwise(array_join(transform(kept, p => p.getField("t")), " ")))
      .drop("__spans")
  }
}
