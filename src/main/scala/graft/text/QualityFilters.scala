package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Repetition-based document quality signals — the Gopher-style "repetitive
  * document" filters (Rae et al. 2021 §A1.1) re-expressed at the token
  * level, since this corpus has no line structure. A scraped/ML-generated
  * document that loops the same phrase has a high duplicate-n-gram
  * fraction and a high most-common-n-gram fraction; the thresholds below
  * gate it out of a training mix.
  *
  * Everything is a pure Catalyst `Column` over an already-materialized
  * token-array column — no UDFs, stays in whole-stage codegen, and an
  * identical DuckDB list-expression oracle reproduces every value. The
  * reference has no text surface (SURVEY §2 scope note); this package is
  * part of the engine's training-data-pipeline extension surface.
  *
  * All fractions are 0.0 for documents with no grams at the given width
  * (empty or shorter-than-n docs), so the gate never NULLs out.
  *
  * Scale: per-row array expressions only — no shuffle, no state; cost is
  * O(tokens × distinct) per row for the top-fraction signals, bounded in
  * practice by document length. At 100 TB these run at scan speed next to
  * the parquet reader, exactly like [[TextFunctions]].
  */
object QualityFilters {

  private def safeFrac(num: Column, den: Column): Column =
    when(den > 0, num.cast("double") / den).otherwise(lit(0.0))

  /** Fraction of token occurrences that are repeats of an earlier token:
    * 1 − |distinct| / |all|. 0 for empty docs.
    */
  def dupTokenFrac(ts: Column): Column =
    safeFrac(size(ts) - size(array_distinct(ts)), size(ts))

  /** Fraction of n-gram occurrences that are repeats: 1 − |distinct
    * grams| / |grams|. High values mean the document loops phrases.
    */
  def dupNgramFrac(ts: Column, n: Int): Column = {
    val grams = TextFunctions.ngramsOfTokens(ts, n)
    safeFrac(size(grams) - size(array_distinct(grams)), size(grams))
  }

  /** Fraction of token occurrences belonging to the single most frequent
    * token (the "fraction of characters in the most common word" analogue).
    */
  def topTokenFrac(ts: Column): Column = topFracOf(ts)

  /** Fraction of n-gram occurrences belonging to the most frequent n-gram. */
  def topNgramFrac(ts: Column, n: Int): Column =
    topFracOf(TextFunctions.ngramsOfTokens(ts, n))

  /** max over distinct elements of (occurrences / total). The inner
    * count is a filter over the materialized array — O(distinct × n)
    * comparisons per row, zero extra tokenization passes because `ts`
    * is a column reference, not the tokenizer expression.
    */
  private def topFracOf(arr: Column): Column = {
    val top = array_max(transform(array_distinct(arr), d => size(filter(arr, x => x === d))))
    safeFrac(coalesce(top, lit(0)), size(arr))
  }

  /** Gopher-shape repetition gate thresholds (policy values; the engine
    * contract is that the gate is a deterministic codegen'd predicate).
    */
  val MaxTopBigramFrac = 0.20
  val MaxTopTrigramFrac = 0.18
  val MaxDupBigramFrac = 0.60

  /** true when the document passes every repetition threshold. */
  def repetitionOk(ts: Column): Column =
    (topNgramFrac(ts, 2) <= MaxTopBigramFrac) &&
      (topNgramFrac(ts, 3) <= MaxTopTrigramFrac) &&
      (dupNgramFrac(ts, 2) <= MaxDupBigramFrac)

  /** Signal column names appended by [[withSignals]], in order. */
  val SignalNames: Seq[String] =
    Seq("dup_tok", "top_tok", "dup_2gram", "top_2gram", "top_3gram", "rep_ok")

  /** JVM single-pass variant of the full signal set: appends
    * [[SignalNames]] (5 doubles + rep_ok boolean) to every row via one
    * `mapPartitions` — tokenize once, count grams in a hash map, O(n)
    * per row. Semantically identical to the Column forms above
    * (QualityFiltersSpec pins equivalence), but those re-evaluate the
    * tokenization inside every HOF lambda once CollapseProject inlines
    * the token projection into the nested transform/filter counting —
    * O(n³) regex work per row, measured 66 s vs <1 s for this kernel on
    * the sf0.1 documents table. Same kernel discipline as
    * [[graft.io.Gsod.parseLines]]: Column form is the semantic
    * reference, the kernel is the hot path.
    */
  def withSignals(df: org.apache.spark.sql.DataFrame, textCol: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.types._
    val outSchema = StructType(df.schema.fields ++
      (SignalNames.init.map(StructField(_, DoubleType)) :+ StructField("rep_ok", BooleanType)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val idx = df.schema.fieldIndex(textCol)
    df.mapPartitions { it =>
      it.map { r =>
        val text = if (r.isNullAt(idx)) null else r.getString(idx)
        val toks: Array[String] =
          if (text == null) Array.empty
          else text.toLowerCase(java.util.Locale.ROOT).split("\\s+").filter(_.nonEmpty)
        def counts(arr: Array[String]): (Int, Int) = { // (distinct, topCount)
          val m = new java.util.HashMap[String, Int]()
          var top = 0
          var i = 0
          while (i < arr.length) {
            val c = m.merge(arr(i), 1, Integer.sum)
            if (c > top) top = c
            i += 1
          }
          (m.size, top)
        }
        def grams(n: Int): Array[String] =
          if (toks.length < n) Array.empty
          else Array.tabulate(toks.length - n + 1)(i => toks.slice(i, i + n).mkString(" "))
        def frac(num: Int, den: Int): Double = if (den > 0) num.toDouble / den else 0.0
        val (dTok, topTok) = counts(toks)
        val g2 = grams(2); val (d2, top2) = counts(g2)
        val g3 = grams(3); val (_, top3) = counts(g3)
        val dupTok = frac(toks.length - dTok, toks.length)
        val topTokF = frac(topTok, toks.length)
        val dup2 = frac(g2.length - d2, g2.length)
        val top2F = frac(top2, g2.length)
        val top3F = frac(top3, g3.length)
        val ok = top2F <= MaxTopBigramFrac && top3F <= MaxTopTrigramFrac && dup2 <= MaxDupBigramFrac
        org.apache.spark.sql.Row.fromSeq(
          r.toSeq ++ Seq(dupTok, topTokF, dup2, top2F, top3F, ok))
      }
    }(enc)
  }
}
