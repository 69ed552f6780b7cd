package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column library for large-scale training-data pipelines.
  *
  * Everything here is a pure Catalyst `Column` expression — no UDFs — so
  * each function stays inside whole-stage codegen, is pushed down /
  * pruned like any built-in, and scales with the scan. The reference has
  * no text surface (its only string op is fixed-width substring parse,
  * Point.java:22-31); this package is part of the engine's
  * training-data-pipeline extension surface.
  *
  * Tokenization contract (shared with the DuckDB oracles): lowercase,
  * split on runs of whitespace, drop empty tokens.
  */
object TextFunctions {

  /** Whitespace tokens, lowercased, empties dropped. */
  def tokens(text: Column): Column =
    filter(split(lower(text), "\\s+"), t => length(t) > 0)

  /** BPE-ish sub-word tokens: word pieces + standalone punctuation, the
    * shape a byte-pair pre-tokenizer produces (letter/digit runs, or a
    * single non-space symbol).
    */
  def bpeTokens(text: Column): Column =
    regexp_extract_all(lower(text), lit("[a-z0-9]+|[^a-z0-9\\s]"), lit(0))

  def tokenCount(text: Column): Column = size(tokens(text))

  /** Vowel-group count over the lowercased text — the classic
    * syllable surrogate of readability formulas (each maximal
    * [aeiouy]+ run ≈ one syllable). Exact long; regex class is
    * engine-portable (no lookaround, no unicode classes). */
  def vowelGroupCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit("[aeiouy]+"), lit(0)))
      .cast("long")

  /** Sentence-terminator run count ([.!?]+ ≈ one sentence end). */
  def sentenceCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[.!?]+"), lit(0))).cast("long")

  /** Distinct n-gram (shingle) set over whitespace tokens, each shingle
    * a single space-joined string. Used by Jaccard/MinHash dedup.
    *
    * Built as a zip_with chain over shifted copies of the token array:
    * every reference to the token array sits in an ARGUMENT position,
    * so the tokenization (regex split + filter) evaluates O(n) times
    * per row. The natural `transform(sequence(...), i => slice(ts,...))`
    * form buries `ts` inside the lambda, re-evaluating it per element —
    * O(tokens²) regex work per document (measured 2× the entire
    * MinHash pipeline at sf0.1).
    */
  def shingles(text: Column, n: Int): Column = array_distinct(ngrams(text, n))

  /** All n-gram OCCURRENCES over whitespace tokens, position order
    * preserved (one entry per starting token; [[shingles]] is the
    * distinct-set view). The corpus-statistics primitive: explode +
    * groupBy gives n-gram counts with map-side partial aggregation.
    */
  def ngrams(text: Column, n: Int): Column = ngramsOfTokens(tokens(text), n)

  /** [[ngrams]] over an already-materialized token array column. Use this
    * form when several gram widths are computed from one document: project
    * `tokens(text)` into a named column first and the tokenization runs
    * once per row instead of once per width (CollapseProject keeps a
    * multiply-referenced non-cheap projection as its own step).
    */
  def ngramsOfTokens(ts: Column, n: Int): Column = {
    // grams_k[i] = tokens i..i+k-1 joined; shift-and-concat n-1 times.
    // zip_with pads the shorter side with nulls; concat propagates the
    // null, and the final slice drops the padded tail.
    val grams = (2 to n).foldLeft(ts) { (acc, k) =>
      zip_with(acc, slice(ts, lit(k), size(ts)), (a, b) => concat(a, lit(" "), b))
    }
    when(size(ts) >= n, slice(grams, lit(1), size(ts) - (n - 1)))
      .otherwise(array())
  }

  /** English-ish stopword list used by quality scoring and language ID. */
  val stopwordsEn: Seq[String] = Seq(
    "the", "a", "an", "of", "to", "and", "in", "is", "it", "that")

  /** Fraction of tokens that are stopwords (0 for empty docs). */
  def stopwordRatio(text: Column, stopwords: Seq[String] = stopwordsEn): Column = {
    val ts = tokens(text)
    val sw = array(stopwords.map(lit): _*)
    when(size(ts) > 0,
      size(filter(ts, t => array_contains(sw, t))).cast("double") / size(ts))
      .otherwise(lit(0.0))
  }

  /** RAKE candidate phrases (Rose et al. 2010, "Automatic Keyword
    * Extraction from Individual Documents"): maximal runs of non-
    * stopword tokens — the phrase inventory keyword scoring ranks.
    *
    * Pure-Column extraction, no per-doc shuffle: the token stream is
    * space-joined, every space DOUBLED (so adjacent stopwords each
    * keep their own delimiting spaces — " of the " must split twice),
    * each stopword occurrence " w " rewritten to a '|' break, and the
    * result split + retokenized. The whole chain is scan-local string
    * work inside whole-stage codegen, replayable verbatim in SQL.
    */
  def candidatePhrases(text: Column,
      stopwords: Seq[String] = stopwordsEn): Column = {
    val nt = concat(lit(" "), concat_ws(" ", tokens(text)), lit(" "))
    val dd = regexp_replace(nt, " ", "  ")
    val marked = stopwords.foldLeft(dd) { (acc, w) =>
      regexp_replace(acc, java.util.regex.Pattern.quote(s" $w "), " | ")
    }
    filter(
      transform(split(marked, "\\|"),
        p => array_join(filter(split(p, " +"), t => length(t) > 0), " ")),
      p => length(p) > 0)
  }

  /** Fraction of non-space characters that are punctuation/symbols. */
  def punctRatio(text: Column): Column = {
    val nonSpace = length(regexp_replace(text, "\\s+", ""))
    val punct = length(regexp_replace(regexp_replace(text, "\\s+", ""), "[a-zA-Z0-9]", ""))
    when(nonSpace > 0, punct.cast("double") / nonSpace).otherwise(lit(0.0))
  }

  /** Mean token length in characters (0 for empty docs). */
  def meanTokenLen(text: Column): Column = {
    val ts = tokens(text)
    when(size(ts) > 0,
      aggregate(ts, lit(0L), (acc, t) => acc + length(t)).cast("double") / size(ts))
      .otherwise(lit(0.0))
  }

  /** Heuristic document quality in [0,1]: length in a sane band, some
    * stopwords present, punctuation not dominating. The exact weights
    * are a policy choice; what matters for the engine is that the score
    * is a deterministic, codegen'd arithmetic expression an identical
    * SQL oracle can reproduce.
    */
  def qualityScore(text: Column): Column = {
    val nTok = tokenCount(text).cast("double")
    val lenScore = least(nTok / 20.0, lit(1.0)) * least(lit(1.0), lit(500.0) / greatest(nTok, lit(1.0)))
    val swScore = least(stopwordRatio(text) * 5.0, lit(1.0))
    val punctScore = lit(1.0) - least(punctRatio(text) * 2.0, lit(1.0))
    round(lit(0.5) * lenScore + lit(0.3) * swScore + lit(0.2) * punctScore, 6)
  }

  /** Per-language marker words for the n-gram-free language heuristic.
    * Deliberately tiny — the point is the argmax plumbing, not lexicon
    * quality.
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "nicht", "ist"),
    "en" -> Seq("the", "a", "of", "and", "is", "to"),
    "es" -> Seq("el", "la", "de", "que", "y", "es"),
    "fr" -> Seq("le", "la", "les", "et", "est", "que"),
    "zh" -> Seq("de5", "shi4", "le5", "bu4", "wo3", "ni3"))

  /** Per-language marker hit count columns, in `langMarkers` order. */
  def langScores(text: Column): Seq[Column] = {
    val ts = tokens(text)
    langMarkers.map { case (_, words) =>
      val w = array(words.map(lit): _*)
      size(filter(ts, t => array_contains(w, t)))
    }
  }

  /** Predicted language: argmax of marker hits, ties broken by language
    * code ascending (the `langMarkers` order), "und" (undetermined) when
    * no marker hits at all. Deterministic, SQL-reproducible.
    */
  def langId(text: Column): Column = {
    val scores = langScores(text)
    val best = greatest(scores: _*)
    val pick = langMarkers.zip(scores).foldRight(lit("und")) {
      case (((code, _), s), acc) => when(s === best, lit(code)).otherwise(acc)
    }
    when(best > 0, pick).otherwise(lit("und"))
  }

  /** Characteristic character trigrams per language — the classic
    * n-gram-profile language heuristic (Cavnar & Trenkle '94 shape,
    * profile deliberately tiny). The zh row matches the fixture's
    * pinyin-with-tone-digit romanization.
    */
  val langTrigrams: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "ein", "sch", "ung", "cht"),
    "en" -> Seq("the", "ing", "and", "ion", "ent"),
    "es" -> Seq("que", "ado", "los", "nte", "cio"),
    "fr" -> Seq("les", "ent", "que", "eur", "ais"),
    "zh" -> Seq("de5", "hi4", "le5", "bu4", "wo3"))

  /** Occurrences of a literal substring: (len − len(without)) / |sub| —
    * two string ops, no regex machinery, SQL-identical in any engine.
    */
  private def occurrences(text: Column, sub: String): Column =
    (length(text) - length(replace(text, lit(sub)))) / sub.length

  /** Per-language char-trigram hit counts over the lowercased text. */
  def langNgramScores(text: Column): Seq[Column] = {
    val t = lower(text)
    langTrigrams.map { case (_, tris) =>
      tris.map(occurrences(t, _)).reduce(_ + _).cast("long")
    }
  }

  /** N-gram language ID: argmax of trigram occurrences, ties broken by
    * language code ascending, "und" when nothing matches. The
    * word-marker [[langId]] is the token-level sibling; this one works
    * on raw characters, so it also catches languages glued by
    * punctuation or unusual spacing.
    */
  def langIdNgram(text: Column): Column = {
    val scores = langNgramScores(text)
    val best = greatest(scores: _*)
    val pick = langTrigrams.zip(scores).foldRight(lit("und")) {
      case (((code, _), s), acc) => when(s === best, lit(code)).otherwise(acc)
    }
    when(best > 0, pick).otherwise(lit("und"))
  }

  /** Stable 128-bit content fingerprint (hex md5 of the normalized token
    * stream) — the exact-dedup key. Normalizing first makes it a
    * *text* fingerprint rather than a byte fingerprint: whitespace and
    * case differences collapse.
    */
  def fingerprint(text: Column): Column =
    md5(concat_ws(" ", tokens(text)))

  /** Rolling polynomial fingerprint of the token stream (Rabin-Karp
    * shape: h = h*B + tokenHash mod P). Expressed with `aggregate` so it
    * is still a codegen'd expression; the modulus keeps every
    * intermediate below 2^63 so Spark and an ANSI-SQL oracle (which
    * would overflow-error, not wrap) agree exactly. The per-token hash
    * is the first 8 md5 hex digits as an integer — md5 is the one hash
    * Spark and DuckDB both expose bit-identically (crc32/xxhash are
    * Spark-only), which keeps the whole fingerprint oracle-checkable.
    */
  def rollingFingerprint(text: Column): Column = {
    val P = 2147483647L // 2^31-1: h*B + x stays < 2^52, no long overflow
    val B = 1000003L
    aggregate(
      tokens(text),
      lit(0L),
      (h, t) => pmod(h * B + conv(substring(md5(t), 1, 8), 16, 10).cast("long"), lit(P)))
  }

  /** One-pass JVM kernel for marker-word language ID: appends the five
    * per-language score columns (`s_de`…`s_zh`, [[langMarkers]] order)
    * and `lang_pred` — one tokenization instead of six (each
    * [[langScores]] column plus [[langId]]'s argmax re-tokenizes).
    * Pinned ≡ the Column forms in TextStatsKernelSpec: ties break to
    * the alphabetically-first code, all-zero → "und", NULL text →
    * NULL scores + "und".
    */
  def withLangId(df: org.apache.spark.sql.DataFrame, textCol: String)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.types._
    val outSchema = StructType(df.schema.fields ++
      (langMarkers.map { case (code, _) => StructField(s"s_$code", IntegerType) } :+
        StructField("lang_pred", StringType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val idx = df.schema.fieldIndex(textCol)
    val markerSets = langMarkers.map { case (code, ws) => (code, ws.toSet) }.toArray
    df.mapPartitions { it =>
      it.map { r =>
        if (r.isNullAt(idx)) {
          org.apache.spark.sql.Row.fromSeq(
            r.toSeq ++ markerSets.map(_ => null).toSeq :+ "und")
        } else {
          val toks = r.getString(idx).toLowerCase(java.util.Locale.ROOT)
            .split("\\s+").filter(_.nonEmpty)
          val scores = new Array[Int](markerSets.length)
          toks.foreach { t =>
            var i = 0
            while (i < markerSets.length) {
              if (markerSets(i)._2.contains(t)) scores(i) += 1
              i += 1
            }
          }
          var best = 0
          scores.foreach(s => if (s > best) best = s)
          val pred =
            if (best == 0) "und"
            else markerSets(scores.indexWhere(_ == best))._1
          org.apache.spark.sql.Row.fromSeq(
            r.toSeq ++ scores.toSeq :+ pred)
        }
      }
    }(enc)
  }

  /** One-pass JVM kernel for char-trigram language ID: appends the five
    * `g_de`…`g_zh` counts ([[langTrigrams]] order) and `lang_pred`.
    * The Column forms evaluate `lower(text)` + a `replace` per trigram
    * (25 string rewrites per row); the kernel lowercases once and
    * counts all trigrams by non-overlapping left-to-right scan —
    * exactly `replace`'s removal semantics. Pinned ≡ the Column forms
    * in TextStatsKernelSpec (argmax/tie/und/null identical to
    * [[withLangId]]).
    */
  def withLangIdNgram(df: org.apache.spark.sql.DataFrame, textCol: String)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.types._
    val outSchema = StructType(df.schema.fields ++
      (langTrigrams.map { case (code, _) => StructField(s"g_$code", LongType) } :+
        StructField("lang_pred", StringType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val idx = df.schema.fieldIndex(textCol)
    val tris = langTrigrams.map { case (code, ts) => (code, ts.toArray) }.toArray
    def countOcc(s: String, sub: String): Long = {
      var c = 0L
      var i = s.indexOf(sub)
      while (i >= 0) { c += 1; i = s.indexOf(sub, i + sub.length) }
      c
    }
    df.mapPartitions { it =>
      it.map { r =>
        if (r.isNullAt(idx)) {
          org.apache.spark.sql.Row.fromSeq(
            r.toSeq ++ tris.map(_ => null).toSeq :+ "und")
        } else {
          val lower = r.getString(idx).toLowerCase(java.util.Locale.ROOT)
          val scores = tris.map { case (_, ts) =>
            var s = 0L; ts.foreach(t => s += countOcc(lower, t)); s
          }
          var best = 0L
          scores.foreach(s => if (s > best) best = s)
          val pred =
            if (best == 0L) "und"
            else tris(scores.indexWhere(_ == best))._1
          org.apache.spark.sql.Row.fromSeq(r.toSeq ++ scores.toSeq :+ pred)
        }
      }
    }(enc)
  }

  /** Per-document token-distribution Shannon entropy (bits):
    * H = −Σ (c/n)·log₂(c/n) = log₂n − (Σ c·ln c)/(n·ln 2) over the
    * within-doc token frequencies — the repetition-collapse signal
    * (spam pages repeating a token farm score near 0; diverse prose
    * near log₂ n). Two keyed aggregations — explode → (doc, token)
    * counts with map-side combine → per-doc fold; no joins, no driver
    * state. Counts are exact longs, so both engines derive the same
    * doubles up to summation order (rounded to 6 by callers, the
    * [[LmScore]] discipline). Docs with no tokens (empty/whitespace
    * text) are absent from the output, matching an `unnest`-based SQL
    * mirror.
    */
  def tokenEntropy(df: org.apache.spark.sql.DataFrame, textCol: String, idCol: String)
      : org.apache.spark.sql.DataFrame = {
    val toks = df.filter(col(textCol).isNotNull)
      .select(col(idCol), explode(tokens(col(textCol))).as("__t"))
    toks.groupBy(col(idCol), col("__t"))
      .agg(count(lit(1)).as("__c"))
      .groupBy(col(idCol))
      .agg(sum(col("__c")).as("n_tokens"),
        sum(col("__c") * log(col("__c"))).as("__clogc"))
      .select(col(idCol),
        col("n_tokens"),
        ((log(col("n_tokens")) - col("__clogc") / col("n_tokens")) / math.log(2.0))
          .as("entropy"))
  }

  /** One-pass JVM kernel computing ALL the text-stats columns —
    * n_tokens, n_bpe, mean_tok_len, stopword_ratio, punct_ratio,
    * quality — appended to `df`. Same discipline as
    * [[QualityFilters.withSignals]] and `Gsod.parseLines`: the Column
    * forms above are the semantic reference (pinned equivalent in
    * TextStatsKernelSpec, non-ASCII included), the kernel is the hot
    * path. Six independent Column projections each re-tokenize /
    * re-regex the text (~6 regex passes per row); the kernel runs one
    * split, one sub-word regex, and one character scan.
    *
    * Exactness notes (each pinned by spec):
    *  - lengths count CODE POINTS, matching Spark's `length` on
    *    UTF8String (Java's String.length counts UTF-16 units and would
    *    diverge on astral chars);
    *  - the character scan replicates java.util.regex semantics of the
    *    Column forms' patterns: `\s` is ASCII-only, `[a-zA-Z0-9]` on
    *    the ORIGINAL case (punct_ratio does not lowercase);
    *  - ratio columns are emitted UNROUNDED (callers round like they
    *    would the Column forms); quality rounds internally with the
    *    same BigDecimal HALF_UP as Spark's `round`.
    */
  def withTextStats(df: org.apache.spark.sql.DataFrame, textCol: String)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.types._
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField("n_tokens", IntegerType, nullable = true),
      StructField("n_bpe", IntegerType, nullable = true),
      StructField("mean_tok_len", DoubleType, nullable = false),
      StructField("stopword_ratio", DoubleType, nullable = false),
      StructField("punct_ratio", DoubleType, nullable = false),
      StructField("quality", DoubleType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val idx = df.schema.fieldIndex(textCol)
    val stopwords = stopwordsEn.toSet
    val bpeRe = java.util.regex.Pattern.compile("[a-z0-9]+|[^a-z0-9\\s]")
    df.mapPartitions { it =>
      it.map { r =>
        if (r.isNullAt(idx)) {
          // NULL text through the Column forms: size(null) = null for
          // both counts; the when(...).otherwise(0.0) ratios fall to
          // 0.0; qualityScore's null-skipping least/greatest chain
          // evaluates to 0.5·1 + 0.3·0 + 0.2·1 = 0.7. Pinned in spec.
          org.apache.spark.sql.Row.fromSeq(
            r.toSeq ++ Seq(null, null, 0.0, 0.0, 0.0, 0.7))
        } else {
        val text = r.getString(idx)
        val lower = text.toLowerCase(java.util.Locale.ROOT)
        val toks = lower.split("\\s+").filter(_.nonEmpty)
        val nTok = toks.length

        var bpe = 0
        val m = bpeRe.matcher(lower)
        while (m.find()) bpe += 1

        var tokLenSum = 0L // code points, matching length(t) per token
        var sw = 0
        toks.foreach { t =>
          tokLenSum += t.codePointCount(0, t.length)
          if (stopwords.contains(t)) sw += 1
        }

        // one scan ≡ length(regexp_replace(text,"\s+","")) and the
        // [a-zA-Z0-9] strip — java \s is ASCII-only; count code points
        var nonSpace = 0
        var punct = 0
        var i = 0
        while (i < text.length) {
          val cp = text.codePointAt(i)
          val isSpace = cp == ' ' || cp == '\t' || cp == '\n' || cp == 0x0B ||
            cp == '\f' || cp == '\r'
          if (!isSpace) {
            nonSpace += 1
            val alnum = (cp >= 'a' && cp <= 'z') || (cp >= 'A' && cp <= 'Z') ||
              (cp >= '0' && cp <= '9')
            if (!alnum) punct += 1
          }
          i += Character.charCount(cp)
        }

        val meanLen = if (nTok > 0) tokLenSum.toDouble / nTok else 0.0
        val swRatio = if (nTok > 0) sw.toDouble / nTok else 0.0
        val pRatio = if (nonSpace > 0) punct.toDouble / nonSpace else 0.0

        val nTokD = nTok.toDouble
        val lenScore = math.min(nTokD / 20.0, 1.0) *
          math.min(1.0, 500.0 / math.max(nTokD, 1.0))
        val swScore = math.min(swRatio * 5.0, 1.0)
        val punctScore = 1.0 - math.min(pRatio * 2.0, 1.0)
        val quality = java.math.BigDecimal
          .valueOf(0.5 * lenScore + 0.3 * swScore + 0.2 * punctScore)
          .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

        // Seq[Any]: a bare Seq(Int, …, Double) unifies to Seq[Double]
        // and silently widens the counts
        org.apache.spark.sql.Row.fromSeq(
          r.toSeq ++ Seq[Any](nTok, bpe, meanLen, swRatio, pRatio, quality))
        }
      }
    }(enc)
  }
}
