package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-trained byte-pair-encoding tokenizer (Sennrich et al. 2016,
  * the public BPE algorithm every modern LLM tokenizer descends from)
  * — closes the round-8 gap that every token-denominated operator
  * (budget fill, chunking, entropy) counted WHITESPACE tokens, which
  * are off real subword counts by 1.3-2× and language-dependent.
  *
  * Spark shape (the deterministic-iteration contract of
  * graft.sim.KMeans / graft.ml.LinearGd): the vocabulary is a
  * DISTRIBUTED (word, count, symbol-string) table; each merge round is
  * one pair-count groupBy (exact integer sums) plus a 1-row collect of
  * the argmax pair (bounded driver state: two symbols + a long), then
  * a broadcast literal `replace` over the vocab. At 100 TB the corpus
  * is scanned ONCE (the word histogram); all N rounds iterate the
  * vocab table, which is |distinct words| — millions, not billions —
  * and never the corpus.
  *
  * Symbol-string representation (shared verbatim with the DuckDB
  * oracle so every round replays bit-for-bit): each word renders as
  * its characters '|'-wrapped plus a terminal end-of-word marker '_',
  * e.g. "the" → `|t||h||e||_|`. A merge of (lhs, rhs) is the plain
  * string replace `|lhs||rhs|` → `|lhsrhs|` — left-to-right
  * non-overlapping, which IS greedy BPE pair application, and the
  * double-separator boundary makes adjacent matches unambiguous
  * (`|a||b||a||b|` → `|ab||ab|`, never a partial overlap). Words are
  * pre-tokenized `[a-z0-9]+` of the lowercased text, so '|' and '_'
  * can never collide with content.
  *
  * Determinism: pair counts are exact integer sums; the winning pair
  * orders by (count DESC, lhs ASC, rhs ASC) — binary string order,
  * identical across engines on this alphabet. No floats anywhere.
  */
object Bpe {

  final case class Merge(step: Int, lhs: String, rhs: String, cnt: Long)

  /** merges: the learned table in training order; vocab: (word, n,
    * symstr, n_tokens) — the corpus vocabulary with each word's final
    * symbol string and subword token count.
    */
  final case class Model(merges: Seq[Merge], vocab: DataFrame)

  /** `[a-z0-9]+` words of the lowercased text — the pre-tokenizer,
    * shared by training and encoding (and the oracle's
    * regexp_extract_all).
    */
  def words(text: Column): Column =
    regexp_extract_all(lower(text), lit("[a-z0-9]+"), lit(0))

  private def wordsOf(textCol: String): Column = words(col(textCol))

  /** Initial symbol string of a word: chars wrapped in '|' + end marker. */
  private def wrapped(word: Column): Column =
    concat(lit("|"), regexp_replace(word, "(.)", "$1||"), lit("_|"))

  /** Symbols of a symbol string (split the '||' joints). */
  private def symbols(symstr: Column): Column =
    split(symstr.substr(lit(2), length(symstr) - 2), "\\|\\|")

  /** Train `steps` merges on the corpus. One corpus scan (word
    * histogram), then per round: pair-count groupBy over the vocab +
    * one 1-row collect + a literal replace. The vocab stays cached
    * across rounds (previous round unpersisted once the next is
    * materialized by the argmax job).
    */
  def train(df: DataFrame, textCol: String, steps: Int): Model = {
    require(steps >= 0, "steps must be non-negative")
    var vocab = df
      .select(explode(wordsOf(textCol)).as("word"))
      .groupBy("word").agg(count(lit(1)).as("n"))
      .withColumn("symstr", wrapped(col("word")))
      .persist()
    val merges = Seq.newBuilder[Merge]
    for (step <- 0 until steps) {
      val s = symbols(col("symstr"))
      // Adjacent pairs as zip(s[0..len−2], s[1..len−1]); the greatest()
      // guard keeps 1-symbol words (fully merged) at an EMPTY pair
      // list — sequence(0, −1) would count backwards instead.
      val nPairs = greatest(size(s) - 1, lit(0))
      val pairRows = vocab
        .select(col("n"), explode(arrays_zip(
          slice(s, lit(1), nPairs).as("lhs"),
          slice(s, lit(2), nPairs).as("rhs"))).as("pr"))
        .groupBy(col("pr.lhs").as("lhs"), col("pr.rhs").as("rhs"))
        .agg(sum(col("n")).as("cnt"))
      val best = pairRows
        .orderBy(col("cnt").desc, col("lhs").asc, col("rhs").asc)
        .limit(1).collect()
      if (best.isEmpty) {
        // Degenerate corpus (no pairs left) — stop early, loudly
        // visible in the short merge table rather than padded rows.
        vocab.unpersist()
        return Model(merges.result(), finalVocab(vocab))
      }
      val (lhs, rhs, cnt) =
        (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
      merges += Merge(step, lhs, rhs, cnt)
      val next = vocab.withColumn("symstr",
        call_function("replace", col("symstr"),
          lit(s"|$lhs||$rhs|"), lit(s"|$lhs$rhs|")))
        .persist()
      next.count() // materialize before dropping the parent cache
      vocab.unpersist()
      vocab = next
    }
    val out = Model(merges.result(), finalVocab(vocab))
    out.vocab.persist().count()
    vocab.unpersist()
    out
  }

  private def finalVocab(vocab: DataFrame): DataFrame =
    vocab.withColumn("n_tokens", size(symbols(col("symstr"))).cast("long"))

  /** Per-document BPE token counts for the TRAINING corpus: explode
    * words, join the (broadcastable) vocab's per-word counts, sum per
    * doc. Docs with zero words get 0. One small shuffle keyed by the
    * doc id; the vocab side broadcasts.
    */
  def tokenCounts(
      df: DataFrame,
      textCol: String,
      idCol: String,
      model: Model,
      outCol: String = "bpe_tokens"): DataFrame = {
    val counts = df
      .select(col(idCol).as("__bid"), explode(wordsOf(textCol)).as("word"))
      .join(broadcast(model.vocab.select(col("word"), col("n_tokens"))), "word")
      .groupBy("__bid").agg(sum(col("n_tokens")).as(outCol))
    df.join(counts, df(idCol) === counts("__bid"), "left")
      .drop("__bid")
      .withColumn(outCol, coalesce(col(outCol), lit(0L)))
  }

  /** Encode ARBITRARY text (not necessarily in the training corpus):
    * per word, apply the learned merges in training order as chained
    * replaces, then count symbols; sum over the words. Pure Column
    * expression — scan-local, codegen-friendly, no join. Pinned
    * equivalent to the vocab-join path on the training corpus by
    * BpeSpec.
    */
  def countTokens(text: Column, merges: Seq[Merge]): Column = {
    val perWord = transform(words(text), w => {
      val encoded = merges.foldLeft(wrapped(w)) { (acc, m) =>
        call_function("replace", acc,
          lit(s"|${m.lhs}||${m.rhs}|"), lit(s"|${m.lhs}${m.rhs}|"))
      }
      size(symbols(encoded)).cast("long")
    })
    coalesce(aggregate(perWord, lit(0L), (acc, x) => acc + x), lit(0L))
  }

  // ---- one-pass JVM kernel ------------------------------------------

  /** [[countTokens]] as a JVM function — the hot-path form: the Column
    * tree runs `merges.size` chained replaces inside an INTERPRETED
    * higher-order transform per word (~16 string walks × every word of
    * every chunk). Same semantics symbol-for-symbol: lowercase
    * [a-z0-9]+ word runs, char-wrapped symbol strings, the merges as
    * left-to-right non-overlapping replaces in training order (Java
    * String.replace ≡ SQL replace), then the symbol count. Pinned ≡
    * the Column form by BpeSpec (kernel≡Column, the
    * TextFunctions/UrlOps discipline).
    */
  def countTokensJvm(text: String, merges: Seq[Merge]): Long = {
    if (text == null) return 0L
    val finds = merges.map(m => s"|${m.lhs}||${m.rhs}|").toArray
    val repls = merges.map(m => s"|${m.lhs}${m.rhs}|").toArray
    countTokensJvmPre(text, finds, repls)
  }

  private def countTokensJvmPre(
      text: String,
      finds: Array[String],
      repls: Array[String]): Long = {
    if (text == null) return 0L
    // Locale-independent, matching Spark's lower() (a default-locale
    // toLowerCase would hit the Turkish-I trap).
    val lower = text.toLowerCase(java.util.Locale.ROOT)
    var total = 0L
    var i = 0
    val n = lower.length
    while (i < n) {
      val c = lower.charAt(i)
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) {
        var j = i + 1
        while (j < n && {
          val d = lower.charAt(j)
          (d >= 'a' && d <= 'z') || (d >= '0' && d <= '9')
        }) j += 1
        // wrapped symbol string of the word lower[i, j)
        val sb = new java.lang.StringBuilder(2 + 3 * (j - i) + 2)
        sb.append('|')
        var k = i
        while (k < j) { sb.append(lower.charAt(k)).append("||"); k += 1 }
        sb.append("_|")
        var sym = sb.toString
        var m = 0
        while (m < finds.length) {
          sym = sym.replace(finds(m), repls(m))
          m += 1
        }
        // symbols = '||' joints in the inner string + 1
        var joints = 0
        var p = sym.indexOf("||", 1)
        while (p >= 0 && p < sym.length - 2) {
          joints += 1
          p = sym.indexOf("||", p + 2)
        }
        total += joints + 1
        i = j
      } else i += 1
    }
    total
  }

  /** `df` plus `outCol` = [[countTokensJvm]] of `textCol` — one
    * mapPartitions pass with the merge tables precompiled once.
    */
  def withBpeCount(
      df: org.apache.spark.sql.DataFrame,
      textCol: String,
      merges: Seq[Merge],
      outCol: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types.LongType
    val outSchema = df.schema.add(outCol, LongType, nullable = false)
    val enc = Encoders.row(outSchema)
    val idx = df.schema.fieldIndex(textCol)
    val finds = merges.map(m => s"|${m.lhs}||${m.rhs}|").toArray
    val repls = merges.map(m => s"|${m.lhs}${m.rhs}|").toArray
    df.mapPartitions { it =>
      it.map { r =>
        val t = if (r.isNullAt(idx)) null else r.getString(idx)
        Row.fromSeq(r.toSeq :+ countTokensJvmPre(t, finds, repls))
      }
    }(enc)
  }
}
