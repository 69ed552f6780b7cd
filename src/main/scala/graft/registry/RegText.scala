package graft.registry

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, LongType, StructField, StructType}
import graft.dedup.{Clusters, Decontaminate, Dedup, MinHashLsh, SimHash, SubstrDedup}
import graft.io.Gsod
import graft.multimodal.{ImageDedup, Multimodal}
import graft.operators.{AsofJoin, BloomJoin, Funnel, RangeJoin, Salting, Sampling, Scd2}
import graft.pipeline.TrainingPipeline
import graft.sources.BucketedTables
import graft.sim.{AnnLsh, IvfFlat, IvfPq, KMeans, ProductQuantizer, VectorSim}
import graft.skyline.{Max, Min, ReverseSkyline, SkyDim, SkyMr, SkylineOp, SkylineSpec}
import graft.stats.{DistinctSketch, QuantileSketch, RangeStats}
import graft.text.{Bm25, Bpe, InvertedIndex, LmScore, Pii, QualityFilters, TextFunctions}
import graft.{SparkEntry, Tables}
import graft.SparkEntry._

/** Text slice of the [[SparkEntry]] query/oracle registry. Split from
  * the former single 15k-line entry file so scalac parallelizes across
  * domains and no single Map literal dominates compile time or method
  * size. Entry names, bodies, and oracle SQL are the driver contract,
  * byte-for-byte as they were in SparkEntry; shared fixtures and
  * oracle CTE builders stay on [[SparkEntry]] (private[graft]). */
private[graft] object RegText {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- text analysis over `documents` -------------------------------

    // Per-document token counts, quality signals, composite score — all
    // codegen'd Column expressions (graft.text.TextFunctions).
    // One-pass kernel (TextFunctions.withTextStats): the six Column
    // forms each re-tokenize/re-regex the text (~6 regex passes/row);
    // the kernel runs one split + one sub-word regex + one char scan,
    // pinned ≡ the Column forms by TextStatsKernelSpec (nulls and
    // non-ASCII included).
    "q_text_stats" -> { (s, dir) =>
      TextFunctions.withTextStats(
        Tables.load(s, dir, "documents").select("doc_id", "text"), "text")
        .select(
          col("doc_id"),
          col("n_tokens"),
          col("n_bpe"),
          round(col("mean_tok_len"), 6).as("mean_tok_len"),
          round(col("stopword_ratio"), 6).as("stopword_ratio"),
          round(col("punct_ratio"), 6).as("punct_ratio"),
          col("quality"))
        .orderBy("doc_id")
    },


    // FLESCH READING EASE per language: per-doc 206.835 −
    // 1.015·(words/sentences) − 84.6·(syllables/words) with exact long
    // word / sentence-run / vowel-group counts (clamped ≥1 in the
    // ratios only), the per-doc double rounded to 4 and summed as
    // exact DECIMAL (the Eval.calibration mean discipline — corpus
    // averages must not depend on summation order). Scan-local kernel,
    // one keyed agg.
    "q_readability" -> { (s, dir) =>
      val d = Tables.load(s, dir, "documents")
      val w = TextFunctions.tokenCount(col("text")).cast("long")
      val sc = TextFunctions.sentenceCount(col("text"))
      val y = TextFunctions.vowelGroupCount(col("text"))
      val wd = greatest(lit(1L), col("w")).cast("double")
      val sd = greatest(lit(1L), col("sc")).cast("double")
      val flesch = round(lit(206.835) - lit(1.015) * (wd / sd) -
        lit(84.6) * (col("y").cast("double") / wd), 4)
      d.select(col("lang"), w.as("w"), sc.as("sc"), y.as("y"))
        .withColumn("fl", flesch.cast("decimal(18,4)"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("w")).as("sum_words"),
          sum(col("sc")).as("sum_sents"),
          sum(col("y")).as("sum_sylls"),
          round(sum(col("fl")).cast("double") / count(lit(1)), 6)
            .as("mean_flesch"))
        .orderBy("lang")
    },


    // TOKENIZER FERTILITY per language (subword tokens per whitespace
    // word — THE tokenizer-evaluation metric: fertility ≫ 1 on a
    // language means the vocab under-serves it and its effective
    // context shrinks): the corpus-trained BPE's token counts joined
    // with word counts, aggregated per lang. Reuses the replayable
    // BPE encode (q_bpe_encode) — one scan each side, one tiny join.
    "q_tokenizer_fertility" -> { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      val bpe = Bpe.tokenCounts(docs, "text", "doc_id", bpeModelFor(s, dir))
        .select("doc_id", "bpe_tokens")
      val words = docs.select(col("doc_id"), col("lang"),
        TextFunctions.tokenCount(col("text")).cast("long").as("words"))
      words.join(bpe, "doc_id")
        .filter(col("words") > 0)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("bpe_tokens")).as("sum_bpe"),
          sum(col("words")).as("sum_words"),
          round(sum(col("bpe_tokens")).cast("double") / sum(col("words")), 6)
            .as("fertility"))
        .orderBy("lang")
    },


    // ROBOTS.TXT COMPLIANCE with RFC-9309 LONGEST-MATCH semantics —
    // the crawl pipeline's first gate: per host the longest matching
    // path prefix decides, Allow beats Disallow on a length tie.
    // Rules are synthesized per host from its md5 (full-disallow
    // hosts, a Disallow prefix, and a longer Allow override), so both
    // engines derive the identical rule set. Lookup is a broadcast-
    // able host equi join; the longest-match argmax is one keyed
    // integer-score aggregate — no struct compare, no window
    // (graft.text.Robots, RobotsSpec).
    "q_robots" -> { (s, dir) =>
      val o = Tables.load(s, dir, "orders")
      val urls = o.select(col("o_orderkey"),
        syntheticUrlExpr(col("o_custkey"), col("o_orderkey")).as("url"))
      // parse ONCE (host+path regexes are the dominant cost) — the
      // checkpointed frame feeds both the rule synthesis and the
      // verdict join; rules lose their stats behind it, so broadcast
      // explicitly (the ALS localCheckpoint lesson, ADVICE r11).
      val parsed = urls.select(col("o_orderkey"),
          graft.text.UrlOps.host(col("url")).as("host"),
          graft.text.Robots.pathQuery(col("url")).as("path"))
        .localCheckpoint()
      val hosts = parsed.select("host").distinct()
      val h = conv(substring(md5(col("host")), 1, 15), 16, 10).cast("long")
      val full = hosts.filter(pmod(h, lit(5L)) === 0)
        .select(col("host"), lit("/").as("rule"), lit(false).as("allow"))
      val rest = hosts.filter(pmod(h, lit(5L)) =!= 0)
      val dis = rest.select(col("host"),
        concat(lit("/items%2fview/"), pmod(h, lit(10L)).cast("string"))
          .as("rule"), lit(false).as("allow"))
      val alw = rest.select(col("host"),
        concat(lit("/items%2fview/"), pmod(h, lit(10L)).cast("string"),
          lit("0")).as("rule"), lit(true).as("allow"))
      graft.text.Robots.evaluateParsed(parsed, Seq("o_orderkey"),
          broadcast(full.unionAll(dis).unionAll(alw)))
        .groupBy("verdict")
        .agg(count(lit(1)).as("n_urls"),
          countDistinct(col("host")).as("n_hosts"),
          sum(pmod(col("o_orderkey"), lit(100000L))).as("key_checksum"))
        .orderBy("verdict")
    },


    // Within-domain BOILERPLATE detection (the CCNet/RefinedWeb
    // header/footer strip that runs BEFORE dedup): a planted 8-token
    // per-source notice on every even doc (constructing the hard case
    // is the test — the q_pii planting discipline) must surface as
    // exactly its two 4-token chunks per source at the integer-exact
    // df·10 ≥ 3·n_docs rule, while the prose chunks stay clean. One
    // explode + (source, chunk) countDistinct — a corpus-count job
    // (graft.text.Boilerplate, BoilerplateSpec).
    "q_boilerplate" -> { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
        .withColumn("t2", when(col("doc_id") % 2 === 0,
          concat(lit("begin boilerplate notice for "), col("source"),
            lit(" all rights reserved "), col("text")))
          .otherwise(col("text")))
      graft.text.Boilerplate.detect(docs, "t2", "doc_id", "source",
          n = 4, num = 3, den = 10)
        .groupBy("source")
        .agg(max(col("n_docs")).as("n_docs"),
          count(lit(1)).as("n_chunks"),
          sum(when(col("is_boiler"), 1L).otherwise(0L))
            .as("n_boiler_chunks"),
          sum(when(col("is_boiler"), col("df")).otherwise(0L))
            .as("boiler_hits"))
        .orderBy("source")
    },


    // Interpolated Kneser-Ney bigram LM trained on the doc_id%5!=0
    // split, scored on the held-out split — LM TRAINING as a corpus
    // job (q_lm_score is fixed add-α scoring; this learns the
    // discount/continuation form). Exact-long count tables, three
    // keyed left joins for the eval pass, two driver scalars (B, V);
    // per-source mean ln P rounded to 6 (the lm_score float
    // contract), plus the integer backoff count as an exact
    // cross-check (graft.text.KneserNey, KneserNeySpec).
    "q_kn_lm" -> { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      graft.text.KneserNey.heldOutLogProb(docs, "text", "source",
        col("doc_id") % 5 =!= 0).orderBy("source")
    },


    // Dense vocabulary ids at corpus scale: 0..V-1 by (count desc,
    // token asc) via range-partition + within-partition sort +
    // zipWithIndex (driver state = one count per partition), NEVER
    // row_number() over an unpartitioned window — the single-partition
    // sort that caps out exactly when the vocab gets interesting. The
    // 10-bucket Σ id·cnt checksum pins the ENTIRE assignment, not a
    // head sample (graft.text.Vocab; window-equivalence + plan shape
    // in VocabSpec).
    "q_vocab_ids" -> { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      val counts = docs
        .select(explode(TextFunctions.tokens(col("text"))).as("token"))
        .groupBy("token").agg(count(lit(1)).as("cnt"))
      graft.text.Vocab.assignIds(counts, "token", "cnt", parts = 32)
        .groupBy(pmod(col("id"), lit(10L)).as("bucket"))
        .agg(count(lit(1)).as("n_tokens"),
          sum(col("id") * col("cnt")).as("idcnt_checksum"),
          min(col("id")).as("min_id"), max(col("id")).as("max_id"),
          sum(col("cnt")).as("sum_cnt"))
        .orderBy("bucket")
    },


    // Incremental vocab update with STABLE ids: the 4/5 split's vocab
    // ids are frozen (already-encoded corpora reference them); the
    // held-out fifth's unseen tokens append at V, V+1, … by (delta
    // count desc, token). Counts merge through one full-outer keyed
    // join; the new tail reuses the window-free assignment. Same
    // 10-bucket full-assignment checksum as q_vocab_ids plus the
    // per-bucket new-token count (graft.text.Vocab.updateIds).
    "q_vocab_incr" -> { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      def counts(d: DataFrame) = d
        .select(explode(TextFunctions.tokens(col("text"))).as("token"))
        .groupBy("token").agg(count(lit(1)).as("cnt"))
      val baseIds = graft.text.Vocab.assignIds(
        counts(docs.filter(col("doc_id") % 5 =!= 0)), "token", "cnt", 32)
      val updated = graft.text.Vocab.updateIds(baseIds,
        counts(docs.filter(col("doc_id") % 5 === 0)), "token", "cnt", 32)
      updated.groupBy(pmod(col("id"), lit(10L)).as("bucket"))
        .agg(count(lit(1)).as("n_tokens"),
          sum(when(col("is_new"), 1L).otherwise(0L)).as("n_new"),
          sum(col("id") * col("cnt")).as("idcnt_checksum"),
          sum(col("cnt")).as("sum_cnt"))
        .orderBy("bucket")
    },


    // Marker-word language heuristic; deterministic argmax with
    // alphabetical tie-break. One-pass kernel (withLangId) — the six
    // Column forms each re-tokenize; pinned ≡ in TextStatsKernelSpec.
    "q_lang_id" -> { (s, dir) =>
      TextFunctions.withLangId(
        Tables.load(s, dir, "documents").select("doc_id", "text"), "text")
        .drop("text")
        .orderBy("doc_id")
    },


    // Char-trigram sibling of q_lang_id (Cavnar-Trenkle-shape profile,
    // substring counting via length arithmetic — no regex, no tokens).
    // One-pass kernel (withLangIdNgram): the Column forms rewrite the
    // string 25 times (a replace per trigram); pinned ≡ in
    // TextStatsKernelSpec.
    "q_lang_id_ngram" -> { (s, dir) =>
      TextFunctions.withLangIdNgram(
        Tables.load(s, dir, "documents").select("doc_id", "text"), "text")
        .drop("text")
        .orderBy("doc_id")
    },


    // Gopher-style repetition quality signals: duplicate/top token and
    // n-gram fractions + the threshold gate, via the one-pass JVM
    // kernel (the Column forms are the pinned-equivalent semantic
    // reference; inlined into nested HOF lambdas they cost O(n³) regex
    // per row — see QualityFilters.withSignals).
    "q_repetition" -> { (s, dir) =>
      QualityFilters.withSignals(
        Tables.load(s, dir, "documents").select("doc_id", "text"), "text")
        .select(
          col("doc_id"),
          round(col("dup_tok"), 6).as("dup_tok"),
          round(col("top_tok"), 6).as("top_tok"),
          round(col("dup_2gram"), 6).as("dup_2gram"),
          round(col("top_2gram"), 6).as("top_2gram"),
          round(col("top_3gram"), 6).as("top_3gram"),
          col("rep_ok").cast("int").as("rep_ok"))
        .orderBy("doc_id")
    },


    // Per-source TOKEN-budget fill (mixes are specified in tokens, not
    // doc counts): hash-ordered prefix per source until the budget is
    // crossed; soft cap — the crossing doc is kept. One window = one
    // keyed sort-shuffle; selection layout-invariant.
    "q_token_budget" -> { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      val budgets = (0 to 19).map(i => s"src$i" -> (if (i % 2 == 0) 3000L else 1500L)).toMap
      Sampling.tokenBudget(docs, "source", "n_chars", "doc_id", budgets, "tb1")
        .select("doc_id", "source", "n_chars")
        .orderBy("doc_id")
    },


    // URL canonicalization (round-9 directive #3): scheme/host
    // lowercase, userinfo strip, default-port drop, fragment strip,
    // empty-path '/', percent-escape hex uppercased char-by-char —
    // each branch exercised by the synthetic fixture; the registrable
    // domain resolves against the embedded public-suffix subset
    // (graft.text.UrlOps).
    "q_url_canon" -> { (s, dir) =>
      // One-pass kernel (pinned ≡ the canonicalize/urlDomain Column
      // forms by UrlOpsSpec): the Column tree's interpreted
      // percent-escape HOF + repeated regexes cost ~40 µs/row.
      graft.text.UrlOps.withCanonical(
        syntheticUrls(s, dir).select(col("o_orderkey"), col("url")), "url")
        .orderBy("o_orderkey")
    },


    // HTML boilerplate extraction (round-9 directive #2): every doc
    // wrapped into a deterministic page — nav chrome, tracking
    // comment, a script whose BODY contains markup, entities, numeric
    // junk — then extracted by the tag-strip + entity-decode +
    // line-density pipeline (graft.text.Extract). The oracle builds
    // the IDENTICAL page and runs the literally-identical regex/list
    // pipeline in DuckDB; md5 of the extracted prose is compared, so
    // every regex and the integer density gate replay exactly.
    "q_extract" -> { (s, dir) =>
      val html = concat(
        lit("<html><head><title>Doc</title><style>p{color:red}</style>"),
        lit("<script>var x = \"<p>hidden</p>\";</script></head>"),
        lit("<body><div>home</div><div>login</div><!-- tracking -->"),
        lit("<h1>Doc "), col("doc_id").cast("string"), lit("</h1><p>"),
        col("text"),
        lit("</p><p>tail &amp; entity &lt;x&gt; demo line</p>"),
        lit("<div>4 8 15 16 23 42</div><footer>c</footer></body></html>"))
      Tables.load(s, dir, "documents")
        .select(col("doc_id"), graft.text.Extract.text(html).as("extracted"))
        .select(col("doc_id"), md5(col("extracted")).as("h"),
          length(col("extracted")).cast("long").as("n_extracted"))
        .orderBy("doc_id")
    },


    // Corpus-trained BPE tokenizer (round-9 directive #1): the learned
    // merge table itself — 16 rounds of exact pair counting over the
    // distributed vocabulary, argmax pair per round (count DESC, then
    // lexicographic — fully deterministic), greedy merge application
    // as a boundary-safe string replace. The oracle replays EVERY
    // round as an unrolled CTE chain (the q_kmeans/q_lingd
    // deterministic-iteration pattern), so the training itself is
    // hash-checked, not just the outputs.
    "q_bpe" -> { (s, dir) =>
      import s.implicits._
      bpeModelFor(s, dir).merges
        .map(m => (m.step, m.lhs, m.rhs, m.lhs + m.rhs, m.cnt))
        .toDF("step", "lhs", "rhs", "merged", "cnt")
        .orderBy("step")
    },


    // Per-document REAL subword token counts from the trained model —
    // the denomination every budget/chunk/billing operator should use
    // (whitespace counts are off 1.3-2×). Explode words → broadcast
    // vocab join → per-doc sum; scan-local except one keyed sum.
    "q_bpe_encode" -> { (s, dir) =>
      Bpe.tokenCounts(Tables.load(s, dir, "documents"), "text", "doc_id",
        bpeModelFor(s, dir))
        .select("doc_id", "bpe_tokens")
        .orderBy("doc_id")
    },


    // q_token_budget re-based on BPE tokens (round-9 directive #1):
    // same hash-ordered per-source budget fill, but the budget is
    // denominated in real subword tokens from the corpus-trained
    // model. The whitespace-denominated q_token_budget stays as the
    // cross-check tier.
    "q_token_budget_bpe" -> { (s, dir) =>
      val docs = Bpe.tokenCounts(Tables.load(s, dir, "documents"), "text",
        "doc_id", bpeModelFor(s, dir))
      val budgets = (0 to 19).map(i => s"src$i" -> (if (i % 2 == 0) 2000L else 1000L)).toMap
      Sampling.tokenBudget(docs, "source", "bpe_tokens", "doc_id", budgets, "tbbpe1")
        .select("doc_id", "source", "bpe_tokens")
        .orderBy("doc_id")
    },


    // Misra-Gries heavy hitters as a Catalyst TypedImperativeAggregate:
    // top-20 corpus tokens from a bounded-memory mergeable summary
    // (≤ 256 counters per partial buffer) instead of shuffling the full
    // token keyspace. Capacity far exceeds the fixture vocabulary, so
    // counts are exact and the GROUP BY oracle applies (the
    // exact-at-capacity discipline of q_distinct_kmv); the approximate
    // regime's guarantees are pinned in HeavyHittersSpec.
    "q_heavy_hitters" -> { (s, dir) =>
      Tables.load(s, dir, "documents")
        .select(explode(TextFunctions.tokens(col("text"))).as("item"))
        .agg(graft.stats.HeavyHitters.misraGries(col("item"), 256).as("mg"))
        .select(explode(col("mg")).as("e"))
        .select(col("e.item").as("item"), col("e.cnt").as("cnt"))
        .orderBy(col("cnt").desc, col("item").asc)
        .limit(20)
    },


    // Misra-Gries under a KEYED exchange: per-SOURCE top-5 tokens —
    // the corpus-audit query shape (which boilerplate dominates which
    // crawl). The same grouped-aggregate proof q_quantiles_gk_grouped
    // gives the GK sketch: partial summaries merge across the group
    // shuffle (ObjectHashAggregate carries the typed buffer), ≤ 256
    // counters per group per partial — never the full per-source token
    // keyspace. Capacity again exceeds the fixture vocabulary, so
    // per-group counts are exact and the GROUP BY oracle applies.
    "q_heavy_hitters_grouped" -> { (s, dir) =>
      val counts = Tables.load(s, dir, "documents")
        .select(col("source"), explode(TextFunctions.tokens(col("text"))).as("item"))
        .groupBy(col("source"))
        .agg(graft.stats.HeavyHitters.misraGries(col("item"), 256).as("mg"))
        .select(col("source"), explode(col("mg")).as("e"))
        .select(col("source"), col("e.item").as("item"), col("e.cnt").as("cnt"))
      val w = Window.partitionBy(col("source"))
        .orderBy(col("cnt").desc, col("item").asc)
      counts.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") <= 5)
        .drop("__rn")
        .orderBy(col("source"), col("cnt").desc, col("item").asc)
    },


    // Positional phrase search ("slow hash batch" as consecutive
    // tokens): postings filtered to the query's terms BEFORE any join
    // (the Bm25 discipline), then k−1 keyed equi-joins on
    // (doc, anchor-position) — the inverted-index serving shape, never
    // a LIKE scan over every byte (graft.text.Phrase).
    "q_phrase" -> { (s, dir) =>
      graft.text.Phrase.phraseMatches(Tables.load(s, dir, "documents"),
        "text", "doc_id", Seq("slow", "hash", "batch"))
        .orderBy("doc_id")
    },


    // RAKE KEYWORD EXTRACTION (Rose 2010) over the corpus: candidate
    // phrases are maximal non-stopword token runs (scan-local Column
    // chain — TextFunctions.candidatePhrases, no per-doc shuffle),
    // word stats (freq, degree = Σ phrase length) come from ONE keyed
    // aggregate over exploded phrase words, and phrase scores are
    // integer-scaled word-score sums — (deg·10⁴) div freq summed as
    // exact longs, so there is NO float accumulation order anywhere.
    // Top-15 via TakeOrderedAndProject (bounded per partition, never a
    // global sort of the phrase table).
    "q_keywords" -> { (s, dir) =>
      val phrases = Tables.load(s, dir, "documents")
        .filter(col("text").isNotNull)
        .select(explode(graft.text.TextFunctions.candidatePhrases(
          col("text"))).as("phrase"))
      val pw = phrases.select(col("phrase"),
        size(split(col("phrase"), " ")).as("plen"))
        .select(col("phrase"), col("plen"),
          explode(split(col("phrase"), " ")).as("word"))
      val ws = pw.groupBy("word")
        .agg(count(lit(1)).as("freq"), sum(col("plen")).as("deg"))
        .withColumn("wscore", expr("(deg * 10000) div freq"))
      val pc = phrases.groupBy("phrase").agg(count(lit(1)).as("n"))
      pc.select(col("phrase"), col("n"),
          explode(split(col("phrase"), " ")).as("word"))
        .join(ws.select(col("word"), col("wscore")), "word")
        .groupBy("phrase", "n")
        .agg(sum(col("wscore")).as("score"))
        .select(col("phrase"), col("n"), col("score"))
        .orderBy(col("score").desc, col("phrase"))
        .limit(15)
    },


    // Document chunking (the pretraining/RAG segmentation pass):
    // 50-token windows at stride 25 per doc, chunk text re-joined and
    // fingerprinted — scan-local explode, no shuffle until the
    // ORDER BY; short tails kept (chunk = whatever remains).
    "q_chunk" -> { (s, dir) =>
      Tables.load(s, dir, "documents")
        .filter(col("text").isNotNull)
        .select(col("doc_id"), TextFunctions.tokens(col("text")).as("toks"))
        .filter(size(col("toks")) > 0)
        .select(col("doc_id"), col("toks"),
          posexplode(sequence(lit(0), size(col("toks")) - 1, lit(25))))
        .withColumnRenamed("pos", "chunk_idx").withColumnRenamed("col", "start")
        .select(col("doc_id"), col("chunk_idx"),
          size(slice(col("toks"), col("start") + 1, lit(50))).as("n_toks"),
          md5(concat_ws(" ", slice(col("toks"), col("start") + 1, lit(50))))
            .as("chunk_md5"))
        .orderBy("doc_id", "chunk_idx")
    },


    // q_chunk re-based on REAL subword accounting (round-9 directive
    // #1's second half): identical 50/25 word windows, but each chunk
    // billed in BPE tokens via the learned merge table — the number a
    // context-length budget actually constrains. Uses ONLY the
    // driver-side merges (Bpe.countTokens, a scan-local Column fold) —
    // no vocab join, so the chunk pass stays shuffle-free like
    // q_chunk; whitespace n_toks kept alongside as the cross-check.
    "q_chunk_bpe" -> { (s, dir) =>
      val merges = bpeModelFor(s, dir).merges
      val chunks = Tables.load(s, dir, "documents")
        .filter(col("text").isNotNull)
        .select(col("doc_id"), TextFunctions.tokens(col("text")).as("toks"))
        .filter(size(col("toks")) > 0)
        .select(col("doc_id"), col("toks"),
          posexplode(sequence(lit(0), size(col("toks")) - 1, lit(25))))
        .withColumnRenamed("pos", "chunk_idx").withColumnRenamed("col", "start")
        .select(col("doc_id"), col("chunk_idx"),
          size(slice(col("toks"), col("start") + 1, lit(50))).as("n_toks"),
          concat_ws(" ", slice(col("toks"), col("start") + 1, lit(50)))
            .as("chunk_text"))
      // BPE counts via the JVM kernel (pinned ≡ the countTokens Column
      // form by BpeSpec): the Column tree's interpreted per-word
      // replace chain was the #6 bench query at 5.6 s.
      graft.text.Bpe.withBpeCount(chunks, "chunk_text", merges, "n_bpe")
        .select(col("doc_id"), col("chunk_idx"), col("n_toks"), col("n_bpe"),
          md5(col("chunk_text")).as("chunk_md5"))
        .orderBy("doc_id", "chunk_idx")
    },


    // Per-column frequent values (the DETERMINISTIC form of
    // DataFrame.stat.freqItems, whose sketch is order-sensitive):
    // unpivot the audited columns, one keyed count, top-3 per column
    // under a WindowGroupLimit — exact counts, reproducible output.
    "q_freq_items" -> { (s, dir) =>
      val w = Window.partitionBy(col("col_name"))
        .orderBy(col("n").desc, col("value").asc)
      Tables.load(s, dir, "orders")
        .select(expr("stack(2, 'o_orderpriority', o_orderpriority, " +
          "'o_orderstatus', o_orderstatus) AS (col_name, value)"))
        .groupBy("col_name", "value").agg(count(lit(1)).as("n"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select("col_name", "value", "n", "rank")
        .orderBy("col_name", "rank")
    },


    // Token co-occurrence pairs (market-basket over the vocabulary):
    // distinct tokens per doc, within-doc self-join a<b, count docs
    // per pair, top 15. Scale shape: the join is WITHIN a doc key and
    // the pair keyspace is vocabulary², never corpus² — explode is
    // dominated by per-doc distinct vocab, bounded for natural text.
    "q_cooccur" -> { (s, dir) =>
      val toks = Tables.load(s, dir, "documents")
        .filter(col("text").isNotNull)
        .select(col("doc_id"), explode(TextFunctions.tokens(col("text"))).as("t"))
        .distinct()
      val a = toks.select(col("doc_id"), col("t").as("t1"))
      val b = toks.select(col("doc_id"), col("t").as("t2"))
      a.join(b, Seq("doc_id")).filter(col("t1") < col("t2"))
        .groupBy("t1", "t2").agg(count(lit(1)).as("n_docs"))
        .orderBy(col("n_docs").desc, col("t1").asc, col("t2").asc)
        .limit(15)
    },


    // Per-doc top-3 terms by smoothed TF-IDF (sklearn-style
    // idf = ln((1+N)/(1+df)) + 1): full-vocabulary postings with exact
    // integer tf/df/N so both engines derive identical doubles, scores
    // rounded to 6, WindowGroupLimit top-3 per doc. The classic
    // "what is this document about" signal beside BM25's query-scoped
    // ranking.
    "q_tfidf" -> { (s, dir) =>
      val docs = Tables.load(s, dir, "documents").filter(col("text").isNotNull)
      val n = docs.count()
      val posts = docs
        .select(col("doc_id"), explode(TextFunctions.tokens(col("text"))).as("term"))
        .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      val dfreq = posts.groupBy("term").agg(count(lit(1)).as("df"))
      val w = Window.partitionBy(col("doc_id"))
        .orderBy(col("score").desc, col("term").asc)
      posts.join(dfreq, "term")
        .withColumn("score",
          round(col("tf") * (log(lit(1.0 + n) / (col("df") + lit(1.0))) + lit(1.0)), 6))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select(col("doc_id"), col("term"), col("score"), col("rank"))
        .orderBy("doc_id", "rank")
    },


    // AT-REST inverted index: postings (term, doc_id, tf) written once
    // into md5-bucketed `bucket=<b>` partitions, then conjunctive
    // search reads ONLY the query terms' buckets (PartitionFilters
    // prune — the lexical twin of the IVF `list=` layout) and ranks by
    // summed tf. 100 TB shape: serving cost is |q-buckets|/nBuckets of
    // the index bytes, never a corpus rescan (graft.text.InvertedIndex).
    "q_inverted_index" -> { (s, dir) =>
      val path = System.getProperty("java.io.tmpdir") +
        "/graft_inv_index_" + stageTag(dir)
      InvertedIndex.writeIndex(
        Tables.load(s, dir, "documents"), "text", "doc_id", nBuckets = 16, path)
      InvertedIndex.searchAll(s, path, 16,
        Seq("vector", "merge", "filter"), topK = 20)
    },


    // Zipf's-law audit of the corpus vocabulary: top-100 terms by
    // frequency (GlobalRank — range-partitioned total order, never a
    // single-partition window over the vocabulary), then the OLS slope
    // of ln(freq) on ln(rank); healthy natural-language corpora sit
    // near −1, and a drifting slope is an early corpus-poisoning
    // signal. Counts exact; the slope is one closed form over 100
    // rows.
    "q_zipf" -> { (s, dir) =>
      val t = Tables.load(s, dir, "documents").where(col("text").isNotNull)
        .select(explode(graft.text.TextFunctions.tokens(col("text"))).as("term"))
      val f = t.groupBy("term").agg(count(lit(1)).as("freq"))
      val ranked = graft.operators.GlobalRank
        .withGlobalRank(f, Seq((-col("freq")).asc, col("term").asc), "rank")
        .filter(col("rank") <= 100)
      val lr = log(col("rank"))
      val lf = log(col("freq"))
      ranked
        .agg(count(lit(1)).as("n"), max(col("freq")).as("top_freq"),
          sum(lr).as("sx"), sum(lf).as("sy"),
          sum(lr * lf).as("sxy"), sum(lr * lr).as("sxx"))
        .select(col("n").as("n_terms"), col("top_freq"),
          round((col("n") * col("sxy") - col("sx") * col("sy")) /
            (col("n") * col("sxx") - col("sx") * col("sx")), 6).as("slope"))
    },


    // Frequency-of-frequencies spectrum with Good-Turing adjusted
    // counts r* = (r+1)·N_{r+1}/N_r — the species-abundance audit
    // behind LM smoothing and "how many one-time keys exist" capacity
    // questions, here over customer order counts (the fixture's text
    // vocabulary is 31 tokens — no tail to audit; customers have a
    // real Poisson-ish spread). Two keyed aggs over exact integers;
    // r* is one division of exact longs per row; the lead window runs
    // over the ≤ max(r) distinct-count frame, never the corpus.
    "q_token_spectrum" -> { (s, dir) =>
      val freqs = Tables.load(s, dir, "orders")
        .groupBy("o_custkey").agg(count(lit(1)).as("r"))
      val spectrum = freqs.groupBy("r").agg(count(lit(1)).as("n_r"))
      val w = Window.orderBy(col("r"))
      spectrum
        .withColumn("n_r1", lead(col("n_r"), 1).over(w))
        .withColumn("r_next", lead(col("r"), 1).over(w))
        .select(col("r"), col("n_r"),
          round(
            when(col("r_next") === col("r") + 1,
              (col("r") + 1) * col("n_r1") / col("n_r").cast("double")),
            6).as("gt_adjusted"))
        .filter(col("r") <= 15)
        .orderBy("r")
    },


    // Source-mix Shannon entropy per fold — the diversity audit run on
    // every shard of a training mix (a fold that collapsed to two
    // sources is a bug the per-source counts hide). Terms are
    // ln-of-exact-integers; the ≤ 20-term sum is rounded 6 (the
    // LmScore order-noise contract, ~1e-15 « the round grain).
    "q_mix_entropy" -> { (s, dir) =>
      val folds = graft.operators.Sampling.assignFolds(
        Tables.load(s, dir, "documents"), "doc_id", k = 5, salt = "cv9")
      val counts = folds.groupBy("fold", "source").agg(count(lit(1)).as("n"))
      val tot = counts.groupBy("fold").agg(sum(col("n")).as("nt"),
        count(lit(1)).as("n_sources"))
      counts.join(tot, "fold")
        .groupBy("fold")
        .agg(first(col("nt")).as("n_docs"), first(col("n_sources")).as("n_sources"),
          round(
            log(first(col("nt")).cast("double")) -
              sum(col("n").cast("double") * log(col("n").cast("double"))) /
              first(col("nt")),
            6).as("entropy"))
        .orderBy("fold")
    },


    // Lang-ID confusion matrix — the heuristic classifier audited
    // against the fixture labels (per (true, predicted) exact counts):
    // the eval step between building a classifier (q_lang_id) and
    // trusting it to gate a corpus. One scan + one keyed agg.
    "q_lang_confusion" -> { (s, dir) =>
      TextFunctions.withLangId(
        Tables.load(s, dir, "documents").select("doc_id", "lang", "text"), "text")
        .groupBy(col("lang"), col("lang_pred"))
        .agg(count(lit(1)).as("n"))
        .orderBy("lang", "lang_pred")
    },


    // Frequent 3-itemsets — the Apriori step above q_assoc_rules'
    // pairs: triples co-purchased in ≥ 2 orders. The candidate join
    // stays WITHIN the basket key (3-way self-join bounded by basket
    // size cubed over a ~5-item basket, never corpus³).
    "q_freq_triples" -> { (s, dir) =>
      val items = Tables.load(s, dir, "lineitem")
        .select(col("l_orderkey").as("bk"), col("l_partkey").as("it"))
        .distinct()
      items.as("a")
        .join(items.as("b"),
          col("a.bk") === col("b.bk") && col("a.it") < col("b.it"))
        .join(items.as("c"),
          col("a.bk") === col("c.bk") && col("b.it") < col("c.it"))
        .groupBy(col("a.it").as("i1"), col("b.it").as("i2"), col("c.it").as("i3"))
        .agg(count(lit(1)).as("n_baskets"))
        .filter(col("n_baskets") >= 2)
        .orderBy("i1", "i2", "i3")
    },


    // Unicode accent folding (NFD → strip combining marks → NFC) over
    // deterministically PLANTED accent vocabulary (the fixture is pure
    // ASCII — the q_pii planting discipline): the oracle replays the
    // identical construction through the SQL engine's strip_accents,
    // so the md5 match proves the fold semantics cross-engine on the
    // Latin diacritic range (graft.text.AccentFoldExpr — codegen'd
    // expression, not a UDF).
    "q_normalize" -> { (s, dir) =>
      val ws = Seq("école", "crème", "naïve", "señor", "über", "jalapeño",
        "fiancée", "tête")
      val wArr = array(ws.map(lit): _*)
      Tables.load(s, dir, "documents").filter(col("text").isNotNull)
        .withColumn("__t", concat(col("text"), lit(" "),
          element_at(wArr, (pmod(col("doc_id"), lit(8)) + 1).cast("int")), lit(" "),
          element_at(wArr, (pmod(col("doc_id") + 3, lit(8)) + 1).cast("int")), lit(" "),
          element_at(wArr, (pmod(col("doc_id") * 5 + 1, lit(8)) + 1).cast("int"))))
        .select(col("doc_id"), md5(graft.text.AccentFoldExpr(col("__t"))).as("fp"))
        .orderBy("doc_id")
    },


    // Per-doc token-distribution Shannon entropy — the repetition-
    // collapse quality signal (token-farm spam → ~0 bits; diverse
    // prose → ~log2 n). Two keyed aggregations, exact integer counts
    // (graft.text.TextFunctions.tokenEntropy).
    "q_token_entropy" -> { (s, dir) =>
      TextFunctions.tokenEntropy(Tables.load(s, dir, "documents"), "text", "doc_id")
        .select(col("doc_id"), col("n_tokens"),
          round(col("entropy"), 6).as("entropy"))
        .orderBy("doc_id")
    },


    // Okapi BM25 relevance against a 3-term query (graft.text.Bm25):
    // the lexical-retrieval primitive for query-targeted corpus
    // slicing. Postings are filtered to the query terms BEFORE any
    // aggregation (corpus-size-independent shuffle keyspace); corpus
    // constants ride in as literals; idf is the Lucene non-negative
    // form.
    "q_bm25" -> { (s, dir) =>
      Bm25.score(Tables.load(s, dir, "documents"), "text", "doc_id",
        Seq("spark", "sort", "hash"))
        .orderBy("doc_id")
    },


    // CCNet-style LM quality score (graft.text.LmScore): mean log
    // add-1-smoothed conditional bigram probability under the corpus's
    // own counts — documents with improbable token transitions score
    // low. One explode+groupBy per gram order, two keyed joins; counts
    // are exact longs so both engines derive identical doubles.
    "q_lm_score" -> { (s, dir) =>
      LmScore.bigramLogProb(Tables.load(s, dir, "documents"), "text", "doc_id")
        .orderBy("doc_id")
    },


    // PII detection + redaction (graft.text.Pii): deterministic
    // synthetic emails/phones/IPs are planted per doc_id (the fixture
    // vocabulary has none), then DETECTED back by the rule set and
    // redacted; the oracle replays the identical classification and
    // hashes the identical redacted text — so the hash match proves
    // the detection rules, not arithmetic.
    "q_pii" -> { (s, dir) =>
      val idStr = col("doc_id").cast("string")
      val planted = Tables.load(s, dir, "documents")
        .filter(col("text").isNotNull)
        .withColumn("t2", concat(
          col("text"),
          when(pmod(col("doc_id"), lit(3)) === 0,
            concat(lit(" user"), idStr, lit("@mail"),
              pmod(col("doc_id"), lit(7)).cast("string"), lit(".example.com")))
            .otherwise(lit("")),
          when(pmod(col("doc_id"), lit(5)) === 0,
            concat(lit(" +1-555-0"),
              (pmod(col("doc_id"), lit(900)) + 100).cast("string")))
            .otherwise(lit("")),
          when(pmod(col("doc_id"), lit(7)) === 0,
            concat(lit(" 10."), pmod(col("doc_id"), lit(256)).cast("string"),
              lit(".0."), pmod(col("doc_id"), lit(100)).cast("string")))
            .otherwise(lit(""))))
      val toks = Pii.rawTokens(col("t2"))
      planted.select(
        col("doc_id"),
        Pii.emailCount(toks).cast("long").as("n_emails"),
        Pii.phoneCount(toks).cast("long").as("n_phones"),
        Pii.ipCount(toks).cast("long").as("n_ips"),
        md5(Pii.redact(col("t2"))).as("redacted_fp"))
        .orderBy("doc_id")
    },


    // Corpus bigram counts, top 20 — the vocabulary-statistics shape
    // (explode → groupBy with map-side partial agg → one keyed shuffle
    // → TakeOrderedAndProject; only 20·partitions rows reach the
    // driver-side merge regardless of corpus size).
    "q_ngram_topk" -> { (s, dir) =>
      Tables.load(s, dir, "documents")
        .select(explode(TextFunctions.ngrams(col("text"), 2)).as("ngram"))
        .groupBy("ngram").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("ngram").asc)
        .limit(20)
    },
  )

  val oracles: Map[String, String] = Map(

    // Tokenization contract mirrored from TextFunctions.tokens:
    // lowercase, split on \s+, drop empties. Every ratio replicates the
    // Spark expression tree exactly (same operation order) so doubles
    // agree bit-for-bit before the 6-dp round.
    "q_text_stats" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    list_filter(regexp_split_to_array(lower(text), '\s+'), x -> len(x) > 0) AS toks,
        |    regexp_extract_all(lower(text), '[a-z0-9]+|[^a-z0-9\s]') AS bpe,
        |    regexp_replace(text, '\s+', '', 'g') AS nosp
        |  FROM documents),
        |m AS (
        |  SELECT doc_id,
        |    len(toks) AS n_tokens,
        |    len(bpe) AS n_bpe,
        |    CASE WHEN len(toks) > 0
        |      THEN CAST(list_sum(list_transform(toks, x -> len(x))) AS DOUBLE) / len(toks)
        |      ELSE 0.0 END AS mean_tok_len,
        |    CASE WHEN len(toks) > 0
        |      THEN CAST(len(list_filter(toks, x -> x IN ('the','a','an','of','to','and','in','is','it','that'))) AS DOUBLE) / len(toks)
        |      ELSE 0.0 END AS stopword_ratio,
        |    CASE WHEN len(nosp) > 0
        |      THEN CAST(len(regexp_replace(nosp, '[a-zA-Z0-9]', '', 'g')) AS DOUBLE) / len(nosp)
        |      ELSE 0.0 END AS punct_ratio
        |  FROM t)
        |SELECT doc_id, n_tokens, n_bpe,
        |  round(mean_tok_len, 6) AS mean_tok_len,
        |  round(stopword_ratio, 6) AS stopword_ratio,
        |  round(punct_ratio, 6) AS punct_ratio,
        |  round(0.5 * (least(CAST(n_tokens AS DOUBLE) / 20.0, 1.0)
        |               * least(1.0, 500.0 / greatest(CAST(n_tokens AS DOUBLE), 1.0)))
        |      + 0.3 * least(stopword_ratio * 5.0, 1.0)
        |      + 0.2 * (1.0 - least(punct_ratio * 2.0, 1.0)), 6) AS quality
        |FROM m ORDER BY doc_id""".stripMargin,


    // Same count/flesch kernel; per-doc 4dp rounds sum as DECIMAL.
    "q_readability" ->
      """WITH d AS (
        |  SELECT lang,
        |    CAST(len(list_filter(regexp_split_to_array(lower(text), '\s+'), t -> len(t) > 0)) AS BIGINT) AS w,
        |    CAST(len(regexp_extract_all(text, '[.!?]+')) AS BIGINT) AS sc,
        |    CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT) AS y
        |  FROM documents),
        |f AS (SELECT lang, w, sc, y,
        |  CAST(round(206.835
        |    - 1.015 * (CAST(greatest(1, w) AS DOUBLE) / CAST(greatest(1, sc) AS DOUBLE))
        |    - 84.6 * (CAST(y AS DOUBLE) / CAST(greatest(1, w) AS DOUBLE)), 4)
        |    AS DECIMAL(18,4)) AS fl
        |  FROM d)
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(w) AS BIGINT) AS sum_words,
        |  CAST(sum(sc) AS BIGINT) AS sum_sents,
        |  CAST(sum(y) AS BIGINT) AS sum_sylls,
        |  round(CAST(sum(fl) AS DOUBLE) / count(*), 6) AS mean_flesch
        |FROM f GROUP BY lang ORDER BY lang""".stripMargin,


    // The replayed BPE token counts (tc) joined with whitespace word
    // counts; one rounded division per lang.
    "q_tokenizer_fertility" ->
      ("WITH " + bpeTokenCountCtes(BpeSteps) + """,
        |wd AS (
        |  SELECT doc_id, lang,
        |    CAST(len(list_filter(regexp_split_to_array(lower(text), '\s+'),
        |                         x -> len(x) > 0)) AS BIGINT) AS words
        |  FROM documents WHERE text IS NOT NULL)
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(tc.bpe_tokens) AS BIGINT) AS sum_bpe,
        |  CAST(sum(wd.words) AS BIGINT) AS sum_words,
        |  round(CAST(sum(tc.bpe_tokens) AS DOUBLE) / sum(wd.words), 6)
        |    AS fertility
        |FROM wd JOIN tc USING (doc_id)
        |WHERE wd.words > 0
        |GROUP BY lang ORDER BY lang""".stripMargin),


    // Same md5 rule synthesis, same integer longest-match score
    // (matchlen·2 + allowBit), same path slice.
    "q_robots" -> {
      val pathRaw =
        "regexp_extract(trim(url), '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)', 1)"
      s"""WITH u AS (
         |  SELECT o_orderkey, ${urlSqlExpr("o_custkey", "o_orderkey")} AS url
         |  FROM orders),
         |p AS (
         |  SELECT o_orderkey, ${hostSqlExpr("url")} AS host,
         |    CASE WHEN regexp_replace($pathRaw, '\\?$$', '') = '' THEN '/'
         |         ELSE regexp_replace($pathRaw, '\\?$$', '') END AS path
         |  FROM u),
         |hh AS (
         |  SELECT host, ('0x' || substr(md5(host), 1, 15))::BIGINT AS h
         |  FROM (SELECT DISTINCT host FROM p)),
         |rules AS (
         |  SELECT host, '/' AS rule, false AS allow FROM hh WHERE h % 5 = 0
         |  UNION ALL
         |  SELECT host, '/items%2fview/' || CAST(h % 10 AS VARCHAR), false
         |  FROM hh WHERE h % 5 <> 0
         |  UNION ALL
         |  SELECT host, '/items%2fview/' || CAST(h % 10 AS VARCHAR) || '0',
         |    true
         |  FROM hh WHERE h % 5 <> 0),
         |j AS (
         |  SELECT p.o_orderkey, p.host,
         |    max(CASE WHEN r.rule IS NOT NULL AND starts_with(p.path, r.rule)
         |             THEN len(r.rule) * 2
         |                  + CASE WHEN r.allow THEN 1 ELSE 0 END
         |             ELSE -2 END) AS s
         |  FROM p LEFT JOIN rules r ON r.host = p.host
         |  GROUP BY 1, 2),
         |v AS (
         |  SELECT o_orderkey, host,
         |    CASE WHEN s < 0 THEN 'allowed'
         |         WHEN s % 2 = 1 THEN 'allowed_override'
         |         ELSE 'blocked' END AS verdict
         |  FROM j)
         |SELECT verdict, CAST(count(*) AS BIGINT) AS n_urls,
         |  CAST(count(DISTINCT host) AS BIGINT) AS n_hosts,
         |  CAST(sum(o_orderkey % 100000) AS BIGINT) AS key_checksum
         |FROM v GROUP BY 1 ORDER BY 1""".stripMargin
    },


    // Identical planting, identical 4-token chunking (list slices are
    // 1-based inclusive), identical integer df rule.
    "q_boilerplate" ->
      """WITH d AS (
        |  SELECT doc_id, source,
        |    CASE WHEN doc_id % 2 = 0
        |      THEN 'begin boilerplate notice for ' || source ||
        |           ' all rights reserved ' || text
        |      ELSE text END AS t2
        |  FROM documents),
        |tk AS (
        |  SELECT doc_id, source,
        |    list_filter(regexp_split_to_array(lower(t2), '\s+'),
        |                x -> len(x) > 0) AS toks
        |  FROM d),
        |ch AS (
        |  SELECT doc_id, source,
        |    array_to_string(toks[k*4+1 : k*4+4], ' ') AS chunk
        |  FROM tk CROSS JOIN UNNEST(range(0, len(toks) // 4)) AS r(k)),
        |cc AS (SELECT source, chunk,
        |         CAST(count(DISTINCT doc_id) AS BIGINT) AS df
        |       FROM ch GROUP BY 1, 2),
        |sd AS (SELECT source, CAST(count(DISTINCT doc_id) AS BIGINT)
        |         AS n_docs
        |       FROM d GROUP BY 1)
        |SELECT cc.source, max(sd.n_docs) AS n_docs,
        |  CAST(count(*) AS BIGINT) AS n_chunks,
        |  CAST(count(*) FILTER (WHERE df * 10 >= n_docs * 3) AS BIGINT)
        |    AS n_boiler_chunks,
        |  CAST(coalesce(sum(df) FILTER (WHERE df * 10 >= n_docs * 3), 0)
        |       AS BIGINT) AS boiler_hits
        |FROM cc JOIN sd ON sd.source = cc.source
        |GROUP BY cc.source ORDER BY cc.source""".stripMargin,


    // Same split, same count tables, same expression tree (division
    // order matters for bit-identical doubles before the round-6).
    "q_kn_lm" ->
      """WITH d AS (
        |  SELECT doc_id, source,
        |    list_filter(regexp_split_to_array(lower(text), '\s+'),
        |                x -> len(x) > 0) AS toks
        |  FROM documents WHERE text IS NOT NULL),
        |tr AS (SELECT * FROM d WHERE doc_id % 5 <> 0),
        |ev AS (SELECT * FROM d WHERE doc_id % 5 = 0),
        |tocc AS (
        |  SELECT toks[i] AS v, toks[i+1] AS w
        |  FROM tr CROSS JOIN UNNEST(range(1, len(toks))) AS r(i)
        |  WHERE len(toks) >= 2),
        |c2 AS (SELECT v, w, CAST(count(*) AS BIGINT) AS c2
        |       FROM tocc GROUP BY 1, 2),
        |ctx AS (SELECT v, CAST(sum(c2) AS BIGINT) AS c1,
        |               CAST(count(*) AS BIGINT) AS n1v
        |        FROM c2 GROUP BY 1),
        |cw AS (SELECT w, CAST(count(*) AS BIGINT) AS cont
        |       FROM c2 GROUP BY 1),
        |bv AS (SELECT (SELECT count(*) FROM c2)
        |         + (SELECT count(DISTINCT t)
        |            FROM (SELECT unnest(toks) AS t FROM tr)) AS denom),
        |eocc AS (
        |  SELECT source, toks[i] AS v, toks[i+1] AS w
        |  FROM ev CROSS JOIN UNNEST(range(1, len(toks))) AS r(i)
        |  WHERE len(toks) >= 2),
        |j AS (
        |  SELECT source, coalesce(c2.c2, 0) AS c2v, ctx.c1, ctx.n1v,
        |         coalesce(cw.cont, 0) AS cont
        |  FROM eocc
        |  LEFT JOIN c2 ON c2.v = eocc.v AND c2.w = eocc.w
        |  LEFT JOIN ctx ON ctx.v = eocc.v
        |  LEFT JOIN cw ON cw.w = eocc.w),
        |p AS (
        |  SELECT source,
        |    CASE WHEN coalesce(c1, 0) > 0
        |      THEN (greatest(c2v - 0.75, 0.0) / c1)
        |           + (((0.75 * n1v) / c1)
        |              * ((cont + 1.0) / (SELECT denom FROM bv)))
        |      ELSE ((cont + 1.0) / (SELECT denom FROM bv)) END AS p,
        |    CASE WHEN coalesce(c1, 0) > 0 THEN 0 ELSE 1 END AS backoff
        |  FROM j)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_eval_bigrams,
        |  CAST(sum(backoff) AS BIGINT) AS n_backoff,
        |  round(avg(ln(p)), 6) AS kn_logprob
        |FROM p GROUP BY source ORDER BY source""".stripMargin,


    // row_number() is fine ORACLE-side (DuckDB, one box); the Spark
    // side must produce the identical order without the global window.
    "q_vocab_ids" ->
      """WITH t AS (
        |  SELECT unnest(list_filter(regexp_split_to_array(lower(text), '\s+'),
        |                            x -> len(x) > 0)) AS token
        |  FROM documents WHERE text IS NOT NULL),
        |c AS (SELECT token, CAST(count(*) AS BIGINT) AS cnt FROM t GROUP BY 1),
        |v AS (SELECT token, cnt,
        |        row_number() OVER (ORDER BY cnt DESC, token) - 1 AS id
        |      FROM c)
        |SELECT id % 10 AS bucket, CAST(count(*) AS BIGINT) AS n_tokens,
        |  CAST(sum(id * cnt) AS BIGINT) AS idcnt_checksum,
        |  CAST(min(id) AS BIGINT) AS min_id,
        |  CAST(max(id) AS BIGINT) AS max_id,
        |  CAST(sum(cnt) AS BIGINT) AS sum_cnt
        |FROM v GROUP BY bucket ORDER BY bucket""".stripMargin,


    // Base ids frozen from the train split; the delta's unseen tokens
    // row_number from V in (delta cnt desc, token) order.
    "q_vocab_incr" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    unnest(list_filter(regexp_split_to_array(lower(text), '\s+'),
        |                       x -> len(x) > 0)) AS token
        |  FROM documents WHERE text IS NOT NULL),
        |bc AS (SELECT token, CAST(count(*) AS BIGINT) AS cnt FROM t
        |       WHERE doc_id % 5 <> 0 GROUP BY 1),
        |dc AS (SELECT token, CAST(count(*) AS BIGINT) AS cnt FROM t
        |       WHERE doc_id % 5 = 0 GROUP BY 1),
        |b AS (SELECT token, cnt,
        |        row_number() OVER (ORDER BY cnt DESC, token) - 1 AS id
        |      FROM bc),
        |v AS (SELECT count(*) AS v FROM b),
        |ex AS (SELECT b.token, b.cnt + coalesce(dc.cnt, 0) AS cnt, b.id,
        |         false AS is_new
        |       FROM b LEFT JOIN dc USING (token)),
        |nw AS (SELECT dc.token, dc.cnt,
        |         row_number() OVER (ORDER BY dc.cnt DESC, dc.token) - 1
        |           + (SELECT v FROM v) AS id,
        |         true AS is_new
        |       FROM dc ANTI JOIN b USING (token)),
        |u AS (SELECT * FROM ex UNION ALL SELECT * FROM nw)
        |SELECT id % 10 AS bucket, CAST(count(*) AS BIGINT) AS n_tokens,
        |  CAST(count(*) FILTER (WHERE is_new) AS BIGINT) AS n_new,
        |  CAST(sum(id * cnt) AS BIGINT) AS idcnt_checksum,
        |  CAST(sum(cnt) AS BIGINT) AS sum_cnt
        |FROM u GROUP BY bucket ORDER BY bucket""".stripMargin,


    // Argmax with ties resolved in langMarkers order (de,en,es,fr,zh),
    // 'und' when no marker hits — mirrors TextFunctions.langId.
    "q_lang_id" -> LangIdOracle,


    // Per-trigram INDEPENDENT occurrence counts over the original text
    // ((len − len(replace))/3 summed per language) — NOT nested
    // replaces, whose sequential removal would perturb later counts.
    "q_lang_id_ngram" ->
      """WITH lt AS (SELECT doc_id, lower(text) AS t, len(lower(text)) AS L FROM documents),
        |sc AS (
        |  SELECT doc_id,
        |    CAST((5*L - len(replace(t,'der','')) - len(replace(t,'ein','')) - len(replace(t,'sch','')) - len(replace(t,'ung','')) - len(replace(t,'cht',''))) / 3 AS BIGINT) AS g_de,
        |    CAST((5*L - len(replace(t,'the','')) - len(replace(t,'ing','')) - len(replace(t,'and','')) - len(replace(t,'ion','')) - len(replace(t,'ent',''))) / 3 AS BIGINT) AS g_en,
        |    CAST((5*L - len(replace(t,'que','')) - len(replace(t,'ado','')) - len(replace(t,'los','')) - len(replace(t,'nte','')) - len(replace(t,'cio',''))) / 3 AS BIGINT) AS g_es,
        |    CAST((5*L - len(replace(t,'les','')) - len(replace(t,'ent','')) - len(replace(t,'que','')) - len(replace(t,'eur','')) - len(replace(t,'ais',''))) / 3 AS BIGINT) AS g_fr,
        |    CAST((5*L - len(replace(t,'de5','')) - len(replace(t,'hi4','')) - len(replace(t,'le5','')) - len(replace(t,'bu4','')) - len(replace(t,'wo3',''))) / 3 AS BIGINT) AS g_zh
        |  FROM lt)
        |SELECT doc_id, g_de, g_en, g_es, g_fr, g_zh,
        |  CASE WHEN greatest(g_de, g_en, g_es, g_fr, g_zh) = 0 THEN 'und'
        |       WHEN g_de = greatest(g_de, g_en, g_es, g_fr, g_zh) THEN 'de'
        |       WHEN g_en = greatest(g_de, g_en, g_es, g_fr, g_zh) THEN 'en'
        |       WHEN g_es = greatest(g_de, g_en, g_es, g_fr, g_zh) THEN 'es'
        |       WHEN g_fr = greatest(g_de, g_en, g_es, g_fr, g_zh) THEN 'fr'
        |       ELSE 'zh' END AS lang_pred
        |FROM sc ORDER BY doc_id""".stripMargin,


    // Same tokenization contract; n-grams via generate_series + list
    // slice (empty below width n, like the Spark side). The gate
    // compares UNROUNDED fractions, mirroring repetitionOk.
    "q_repetition" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    list_filter(regexp_split_to_array(lower(text), '\s+'), x -> len(x) > 0) AS toks
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, toks,
        |    list_transform(generate_series(1, len(toks)-1), i -> array_to_string(toks[i:i+1], ' ')) AS g2,
        |    list_transform(generate_series(1, len(toks)-2), i -> array_to_string(toks[i:i+2], ' ')) AS g3
        |  FROM t),
        |m AS (
        |  SELECT doc_id,
        |    CASE WHEN len(toks) > 0 THEN CAST(len(toks) - len(list_distinct(toks)) AS DOUBLE) / len(toks) ELSE 0.0 END AS dup_tok,
        |    CASE WHEN len(toks) > 0 THEN CAST(coalesce(list_max(list_transform(list_distinct(toks), d -> len(list_filter(toks, x -> x = d)))), 0) AS DOUBLE) / len(toks) ELSE 0.0 END AS top_tok,
        |    CASE WHEN len(g2) > 0 THEN CAST(len(g2) - len(list_distinct(g2)) AS DOUBLE) / len(g2) ELSE 0.0 END AS dup_2gram,
        |    CASE WHEN len(g2) > 0 THEN CAST(coalesce(list_max(list_transform(list_distinct(g2), d -> len(list_filter(g2, x -> x = d)))), 0) AS DOUBLE) / len(g2) ELSE 0.0 END AS top_2gram,
        |    CASE WHEN len(g3) > 0 THEN CAST(coalesce(list_max(list_transform(list_distinct(g3), d -> len(list_filter(g3, x -> x = d)))), 0) AS DOUBLE) / len(g3) ELSE 0.0 END AS top_3gram
        |  FROM g)
        |SELECT doc_id,
        |  round(dup_tok, 6) AS dup_tok, round(top_tok, 6) AS top_tok,
        |  round(dup_2gram, 6) AS dup_2gram, round(top_2gram, 6) AS top_2gram,
        |  round(top_3gram, 6) AS top_3gram,
        |  CAST(top_2gram <= 0.20 AND top_3gram <= 0.18 AND dup_2gram <= 0.60 AS INT) AS rep_ok
        |FROM m ORDER BY doc_id""".stripMargin,


    // Cumulative window over the same hash order (ties by doc_id);
    // soft-cap filter on the pre-row cumulative.
    "q_token_budget" ->
      """WITH u AS (
        |  SELECT doc_id, source, n_chars,
        |    ('0x' || substr(md5('tb1|' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT / 1152921504606846976.0 AS u
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, source, n_chars,
        |    sum(n_chars) OVER (PARTITION BY source ORDER BY u, doc_id) AS cum
        |  FROM u)
        |SELECT doc_id, source, n_chars FROM c
        |WHERE (cum - n_chars) < CASE WHEN source IN ('src0','src2','src4','src6','src8','src10','src12','src14','src16','src18') THEN 3000 ELSE 1500 END
        |ORDER BY doc_id""".stripMargin,


    // Identical URL construction + stage-by-stage canonicalization
    // replay (see urlCanonCtes).
    "q_url_canon" ->
      ("WITH " + urlCanonCtes() + """
        |SELECT o_orderkey, url, canon, domain FROM canon
        |ORDER BY o_orderkey""".stripMargin),


    // The identical page construction and the identical regex/list
    // pipeline, stage for stage (script/style strip → comment strip →
    // block-closer newlines → tag strip → entity decode → integer
    // line-density gate).
    "q_extract" ->
      """WITH h AS (
        |  SELECT doc_id,
        |    '<html><head><title>Doc</title><style>p{color:red}</style>'
        |    || '<script>var x = "<p>hidden</p>";</script></head>'
        |    || '<body><div>home</div><div>login</div><!-- tracking -->'
        |    || '<h1>Doc ' || CAST(doc_id AS VARCHAR) || '</h1><p>' || text
        |    || '</p><p>tail &amp; entity &lt;x&gt; demo line</p>'
        |    || '<div>4 8 15 16 23 42</div><footer>c</footer></body></html>' AS html
        |  FROM documents),
        |s1 AS (SELECT doc_id, regexp_replace(html, '(?is)<script[^>]*>.*?</script\s*>', ' ', 'g') AS t FROM h),
        |s2 AS (SELECT doc_id, regexp_replace(t, '(?is)<style[^>]*>.*?</style\s*>', ' ', 'g') AS t FROM s1),
        |s3 AS (SELECT doc_id, regexp_replace(t, '(?s)<!--.*?-->', ' ', 'g') AS t FROM s2),
        |s4 AS (SELECT doc_id, regexp_replace(t, '(?i)<(br|/p|/div|/h[1-6]|/li|/tr|/td|/table|/ul|/ol|/section|/article|/header|/footer|/nav|/title|/head)[^>]*>', chr(10), 'g') AS t FROM s3),
        |s5 AS (SELECT doc_id, regexp_replace(t, '(?s)<[^>]*>', ' ', 'g') AS t FROM s4),
        |s6 AS (SELECT doc_id, replace(replace(replace(replace(replace(replace(t,
        |    '&nbsp;', ' '), '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', ''''), '&amp;', '&') AS t FROM s5),
        |ln AS (SELECT doc_id, list_transform(string_split(t, chr(10)),
        |    l -> trim(regexp_replace(l, '\s+', ' ', 'g'))) AS ls FROM s6),
        |kp AS (SELECT doc_id, list_filter(ls, l -> len(string_split(l, ' ')) >= 3
        |    AND 2 * length(regexp_replace(l, '[^a-zA-Z]', '', 'g')) >= length(l)) AS ls FROM ln),
        |x AS (SELECT doc_id, array_to_string(ls, chr(10)) AS extracted FROM kp)
        |SELECT doc_id, md5(extracted) AS h,
        |  CAST(length(extracted) AS BIGINT) AS n_extracted
        |FROM x ORDER BY doc_id""".stripMargin,


    // The 16 merge rounds, each read off its own argmax CTE — the
    // whole training replayed, not just a final artifact.
    "q_bpe" ->
      ("WITH " + bpeVocabCtes(BpeSteps) + "\n" +
        (0 until BpeSteps).map(k =>
          s"SELECT $k AS step, lhs, rhs, lhs || rhs AS merged, CAST(cnt AS BIGINT) AS cnt FROM b$k")
          .mkString("", "\nUNION ALL\n", "\nORDER BY step")),


    // Final replayed vocab → per-word symbol counts → per-doc sums.
    "q_bpe_encode" ->
      ("WITH " + bpeTokenCountCtes(BpeSteps) + """
        |SELECT doc_id, bpe_tokens FROM tc ORDER BY doc_id""".stripMargin),


    // The q_token_budget window over replayed BPE counts (salt tbbpe1,
    // budgets 2000/1000 tokens).
    "q_token_budget_bpe" ->
      ("WITH " + bpeTokenCountCtes(BpeSteps) + """,
        |u AS (
        |  SELECT doc_id, source, bpe_tokens,
        |    ('0x' || substr(md5('tbbpe1|' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT / 1152921504606846976.0 AS u
        |  FROM tc),
        |c AS (
        |  SELECT doc_id, source, bpe_tokens,
        |    sum(bpe_tokens) OVER (PARTITION BY source ORDER BY u, doc_id) AS cum
        |  FROM u)
        |SELECT doc_id, source, bpe_tokens FROM c
        |WHERE (cum - bpe_tokens) < CASE WHEN source IN ('src0','src2','src4','src6','src8','src10','src12','src14','src16','src18') THEN 2000 ELSE 1000 END
        |ORDER BY doc_id""".stripMargin),


    // Exact regime (capacity > vocabulary): plain token counts.
    "q_heavy_hitters" ->
      """WITH t AS (
        |  SELECT unnest(list_filter(regexp_split_to_array(lower(text), '\s+'), x -> len(x) > 0)) AS item
        |  FROM documents)
        |SELECT item, count(*) AS cnt FROM t
        |GROUP BY item ORDER BY cnt DESC, item ASC LIMIT 20""".stripMargin,


    // Exact regime per group (capacity > per-source vocabulary):
    // plain grouped counts, top-5 per source by (cnt desc, item asc).
    "q_heavy_hitters_grouped" ->
      """WITH t AS (
        |  SELECT source,
        |    unnest(list_filter(regexp_split_to_array(lower(text), '\s+'), x -> len(x) > 0)) AS item
        |  FROM documents),
        |c AS (SELECT source, item, count(*) AS cnt FROM t GROUP BY 1, 2),
        |r AS (SELECT source, item, cnt,
        |        row_number() OVER (PARTITION BY source ORDER BY cnt DESC, item ASC) AS rn
        |      FROM c)
        |SELECT source, item, cnt FROM r WHERE rn <= 5
        |ORDER BY source, cnt DESC, item ASC""".stripMargin,


    // Phrase hits by list comprehension over token positions — the
    // brute-force mirror of the postings join (1-based, same
    // tokenization contract).
    "q_phrase" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    list_filter(regexp_split_to_array(lower(text), '\s+'), x -> len(x) > 0) AS toks
        |  FROM documents WHERE text IS NOT NULL),
        |m AS (
        |  SELECT doc_id,
        |    [i for i in range(1, len(toks) - 1)
        |       if toks[i] = 'slow' AND toks[i+1] = 'hash' AND toks[i+2] = 'batch'] AS hits
        |  FROM t WHERE len(toks) >= 3)
        |SELECT doc_id, CAST(len(hits) AS BIGINT) AS n_matches,
        |  CAST(hits[1] AS BIGINT) AS first_pos
        |FROM m WHERE len(hits) > 0 ORDER BY doc_id""".stripMargin,


    // The same doubled-space stopword-break chain (replace() is
    // non-overlapping left-to-right on both engines), then RAKE's
    // integer-scaled word-score algebra. The break chain is GENERATED
    // from TextFunctions.stopwordsEn so the lists can't drift.
    "q_keywords" -> {
      val marked = graft.text.TextFunctions.stopwordsEn.foldLeft("s") {
        (acc, w) => s"replace($acc, ' $w ', ' | ')"
      }
      s"""WITH d AS (SELECT lower(text) AS t FROM documents WHERE text IS NOT NULL),
         |nt AS (SELECT ' ' || array_to_string(
         |         list_filter(regexp_split_to_array(t, '\\s+'), x -> len(x) > 0),
         |         ' ') || ' ' AS s FROM d),
         |dd AS (SELECT replace(s, ' ', '  ') AS s FROM nt),
         |mk AS (SELECT $marked AS s FROM dd),
         |ph0 AS (SELECT unnest(string_split(s, '|')) AS p FROM mk),
         |phr AS (SELECT array_to_string(
         |          list_filter(regexp_split_to_array(p, ' +'), x -> len(x) > 0),
         |          ' ') AS phrase FROM ph0),
         |phx AS (SELECT phrase FROM phr WHERE len(phrase) > 0),
         |pw AS (SELECT phrase, len(string_split(phrase, ' ')) AS plen,
         |         unnest(string_split(phrase, ' ')) AS word FROM phx),
         |ws AS (SELECT word, CAST(count(*) AS BIGINT) AS freq,
         |         CAST(sum(plen) AS BIGINT) AS deg FROM pw GROUP BY 1),
         |wsc AS (SELECT word, (deg * 10000) // freq AS wscore FROM ws),
         |pc AS (SELECT phrase, CAST(count(*) AS BIGINT) AS n FROM phx GROUP BY 1),
         |pwd AS (SELECT phrase, n, unnest(string_split(phrase, ' ')) AS word
         |        FROM pc)
         |SELECT pwd.phrase, pwd.n, CAST(sum(w.wscore) AS BIGINT) AS score
         |FROM pwd JOIN wsc w USING (word)
         |GROUP BY 1, 2
         |ORDER BY score DESC, phrase LIMIT 15""".stripMargin
    },


    // Same 1-based slice semantics: toks[s+1 : s+50] truncates at the
    // array end, md5 over the space-joined window.
    "q_chunk" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    list_filter(regexp_split_to_array(lower(text), '\s+'),
        |                x -> len(x) > 0) AS toks
        |  FROM documents WHERE text IS NOT NULL),
        |c AS (
        |  SELECT doc_id, unnest(range(0, len(toks), 25)) AS start, toks
        |  FROM t WHERE len(toks) > 0)
        |SELECT doc_id, CAST((start // 25) AS INT) AS chunk_idx,
        |  CAST(len(toks[start + 1 : start + 50]) AS INT) AS n_toks,
        |  md5(array_to_string(toks[start + 1 : start + 50], ' ')) AS chunk_md5
        |FROM c ORDER BY doc_id, chunk_idx""".stripMargin,


    // Same windows, BPE accounting: every chunk word is a word of the
    // training corpus (chunk text is the SAME lowercased text re-joined
    // on single spaces — its [a-z0-9]+ runs are unchanged), so each
    // word's subword count comes from the replayed final vocab; the
    // chained-replace encoder the Spark side uses is pinned ≡ the
    // vocab lookup on corpus words by BpeSpec.
    "q_chunk_bpe" ->
      ("WITH " + bpeVocabCtes(BpeSteps) +
        s""",
        |vt AS (
        |  SELECT word,
        |    CAST(len(string_split(symstr[2:length(symstr)-1], '||')) AS BIGINT) AS n_tokens
        |  FROM v$BpeSteps),
        |t AS (
        |  SELECT doc_id,
        |    list_filter(regexp_split_to_array(lower(text), '\\s+'),
        |                x -> len(x) > 0) AS toks
        |  FROM documents WHERE text IS NOT NULL),
        |c AS (
        |  SELECT doc_id, unnest(range(0, len(toks), 25)) AS start, toks
        |  FROM t WHERE len(toks) > 0),
        |ch AS (
        |  SELECT doc_id, CAST((start // 25) AS INT) AS chunk_idx,
        |    CAST(len(toks[start + 1 : start + 50]) AS INT) AS n_toks,
        |    array_to_string(toks[start + 1 : start + 50], ' ') AS chunk_text
        |  FROM c),
        |cw AS (
        |  SELECT doc_id, chunk_idx,
        |    unnest(regexp_extract_all(lower(chunk_text), '[a-z0-9]+')) AS word
        |  FROM ch),
        |cb AS (
        |  SELECT doc_id, chunk_idx, sum(vt.n_tokens) AS nb
        |  FROM cw JOIN vt USING (word) GROUP BY 1, 2)
        |SELECT ch.doc_id, ch.chunk_idx, ch.n_toks,
        |  CAST(coalesce(cb.nb, 0) AS BIGINT) AS n_bpe,
        |  md5(ch.chunk_text) AS chunk_md5
        |FROM ch LEFT JOIN cb USING (doc_id, chunk_idx)
        |ORDER BY doc_id, chunk_idx""".stripMargin),


    "q_freq_items" ->
      """WITH l AS (
        |  SELECT 'o_orderpriority' AS col_name, o_orderpriority AS value FROM orders
        |  UNION ALL
        |  SELECT 'o_orderstatus', o_orderstatus FROM orders),
        |c AS (SELECT col_name, value, count(*) AS n FROM l GROUP BY 1, 2),
        |r AS (
        |  SELECT *, row_number() OVER (PARTITION BY col_name
        |                               ORDER BY n DESC, value ASC) AS rank
        |  FROM c)
        |SELECT col_name, value, n, CAST(rank AS INT) AS rank FROM r
        |WHERE rank <= 3 ORDER BY col_name, rank""".stripMargin,


    "q_cooccur" ->
      """WITH toks AS (
        |  SELECT DISTINCT doc_id,
        |    unnest(list_filter(regexp_split_to_array(lower(text), '\s+'),
        |                       x -> len(x) > 0)) AS t
        |  FROM documents WHERE text IS NOT NULL)
        |SELECT a.t AS t1, b.t AS t2, count(*) AS n_docs
        |FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND a.t < b.t
        |GROUP BY 1, 2 ORDER BY n_docs DESC, t1 ASC, t2 ASC
        |LIMIT 15""".stripMargin,


    // Same smoothed idf expression shape — (1+N)/(1+df) then ln then
    // +1 — so the doubles agree bit-for-bit before the 6-dp round.
    "q_tfidf" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    list_filter(regexp_split_to_array(lower(text), '\s+'),
        |                x -> len(x) > 0) AS toks
        |  FROM documents WHERE text IS NOT NULL),
        |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM d),
        |p AS (SELECT doc_id, unnest(toks) AS term FROM d),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM p GROUP BY 1, 2),
        |dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        |s AS (
        |  SELECT tf.doc_id, tf.term,
        |    round(tf.tf * (ln((1 + (SELECT n FROM nn)) / (1 + dfq.df)) + 1), 6) AS score
        |  FROM tf JOIN dfq ON tf.term = dfq.term),
        |r AS (
        |  SELECT *, row_number() OVER (PARTITION BY doc_id
        |                               ORDER BY score DESC, term ASC) AS rank
        |  FROM s)
        |SELECT doc_id, term, score, CAST(rank AS INT) AS rank FROM r
        |WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin,


    // Postings recomputed from the corpus — the index layout must not
    // change the answer; conjunctive via HAVING count(DISTINCT term).
    "q_inverted_index" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    unnest(list_filter(regexp_split_to_array(lower(text), '\s+'),
        |                       x -> len(x) > 0)) AS term
        |  FROM documents WHERE text IS NOT NULL),
        |p AS (
        |  SELECT term, doc_id, count(*) AS tf FROM t
        |  WHERE term IN ('vector', 'merge', 'filter') GROUP BY 1, 2),
        |m AS (
        |  SELECT doc_id, CAST(sum(tf) AS BIGINT) AS score FROM p
        |  GROUP BY 1 HAVING count(DISTINCT term) = 3)
        |SELECT doc_id, score FROM m
        |ORDER BY score DESC, doc_id ASC LIMIT 20""".stripMargin,


    // Same tokenization contract; exact term counts; one closed-form
    // slope over the ranked-100 frame.
    "q_zipf" ->
      """WITH t AS (
        |  SELECT unnest(list_filter(regexp_split_to_array(lower(text), '\s+'),
        |    x -> len(x) > 0)) AS term
        |  FROM documents WHERE text IS NOT NULL),
        |f AS (SELECT term, CAST(count(*) AS BIGINT) AS freq FROM t GROUP BY 1),
        |r AS (SELECT term, freq,
        |        row_number() OVER (ORDER BY freq DESC, term) AS rank
        |      FROM f QUALIFY rank <= 100),
        |s AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |        CAST(max(freq) AS BIGINT) AS top_freq,
        |        sum(ln(rank)) AS sx, sum(ln(freq)) AS sy,
        |        sum(ln(rank) * ln(freq)) AS sxy,
        |        sum(ln(rank) * ln(rank)) AS sxx
        |      FROM r)
        |SELECT n AS n_terms, top_freq,
        |  round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope
        |FROM s""".stripMargin,


    "q_token_spectrum" ->
      """WITH freqs AS (
        |  SELECT o_custkey, CAST(count(*) AS BIGINT) AS r
        |  FROM orders GROUP BY 1),
        |sp AS (SELECT r, CAST(count(*) AS BIGINT) AS n_r FROM freqs GROUP BY r),
        |l AS (
        |  SELECT r, n_r,
        |    lead(n_r) OVER (ORDER BY r) AS n_r1,
        |    lead(r) OVER (ORDER BY r) AS r_next
        |  FROM sp)
        |SELECT r, n_r,
        |  round(CASE WHEN r_next = r + 1
        |        THEN (r + 1) * n_r1 / CAST(n_r AS DOUBLE) END, 6) AS gt_adjusted
        |FROM l WHERE r <= 15 ORDER BY r""".stripMargin,


    // H = ln N − Σ n·ln n / N per fold; ln of exact integers, the
    // small-term sum rounded 6 (LmScore order-noise contract).
    "q_mix_entropy" ->
      """WITH f AS (
        |  SELECT CAST(('0x' || substr(md5('cv9|' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 5 AS INT) AS fold,
        |    source
        |  FROM documents),
        |c AS (SELECT fold, source, CAST(count(*) AS BIGINT) AS n
        |      FROM f GROUP BY 1, 2),
        |t AS (SELECT fold, CAST(sum(n) AS BIGINT) AS nt,
        |        CAST(count(*) AS BIGINT) AS n_sources FROM c GROUP BY 1)
        |SELECT c.fold, t.nt AS n_docs, t.n_sources,
        |  round(ln(CAST(t.nt AS DOUBLE))
        |    - sum(CAST(c.n AS DOUBLE) * ln(CAST(c.n AS DOUBLE))) / t.nt,
        |  6) AS entropy
        |FROM c JOIN t ON c.fold = t.fold
        |GROUP BY c.fold, t.nt, t.n_sources ORDER BY c.fold""".stripMargin,


    // The lang-id replay grouped against the fixture labels.
    "q_lang_confusion" ->
      s"""SELECT d.lang, p.lang_pred, CAST(count(*) AS BIGINT) AS n
         |FROM ($LangIdOracle) p
         |JOIN documents d ON p.doc_id = d.doc_id
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,


    "q_freq_triples" ->
      """WITH items AS (
        |  SELECT DISTINCT l_orderkey AS bk, l_partkey AS it FROM lineitem),
        |tr AS (
        |  SELECT a.it AS i1, b.it AS i2, c.it AS i3,
        |    CAST(count(*) AS BIGINT) AS n_baskets
        |  FROM items a
        |  JOIN items b ON a.bk = b.bk AND a.it < b.it
        |  JOIN items c ON a.bk = c.bk AND b.it < c.it
        |  GROUP BY 1, 2, 3 HAVING count(*) >= 2)
        |SELECT i1, i2, i3, n_baskets FROM tr ORDER BY i1, i2, i3""".stripMargin,


    // strip_accents ≡ the NFD-mark-strip fold on the planted Latin
    // diacritic vocabulary; md5 over the folded UTF-8 bytes.
    "q_normalize" ->
      """WITH w AS (
        |  SELECT ['école','crème','naïve','señor','über','jalapeño','fiancée','tête'] AS ws),
        |a AS (
        |  SELECT doc_id,
        |    text || ' ' || ws[(doc_id % 8) + 1] || ' ' || ws[((doc_id + 3) % 8) + 1]
        |         || ' ' || ws[((doc_id * 5 + 1) % 8) + 1] AS t
        |  FROM documents, w WHERE text IS NOT NULL)
        |SELECT doc_id, md5(strip_accents(t)) AS fp FROM a ORDER BY doc_id""".stripMargin,


    // Same two aggregations; sum(c·ln c) differs only by summation
    // order, absorbed by round 6 (the LmScore discipline).
    "q_token_entropy" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    unnest(list_filter(regexp_split_to_array(lower(text), '\s+'), x -> len(x) > 0)) AS tk
        |  FROM documents WHERE text IS NOT NULL),
        |c AS (SELECT doc_id, tk, count(*) AS c FROM t GROUP BY 1, 2),
        |g AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
        |        sum(c * ln(c)) AS clogc
        |      FROM c GROUP BY 1)
        |SELECT doc_id, n_tokens,
        |  round((ln(CAST(n_tokens AS DOUBLE)) - clogc / n_tokens) / ln(2.0), 6) AS entropy
        |FROM g ORDER BY doc_id""".stripMargin,


    // Same tokenization, the same left-associated BM25 arithmetic
    // (idf·tf·(k1+1) / (tf + k1·(1−b + b·len/avgLen))); tf/df/N/Σlen
    // are exact longs so both engines derive identical doubles.
    "q_bm25" ->
      """WITH b2 AS (
        |  SELECT doc_id,
        |    list_filter(regexp_split_to_array(lower(text), '\s+'), x -> len(x) > 0) AS toks
        |  FROM documents WHERE text IS NOT NULL),
        |b3 AS (SELECT doc_id, toks, len(toks) AS l FROM b2),
        |consts AS (SELECT count(*) AS n, CAST(sum(l) AS DOUBLE) / count(*) AS avglen FROM b3),
        |post AS (
        |  SELECT doc_id, l, t, count(*) AS tf FROM (
        |    SELECT doc_id, l, unnest(toks) AS t FROM b3)
        |  WHERE t IN ('spark', 'sort', 'hash') GROUP BY 1, 2, 3),
        |dfreq AS (SELECT t, count(DISTINCT doc_id) AS df FROM post GROUP BY 1)
        |SELECT doc_id,
        |  round(sum(
        |    ln(1 + ((SELECT n FROM consts) - df + 0.5) / (df + 0.5))
        |      * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * l / (SELECT avglen FROM consts)))), 6) AS score,
        |  count(*) AS n_terms
        |FROM post JOIN dfreq USING (t)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,


    // Same counts (exact longs), same add-1 smoothing, same ln — the
    // per-doc mean rounds to 6 on both sides.
    "q_lm_score" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    list_filter(regexp_split_to_array(lower(text), '\s+'), x -> len(x) > 0) AS toks
        |  FROM documents WHERE text IS NOT NULL),
        |u AS (SELECT unnest(toks) AS w FROM t),
        |c1 AS (SELECT w, count(*) AS c1 FROM u GROUP BY 1),
        |v AS (SELECT count(*) AS v FROM c1),
        |occ AS (
        |  SELECT doc_id, toks[i] AS w, array_to_string(toks[i:i+1], ' ') AS g
        |  FROM t CROSS JOIN UNNEST(range(1, len(toks))) AS r(i)
        |  WHERE len(toks) >= 2),
        |c2 AS (SELECT g, count(*) AS c2 FROM occ GROUP BY 1)
        |SELECT doc_id, count(*) AS n_bigrams,
        |  round(avg(ln((c2.c2 + 1.0) / (c1.c1 + 1.0 * (SELECT v FROM v)))), 6) AS lm_score
        |FROM occ JOIN c2 USING (g) JOIN c1 USING (w)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,


    // Identical planting, identical rules (string primitives + the
    // shared-regex-subset classes), identical precedence and
    // redaction; DuckDB regexp_replace needs the explicit 'g' flag to
    // match Spark's replace-all default.
    "q_pii" ->
      """WITH d AS (
        |  SELECT doc_id, text ||
        |    CASE WHEN doc_id % 3 = 0
        |      THEN ' user' || doc_id || '@mail' || (doc_id % 7) || '.example.com' ELSE '' END ||
        |    CASE WHEN doc_id % 5 = 0
        |      THEN ' +1-555-0' || (doc_id % 900 + 100) ELSE '' END ||
        |    CASE WHEN doc_id % 7 = 0
        |      THEN ' 10.' || (doc_id % 256) || '.0.' || (doc_id % 100) ELSE '' END AS t2
        |  FROM documents WHERE text IS NOT NULL),
        |tok AS (
        |  SELECT doc_id, t2,
        |    list_filter(regexp_split_to_array(t2, '\s+'), x -> len(x) > 0) AS toks
        |  FROM d),
        |u AS (SELECT doc_id, unnest(toks) AS t FROM tok),
        |cls AS (
        |  SELECT doc_id, t,
        |    (len(t) - len(replace(t, '@', ''))) = 1 AND position('@' IN t) >= 2
        |      AND len(t[position('@' IN t) + 1:]) >= 3
        |      AND position('.' IN t[position('@' IN t) + 1:]) >= 2
        |      AND t NOT LIKE '%.' AS is_email,
        |    regexp_full_match(t, '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}') AS is_ip,
        |    len(regexp_replace(t, '[^0-9]', '', 'g')) BETWEEN 7 AND 15
        |      AND len(t) - len(regexp_replace(t, '[^0-9]', '', 'g')) <= 5 AS is_phone
        |  FROM u),
        |agg AS (
        |  SELECT doc_id,
        |    count(*) FILTER (is_email) AS n_emails,
        |    count(*) FILTER (NOT is_email AND NOT is_ip AND is_phone) AS n_phones,
        |    count(*) FILTER (NOT is_email AND is_ip) AS n_ips
        |  FROM cls GROUP BY doc_id),
        |red AS (
        |  SELECT doc_id, md5(array_to_string(list_transform(toks, x ->
        |    CASE WHEN ((len(x) - len(replace(x, '@', ''))) = 1 AND position('@' IN x) >= 2
        |          AND len(x[position('@' IN x) + 1:]) >= 3
        |          AND position('.' IN x[position('@' IN x) + 1:]) >= 2
        |          AND x NOT LIKE '%.')
        |      OR regexp_full_match(x, '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}')
        |      OR (len(regexp_replace(x, '[^0-9]', '', 'g')) BETWEEN 7 AND 15
        |          AND len(x) - len(regexp_replace(x, '[^0-9]', '', 'g')) <= 5)
        |    THEN '<PII>' ELSE x END), ' ')) AS redacted_fp
        |  FROM tok)
        |SELECT agg.doc_id, n_emails, n_phones, n_ips, redacted_fp
        |FROM agg JOIN red ON agg.doc_id = red.doc_id
        |ORDER BY agg.doc_id""".stripMargin,


    // Occurrence bigrams (NOT the per-doc distinct shingle set the
    // dedup oracles use): one gram per starting token position.
    "q_ngram_topk" ->
      """WITH t AS (
        |  SELECT list_filter(regexp_split_to_array(lower(text), '\s+'), x -> len(x) > 0) AS toks
        |  FROM documents),
        |g AS (
        |  SELECT unnest([array_to_string(toks[i:i+1], ' ') for i in range(1, len(toks))]) AS ngram
        |  FROM t WHERE len(toks) >= 2)
        |SELECT ngram, count(*) AS n FROM g
        |GROUP BY 1 ORDER BY n DESC, ngram ASC LIMIT 20""".stripMargin,
  )
}
