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

/** Stats slice of the [[SparkEntry]] query/oracle registry. Split from
  * the former single 15k-line entry file so scalac parallelizes across
  * domains and no single Map literal dominates compile time or method
  * size. Entry names, bodies, and oracle SQL are the driver contract,
  * byte-for-byte as they were in SparkEntry; shared fixtures and
  * oracle CTE builders stay on [[SparkEntry]] (private[graft]). */
private[graft] object RegStats {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ε-DP NOISY COUNTS (Laplace mechanism, seeded): the release step
    // of the privacy family — k-anon/l-div/t-closeness AUDIT the
    // data, this perturbs the published statistic. Inverse-CDF
    // Laplace at scale 1/ε from a salted md5 uniform, so the run
    // replays bit-for-bit (the guarantee then rests on the salt
    // staying secret — production swaps in a secure RNG, scaladoc'd).
    // One keyed count; noise is a per-group scalar expression
    // (graft.stats.DpNoise, DpNoiseSpec).
    "q_dp_counts" -> { (s, dir) =>
      graft.stats.DpNoise.noisyCounts(
        Tables.load(s, dir, "documents"), "source", "dp1", epsilon = 0.5)
        .orderBy("source")
    },


    // Deterministic training mix + split assignment: per-source keep
    // rates and train/val/test cuts, both pure functions of
    // (salt, doc_id) — layout/retry/cluster-size invariant, unlike
    // df.sample. Rates and cuts are dyadic (exact in binary), so the
    // threshold comparison is bit-identical in any IEEE engine.
    // Winsorization (outlier capping at exact p05/p95, the feature-
    // cleaning standard): cut values from the DISTRIBUTED global rank
    // (one range shuffle — never a single-partition window, the
    // q_histogram_eqdepth machinery), ranks k = max(1, ⌊n·p/100⌋) in
    // exact integer arithmetic, clamp, then per-source integer stats.
    // Driver state: two scalar cut values (the ReverseSkyline bbox
    // class of bounded collect).
    "q_winsorize" -> { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      val ranked = graft.operators.GlobalRank.withGlobalRank(docs,
        Seq(col("n_chars"), col("doc_id")), "r")
      val n = docs.count()
      val k05 = math.max(1L, n * 5 / 100)
      val k95 = math.max(1L, n * 95 / 100)
      val cuts = ranked.filter(col("r") === k05 || col("r") === k95)
        .select(col("r"), col("n_chars")).collect()
        .map(row => row.getLong(0) -> row.getLong(1)).toMap
      val (lo, hi) = (cuts(k05), cuts(k95))
      docs.select(col("source"),
          least(greatest(col("n_chars"), lit(lo)), lit(hi)).as("clamped"))
        .groupBy("source")
        .agg(count(lit(1)).as("n"), sum(col("clamped")).as("sum_clamped"),
          min(col("clamped")).as("min_clamped"), max(col("clamped")).as("max_clamped"))
        .orderBy("source")
    },


    // Per-group z-score normalization (feature engineering): mean and
    // population stddev derived from EXACT integer sums (Σx, Σx², n)
    // so both engines compute bit-identical doubles — deliberately not
    // the builtin stddev_pop, whose merge order is engine-internal.
    // One keyed window exchange.
    "q_zscore" -> { (s, dir) =>
      val w = Window.partitionBy(col("source"))
      Tables.load(s, dir, "documents")
        .withColumn("__s", sum(col("n_chars")).over(w))
        .withColumn("__s2", sum(col("n_chars") * col("n_chars")).over(w))
        .withColumn("__n", count(lit(1)).over(w))
        .withColumn("__mu", col("__s").cast("double") / col("__n"))
        .withColumn("__var",
          col("__s2").cast("double") / col("__n") - col("__mu") * col("__mu"))
        .select(col("doc_id"), col("source"),
          round(when(col("__var") > 0,
            (col("n_chars") - col("__mu")) / sqrt(col("__var"))).otherwise(0.0), 6)
            .as("z"))
        .orderBy("doc_id")
    },


    // Experiment analysis: deterministic 50/50 hash split of users →
    // per-user conversion (a high-value purchase) → 2×2 chi-square
    // independence statistic from exact integer bucket counts in one
    // fixed-shape double expression (stats/ABTest.scala). The readout
    // gate of an A/B experiment, fully inside the oracle.
    "q_chisq" -> { (s, dir) =>
      val users = Tables.loadEvents(s, dir)
        .groupBy("user_id")
        .agg(max(when(col("event_type") === "purchase" && col("value") > 180, 1)
          .otherwise(0)).as("conv"))
      val split = graft.operators.Sampling.assignSplit(
        users, "user_id", Seq("A" -> 0.5, "B" -> 0.5), "ab9")
      graft.stats.ABTest.chiSquare2x2(split, "split", "A", "B",
        col("conv") === 1)
    },


    // Welch's unequal-variance t-test — the continuous-metric sibling
    // of q_chisq (chars per doc, en vs everything else): exact BIGINT
    // (n, Σx, Σx²) per arm off one agg, then the t statistic and
    // Welch–Satterthwaite df in fixed-shape double arithmetic from
    // those six integers.
    "q_ttest" -> { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
        .withColumn("grp",
          when(col("lang") === "en", "en").otherwise("other"))
      graft.stats.ABTest.welchT(docs, "grp", "en", "other", col("n_chars"))
    },


    // Mann–Whitney U on the same en-vs-other doc-length contrast as
    // q_ttest — the nonparametric twin (stats/MannWhitney): exact
    // histogram midranks (the Eval.auc machinery), exact Σ(t³−t) tie
    // correction, tie-corrected z in one pinned double formula.
    "q_mannwhitney" -> { (s, dir) =>
      graft.stats.MannWhitney.uTest(
        Tables.load(s, dir, "documents"),
        col("lang") === "en", "n_chars")
    },


    // CUSUM change-point scan over the daily event series: the
    // cumulative deviation from the global mean, kept EXACT by scaling
    // by n (sdev_k = n·cumsum_k − k·total — pure BIGINT algebra, no
    // float mean anywhere), with the |sdev| argmax flagged as the
    // change point. The series is post-agg-bounded (one row per day),
    // so the unpartitioned windows run over a frame of days, never
    // events.
    // Cross-source quantile normalization (the batch-effect corrector):
    // every source's n_chars distribution is mapped onto the pooled
    // one, so per-source measurement bias can't skew global length
    // thresholds. Exact integer rank arithmetic with id tiebreaks; the
    // pooled ranking runs through GlobalRank (range-partitioned, no
    // single-partition window) + one rank equi-join
    // (graft.operators.QuantileNorm).
    "q_quantile_norm" -> { (s, dir) =>
      graft.operators.QuantileNorm.normalize(
        Tables.load(s, dir, "documents")
          .where(col("n_chars").isNotNull)
          .select("doc_id", "source", "n_chars"),
        "n_chars", "doc_id", "source")
        .select("doc_id", "source", "n_chars", "qnorm")
        .orderBy("doc_id")
    },


    // Theil–Sen robust trend of the daily event-count series
    // (stats/TheilSen): median pairwise slope over integer (dy, dx)
    // pairs with a total-order tie-break, half-sum of the two middle
    // slopes, percentile-median intercept. The pair set and ordering
    // window are bounded by the CALENDAR length of the series, not by
    // corpus size (the q_acf clause).
    "q_theil_sen" -> { (s, dir) =>
      val daily = Tables.loadEvents(s, dir)
        .groupBy(to_date(col("ts")).as("d")).agg(count(lit(1)).as("x"))
      val d0 = daily.agg(min(col("d")).as("d0"))
      val series = daily.crossJoin(broadcast(d0))
        .select(datediff(col("d"), col("d0")).cast("long").as("k"),
          col("x"))
      graft.stats.TheilSen.fit(series, "k", "x")
    },


    // Two-sample Kolmogorov–Smirnov D on chars-per-doc, en vs rest —
    // the whole-distribution companion to q_ttest. The ECDF gap scaled
    // by nₐ·nᵦ is exact BIGINT algebra over the value histogram.
    "q_ks" -> { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
        .withColumn("grp",
          when(col("lang") === "en", "en").otherwise("other"))
      graft.stats.ABTest.ksTest(docs, "grp", "en", "other", col("n_chars"))
    },


    // Gini concentration of customer revenue — "how unequal is the
    // spend distribution", the corpus-balance twin of the source-mix
    // audits. Ranks come from the DISTRIBUTED global rank (no
    // single-partition window); revenue is exact integer cents, so the
    // Lorenz moment Σ rank·cents is exact and the coefficient is one
    // fixed-shape double expression.
    "q_gini" -> { (s, dir) =>
      val cust = Tables.load(s, dir, "orders")
        .groupBy("o_custkey")
        .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("rev"))
        .select(col("o_custkey"), (col("rev") * 100).cast("long").as("cents"))
      val ranked = graft.operators.GlobalRank.withGlobalRank(
        cust, Seq(col("cents"), col("o_custkey")), "rank")
      ranked.agg(count(lit(1)).as("n"), sum(col("cents")).as("total_cents"),
          sum(col("rank") * col("cents")).as("weighted"))
        .select(col("n"), col("total_cents"), col("weighted"),
          round(lit(2.0) * col("weighted") /
            (col("n") * col("total_cents")).cast("double") -
            (col("n") + 1).cast("double") / col("n"), 6).as("gini"))
    },


    // Lorenz concentration table — the curve q_gini summarizes: per
    // spend-rank decile of customers, exact customer/revenue mass and
    // the revenue share ("does the top decile carry 40% of revenue").
    // Ranks from the DISTRIBUTED global rank; decile assignment is
    // exact integer arithmetic ((rank−1)·10 div n).
    "q_pareto" -> { (s, dir) =>
      val cust = Tables.load(s, dir, "orders")
        .groupBy("o_custkey")
        .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("rev"))
        .select(col("o_custkey"), (col("rev") * 100).cast("long").as("cents"))
      val ranked = graft.operators.GlobalRank.withGlobalRank(
        cust, Seq(col("cents"), col("o_custkey")), "rank")
      val tot = ranked.agg(count(lit(1)).as("n"),
        sum(col("cents")).as("total_cents"))
      ranked.crossJoin(broadcast(tot))
        .select(expr("((rank - 1) * 10) div n").cast("int").as("decile"),
          col("cents"), col("total_cents"))
        .groupBy("decile")
        .agg(count(lit(1)).as("n_cust"), sum(col("cents")).as("cents"),
          round(sum(col("cents")).cast("double") / first(col("total_cents")), 6)
            .as("rev_share"))
        .orderBy("decile")
    },


    // Token↔label mutual information (feature selection for the
    // quality/language classifier): per token, the exact 2×2 presence
    // table against lang='en', MI as four fixed-shape terms from exact
    // BIGINTs. df ≥ 10 floor bounds the candidate set; top 15 by MI.
    "q_mutual_info" -> { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
        .filter(col("text").isNotNull)
        .select(col("doc_id"),
          when(col("lang") === "en", 1L).otherwise(0L).as("y"),
          col("text"))
      val tot = docs.agg(count(lit(1)).as("n_total"), sum(col("y")).as("n_pos"))
      val tok = docs
        .select(col("doc_id"), col("y"),
          explode(TextFunctions.tokens(col("text"))).as("t"))
        .distinct()
        .groupBy("t").agg(count(lit(1)).as("df"), sum(col("y")).as("n11"))
        .filter(col("df") >= 10)
      val cells = tok.crossJoin(broadcast(tot))
        .select(col("t"), col("n11"), (col("df") - col("n11")).as("n10"),
          (col("n_pos") - col("n11")).as("n01"),
          (col("n_total") - col("n_pos") - (col("df") - col("n11"))).as("n00"),
          col("n_total"), col("n_pos"), col("df"))
      def term(nij: org.apache.spark.sql.Column, ni: org.apache.spark.sql.Column,
          nj: org.apache.spark.sql.Column) =
        when(nij > 0,
          (nij.cast("double") / col("n_total")) *
            log(nij.cast("double") * col("n_total") /
              (ni.cast("double") * nj)))
          .otherwise(lit(0.0))
      cells
        .select(col("t"), col("n11"), col("n10"), col("n01"), col("n00"),
          round(
            term(col("n11"), col("df"), col("n_pos")) +
              term(col("n10"), col("df"), col("n_total") - col("n_pos")) +
              term(col("n01"), col("n_total") - col("df"), col("n_pos")) +
              term(col("n00"), col("n_total") - col("df"),
                col("n_total") - col("n_pos")),
            6).as("mi"))
        .orderBy(col("mi").desc, col("t"))
        .limit(15)
    },


    // Tukey-fence outlier gate per segment: q1/q3 per event type,
    // fences at 1.5·IQR, exact outlier counts + the observed extremes
    // (the metric-anomaly sibling of q_anomaly_mad — per-value instead
    // of per-day). Quantiles interpolate identically cross-engine
    // (q_quantiles parity); fences are fixed-shape doubles, so the
    // comparisons are deterministic. Group stats ride in as a
    // broadcast.
    "q_iqr_outliers" -> { (s, dir) =>
      val li = Tables.loadEvents(s, dir)
        .select(col("event_type").as("g"), col("value").as("v"))
      val q = li.groupBy("g").agg(
        expr("percentile(v, 0.25)").as("q1"),
        expr("percentile(v, 0.75)").as("q3"))
      val f = q.select(col("g"),
        (col("q1") - lit(1.5) * (col("q3") - col("q1"))).as("lo"),
        (col("q3") + lit(1.5) * (col("q3") - col("q1"))).as("hi"))
      li.join(broadcast(f), "g")
        .filter(col("v") < col("lo") || col("v") > col("hi"))
        .groupBy("g")
        .agg(count(lit(1)).as("n_outliers"),
          min(col("v")).as("min_out"), max(col("v")).as("max_out"),
          round(min(col("lo")), 6).as("lo"), round(min(col("hi")), 6).as("hi"))
        .orderBy("g")
    },


    // Wilson 95% confidence interval for the per-arm conversion rate —
    // what the experiment dashboard actually displays next to
    // q_chisq's verdict. Exact (n, conv) integers per arm; the
    // interval is one fixed-shape double expression per row
    // (z = 1.96 literal), identical in any IEEE engine.
    "q_conversion_ci" -> { (s, dir) =>
      val users = Tables.loadEvents(s, dir)
        .groupBy("user_id")
        .agg(max(when(col("event_type") === "purchase" && col("value") > 180, 1L)
          .otherwise(0L)).as("conv"))
      val split = graft.operators.Sampling.assignSplit(
        users, "user_id", Seq("A" -> 0.5, "B" -> 0.5), "ab9")
      val arms = split.groupBy("split")
        .agg(count(lit(1)).as("n"), sum(col("conv")).as("n_conv"))
      val z = lit(1.96)
      val nD = col("n").cast("double")
      val p = col("n_conv").cast("double") / nD
      val denom = lit(1.0) + z * z / nD
      val center = p + z * z / (lit(2.0) * nD)
      val half = z * sqrt(p * (lit(1.0) - p) / nD + z * z / (lit(4.0) * nD * nD))
      arms.select(col("split"), col("n"), col("n_conv"),
          round(p, 6).as("rate"),
          round((center - half) / denom, 6).as("ci_lo"),
          round((center + half) / denom, 6).as("ci_hi"))
        .orderBy("split")
    },


    // Empirical-Bayes beta-binomial shrinkage of per-user click-
    // through rates (clicks / click-or-view events): method-of-moments
    // Beta prior fit and posterior means entirely in 1e-6 fixed point
    // (stats/EbSmooth) — small-n users shrink to the corpus rate,
    // heavy users keep their own. Zero floats; the oracle replays the
    // identical integer algebra.
    "q_eb_smooth" -> { (s, dir) =>
      val g = Tables.loadEvents(s, dir)
        .filter(col("event_type").isin("view", "click"))
        .groupBy("user_id")
        .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L))
            .as("k"),
          count(lit(1)).as("n"))
      graft.stats.EbSmooth.betaBinomial(g, Seq("user_id"), "k", "n")
        .orderBy("user_id")
    },


    // Deterministic Poisson bootstrap (Chamandy/Google 2012): 32
    // resampling replicates of mean order revenue, each row entering
    // replicate b with a Poisson(1) weight that is a pure function of
    // (salt, b, orderkey) — no RNG state, layout-invariant, so the
    // whole resampling distribution replays in SQL. Replicates carry
    // exact integer (Σw·cents, Σw) pairs; ranks 4/29 of 32 are the
    // percentile-method 10/90 CI. Shuffle cost: B rows per upstream
    // partition (map-side combine), never the data (stats/Bootstrap).
    "q_bootstrap" -> { (s, dir) =>
      val o = Tables.load(s, dir, "orders")
        .select(col("o_orderkey"),
          (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
            .as("cents"))
      graft.stats.Bootstrap.rankedMeans(o, "cents", "o_orderkey",
          b = 32, salt = "bs9")
        .select(col("rank"), col("rep"), col("n"), col("sum_v"),
          round(col("mean"), 6).as("mean"),
          (col("rank") === 4).as("is_ci10_lo"),
          (col("rank") === 29).as("is_ci10_hi"))
        .orderBy("rank")
    },


    // MEDIAN bootstrap (stats/Bootstrap.rankedMedians) — the CI the
    // q_bootstrap machinery exists for (no CLT closed form for a
    // median): same deterministic Poisson weights, but each replicate
    // takes the exact weighted median via percentile's frequency arg —
    // resampled rows never physically repeat; the oracle unnests
    // range(w) for identical repeated-value semantics.
    "q_bootstrap_median" -> { (s, dir) =>
      val o = Tables.load(s, dir, "orders")
        .select(col("o_orderkey"),
          (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
            .as("cents"))
      graft.stats.Bootstrap.rankedMedians(o, "cents", "o_orderkey",
          b = 32, salt = "bm11")
        .select(col("rank"), col("rep"), col("n"),
          round(col("med"), 6).as("med"),
          (col("rank") === 4).as("is_ci10_lo"),
          (col("rank") === 29).as("is_ci10_hi"))
        .orderBy("rank")
    },


    // Pairwise Pearson correlation matrix over lineitem's numeric
    // columns (the profiling step before any feature is trusted) —
    // every moment is an EXACT DECIMAL(38,0) sum of integer-scaled
    // values (cents), so all six correlations come from one scan and
    // one final double expression apiece; deliberately not the builtin
    // corr(), whose float accumulation order is engine-internal.
    "q_corr_matrix" -> { (s, dir) =>
      val li = Tables.load(s, dir, "lineitem")
      val cols = corrCols.map { case (name, e) => e.as(name) }
      val base = li.select(cols: _*)
      val names = corrCols.map(_._1)
      def dsum(c: Column) = sum(c.cast("decimal(38,0)"))
      val moments =
        Seq(count(lit(1)).cast("decimal(38,0)").as("n")) ++
          names.map(x => dsum(col(x)).as(s"s_$x")) ++
          corrPairs.map { case (x, y) =>
            dsum(col(x) * col(y)).as(s"s_${x}_$y")
          } ++
          names.map(x => dsum(col(x) * col(x)).as(s"s_${x}_$x"))
      val m = base.agg(moments.head, moments.tail: _*)
      val rows = corrPairs.map { case (x, y) =>
        val num = (col("n") * col(s"s_${x}_$y") -
          col(s"s_$x") * col(s"s_$y")).cast("double")
        val dx = (col("n") * col(s"s_${x}_$x") -
          col(s"s_$x") * col(s"s_$x")).cast("double")
        val dy = (col("n") * col(s"s_${y}_$y") -
          col(s"s_$y") * col(s"s_$y")).cast("double")
        struct(lit(x).as("x"), lit(y).as("y"),
          round(num / sqrt(dx * dy), 6).as("r"))
      }
      m.select(explode(array(rows: _*)).as("e"))
        .select(col("e.x"), col("e.y"), col("e.r"))
        .orderBy("x", "y")
    },


    // Benford first-digit audit (fraud/fabrication screen): observed
    // first-digit counts of revenue cents vs the Benford expectation
    // log10(1+1/d), with per-digit chi-square terms. Counts are exact
    // integers from the INTEGER cents rendering (double formatting
    // never touches the digit); the expected probabilities are shared
    // literals; no cross-row float sum — each digit's term stands
    // alone, so the audit is oracle-exact.
    "q_benford" -> { (s, dir) =>
      import s.implicits._
      val cents = (col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")
      val counts = Tables.load(s, dir, "orders")
        .where(col("o_totalprice").isNotNull)
        .select(substring(cents.cast("string"), 1, 1).cast("int").as("digit"))
        .groupBy("digit").agg(count(lit(1)).as("n"))
      val pDf = benfordP.toDF("digit", "p")
      val tot = counts.agg(sum(col("n")).as("tot"))
      counts.join(broadcast(pDf), "digit").crossJoin(tot)
        .select(col("digit"), col("n"),
          round(col("p"), 6).as("p_benford"),
          round(col("tot") * col("p"), 4).as("expected"),
          round((col("n") - col("tot") * col("p")) *
            (col("n") - col("tot") * col("p")) /
            (col("tot") * col("p")), 6).as("chi_term"))
        .orderBy("digit")
    },


    // k-anonymity / l-diversity audit (the dataset-release privacy
    // gate): every (nation, segment) quasi-identifier group's size and
    // its count of distinct balance tiers — groups under k=10 rows are
    // re-identifiable; low l leaks the sensitive attribute even at
    // high k. One keyed aggregate (graft.stats.Anonymity).
    "q_kanon" -> { (s, dir) =>
      graft.stats.Anonymity.audit(
        Tables.load(s, dir, "customer"),
        Seq("c_nationkey", "c_mktsegment"),
        floor(col("c_acctbal") / 1000).cast("long"), k = 10)
        .orderBy("c_nationkey", "c_mktsegment")
    },


    // T-CLOSENESS (Li/Li/Venkatasubramanian 2007) — the distribution-
    // distance completion of the q_kanon/l-diversity privacy trio: a
    // QI group can be k-anonymous and l-diverse yet still leak through
    // its sensitive-value DISTRIBUTION. For the ordered sensitive
    // attribute, EMD is the mean |cumulative difference| between group
    // and global distributions — computed here as EXACT integers on
    // the common denominator n_g·n (|cg·n − c·n_g| per bin prefix), so
    // the only double is the final normalized division. Every frame is
    // bounded (groups × bins), built from one pass of per-cell counts.
    "q_tcloseness" -> { (s, dir) =>
      val cust = Tables.load(s, dir, "customer").select(
        col("c_nationkey"), col("c_mktsegment"),
        floor(col("c_acctbal") / 1000).cast("long").as("bin"))
      val cells = cust.groupBy("c_nationkey", "c_mktsegment", "bin")
        .agg(count(lit(1)).as("cnt"))
      val groups = cells.groupBy("c_nationkey", "c_mktsegment")
        .agg(sum(col("cnt")).as("n_g"))
      val bins = cust.groupBy("bin").agg(count(lit(1)).as("cnt_b"))
        .withColumn("c", sum(col("cnt_b")).over(Window.orderBy("bin")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val tot = bins.agg(sum(col("cnt_b")).as("n"),
        count(lit(1)).as("nbins"))
      val wg = Window.partitionBy("c_nationkey", "c_mktsegment")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      groups.crossJoin(broadcast(bins.select(col("bin"), col("c"))))
        .join(cells, Seq("c_nationkey", "c_mktsegment", "bin"), "left")
        .withColumn("cg", sum(coalesce(col("cnt"), lit(0L))).over(wg))
        .crossJoin(broadcast(tot))
        .withColumn("term", abs(col("cg") * col("n") - col("c") * col("n_g")))
        .groupBy(col("c_nationkey"), col("c_mktsegment"), col("n_g"),
          col("n"), col("nbins"))
        .agg(sum(col("term")).as("emd_scaled"))
        .select(col("c_nationkey"), col("c_mktsegment"), col("n_g"),
          round(col("emd_scaled").cast("double") /
            (col("n_g") * col("n") * (col("nbins") - 1)).cast("double"), 6)
            .as("emd"))
        .withColumn("breach", col("emd") > 0.2)
        .orderBy("c_nationkey", "c_mktsegment")
    },


    // Kaplan-Meier retention curves per market segment: subject =
    // customer, duration = weeks between first and last order, event =
    // churned (last order >30 days before the dataset's horizon),
    // else censored. The survival product is a left-to-right chain of
    // exactly-rounded IEEE ops (no exp/ln), so the recursive-CTE
    // oracle replays the doubles bit-for-bit — the q_rand_proj
    // chained-sum discipline applied to a chained product.
    "q_survival" -> { (s, dir) =>
      val o = Tables.load(s, dir, "orders")
        .select(col("o_custkey"), to_date(col("o_orderdate")).as("d"))
      val horizon = o.agg(max(col("d")).as("e"))
      val subj = o.groupBy("o_custkey")
        .agg(min(col("d")).as("f"), max(col("d")).as("l"))
        .crossJoin(broadcast(horizon))
        .join(Tables.load(s, dir, "customer")
          .select(col("c_custkey"), col("c_mktsegment").as("seg")),
          col("o_custkey") === col("c_custkey"))
        .select(col("seg"),
          expr("datediff(l, f) div 7").as("dur_w"),
          when(datediff(col("e"), col("l")) > 30, 1).otherwise(0).as("ev"))
      graft.operators.Survival.kaplanMeier(subj, Seq("seg"), "dur_w", "ev")
        .orderBy("seg", "t")
    },
  )

  val oracles: Map[String, String] = Map(

    // Identical salted-md5 uniform ((h+0.5)/2^60), identical
    // inverse-CDF Laplace, identical parity sign bit and clamp.
    "q_dp_counts" ->
      """WITH c AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n
        |  FROM documents GROUP BY 1),
        |z AS (
        |  SELECT source, n,
        |    (('0x' || substr(md5('dp1|' || source), 1, 15))::BIGINT + 0.5)
        |      / 1152921504606846976.0 AS u,
        |    CASE WHEN ('0x' || substr(md5('dp1|' || source), 16, 1))::BIGINT
        |              % 2 = 0 THEN 1 ELSE -1 END AS sign
        |  FROM c)
        |SELECT source,
        |  greatest(CAST(0 AS BIGINT),
        |    n + CAST(round(-ln(u) / 0.5, 0) AS BIGINT) * sign)
        |    AS noisy_count
        |FROM z ORDER BY source""".stripMargin,


    // row_number mirror of the distributed rank; identical integer
    // k = max(1, n·p//100) and clamp arithmetic.
    "q_winsorize" ->
      """WITH o AS (
        |  SELECT doc_id, n_chars,
        |    row_number() OVER (ORDER BY n_chars, doc_id) AS r
        |  FROM documents),
        |nn AS (SELECT count(*) AS c FROM documents),
        |k AS (SELECT greatest((SELECT c FROM nn) * 5 // 100, 1) AS k05,
        |             greatest((SELECT c FROM nn) * 95 // 100, 1) AS k95),
        |cuts AS (SELECT
        |  (SELECT n_chars FROM o WHERE r = (SELECT k05 FROM k)) AS lo,
        |  (SELECT n_chars FROM o WHERE r = (SELECT k95 FROM k)) AS hi)
        |SELECT source, count(*) AS n,
        |  CAST(sum(least(greatest(n_chars, (SELECT lo FROM cuts)), (SELECT hi FROM cuts))) AS BIGINT) AS sum_clamped,
        |  CAST(min(least(greatest(n_chars, (SELECT lo FROM cuts)), (SELECT hi FROM cuts))) AS BIGINT) AS min_clamped,
        |  CAST(max(least(greatest(n_chars, (SELECT lo FROM cuts)), (SELECT hi FROM cuts))) AS BIGINT) AS max_clamped
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,


    // Same exact-integer-sums derivation (Σx, Σx², n) — identical IEEE
    // arithmetic on both engines, no builtin stddev.
    "q_zscore" ->
      """WITH g AS (
        |  SELECT source, sum(n_chars) AS s, sum(n_chars * n_chars) AS s2,
        |    count(*) AS n
        |  FROM documents GROUP BY source)
        |SELECT d.doc_id, d.source,
        |  round(CASE WHEN CAST(g.s2 AS DOUBLE) / g.n
        |               - (CAST(g.s AS DOUBLE) / g.n) * (CAST(g.s AS DOUBLE) / g.n) > 0
        |    THEN (d.n_chars - CAST(g.s AS DOUBLE) / g.n)
        |         / sqrt(CAST(g.s2 AS DOUBLE) / g.n
        |                - (CAST(g.s AS DOUBLE) / g.n) * (CAST(g.s AS DOUBLE) / g.n))
        |    ELSE 0.0 END, 6) AS z
        |FROM documents d JOIN g ON d.source = g.source
        |ORDER BY d.doc_id""".stripMargin,


    "q_chisq" ->
      """WITH u AS (
        |  SELECT user_id,
        |    max(CASE WHEN event_type = 'purchase' AND value > 180 THEN 1 ELSE 0 END) AS conv
        |  FROM events GROUP BY user_id),
        |sp AS (
        |  SELECT conv,
        |    CASE WHEN ('0x' || substr(md5('ab9|' || CAST(user_id AS VARCHAR)), 1, 15))::BIGINT
        |              / 1152921504606846976.0 < 0.5
        |         THEN 'A' ELSE 'B' END AS split
        |  FROM u),
        |c AS (
        |  SELECT
        |    CAST(sum(CASE WHEN split = 'A' AND conv = 0 THEN 1 ELSE 0 END) AS BIGINT) AS a0,
        |    CAST(sum(CASE WHEN split = 'A' AND conv = 1 THEN 1 ELSE 0 END) AS BIGINT) AS a1,
        |    CAST(sum(CASE WHEN split = 'B' AND conv = 0 THEN 1 ELSE 0 END) AS BIGINT) AS b0,
        |    CAST(sum(CASE WHEN split = 'B' AND conv = 1 THEN 1 ELSE 0 END) AS BIGINT) AS b1
        |  FROM sp),
        |d AS (
        |  SELECT a0, a1, b0, b1,
        |    CAST(a0 AS DOUBLE) AS a0d, CAST(a1 AS DOUBLE) AS a1d,
        |    CAST(b0 AS DOUBLE) AS b0d, CAST(b1 AS DOUBLE) AS b1d
        |  FROM c)
        |SELECT a0, a1, b0, b1,
        |  CAST(a0d + a1d + b0d + b1d AS BIGINT) AS n,
        |  round(CASE WHEN a0d + a1d > 0 AND b0d + b1d > 0
        |              AND a0d + b0d > 0 AND a1d + b1d > 0 THEN
        |      (a0d - (a0d + a1d) * (a0d + b0d) / (a0d + a1d + b0d + b1d))
        |    * (a0d - (a0d + a1d) * (a0d + b0d) / (a0d + a1d + b0d + b1d))
        |    / ((a0d + a1d) * (a0d + b0d) / (a0d + a1d + b0d + b1d))
        |    + (a1d - (a0d + a1d) * (a1d + b1d) / (a0d + a1d + b0d + b1d))
        |    * (a1d - (a0d + a1d) * (a1d + b1d) / (a0d + a1d + b0d + b1d))
        |    / ((a0d + a1d) * (a1d + b1d) / (a0d + a1d + b0d + b1d))
        |    + (b0d - (b0d + b1d) * (a0d + b0d) / (a0d + a1d + b0d + b1d))
        |    * (b0d - (b0d + b1d) * (a0d + b0d) / (a0d + a1d + b0d + b1d))
        |    / ((b0d + b1d) * (a0d + b0d) / (a0d + a1d + b0d + b1d))
        |    + (b1d - (b0d + b1d) * (a1d + b1d) / (a0d + a1d + b0d + b1d))
        |    * (b1d - (b0d + b1d) * (a1d + b1d) / (a0d + a1d + b0d + b1d))
        |    / ((b0d + b1d) * (a1d + b1d) / (a0d + a1d + b0d + b1d))
        |    END, 6) AS chi2
        |FROM d""".stripMargin,


    // Exact integer moments per arm; t and Welch df in CTE-named
    // doubles whose expression shapes mirror ABTest.welchT verbatim.
    "q_ttest" ->
      """WITH c AS (
        |  SELECT
        |    CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |    CAST(sum(CASE WHEN lang = 'en' THEN CAST(n_chars AS BIGINT) ELSE 0 END) AS BIGINT) AS sum_a,
        |    CAST(sum(CASE WHEN lang = 'en' THEN CAST(n_chars AS BIGINT) * CAST(n_chars AS BIGINT) ELSE 0 END) AS BIGINT) AS ssq_a,
        |    CAST(sum(CASE WHEN lang = 'en' THEN 0 ELSE 1 END) AS BIGINT) AS n_b,
        |    CAST(sum(CASE WHEN lang = 'en' THEN 0 ELSE CAST(n_chars AS BIGINT) END) AS BIGINT) AS sum_b,
        |    CAST(sum(CASE WHEN lang = 'en' THEN 0 ELSE CAST(n_chars AS BIGINT) * CAST(n_chars AS BIGINT) END) AS BIGINT) AS ssq_b
        |  FROM documents),
        |d AS (SELECT n_a, sum_a, ssq_a, n_b, sum_b, ssq_b,
        |  CAST(n_a AS DOUBLE) AS nad, CAST(sum_a AS DOUBLE) AS s1a, CAST(ssq_a AS DOUBLE) AS s2a,
        |  CAST(n_b AS DOUBLE) AS nbd, CAST(sum_b AS DOUBLE) AS s1b, CAST(ssq_b AS DOUBLE) AS s2b
        |  FROM c),
        |v AS (SELECT *, s1a / nad AS ma, (s2a - s1a * s1a / nad) / (nad - 1) AS va,
        |        s1b / nbd AS mb, (s2b - s1b * s1b / nbd) / (nbd - 1) AS vb FROM d),
        |e AS (SELECT *, va / nad + vb / nbd AS se2 FROM v)
        |SELECT n_a, sum_a, ssq_a, n_b, sum_b, ssq_b,
        |  round(CASE WHEN n_a > 1 AND n_b > 1 THEN (ma - mb) / sqrt(se2) END, 6) AS t_stat,
        |  round(CASE WHEN n_a > 1 AND n_b > 1 THEN se2 * se2 /
        |    ((va / nad) * (va / nad) / (nad - 1) + (vb / nbd) * (vb / nbd) / (nbd - 1)) END, 6) AS df_welch
        |FROM e""".stripMargin,


    // Value-histogram midranks (the q_auc machinery on raw n_chars),
    // exact tie cubes, the same pinned z formula.
    "q_mannwhitney" ->
      """WITH d AS (
        |  SELECT CAST(n_chars AS BIGINT) AS v,
        |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS a
        |  FROM documents),
        |h AS (SELECT v, CAST(count(*) AS BIGINT) AS cnt,
        |        CAST(sum(a) AS BIGINT) AS na FROM d GROUP BY v),
        |c AS (SELECT v, cnt, na,
        |        CAST(sum(cnt) OVER (ORDER BY v) AS BIGINT) AS cum FROM h),
        |agg AS (SELECT CAST(sum(na) AS BIGINT) AS n_a,
        |  CAST(sum(cnt) - sum(na) AS BIGINT) AS n_b,
        |  CAST(sum(na * (2 * (cum - cnt) + cnt + 1)) AS BIGINT) AS rank2,
        |  CAST(sum(cnt * cnt * cnt - cnt) AS BIGINT) AS ties FROM c),
        |u AS (SELECT n_a, n_b, rank2 - n_a * (n_a + 1) AS u2, ties FROM agg),
        |s AS (SELECT n_a, n_b, u2, ties,
        |  CASE WHEN n_a + n_b > 1 THEN
        |    CAST(n_a AS DOUBLE) * n_b / 12.0 *
        |      (CAST(n_a + n_b + 1 AS DOUBLE)
        |       - CAST(ties AS DOUBLE) /
        |         (CAST(n_a + n_b AS DOUBLE) * (CAST(n_a + n_b AS DOUBLE) - 1.0)))
        |  END AS se2 FROM u)
        |SELECT n_a, n_b, u2, ties,
        |  CASE WHEN se2 > 0 THEN
        |    round((CAST(u2 AS DOUBLE) / 2.0 - CAST(n_a AS DOUBLE) * n_b / 2.0)
        |      / sqrt(se2), 6) END AS z
        |FROM s""".stripMargin,


    // Daily counts → exact scaled cumulative deviation (n·cum − k·total,
    // all BIGINT) → |sdev| argmax flag.
    // Same exact rank mapping: (r·N + n − 1) // n into the pooled
    // row_number frame.
    "q_quantile_norm" ->
      """WITH d AS (
        |  SELECT doc_id, source, n_chars FROM documents
        |  WHERE n_chars IS NOT NULL),
        |src AS (
        |  SELECT doc_id, source, n_chars,
        |    row_number() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS r,
        |    count(*) OVER (PARTITION BY source) AS n
        |  FROM d),
        |g AS (
        |  SELECT n_chars AS qnorm,
        |    row_number() OVER (ORDER BY n_chars, doc_id) AS k
        |  FROM d),
        |t AS (SELECT count(*) AS nt FROM d)
        |SELECT src.doc_id, src.source, src.n_chars, g.qnorm
        |FROM src CROSS JOIN t
        |JOIN g ON g.k = (src.r * t.nt + src.n - 1) // src.n
        |ORDER BY src.doc_id""".stripMargin,


    // All pairwise slopes as integer pairs, the same
    // (ratio, dy, dx) total order, middle-two selection, and the
    // quantile_cont intercept.
    "q_theil_sen" ->
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS d, CAST(count(*) AS BIGINT) AS x
        |  FROM events GROUP BY 1),
        |m0 AS (SELECT min(d) AS d0 FROM daily),
        |s AS (SELECT CAST(date_diff('day', (SELECT d0 FROM m0), d) AS BIGINT) AS k, x
        |      FROM daily),
        |pr AS (SELECT b.x - a.x AS dy, b.k - a.k AS dx
        |       FROM s a JOIN s b ON b.k > a.k),
        |o AS (SELECT dy, dx, row_number() OVER (
        |        ORDER BY CAST(dy AS DOUBLE) / dx, dy, dx) AS rn FROM pr),
        |np AS (SELECT CAST(count(*) AS BIGINT) AS np FROM pr),
        |lo AS (SELECT dy, dx FROM o WHERE rn = ((SELECT np FROM np) + 1) // 2),
        |hi AS (SELECT dy, dx FROM o WHERE rn = (SELECT np FROM np) // 2 + 1),
        |sl AS (SELECT round((CAST((SELECT dy FROM lo) AS DOUBLE) / (SELECT dx FROM lo)
        |         + CAST((SELECT dy FROM hi) AS DOUBLE) / (SELECT dx FROM hi)) / 2.0, 6) AS slope)
        |SELECT (SELECT np FROM np) AS n_pairs,
        |  (SELECT dy FROM lo) AS lo_num, (SELECT dx FROM lo) AS lo_den,
        |  (SELECT dy FROM hi) AS hi_num, (SELECT dx FROM hi) AS hi_den,
        |  (SELECT slope FROM sl) AS slope,
        |  (SELECT round(quantile_cont(x - (SELECT slope FROM sl) * k, 0.5), 6)
        |   FROM s) AS icept""".stripMargin,


    // Value-histogram ECDFs; the scaled max gap is exact BIGINT.
    "q_ks" ->
      """WITH b AS (
        |  SELECT CAST(n_chars AS BIGINT) AS v,
        |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS ia
        |  FROM documents),
        |hist AS (
        |  SELECT v, CAST(sum(ia) AS BIGINT) AS ca,
        |    CAST(count(*) - sum(ia) AS BIGINT) AS cb
        |  FROM b GROUP BY v),
        |cum AS (
        |  SELECT
        |    CAST(sum(ca) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cca,
        |    CAST(sum(cb) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS ccb
        |  FROM hist),
        |t AS (SELECT CAST(sum(ia) AS BIGINT) AS n_a,
        |        CAST(count(*) - sum(ia) AS BIGINT) AS n_b FROM b),
        |a AS (SELECT (SELECT n_a FROM t) AS n_a, (SELECT n_b FROM t) AS n_b,
        |        CAST(max(abs(cca * (SELECT n_b FROM t) - ccb * (SELECT n_a FROM t))) AS BIGINT) AS d_num
        |      FROM cum)
        |SELECT n_a, n_b, d_num,
        |  round(CAST(d_num AS DOUBLE) / CAST(n_a * n_b AS DOUBLE), 6) AS ks_d
        |FROM a""".stripMargin,


    // Integer-cents Lorenz moment over the row_number mirror of the
    // distributed rank (same total order: cents, custkey).
    "q_gini" ->
      """WITH c AS (
        |  SELECT o_custkey,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents
        |  FROM orders GROUP BY 1),
        |r AS (SELECT cents,
        |        row_number() OVER (ORDER BY cents, o_custkey) AS rank FROM c),
        |a AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |        CAST(sum(cents) AS BIGINT) AS total_cents,
        |        CAST(sum(rank * cents) AS BIGINT) AS weighted FROM r)
        |SELECT n, total_cents, weighted,
        |  round(2.0 * weighted / CAST(n * total_cents AS DOUBLE)
        |    - CAST(n + 1 AS DOUBLE) / n, 6) AS gini
        |FROM a""".stripMargin,


    // row_number mirror of the distributed rank, integer decile
    // arithmetic, exact cents.
    "q_pareto" ->
      """WITH c AS (
        |  SELECT o_custkey,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents
        |  FROM orders GROUP BY 1),
        |r AS (SELECT cents,
        |        row_number() OVER (ORDER BY cents, o_custkey) AS rank FROM c),
        |t AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |        CAST(sum(cents) AS BIGINT) AS total_cents FROM r),
        |d AS (SELECT CAST(((rank - 1) * 10) // (SELECT n FROM t) AS INT) AS decile,
        |        cents FROM r)
        |SELECT decile, CAST(count(*) AS BIGINT) AS n_cust,
        |  CAST(sum(cents) AS BIGINT) AS cents,
        |  round(CAST(sum(cents) AS DOUBLE) / (SELECT total_cents FROM t), 6)
        |    AS rev_share
        |FROM d GROUP BY 1 ORDER BY decile""".stripMargin,


    // Exact 2×2 presence tables per token; four fixed-shape MI terms
    // mirroring the Spark expression order.
    "q_mutual_info" ->
      """WITH d AS (
        |  SELECT doc_id, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y, text
        |  FROM documents WHERE text IS NOT NULL),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_total,
        |          CAST(sum(y) AS BIGINT) AS n_pos FROM d),
        |tk AS (
        |  SELECT DISTINCT doc_id, y,
        |    unnest(list_filter(regexp_split_to_array(lower(text), '\s+'),
        |      x -> len(x) > 0)) AS t
        |  FROM d),
        |g AS (
        |  SELECT t, CAST(count(*) AS BIGINT) AS df, CAST(sum(y) AS BIGINT) AS n11
        |  FROM tk GROUP BY t HAVING count(*) >= 10),
        |cells AS (
        |  SELECT t, n11, df - n11 AS n10,
        |    (SELECT n_pos FROM tot) - n11 AS n01,
        |    (SELECT n_total FROM tot) - (SELECT n_pos FROM tot) - (df - n11) AS n00,
        |    (SELECT n_total FROM tot) AS n_total,
        |    (SELECT n_pos FROM tot) AS n_pos, df
        |  FROM g)
        |SELECT t, n11, n10, n01, n00,
        |  round(
        |    (CASE WHEN n11 > 0 THEN (CAST(n11 AS DOUBLE) / n_total)
        |      * ln(CAST(n11 AS DOUBLE) * n_total / (CAST(df AS DOUBLE) * n_pos)) ELSE 0.0 END)
        |    + (CASE WHEN n10 > 0 THEN (CAST(n10 AS DOUBLE) / n_total)
        |      * ln(CAST(n10 AS DOUBLE) * n_total / (CAST(df AS DOUBLE) * (n_total - n_pos))) ELSE 0.0 END)
        |    + (CASE WHEN n01 > 0 THEN (CAST(n01 AS DOUBLE) / n_total)
        |      * ln(CAST(n01 AS DOUBLE) * n_total / (CAST(n_total - df AS DOUBLE) * n_pos)) ELSE 0.0 END)
        |    + (CASE WHEN n00 > 0 THEN (CAST(n00 AS DOUBLE) / n_total)
        |      * ln(CAST(n00 AS DOUBLE) * n_total / (CAST(n_total - df AS DOUBLE) * (n_total - n_pos))) ELSE 0.0 END),
        |  6) AS mi
        |FROM cells ORDER BY mi DESC, t LIMIT 15""".stripMargin,


    // Per-group quantile fences, identical expression shapes.
    "q_iqr_outliers" ->
      """WITH li AS (SELECT event_type AS g, value AS v FROM events),
        |q AS (SELECT g, quantile_cont(v, 0.25) AS q1, quantile_cont(v, 0.75) AS q3
        |      FROM li GROUP BY g),
        |f AS (SELECT g, q1 - 1.5 * (q3 - q1) AS lo, q3 + 1.5 * (q3 - q1) AS hi FROM q)
        |SELECT li.g, CAST(count(*) AS BIGINT) AS n_outliers,
        |  min(v) AS min_out, max(v) AS max_out,
        |  round(min(lo), 6) AS lo, round(min(hi), 6) AS hi
        |FROM li JOIN f ON li.g = f.g
        |WHERE v < lo OR v > hi
        |GROUP BY li.g ORDER BY li.g""".stripMargin,


    // Per-arm Wilson interval; expression shapes mirror the Spark
    // side operand for operand (z² etc. fold to identical doubles).
    "q_conversion_ci" ->
      """WITH u AS (
        |  SELECT user_id,
        |    max(CASE WHEN event_type = 'purchase' AND value > 180 THEN 1 ELSE 0 END) AS conv
        |  FROM events GROUP BY user_id),
        |sp AS (
        |  SELECT conv,
        |    CASE WHEN ('0x' || substr(md5('ab9|' || CAST(user_id AS VARCHAR)), 1, 15))::BIGINT
        |              / 1152921504606846976.0 < 0.5
        |         THEN 'A' ELSE 'B' END AS split
        |  FROM u),
        |arms AS (
        |  SELECT split, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(conv) AS BIGINT) AS n_conv
        |  FROM sp GROUP BY 1),
        |c AS (SELECT split, n, n_conv, CAST(n AS DOUBLE) AS nd,
        |        CAST(n_conv AS DOUBLE) / CAST(n AS DOUBLE) AS p FROM arms)
        |SELECT split, n, n_conv, round(p, 6) AS rate,
        |  round((p + 1.96 * 1.96 / (2.0 * nd)
        |    - 1.96 * sqrt(p * (1.0 - p) / nd + 1.96 * 1.96 / (4.0 * nd * nd)))
        |    / (1.0 + 1.96 * 1.96 / nd), 6) AS ci_lo,
        |  round((p + 1.96 * 1.96 / (2.0 * nd)
        |    + 1.96 * sqrt(p * (1.0 - p) / nd + 1.96 * 1.96 / (4.0 * nd * nd)))
        |    / (1.0 + 1.96 * 1.96 / nd), 6) AS ci_hi
        |FROM c ORDER BY split""".stripMargin,


    // The fixed-point EB fit replayed verbatim: integer div at every
    // step, scalar CTEs instead of broadcasts.
    "q_eb_smooth" ->
      """WITH g AS (
        |  SELECT user_id,
        |    CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS k,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM events WHERE event_type IN ('view', 'click')
        |  GROUP BY user_id),
        |p AS (SELECT user_id, k, n, (k * 1000000) // n AS p6 FROM g),
        |m AS (SELECT CAST(count(*) AS BIGINT) AS gg,
        |        CAST(sum(p6) AS BIGINT) // CAST(count(*) AS BIGINT) AS m6
        |      FROM p),
        |v AS (SELECT CAST(sum((p.p6 - m.m6) * (p.p6 - m.m6)) AS BIGINT)
        |        // max(m.gg) AS var12
        |      FROM p, m),
        |r AS (SELECT greatest(2, (m.m6 * (1000000 - m.m6))
        |        // greatest(v.var12, 1)) AS r, m.m6 AS m6
        |      FROM m, v)
        |SELECT p.user_id, p.k, p.n, p.p6,
        |  (p.k * 1000000 + r.m6 * (r.r - 1)) // (p.n + r.r - 1) AS post6
        |FROM p, r ORDER BY p.user_id""".stripMargin,


    // Weights replayed through the shared inverse-CDF literal chain
    // (Bootstrap.poissonWeightSql — same Scala constants, zero drift).
    "q_bootstrap" -> {
      val u = "(('0x' || substr(md5('bs9|' || CAST(rep AS VARCHAR) || '|' || " +
        "CAST(o_orderkey AS VARCHAR)), 1, 15))::BIGINT / 1152921504606846976.0)"
      s"""WITH o AS (
         |  SELECT o_orderkey,
         |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
         |  FROM orders),
         |reps AS (SELECT range AS rep FROM range(32)),
         |w AS (
         |  SELECT rep, cents,
         |    ${graft.stats.Bootstrap.poissonWeightSql(u)} AS w
         |  FROM o, reps),
         |a AS (
         |  SELECT rep, CAST(sum(w) AS BIGINT) AS n,
         |    CAST(sum(w * cents) AS BIGINT) AS sum_v
         |  FROM w GROUP BY 1),
         |m AS (SELECT rep, n, sum_v, CAST(sum_v AS DOUBLE) / n AS mean FROM a),
         |rk AS (SELECT *, row_number() OVER (ORDER BY mean, rep) AS rank FROM m)
         |SELECT rank, rep, n, sum_v, round(mean, 6) AS mean,
         |  rank = 4 AS is_ci10_lo, rank = 29 AS is_ci10_hi
         |FROM rk ORDER BY rank""".stripMargin
    },


    // Same weights; the frequency-weighted median replayed by
    // physically unnesting range(w) per row.
    "q_bootstrap_median" -> {
      val u = "(('0x' || substr(md5('bm11|' || CAST(rep AS VARCHAR) || '|' || " +
        "CAST(o_orderkey AS VARCHAR)), 1, 15))::BIGINT / 1152921504606846976.0)"
      s"""WITH o AS (
         |  SELECT o_orderkey,
         |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
         |  FROM orders),
         |reps AS (SELECT range AS rep FROM range(32)),
         |w AS (
         |  SELECT rep, cents,
         |    ${graft.stats.Bootstrap.poissonWeightSql(u)} AS w
         |  FROM o, reps),
         |wx AS (SELECT rep, cents
         |       FROM w JOIN (SELECT unnest([1, 2, 3, 4, 5, 6]) AS k) r
         |         ON r.k <= w.w),
         |a AS (
         |  SELECT rep, quantile_cont(cents, 0.5) AS med,
         |    CAST(count(*) AS BIGINT) AS n
         |  FROM wx GROUP BY 1),
         |rk AS (SELECT *, row_number() OVER (ORDER BY med, rep) AS rank FROM a)
         |SELECT rank, rep, n, round(med, 6) AS med,
         |  rank = 4 AS is_ci10_lo, rank = 29 AS is_ci10_hi
         |FROM rk ORDER BY rank""".stripMargin
    },


    // Same exact integer moments; DuckDB combines them in HUGEINT
    // (int128) where Spark uses DECIMAL(38,0) — both exact, and the
    // same integer casts to the same double.
    "q_corr_matrix" -> {
      val names = corrCols.map(_._1)
      val proj = names.map(n => s"${corrColSql(n)} AS $n").mkString(",\n    ")
      val sums =
        names.map(n => s"CAST(sum(CAST($n AS HUGEINT)) AS HUGEINT) AS s_$n") ++
          corrPairs.map { case (x, y) =>
            s"CAST(sum(CAST($x AS HUGEINT) * CAST($y AS HUGEINT)) AS HUGEINT) AS s_${x}_$y"
          } ++
          names.map(n =>
            s"CAST(sum(CAST($n AS HUGEINT) * CAST($n AS HUGEINT)) AS HUGEINT) AS s_${n}_$n")
      val rows = corrPairs.map { case (x, y) =>
        s"""SELECT '$x' AS x, '$y' AS y,
           |  round(CAST(n * s_${x}_$y - s_$x * s_$y AS DOUBLE) /
           |        sqrt(CAST(n * s_${x}_$x - s_$x * s_$x AS DOUBLE) *
           |             CAST(n * s_${y}_$y - s_$y * s_$y AS DOUBLE)), 6) AS r
           |FROM m""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH base AS (
         |  SELECT
         |    $proj
         |  FROM lineitem),
         |m AS (
         |  SELECT CAST(count(*) AS HUGEINT) AS n,
         |    ${sums.mkString(",\n    ")}
         |  FROM base)
         |SELECT * FROM (
         |$rows
         |) ORDER BY x, y""".stripMargin
    },


    // Shared literal probabilities; integer-cents digit extraction;
    // per-digit terms only (no cross-row float sum anywhere).
    "q_benford" -> {
      val values = benfordP.map { case (d, p) => s"($d, $p)" }.mkString(", ")
      s"""WITH c AS (
         |  SELECT CAST(substr(CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS digit
         |  FROM orders WHERE o_totalprice IS NOT NULL),
         |n AS (SELECT digit, CAST(count(*) AS BIGINT) AS n FROM c GROUP BY 1),
         |t AS (SELECT CAST(sum(n) AS BIGINT) AS tot FROM n),
         |p AS (SELECT digit, CAST(p AS DOUBLE) AS p
         |      FROM (VALUES $values) AS v(digit, p))
         |SELECT n.digit, n.n, round(p.p, 6) AS p_benford,
         |  round(t.tot * p.p, 4) AS expected,
         |  round((n.n - t.tot * p.p) * (n.n - t.tot * p.p) / (t.tot * p.p), 6) AS chi_term
         |FROM n JOIN p USING (digit) CROSS JOIN t ORDER BY digit""".stripMargin
    },


    "q_kanon" ->
      """SELECT c_nationkey, c_mktsegment, CAST(count(*) AS BIGINT) AS n,
        |  CAST(count(DISTINCT CAST(floor(c_acctbal / 1000) AS BIGINT)) AS BIGINT) AS l_distinct,
        |  count(*) < 10 AS risky_k
        |FROM customer GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,


    // The same exact common-denominator EMD: per-group and global
    // cumulatives over the full bin list, |cg·n − c·n_g| summed.
    "q_tcloseness" ->
      """WITH cu AS (
        |  SELECT c_nationkey, c_mktsegment,
        |    CAST(floor(c_acctbal / 1000) AS BIGINT) AS bin
        |  FROM customer),
        |cells AS (SELECT c_nationkey, c_mktsegment, bin,
        |            CAST(count(*) AS BIGINT) AS cnt FROM cu GROUP BY 1, 2, 3),
        |grp AS (SELECT c_nationkey, c_mktsegment,
        |          CAST(sum(cnt) AS BIGINT) AS n_g FROM cells GROUP BY 1, 2),
        |bins AS (
        |  SELECT bin, CAST(count(*) AS BIGINT) AS cnt_b,
        |    CAST(sum(count(*)) OVER (ORDER BY bin
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS c
        |  FROM cu GROUP BY 1),
        |tot AS (SELECT CAST(sum(cnt_b) AS BIGINT) AS n,
        |          CAST(count(*) AS BIGINT) AS nbins FROM bins),
        |fz AS (
        |  SELECT g.c_nationkey, g.c_mktsegment, g.n_g, b.bin, b.c,
        |    CAST(sum(coalesce(ce.cnt, 0)) OVER (
        |      PARTITION BY g.c_nationkey, g.c_mktsegment ORDER BY b.bin
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cg
        |  FROM grp g CROSS JOIN bins b
        |  LEFT JOIN cells ce ON ce.c_nationkey = g.c_nationkey
        |    AND ce.c_mktsegment = g.c_mktsegment AND ce.bin = b.bin),
        |agg AS (
        |  SELECT f.c_nationkey, f.c_mktsegment, f.n_g,
        |    CAST(sum(abs(f.cg * t.n - f.c * f.n_g)) AS BIGINT) AS emd_scaled,
        |    max(t.n) AS n, max(t.nbins) AS nbins
        |  FROM fz f, tot t GROUP BY 1, 2, 3)
        |SELECT c_nationkey, c_mktsegment, n_g,
        |  round(CAST(emd_scaled AS DOUBLE)
        |        / CAST(n_g * n * (nbins - 1) AS DOUBLE), 6) AS emd,
        |  round(CAST(emd_scaled AS DOUBLE)
        |        / CAST(n_g * n * (nbins - 1) AS DOUBLE), 6) > 0.2 AS breach
        |FROM agg ORDER BY 1, 2""".stripMargin,


    // The KM product carried through a recursive CTE: each step is
    // ((s · (n−d)) / n) on doubles — the identical left-assoc op
    // sequence the Spark recurrence executes, so bits match.
    "q_survival" ->
      """WITH RECURSIVE horizon AS (
        |  SELECT max(CAST(o_orderdate AS DATE)) AS e FROM orders),
        |subj AS (
        |  SELECT c.c_mktsegment AS seg,
        |    date_diff('day', min(CAST(o.o_orderdate AS DATE)),
        |              max(CAST(o.o_orderdate AS DATE))) // 7 AS t,
        |    CASE WHEN date_diff('day', max(CAST(o.o_orderdate AS DATE)),
        |                        (SELECT e FROM horizon)) > 30
        |         THEN 1 ELSE 0 END AS ev
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |  GROUP BY c.c_mktsegment, o.o_custkey),
        |byt AS (
        |  SELECT seg, t, CAST(sum(ev) AS BIGINT) AS d,
        |    CAST(sum(1 - ev) AS BIGINT) AS c
        |  FROM subj GROUP BY seg, t),
        |rn AS (
        |  SELECT seg, t, d, c,
        |    row_number() OVER (PARTITION BY seg ORDER BY t) AS k,
        |    CAST(sum(d + c) OVER (PARTITION BY seg) AS BIGINT)
        |      - CAST(sum(d + c) OVER (PARTITION BY seg ORDER BY t
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      + d + c AS n
        |  FROM byt),
        |r AS (
        |  SELECT seg, t, d, c, k, n,
        |    CAST(n - d AS DOUBLE) / n AS s
        |  FROM rn WHERE k = 1
        |  UNION ALL
        |  SELECT rn.seg, rn.t, rn.d, rn.c, rn.k, rn.n,
        |    r.s * (rn.n - rn.d) / rn.n
        |  FROM r JOIN rn ON rn.seg = r.seg AND rn.k = r.k + 1)
        |SELECT seg, t, n AS n_at_risk, d, c, s AS survival
        |FROM r ORDER BY seg, t""".stripMargin,
  )
}
