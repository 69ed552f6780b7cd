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

/** Ml slice of the [[SparkEntry]] query/oracle registry. Split from
  * the former single 15k-line entry file so scalac parallelizes across
  * domains and no single Map literal dominates compile time or method
  * size. Entry names, bodies, and oracle SQL are the driver contract,
  * byte-for-byte as they were in SparkEntry; shared fixtures and
  * oracle CTE builders stay on [[SparkEntry]] (private[graft]). */
private[graft] object RegMl {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // REPRODUCIBLE EPOCH SHUFFLE: the deterministic global permutation
    // a training loader consumes — shuffle position = dense rank of
    // md5(epoch_salt | doc_id) via the window-free assignment
    // (graft.text.Vocab.assignIds with a constant count column: order
    // reduces to shuffle_key asc), then round-robin sharding by
    // position for balanced, interleaved shards. Σ pos·(doc_id%1000)
    // per shard pins the ENTIRE permutation, not a sample. Changing
    // the salt is a new epoch; same salt replays bit-for-bit.
    "q_epoch_shuffle" -> { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          TextFunctions.tokenCount(col("text")).cast("long").as("n_tok"),
          md5(concat(lit("epoch7|"), col("doc_id"))).as("shuffle_key"),
          lit(0L).as("zero"))
      graft.text.Vocab.assignIds(docs, "shuffle_key", "zero", parts = 32)
        .select(col("doc_id"), col("n_tok"), col("id").as("pos"))
        .groupBy(pmod(col("pos"), lit(8L)).as("shard"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tok")).as("sum_tokens"),
          min(col("pos")).as("min_pos"), max(col("pos")).as("max_pos"),
          sum(col("pos") * pmod(col("doc_id"), lit(1000L)))
            .as("assign_checksum"))
        .orderBy("shard")
    },


    // Deterministic negative sampling (contrastive-training pairs):
    // per anchor doc, k=4 negatives via neg = (doc_id + 1 + h mod
    // (N−1)) mod N with h = the md5-prefix-60 of "neg|id|j" — never
    // the anchor itself by construction, uniform over the others,
    // layout/retry-invariant (no RNG state). Dense 0..N−1 ids are the
    // fixture's contract; the general form maps through a dense rank
    // first (GlobalRank). Pure projection — no shuffle at all.
    "q_negative_sample" -> { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      val n = docs.count()
      val ks = (0 until 4).map { j =>
        val h = conv(substring(md5(
          concat(lit(s"neg|"), col("doc_id").cast("string"), lit(s"|$j"))), 1, 15),
          16, 10).cast("long")
        struct(lit(j).as("j"),
          pmod(col("doc_id") + 1 + pmod(h, lit(n - 1)), lit(n)).as("neg_id"))
      }
      docs.select(col("doc_id"), explode(array(ks: _*)).as("x"))
        .select(col("doc_id"), col("x.j").as("j"), col("x.neg_id").as("neg_id"))
        .orderBy("doc_id", "j")
    },


    "q_sample_mix" -> { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      val weights = (0 to 19).map { i =>
        s"src$i" -> (if (i < 5) 1.0 else if (i < 10) 0.5 else if (i < 15) 0.25 else 0.125)
      }.toMap
      val mixed = Sampling.mixture(docs, "source", weights, "doc_id", salt = "mix1")
      Sampling.assignSplit(mixed, "doc_id",
        Seq("train" -> 0.875, "val" -> 0.0625, "test" -> 0.0625), salt = "split1")
        .select("doc_id", "source", "split")
        .orderBy("doc_id")
    },


    // Deterministic k-per-group sample: 3 docs per source by smallest
    // (hash, key) — WindowGroupLimit pre-trims per task before the
    // shuffle (asserted in SamplingSpec), so only ≤ k rows per
    // (group, partition) move at any corpus size.
    "q_group_sample" -> { (s, dir) =>
      Sampling.perGroupSample(Tables.load(s, dir, "documents"),
        "source", "doc_id", k = 3, salt = "pg1")
        .select("doc_id", "source")
        .orderBy("doc_id")
    },


    // Weighted sample without replacement (Efraimidis-Spirakis): the
    // 100 longest-weighted documents by the log-domain key ln(u)/n_chars
    // (≡ u^(1/n_chars), but precision-stable at any weight scale) over
    // the deterministic md5 unit hash — corpus curation's "best k by
    // quality weight" primitive. TakeOrdered plan, no global sort.
    "q_weighted_sample" -> { (s, dir) =>
      Sampling.weightedSample(Tables.load(s, dir, "documents"),
        "doc_id", "n_chars", k = 100, salt = "ws1")
        .select("doc_id", "wkey")
        .orderBy("doc_id")
    },


    // The full corpus-preparation pipeline end to end: quality +
    // repetition gate → exact-dedup survivors → benchmark
    // decontamination → deterministic mixture + split. One wide shuffle
    // (the dedup window) + a broadcast semi-join; gates and mix ride
    // the scan. Every stage is individually oracled above; this entry
    // proves the COMPOSITION agrees end to end.
    "q_pipeline" -> { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      val bench = docs.filter(pmod(col("doc_id"), lit(97)) === 0)
      val corpus = docs.filter(pmod(col("doc_id"), lit(97)) =!= 0)
      val weights = (0 to 19).map(i => s"src$i" -> (if (i < 10) 1.0 else 0.5)).toMap
      TrainingPipeline.prepare(corpus, bench, "text", "doc_id", "source",
        TrainingPipeline.Config(
          minQuality = 0.5, decontamN = 5, weights = weights,
          splits = Seq("train" -> 0.875, "val" -> 0.0625, "test" -> 0.0625),
          mixSalt = "mix1", splitSalt = "split1"))
        .select("doc_id", "source", "split")
        .orderBy("doc_id")
    },


    // Model evaluation for the q_lingd weights: MSE and R² of the
    // 2-iteration model over the training table — the fit/eval pair a
    // training pipeline reports. One aggregation over predictions
    // built from the (already rounded) weights; SS divisions are
    // generic doubles (not integer ratios), so round-6 is safe here.
    "q_lingd_eval" -> { (s, dir) =>
      val li = Tables.load(s, dir, "lineitem")
        .select(col("l_discount").as("x1"), col("l_tax").as("x2"),
          col("l_quantity").as("y"))
      val w = graft.ml.LinearGd.fit(li, Seq("x1", "x2"), "y",
        lr = 0.01, iters = 2)
      val pred = lit(w(0)) + lit(w(1)) * col("x1") + lit(w(2)) * col("x2")
      val r = li.agg(
        count(lit(1)).as("n"),
        sum((pred - col("y")) * (pred - col("y"))).as("ss_res"),
        sum(col("y")).as("sy"),
        sum(col("y") * col("y")).as("syy")).head()
      val n = r.getLong(0).toDouble
      val ssRes = r.getDouble(1)
      val ssTot = r.getDouble(3) - r.getDouble(2) * r.getDouble(2) / n
      def rnd(x: Double) =
        BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      import s.implicits._
      Seq((rnd(ssRes / n), rnd(1.0 - ssRes / ssTot))).toDF("mse", "r2")
    },


    // Deterministic full-batch GD LOGISTIC regression — the
    // fastText-style language/quality classifier of a corpus pipeline
    // (predict lang == 'en' from doc length and token count). One
    // aggregation per iteration; σ(z) rounded to 6 PER ROW so the
    // cross-engine exp() last-ulp difference never reaches the
    // gradient sums (graft.ml.LogisticGd; oracle unrolls all three
    // iterations as scalar CTEs with identical operation order).
    "q_logreg" -> { (s, dir) =>
      val d = logRegFeatures(Tables.load(s, dir, "documents"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val w = graft.ml.LogisticGd.fit(d, Seq("x1", "x2"), "y",
        lr = 1.0, iters = 3)
      d.unpersist()
      import s.implicits._
      Seq((w(0), w(1), w(2))).toDF("w0", "w1", "w2")
    },


    // The inference pass of the same classifier: per-doc probability
    // (rounded 6) + thresholded label — the corpus-gating scan a
    // trained quality filter runs over 100 TB (one scan, weights as
    // literals, whole-stage codegen, no UDF).
    "q_logreg_score" -> { (s, dir) =>
      val d = logRegFeatures(Tables.load(s, dir, "documents"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val w = graft.ml.LogisticGd.fit(d, Seq("x1", "x2"), "y",
        lr = 1.0, iters = 3)
      // cache backed training (4 passes); the single serving scan
      // below re-reads the source directly
      d.unpersist()
      graft.ml.LogisticGd.predict(d, Seq("x1", "x2"), w)
        .select(col("doc_id"), col("probability"), col("predicted"))
        .orderBy("doc_id")
    },


    // Deterministic full-batch GD linear regression (quantity ~
    // discount + tax): one aggregation per iteration computing the
    // d+1 gradient sums with current weights as literals, driver
    // state d+1 doubles, gradients and weights rounded 6 per step —
    // the k-means replay contract on a supervised trainer
    // (graft.ml.LinearGd; oracle unrolls both iterations as scalar
    // CTEs with identical operation order).
    "q_lingd" -> { (s, dir) =>
      val li = Tables.load(s, dir, "lineitem")
        .select(col("l_discount").as("x1"), col("l_tax").as("x2"),
          col("l_quantity").as("y"))
      val w = graft.ml.LinearGd.fit(li, Seq("x1", "x2"), "y",
        lr = 0.01, iters = 2)
      import s.implicits._
      Seq((w(0), w(1), w(2))).toDF("w0", "w1", "w2")
    },


    // QUANTILE regression (pinball-loss subgradient descent,
    // ml/QuantileGd): the conditional p75 of order quantity given
    // discount/tax — same feature view as q_lingd, integer lr, exact
    // decimal gradient sums, NO transcendental anywhere (the indicator
    // is a deterministic double comparison). Output = weights plus the
    // empirical coverage audit P(y ≤ ŷ).
    "q_quantile_reg" -> { (s, dir) =>
      val li = Tables.load(s, dir, "lineitem")
        .select(col("l_discount").as("x1"), col("l_tax").as("x2"),
          col("l_quantity").as("y"))
      val w = graft.ml.QuantileGd.fit(li, Seq("x1", "x2"), "y",
        tau = 0.75, lr = 10.0, iters = 3)
      li.agg(graft.ml.QuantileGd.coverage(li, Seq("x1", "x2"), "y", w)
          .as("coverage"))
        .select(lit(w(0)).as("w0"), lit(w(1)).as("w1"),
          lit(w(2)).as("w2"), col("coverage"))
    },


    // POISSON REGRESSION (log-link GLM, ml/PoissonGd) — the
    // count-outcome member of the GLM family (q_lingd identity link,
    // q_logreg logit link): events-per-user-per-day modeled on a
    // weekend indicator and a user bucket. One aggregation job per
    // iteration, exact decimal gradient sums, per-row rounded
    // clamped e^z — training replays bit-for-bit in the oracle.
    "q_poisson" -> { (s, dir) =>
      val d = Tables.loadEvents(s, dir)
        .groupBy(col("user_id"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).cast("double").as("y"))
        .select(
          when((dayofweek(col("day")) - 1).isin(0, 6), 1.0)
            .otherwise(0.0).as("x1"),
          (pmod(col("user_id"), lit(5)).cast("double") / 10.0).as("x2"),
          col("y"))
      val w = graft.ml.PoissonGd.fit(d, Seq("x1", "x2"), "y",
        lr = 1.0, iters = 6)
      s.range(1).select(lit(w(0)).as("w0"), lit(w(1)).as("w1"),
        lit(w(2)).as("w2"))
    },


    // ROC-AUC of the trained quality classifier (same fit as
    // q_logreg_score): Mann-Whitney rank-sum with average-rank tie
    // handling, computed on the 6dp-score HISTOGRAM — the one ordered
    // window runs over a post-agg-bounded frame (≤ 1e6 + 1 score
    // values at ANY corpus size), never a corpus-sized row_number.
    "q_auc" -> { (s, dir) =>
      val d = logRegFeatures(Tables.load(s, dir, "documents"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val w = graft.ml.LogisticGd.fit(d, Seq("x1", "x2"), "y",
        lr = 1.0, iters = 3)
      d.unpersist()
      graft.ml.Eval.auc(
        graft.ml.LogisticGd.predict(d, Seq("x1", "x2"), w),
        "probability", "y")
    },


    // FAIRNESS-SLICE AUC: the q_auc classifier's ranking quality PER
    // SOURCE — the audit that catches a model that ranks well
    // globally while failing a segment. Same exact rank-sum on the
    // score histogram, window partitioned by slice (still post-agg-
    // bounded per group); single-class slices emit NULL instead of
    // silently vanishing (ml/Eval.aucGrouped, EvalSpec).
    "q_auc_grouped" -> { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      val d = logRegFeatures(docs)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val w = graft.ml.LogisticGd.fit(d, Seq("x1", "x2"), "y",
        lr = 1.0, iters = 3)
      d.unpersist()
      graft.ml.Eval.aucGrouped(
        graft.ml.LogisticGd.predict(d, Seq("x1", "x2"), w)
          .join(docs.select("doc_id", "source"), "doc_id"),
        "probability", "y", "source")
        .orderBy("source")
    },


    // Per-slice BRIER SCORE completing the eval triple (AUC ranks,
    // ECE calibrates, Brier punishes confident wrongness): exact
    // DECIMAL(38,12) squared-residual sums — order-independent — one
    // keyed aggregate (ml/Eval.brierGrouped, EvalSpec).
    "q_brier_grouped" -> { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      val d = logRegFeatures(docs)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val w = graft.ml.LogisticGd.fit(d, Seq("x1", "x2"), "y",
        lr = 1.0, iters = 3)
      d.unpersist()
      graft.ml.Eval.brierGrouped(
        graft.ml.LogisticGd.predict(d, Seq("x1", "x2"), w)
          .join(docs.select("doc_id", "source"), "doc_id"),
        "probability", "y", "source")
        .orderBy("source")
    },


    // Per-slice EXPECTED CALIBRATION ERROR: q_calibration's
    // reliability gap collapsed to the fairness scalar per source —
    // Σ (n_bin/n)·|mean_score − frac_pos|. Two keyed aggregates over
    // ≤ slices×bins rows; |gap| runs on the identical rounded per-bin
    // rates both engines derive (ml/Eval.eceGrouped, EvalSpec).
    "q_ece_grouped" -> { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      val d = logRegFeatures(docs)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val w = graft.ml.LogisticGd.fit(d, Seq("x1", "x2"), "y",
        lr = 1.0, iters = 3)
      d.unpersist()
      graft.ml.Eval.eceGrouped(
        graft.ml.LogisticGd.predict(d, Seq("x1", "x2"), w)
          .join(docs.select("doc_id", "source"), "doc_id"),
        "probability", "y", "source")
        .orderBy("source")
    },


    // HELD-OUT cross-validated evaluation — the audit q_auc (trained
    // and scored on the same corpus) deliberately lacks: the same
    // logistic fit on folds 1-4 of the deterministic md5 5-fold split
    // (q_fold_assign's hash, salt cv9), AUC measured on the UNSEEN
    // fold 0. The oracle replays training with the fold filter in
    // every gradient sum and scores only the held-out fold.
    "q_cv_eval" -> { (s, dir) =>
      val d = graft.operators.Sampling.assignFolds(
        logRegFeatures(Tables.load(s, dir, "documents")),
        "doc_id", k = 5, salt = "cv9")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val train = d.filter(col("fold") =!= 0)
      val w = graft.ml.LogisticGd.fit(train, Seq("x1", "x2"), "y",
        lr = 1.0, iters = 3)
      d.unpersist()
      graft.ml.Eval.auc(
        graft.ml.LogisticGd.predict(d.filter(col("fold") === 0),
          Seq("x1", "x2"), w),
        "probability", "y")
    },


    // Calibration (reliability) table of the same classifier: 10
    // equal-width score bins × (exact n, n_pos, exact-decimal score
    // sum) — mean predicted score vs observed positive rate per bin,
    // the miscalibration readout. One keyed agg over ≤ 10 groups.
    "q_calibration" -> { (s, dir) =>
      val d = logRegFeatures(Tables.load(s, dir, "documents"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val w = graft.ml.LogisticGd.fit(d, Seq("x1", "x2"), "y",
        lr = 1.0, iters = 3)
      d.unpersist()
      graft.ml.Eval.calibration(
        graft.ml.LogisticGd.predict(d, Seq("x1", "x2"), w),
        "probability", "y", bins = 10)
        .orderBy("bin")
    },


    // Association rules over order baskets: directed pair rules with
    // support / confidence / lift from exact counts — the rule-mining
    // reading of the same co-purchase graph q_item_sim scores. The
    // candidate join is within the order key (bounded basket size).
    "q_assoc_rules" -> { (s, dir) =>
      graft.operators.AssocRules.rules(Tables.load(s, dir, "lineitem"),
        "l_orderkey", "l_partkey", minPairCount = 3)
        .orderBy("antecedent", "consequent")
    },


    // Deterministic stratified 5-fold audit: fold = md5₆₀(salt|id)
    // mod 5 (pure function of the key — layout/retry invariant), with
    // per-(lang, fold) counts and char mass proving hash balance
    // within every stratum. Per-row expression on the scan + one
    // keyed agg.
    "q_fold_assign" -> { (s, dir) =>
      graft.operators.Sampling.assignFolds(
        Tables.load(s, dir, "documents"), "doc_id", k = 5, salt = "cv9")
        .groupBy("lang", "fold")
        .agg(count(lit(1)).as("n"),
          sum(col("n_chars").cast("long")).as("sum_chars"))
        .orderBy("lang", "fold")
    },


    // DECISION STUMP (the CART split-search primitive): the exact
    // best threshold on l_quantity for predicting price — one
    // value-histogram pass collecting exact (n, Σy, Σy²) per feature
    // value (sums in DECIMAL(38,0)/HUGEINT so nothing rounds), running
    // totals over the ≤50-row histogram (bounded window frame, never
    // the corpus), SSE(t) in one fixed-shape double closed form per
    // candidate, argmin with ties to the smaller threshold. The gain
    // column (1 − SSE_split/SSE_root) is what a tree learner would
    // greedily maximize; every distributed pass is the same the full
    // CART would run per node.
    "q_stump" -> { (s, dir) =>
      val li = Tables.load(s, dir, "lineitem").select(
        round(col("l_quantity")).cast("long").as("q"),
        (col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long")
          .as("cents"))
      val hist = li.groupBy("q").agg(
        count(lit(1)).as("n"),
        sum(col("cents").cast("decimal(38,0)")).as("sy"),
        sum(col("cents").cast("decimal(19,0)")
          * col("cents").cast("decimal(19,0)")).as("syy"))
      val tot = hist.agg(sum(col("n")), sum(col("sy")), sum(col("syy"))).head
      val nTot = tot.getLong(0)
      val syTot = tot.getDecimal(1).doubleValue()
      val syyTot = tot.getDecimal(2).doubleValue()
      val sseRoot = syyTot - syTot * syTot / nTot
      val w = Window.orderBy("q")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = hist
        .withColumn("cn", sum(col("n")).over(w))
        .withColumn("csy", sum(col("sy")).over(w))
        .withColumn("csyy", sum(col("syy")).over(w))
        .filter(col("cn") < nTot) // right side must be non-empty
      val csyD = col("csy").cast("double")
      val csyyD = col("csyy").cast("double")
      val rn = (lit(nTot) - col("cn")).cast("double")
      val rsy = lit(syTot) - csyD
      val rsyy = lit(syyTot) - csyyD
      val sse = (csyyD - csyD * csyD / col("cn")) + (rsyy - rsy * rsy / rn)
      cum.withColumn("sse", sse)
        .orderBy(col("sse").asc, col("q").asc)
        .limit(1)
        .select(col("q").as("split_q"),
          col("cn").as("n_left"), (lit(nTot) - col("cn")).as("n_right"),
          round(csyD / col("cn"), 6).as("mean_left"),
          round(rsy / rn, 6).as("mean_right"),
          round(lit(1.0) - col("sse") / lit(sseRoot), 6).as("gain"))
    },


    // LEAKAGE-SAFE TARGET ENCODING (the CatBoost/leave-fold-out
    // standard): each (category, fold) cell is encoded with the mean
    // target of the OTHER folds — (ΣT − Σf)/(nT − nf) over exact cent
    // sums — so a row never sees its own fold's targets, the leak that
    // makes naive mean-encoding overfit. Folds are the deterministic
    // md5 assignment of q_fold_assign; two keyed aggs, one closed
    // form, no shuffle wider than the (category × fold) grid.
    "q_target_encoding" -> { (s, dir) =>
      val o = graft.operators.Sampling.assignFolds(
        Tables.load(s, dir, "orders"), "o_orderkey", k = 5, salt = "te")
        .select(col("o_orderpriority").as("cat"), col("fold"),
          (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
            .as("cents"))
      val perFold = o.groupBy("cat", "fold")
        .agg(count(lit(1)).as("nf"), sum(col("cents")).as("syf"))
      val perCat = o.groupBy("cat")
        .agg(count(lit(1)).as("nt"), sum(col("cents")).as("syt"))
      perFold.join(perCat, "cat")
        .select(col("cat"), col("fold"), col("nf"),
          round((col("syt") - col("syf")).cast("double")
            / (col("nt") - col("nf")), 6).as("enc"))
        .orderBy("cat", "fold")
    },


    // EQUAL-FREQUENCY BINNING (quantile discretization) through the
    // range-partitioned GlobalRank — the feature-prep op that needs a
    // corpus-wide total order and must NOT become a single-partition
    // window at 100 TB. bin = ⌊(rank−1)·10/N⌋; ties share a value, so
    // every per-bin statistic is multiset-determined even though tied
    // rows may swap ranks. Output: per-bin count, bounds, mass.
    "q_binning" -> { (s, dir) =>
      val li = Tables.load(s, dir, "lineitem").select(
        (col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long")
          .as("cents"))
      val n = li.count()
      graft.operators.GlobalRank
        .withGlobalRank(li, Seq(col("cents").asc), "rk")
        .withColumn("bin", expr(s"((rk - 1) * 10) div ${n}L"))
        .groupBy("bin")
        .agg(count(lit(1)).as("n"), min(col("cents")).as("lo"),
          max(col("cents")).as("hi"), sum(col("cents")).as("mass"))
        .orderBy("bin")
    },


    // DEPTH-2 DECISION TREE, one shuffle per LEVEL (how a distributed
    // tree learner actually scales — never a pass per node): the root
    // stump comes from the level-1 histogram; BOTH children then find
    // their exact splits from ONE level-2 pass keyed by (side, value),
    // each child's argmin running over its own bounded partition. At
    // depth d the corpus is read d times regardless of the 2^d node
    // count. Same exact-sufficient-statistics algebra as
    // q_stump/q_feature_gain; the oracle replays both levels.
    "q_tree2" -> { (s, dir) =>
      val li = Tables.load(s, dir, "lineitem").select(
        round(col("l_quantity")).cast("long").as("q"),
        (col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long")
          .as("cents"))
      val root = graft.ml.BoostedStumps.fit(li, "q", "cents", rounds = 1).head
      val l2 = li.withColumn("side",
        when(col("q") <= root.threshold, lit(0L)).otherwise(lit(1L)))
      val hist = l2.groupBy("side", "q").agg(
        count(lit(1)).as("n"),
        sum(col("cents").cast("decimal(38,0)")).as("sy"),
        sum(col("cents").cast("decimal(19,0)")
          * col("cents").cast("decimal(19,0)")).as("syy"))
      val tots = hist.groupBy("side").agg(
        sum(col("n")).as("nt"), sum(col("sy")).as("syt"),
        sum(col("syy")).as("syyt"))
      val w = Window.partitionBy("side").orderBy("q")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = hist
        .withColumn("cn", sum(col("n")).over(w))
        .withColumn("csy", sum(col("sy")).over(w))
        .withColumn("csyy", sum(col("syy")).over(w))
        .join(tots, "side")
        .filter(col("cn") < col("nt"))
      val csyD = col("csy").cast("double")
      val csyyD = col("csyy").cast("double")
      val sytD = col("syt").cast("double")
      val syytD = col("syyt").cast("double")
      val sse = (csyyD - csyD * csyD / col("cn")) +
        ((syytD - csyyD)
          - (sytD - csyD) * (sytD - csyD) / (col("nt") - col("cn")))
      val kids = cum.withColumn("sse", sse)
        .withColumn("sse_root", syytD - sytD * sytD / col("nt"))
        .groupBy("side")
        .agg(min_by(struct(col("q"), col("cn"), col("sse"), col("sse_root")),
          struct(col("sse"), col("q"))).as("b"))
        .select(
          when(col("side") === 0L, lit("left")).otherwise(lit("right"))
            .as("node"),
          col("b.q").as("split_q"), col("b.cn").as("n_left"),
          round(lit(1.0) - col("b.sse") / col("b.sse_root"), 6).as("gain"))
      val rootRow = s.range(1).select(
        lit("root").as("node"), lit(root.threshold).as("split_q"),
        lit(-1L).as("n_left"), round(lit(root.gain), 6).as("gain"))
      rootRow.unionByName(
        kids.withColumn("n_left", col("n_left").cast("long")))
        .orderBy("node")
    },


    // BAGGED FOREST OF STUMPS, one corpus shuffle for ALL trees — the
    // random-forest training shape at scale: each row enters tree b
    // with a deterministic Poisson(1) weight (stats/Bootstrap's
    // Chamandy resampling, keyed (salt, tree, row id) — no RNG state,
    // layout-invariant), the ×B×F fan-out stays inside whole-stage
    // codegen (explode of sequence + feature map), and map-side
    // combine collapses it to weighted (tree, feature, value)
    // histograms before the exchange — the shuffle carries sufficient
    // statistics, never data. Each tree then picks its best (feature,
    // split) by exact weighted SSE over its own bounded candidate set.
    // Trees disagree because their bootstrap weights disagree — the
    // variance across the `split_v` column IS the ensemble's value.
    "q_forest" -> { (s, dir) =>
      val B = 8
      val li = Tables.load(s, dir, "lineitem").select(
        concat(col("l_orderkey").cast("string"), lit("#"),
          col("l_linenumber").cast("string")).as("rid"),
        round(col("l_quantity")).cast("long").as("qty"),
        (col("l_discount").cast("decimal(18,2)") * 10000).cast("long")
          .as("disc_bp"),
        (col("l_tax").cast("decimal(18,2)") * 10000).cast("long")
          .as("tax_bp"),
        pmod(col("l_partkey"), lit(97)).as("pk_mod"),
        (col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long")
          .as("cents"))
      val u = conv(substring(md5(concat(
        lit("rf11|"), col("tree").cast("string"), lit("|"), col("rid"))),
        1, 15), 16, 10).cast("long").cast("double") / 1152921504606846976.0
      val parts = s.conf.get("spark.sql.shuffle.partitions").toInt
      val fan = li
        // Spread rows BEFORE the ×B fan-out (the Bootstrap.replicateSums
        // lesson): the scan's few input splits would otherwise hash
        // B×|rows| md5s on a handful of threads — this was 21 s of the
        // sf0.1 bench; the small pre-shuffle buys full-width hashing.
        .repartition(parts)
        .select(col("*"),
          explode(sequence(lit(0L), lit((B - 1).toLong))).as("tree"))
        .withColumn("w", graft.stats.Bootstrap.poissonWeight(u))
        .filter(col("w") > 0)
      val feats = Seq("qty", "disc_bp", "tax_bp", "pk_mod")
      val lng = fan.select(col("tree"),
        explode(map(feats.flatMap(f => Seq(lit(f), col(f))): _*))
          .as(Seq("f", "v")),
        col("w"), col("cents"))
      val hist = lng.groupBy("tree", "f", "v").agg(
        sum(col("w")).as("n"),
        sum(col("w") * col("cents").cast("decimal(38,0)")).as("sy"),
        sum(col("w") * col("cents").cast("decimal(19,0)")
          * col("cents").cast("decimal(19,0)")).as("syy"))
      val tots = hist.groupBy("tree", "f").agg(
        sum(col("n")).as("nt"), sum(col("sy")).as("syt"),
        sum(col("syy")).as("syyt"))
      val w7 = Window.partitionBy("tree", "f").orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = hist
        .withColumn("cn", sum(col("n")).over(w7))
        .withColumn("csy", sum(col("sy")).over(w7))
        .withColumn("csyy", sum(col("syy")).over(w7))
        .join(tots, Seq("tree", "f"))
        .filter(col("cn") < col("nt"))
      val csyD = col("csy").cast("double")
      val csyyD = col("csyy").cast("double")
      val sytD = col("syt").cast("double")
      val syytD = col("syyt").cast("double")
      val sse = (csyyD - csyD * csyD / col("cn")) +
        ((syytD - csyyD)
          - (sytD - csyD) * (sytD - csyD) / (col("nt") - col("cn")))
      cum.withColumn("sse", sse)
        .withColumn("sse_root", syytD - sytD * sytD / col("nt"))
        .groupBy("tree", "f")
        .agg(min_by(struct(col("v"), col("cn"), col("sse"), col("sse_root")),
          struct(col("sse"), col("v"))).as("b"))
        .groupBy("tree")
        .agg(min_by(struct(col("f"), col("b")),
          struct(col("b.sse"), col("f"))).as("t"))
        .select(col("tree"), col("t.f").as("feature"),
          col("t.b.v").as("split_v"),
          col("t.b.cn").cast("long").as("n_left"),
          round(lit(1.0) - col("t.b.sse") / col("t.b.sse_root"), 6)
            .as("gain"))
        .orderBy("tree")
    },


    // PER-FEATURE SPLIT GAINS IN ONE PASS — the distributed CART-node
    // primitive: all four candidate features' value histograms come
    // out of a SINGLE corpus shuffle (explode a feature map → one
    // groupBy(feature, value)); running totals then run per feature
    // (partitioned, bounded frames), each feature's exact SSE argmin
    // is one min_by over its ≤vocab candidates, and the ranking —
    // which feature a tree would split on — is 1 − SSE/SSE_root. The
    // per-feature work never rescans the corpus; adding a feature
    // costs one map entry, not a pass.
    "q_feature_gain" -> { (s, dir) =>
      val li = Tables.load(s, dir, "lineitem").select(
        round(col("l_quantity")).cast("long").as("qty"),
        (col("l_discount").cast("decimal(18,2)") * 10000).cast("long")
          .as("disc_bp"),
        (col("l_tax").cast("decimal(18,2)") * 10000).cast("long")
          .as("tax_bp"),
        pmod(col("l_partkey"), lit(97)).as("pk_mod"),
        (col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long")
          .as("cents"))
      val feats = Seq("qty", "disc_bp", "tax_bp", "pk_mod")
      val lng = li.select(
        explode(map(feats.flatMap(f => Seq(lit(f), col(f))): _*))
          .as(Seq("f", "v")),
        col("cents"))
      val hist = lng.groupBy("f", "v").agg(
        count(lit(1)).as("n"),
        sum(col("cents").cast("decimal(38,0)")).as("sy"),
        sum(col("cents").cast("decimal(19,0)")
          * col("cents").cast("decimal(19,0)")).as("syy"))
      val tots = hist.groupBy("f").agg(
        sum(col("n")).as("nt"), sum(col("sy")).as("syt"),
        sum(col("syy")).as("syyt"))
      val w = Window.partitionBy("f").orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = hist
        .withColumn("cn", sum(col("n")).over(w))
        .withColumn("csy", sum(col("sy")).over(w))
        .withColumn("csyy", sum(col("syy")).over(w))
        .join(tots, "f")
        .filter(col("cn") < col("nt"))
      val csyD = col("csy").cast("double")
      val csyyD = col("csyy").cast("double")
      val sytD = col("syt").cast("double")
      val syytD = col("syyt").cast("double")
      val sse = (csyyD - csyD * csyD / col("cn")) +
        ((syytD - csyyD)
          - (sytD - csyD) * (sytD - csyD) / (col("nt") - col("cn")))
      cum.withColumn("sse", sse)
        .withColumn("sse_root", syytD - sytD * sytD / col("nt"))
        .groupBy("f")
        .agg(min_by(struct(col("v"), col("cn"), col("sse"), col("sse_root")),
          struct(col("sse"), col("v"))).as("b"))
        .select(col("f").as("feature"), col("b.v").as("split_v"),
          col("b.cn").as("n_left"),
          round(lit(1.0) - col("b.sse") / col("b.sse_root"), 6).as("gain"))
        .orderBy(col("gain").desc, col("feature"))
    },


    // ISOTONIC REGRESSION (ml/Isotonic) — the monotone repair /
    // calibration primitive, via the minimax closed form fit(k) =
    // max_{i≤k} min_{j≥k} mean[i..j] ≡ pool-adjacent-violators, with
    // no sequential loop to replay: one corpus pass to the exact
    // per-quantity histogram, then (i,k,j) triples of the ≤50-row
    // histogram. Mean discount per quantity bucket, forced monotone.
    "q_isotonic" -> { (s, dir) =>
      graft.ml.Isotonic.fit(
        Tables.load(s, dir, "lineitem").select(
          round(col("l_quantity")).cast("long").as("qty"),
          (col("l_discount").cast("decimal(18,2)") * 10000).cast("long")
            .as("disc_bp")),
        "qty", "disc_bp")
        .orderBy("q")
    },


    // SPLIT-CONFORMAL PREDICTION INTERVALS (Vovk; the distribution-
    // free uncertainty wrapper a production model ships with): train a
    // stump on folds 0-2, take the ⌈(n+1)·0.9⌉-th smallest absolute
    // residual on the CALIBRATION fold as the interval half-width
    // q̂ (an exact integer order statistic through the range-
    // partitioned GlobalRank — never a driver limit(k)), then audit
    // empirical coverage of pred ± q̂ on the held-out TEST fold —
    // guaranteed ≥ 90% in expectation by exchangeability, and the
    // oracle replays every step: md5 folds, floor-div stump
    // predictions, rank arithmetic, exact coverage counts.
    "q_conformal" -> { (s, dir) =>
      val li = Tables.load(s, dir, "lineitem")
        .withColumn("key", col("l_orderkey") * 8 + col("l_linenumber"))
      val folded = graft.operators.Sampling
        .assignFolds(li, "key", k = 5, salt = "conf")
        .select(col("fold"),
          round(col("l_quantity")).cast("long").as("q"),
          (col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long")
            .as("cents"))
        .persist()
      val st = graft.ml.BoostedStumps
        .fit(folded.filter(col("fold") <= 2), "q", "cents", rounds = 1).head
      val pred = when(col("q") <= st.threshold, lit(st.predLeft))
        .otherwise(lit(st.predRight))
      val cal = folded.filter(col("fold") === 3)
        .select(abs(col("cents") - pred).as("r"))
      val nCal = cal.count()
      val k = math.ceil((nCal + 1) * 0.9).toLong
      val qhat = graft.operators.GlobalRank
        .withGlobalRank(cal, Seq(col("r").asc), "rk")
        .filter(col("rk") === k).head.getLong(0)
      val test = folded.filter(col("fold") === 4)
        .agg(count(lit(1)).as("n_test"),
          sum(when(abs(col("cents") - pred) <= qhat, 1L).otherwise(0L))
            .as("n_covered")).head
      folded.unpersist()
      s.range(1).select(
        lit(st.threshold).as("split_q"),
        lit(st.predLeft).as("pred_left"), lit(st.predRight).as("pred_right"),
        lit(nCal).as("n_cal"), lit(k).as("k"), lit(qhat).as("qhat"),
        lit(test.getLong(0)).as("n_test"),
        lit(test.getLong(1)).as("n_covered"),
        round(lit(test.getLong(1).toDouble / test.getLong(0)), 6)
          .as("coverage"))
    },


    // GRADIENT-BOOSTED STUMPS (L2 boosting, ml/BoostedStumps): three
    // rounds of residual-fitting stumps on the SAME (q → cents) task
    // as q_stump — the corpus is shuffled ONCE into the per-value
    // histogram; every boosting round then runs in exact BigInt
    // closed form on the driver (integer predictions via an explicit
    // floor((2Σ+n)/2n) rule make the residual histogram updatable
    // without a second corpus pass). The oracle unrolls all three
    // rounds: same argmin, same floor-div rounding, same residual
    // algebra — boosting itself faces the gate, not just one split.
    "q_gbt" -> { (s, dir) =>
      import s.implicits._
      val li = Tables.load(s, dir, "lineitem").select(
        round(col("l_quantity")).cast("long").as("q"),
        (col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long")
          .as("cents"))
      val model = graft.ml.BoostedStumps.fit(li, "q", "cents", rounds = 3)
      model.zipWithIndex.map { case (st, i) =>
        (i + 1L, st.threshold, st.predLeft, st.predRight,
          BigDecimal(st.gain).setScale(6, BigDecimal.RoundingMode.HALF_UP)
            .toDouble)
      }.toDF("round", "split_q", "pred_left", "pred_right", "gain")
        .orderBy("round")
    },


    // Per-segment OLS trend line (price-vs-quantity slope per
    // returnflag): one keyed pass collecting exact-decimal sufficient
    // statistics, closed forms in fixed-shape double arithmetic — the
    // q_zscore exact-sums discipline applied to regression.
    "q_ols" -> { (s, dir) =>
      graft.ml.Ols.fitGrouped(Tables.load(s, dir, "lineitem"),
        "l_quantity", "l_extendedprice", Seq("l_returnflag"))
        .orderBy("l_returnflag")
    },


    // RANK-2 ALS MATRIX FACTORIZATION (ml/Als) — alternating ridge
    // solves over the supplier×part rating matrix, with factors held
    // as EXACT integer micros: every normal-equation moment is a
    // decimal sum of long products (zero float accumulation), only
    // the per-entity 2×2 Cramer solve runs in double, and the RMSE
    // residuals are exact integers in 10⁻¹² units. Each half-step is
    // one broadcast factor join + one keyed aggregate over a cached
    // co-partitioned ratings layout — the distributed-ALS shape.
    "q_als" -> { (s, dir) =>
      val ratings = Tables.load(s, dir, "lineitem")
        .groupBy(col("l_suppkey").as("u"), col("l_partkey").as("i"))
        .agg(sum(round(col("l_quantity")).cast("long")).as("r"))
      val (userF, _, rmse) = graft.ml.Als.fit(
        ratings, "u", "i", "r", iters = 2, lambda = 0.1)
      userF.select(col("id").as("suppkey"), col("f1"), col("f2"),
          lit(rmse).as("rmse"))
        .orderBy("suppkey")
    },


    // ALS SERVING: top-3 unrated parts per supplier by factor dot
    // product — EXACT integer scores (micro × micro products of the
    // long factors, no float anywhere), already-rated pairs masked by
    // a left-anti join, per-user lists via the bounded TopK aggregate
    // (≤3 structs per partial — the shuffle carries lists, never the
    // |U|×|I| score matrix). The full cross-scoring is the honest
    // exact tier at this scale; at 100 TB the item factors feed the
    // ANN family (q_ann_*) instead — same vectors, bucketed serving.
    "q_als_recs" -> { (s, dir) =>
      // cache the rollup: the fit's two layouts AND the serving mask
      // all read it — one lineitem aggregation total
      val ratings = Tables.load(s, dir, "lineitem")
        .groupBy(col("l_suppkey").as("u"), col("l_partkey").as("i"))
        .agg(sum(round(col("l_quantity")).cast("long")).as("r"))
        .cache()
      val (userF, itemF, _) = graft.ml.Als.fit(
        ratings, "u", "i", "r", iters = 2, lambda = 0.1,
        computeRmse = false)
      // broadcast BOTH small sides: the item factors for the cross and
      // the rated-pair set for the anti join — the |U|×|I| score rows
      // then never leave their map task (a sort-merge anti join here
      // shuffled 20M rows and was 20 s of the sf0.1 bench). The mask
      // key is PACKED into one long (u·2³² + i): a single-long hash
      // probe beats the two-column row hash measurably at 20M probes.
      // Probe-measured (tools/RecsProbe, sf0.1): cross 0.2 s,
      // cross+anti 4.0 s, +TopK agg 0.5 s; the row_number/
      // WindowGroupLimit form was 16.8 s — the bounded TopK aggregate
      // wins by 3× end to end, so it stays.
      val packed = (col("u") * 4294967296L + col("i")).as("k")
      val scored = userF.select(col("id").as("u"),
          col("f1").as("u1"), col("f2").as("u2"))
        .crossJoin(broadcast(itemF.select(col("id").as("i"),
          col("f1").as("v1"), col("f2").as("v2"))))
        .withColumn("k", packed)
        .join(broadcast(ratings.select(packed)), Seq("k"), "left_anti")
        .select(col("u"), col("i"),
          (col("u1") * col("v1") + col("u2") * col("v2")).as("dot"))
      scored.groupBy("u")
        .agg(graft.stats.TopK.topK(
          struct(col("dot").as("d"), (-col("i")).as("ni")), 3).as("top"))
        .select(col("u").as("suppkey"), posexplode(col("top")).as(Seq("p", "v")))
        .select(col("suppkey"), (col("p") + 1).cast("int").as("rank"),
          (-col("v.ni")).as("partkey"), col("v.d").as("dot"))
        .orderBy("suppkey", "rank")
    },


    // RIDGE PATH FROM ONE PASS (ml/Ridge) — the regularized normal
    // equations over exact decimal sufficient statistics: all three λ
    // rows (λ=0 is the exact OLS baseline) come from a SINGLE
    // map-side-combinable aggregate; each λ is a constant-time double
    // expression over the nine moments. A hyperparameter sweep that
    // costs one corpus pass total is the shape that survives 100 TB.
    "q_ridge" -> { (s, dir) =>
      graft.ml.Ridge.fit(Tables.load(s, dir, "lineitem"),
        "l_quantity", "l_discount", "l_extendedprice",
        lambdas = Seq(0.0, 1000.0, 1000000.0))
        .orderBy("lam")
    },


    // IR EVALUATION of the lexical serving stack: MRR, P@10,
    // recall@20 and nDCG@10 of the BM25 top-20 against graded
    // relevance planted as "distinct query terms present" (0..3 —
    // exactly replayable, no human qrels needed). The ranked list
    // comes from the bounded TopK aggregate; the IDEAL ranking for
    // nDCG needs no sort at all — it's a closed form over the three
    // grade counts crossed with positions 1..10. The judge-every-
    // retrieval-change discipline, in-plan.
    "q_ir_eval" -> { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      val terms = Seq("spark", "sort", "hash")
      val relExpr = terms.map(t =>
        when(array_contains(TextFunctions.tokens(col("text")), t), 1)
          .otherwise(0)).reduce(_ + _)
      val rel = docs.filter(col("text").isNotNull)
        .select(col("doc_id"), relExpr.as("rel"))
        .filter(col("rel") > 0)
      val ranked = Bm25.score(docs, "text", "doc_id", terms)
        .agg(graft.stats.TopK.topK(
          struct(col("score").as("s"), (-col("doc_id")).as("nid")), 20)
          .as("top"))
        .select(posexplode(col("top")).as(Seq("p", "v")))
        .select((col("p") + 1).cast("int").as("rank"),
          (-col("v.nid")).as("doc_id"))
      val judged = ranked.join(rel, Seq("doc_id"), "left")
        .select(col("rank"), coalesce(col("rel"), lit(0)).as("rel"))
      val m = judged.agg(
        round(max(when(col("rel") >= 2, lit(1.0) / col("rank"))
          .otherwise(lit(0.0))), 6).as("mrr"),
        sum(when(col("rank") <= 10 && col("rel") > 0, 1L).otherwise(0L))
          .as("p10_hits"),
        sum(when(col("rel") > 0, 1L).otherwise(0L)).as("rel_retrieved"),
        round(sum(when(col("rank") <= 10,
          (pow(lit(2.0), col("rel")) - 1.0) / log2(col("rank") + 1))
          .otherwise(lit(0.0))), 6).as("dcg10"))
      val gc = rel.agg(
        sum(when(col("rel") === 3, 1L).otherwise(0L)).as("n3"),
        sum(when(col("rel") === 2, 1L).otherwise(0L)).as("n2"),
        sum(when(col("rel") === 1, 1L).otherwise(0L)).as("n1"))
      val ideal = gc
        .select(explode(sequence(lit(1), lit(10))).as("r"),
          col("n3"), col("n2"), col("n1"))
        .select(col("r"), when(col("r") <= col("n3"), 3)
          .when(col("r") <= col("n3") + col("n2"), 2)
          .when(col("r") <= col("n3") + col("n2") + col("n1"), 1)
          .otherwise(0).as("g"))
        .agg(round(sum((pow(lit(2.0), col("g")) - 1.0)
          / log2(col("r") + 1)), 6).as("idcg10"))
      m.crossJoin(ideal)
        .crossJoin(gc.select(
          (col("n3") + col("n2") + col("n1")).as("n_relevant")))
        .select(col("n_relevant"), col("mrr"), col("p10_hits"),
          col("rel_retrieved"),
          round(col("rel_retrieved").cast("double") / col("n_relevant"), 6)
            .as("recall20"),
          col("dcg10"), col("idcg10"),
          round(col("dcg10") / col("idcg10"), 6).as("ndcg10"))
    },


    // Hashing-trick vectorizer (the fastText input layer): token →
    // md5-prefix-60 mod 256, (doc, bucket, tf) long form — NO
    // vocabulary state, post-shuffle key space capped at D regardless
    // of corpus size (graft.text.FeatureHash).
    "q_feature_hash" -> { (s, dir) =>
      graft.text.FeatureHash.hashedCounts(
        Tables.load(s, dir, "documents"), "text", "doc_id", dims = 256)
        .orderBy("doc_id", "bucket")
    },


    // Multinomial Naive Bayes language routing: train on even doc_ids,
    // score odd ones. The Laplace-smoothed score product is a chained
    // double recurrence over the first 40 token positions, so the
    // recursive-CTE oracle replays every score bit-for-bit and the
    // argmax (ties → lang asc) agrees exactly. Predictions spread over
    // all five classes on the fixture (203/14/14/11/8) — not a hollow
    // constant-class gate.
    "q_naive_bayes" -> { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
        .filter(col("text").isNotNull)
        .select(col("doc_id"), col("lang"),
          TextFunctions.tokens(col("text")).as("toks"))
      val train = docs.filter(col("doc_id") % 2 === 0)
      val test = docs.filter(col("doc_id") % 2 === 1)
      val sc = graft.ml.NaiveBayes.score(
        train, test, "lang", "toks", "doc_id", maxTokens = 40)
      val w = Window.partitionBy("id")
        .orderBy(col("score").desc, col("label"))
      sc.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("id").as("doc_id"), col("label").as("pred"), col("score"))
        .join(test.select(col("doc_id"), col("lang")), "doc_id")
        .select(col("doc_id"), col("lang"), col("pred"),
          (col("lang") === col("pred")).as("correct"), col("score"))
        .orderBy("doc_id")
    },
  )

  val oracles: Map[String, String] = Map(

    // row_number over the md5 shuffle key (hex sorts identically in
    // both engines) replays the permutation.
    "q_epoch_shuffle" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    CAST(len(list_filter(regexp_split_to_array(lower(text), '\s+'),
        |                         x -> len(x) > 0)) AS BIGINT) AS n_tok,
        |    md5('epoch7|' || doc_id) AS shuffle_key
        |  FROM documents),
        |p AS (SELECT doc_id, n_tok,
        |        row_number() OVER (ORDER BY shuffle_key) - 1 AS pos
        |      FROM d)
        |SELECT pos % 8 AS shard, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_tok) AS BIGINT) AS sum_tokens,
        |  CAST(min(pos) AS BIGINT) AS min_pos,
        |  CAST(max(pos) AS BIGINT) AS max_pos,
        |  CAST(sum(pos * (doc_id % 1000)) AS BIGINT) AS assign_checksum
        |FROM p GROUP BY shard ORDER BY shard""".stripMargin,


    // Same md5-prefix-60 arithmetic; anchor-exclusion by construction.
    "q_negative_sample" ->
      """WITH nn AS (SELECT count(*) AS n FROM documents),
        |jj AS (SELECT unnest(range(4)) AS j)
        |SELECT d.doc_id, CAST(jj.j AS INT) AS j,
        |  (d.doc_id + 1 +
        |   (('0x' || substr(md5('neg|' || CAST(d.doc_id AS VARCHAR) || '|' || CAST(jj.j AS VARCHAR)), 1, 15))::BIGINT
        |    % ((SELECT n FROM nn) - 1))) % (SELECT n FROM nn) AS neg_id
        |FROM documents d CROSS JOIN jj
        |ORDER BY doc_id, j""".stripMargin,


    // The exact 60-bit md5-prefix hash arithmetic of Sampling.hashUnit;
    // all rates/cuts dyadic so the double thresholds are exact.
    "q_sample_mix" ->
      """WITH u AS (
        |  SELECT doc_id, source,
        |    ('0x' || substr(md5('mix1|' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT / 1152921504606846976.0 AS u_mix,
        |    ('0x' || substr(md5('split1|' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT / 1152921504606846976.0 AS u_split
        |  FROM documents)
        |SELECT doc_id, source,
        |  CASE WHEN u_split < 0.875 THEN 'train'
        |       WHEN u_split < 0.9375 THEN 'val'
        |       ELSE 'test' END AS split
        |FROM u
        |WHERE u_mix < CASE WHEN source IN ('src0','src1','src2','src3','src4') THEN 1.0
        |                   WHEN source IN ('src5','src6','src7','src8','src9') THEN 0.5
        |                   WHEN source IN ('src10','src11','src12','src13','src14') THEN 0.25
        |                   WHEN source IN ('src15','src16','src17','src18','src19') THEN 0.125
        |                   ELSE 0.0 END
        |ORDER BY doc_id""".stripMargin,


    // row_number over the per-source hash order, keep rn <= 3.
    "q_group_sample" ->
      """WITH u AS (
        |  SELECT doc_id, source,
        |    ('0x' || substr(md5('pg1|' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT / 1152921504606846976.0 AS u
        |  FROM documents),
        |r AS (
        |  SELECT doc_id, source,
        |    row_number() OVER (PARTITION BY source ORDER BY u ASC, doc_id ASC) AS rn
        |  FROM u)
        |SELECT doc_id, source FROM r WHERE rn <= 3 ORDER BY doc_id""".stripMargin,


    // Log-domain ES key: selection on the UNROUNDED ln(u)/w, output
    // rounded — see Sampling.weightedSample for why.
    "q_weighted_sample" ->
      """WITH u AS (
        |  SELECT doc_id,
        |    ln(greatest(('0x' || substr(md5('ws1|' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT / 1152921504606846976.0,
        |                1.0 / 1152921504606846976.0))
        |      / n_chars AS wk
        |  FROM documents WHERE n_chars > 0)
        |SELECT doc_id, round(wk, 9) AS wkey FROM (
        |  SELECT doc_id, wk FROM u ORDER BY wk DESC, doc_id ASC LIMIT 100)
        |ORDER BY doc_id""".stripMargin,


    // The composed pipeline, stage for stage: quality gate (q_text_stats
    // tree), repetition gate (q_repetition tree, UNROUNDED), survivors
    // window (q_dedup_exact fingerprint), 5-gram bench overlap
    // (q_decontaminate shape), then the q_sample_mix hash arithmetic.
    "q_pipeline" ->
      """WITH t AS (
        |  SELECT doc_id, source, text,
        |    list_filter(regexp_split_to_array(lower(text), '\s+'), x -> len(x) > 0) AS toks
        |  FROM documents),
        |q AS (
        |  SELECT doc_id, source, toks,
        |    len(toks) AS n_tokens,
        |    CASE WHEN len(toks) > 0 THEN CAST(len(list_filter(toks, x -> x IN ('the','a','an','of','to','and','in','is','it','that'))) AS DOUBLE) / len(toks) ELSE 0.0 END AS sw,
        |    CASE WHEN len(regexp_replace(text, '\s+', '', 'g')) > 0
        |      THEN CAST(len(regexp_replace(regexp_replace(text, '\s+', '', 'g'), '[a-zA-Z0-9]', '', 'g')) AS DOUBLE) / len(regexp_replace(text, '\s+', '', 'g'))
        |      ELSE 0.0 END AS pr
        |  FROM t WHERE doc_id % 97 <> 0),
        |gate AS (
        |  SELECT doc_id, source, toks,
        |    list_transform(generate_series(1, len(toks)-1), i -> array_to_string(toks[i:i+1], ' ')) AS g2,
        |    list_transform(generate_series(1, len(toks)-2), i -> array_to_string(toks[i:i+2], ' ')) AS g3
        |  FROM q
        |  WHERE round(0.5 * (least(CAST(n_tokens AS DOUBLE) / 20.0, 1.0)
        |                     * least(1.0, 500.0 / greatest(CAST(n_tokens AS DOUBLE), 1.0)))
        |            + 0.3 * least(sw * 5.0, 1.0)
        |            + 0.2 * (1.0 - least(pr * 2.0, 1.0)), 6) >= 0.5),
        |gate2 AS (
        |  SELECT doc_id, source, toks FROM gate
        |  WHERE (CASE WHEN len(g2) > 0 THEN CAST(coalesce(list_max(list_transform(list_distinct(g2), d -> len(list_filter(g2, x -> x = d)))), 0) AS DOUBLE) / len(g2) ELSE 0.0 END) <= 0.20
        |    AND (CASE WHEN len(g3) > 0 THEN CAST(coalesce(list_max(list_transform(list_distinct(g3), d -> len(list_filter(g3, x -> x = d)))), 0) AS DOUBLE) / len(g3) ELSE 0.0 END) <= 0.18
        |    AND (CASE WHEN len(g2) > 0 THEN CAST(len(g2) - len(list_distinct(g2)) AS DOUBLE) / len(g2) ELSE 0.0 END) <= 0.60),
        |surv AS (
        |  SELECT doc_id, source, toks FROM (
        |    SELECT doc_id, source, toks,
        |      row_number() OVER (PARTITION BY md5(array_to_string(toks, ' ')) ORDER BY doc_id) AS rn
        |    FROM gate2) WHERE rn = 1),
        |bg AS (
        |  SELECT DISTINCT unnest(list_distinct(list_transform(generate_series(1, len(toks)-4), i -> array_to_string(toks[i:i+4], ' ')))) AS gram
        |  FROM t WHERE doc_id % 97 = 0),
        |hit AS (
        |  SELECT DISTINCT s.doc_id
        |  FROM (SELECT doc_id, unnest(list_distinct(list_transform(generate_series(1, len(toks)-4), i -> array_to_string(toks[i:i+4], ' ')))) AS gram FROM surv) s
        |  JOIN bg ON s.gram = bg.gram),
        |u AS (
        |  SELECT doc_id, source,
        |    ('0x' || substr(md5('mix1|' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT / 1152921504606846976.0 AS u_mix,
        |    ('0x' || substr(md5('split1|' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT / 1152921504606846976.0 AS u_split
        |  FROM surv WHERE doc_id NOT IN (SELECT doc_id FROM hit))
        |SELECT doc_id, source,
        |  CASE WHEN u_split < 0.875 THEN 'train'
        |       WHEN u_split < 0.9375 THEN 'val'
        |       ELSE 'test' END AS split
        |FROM u
        |WHERE u_mix < CASE WHEN source IN ('src0','src1','src2','src3','src4','src5','src6','src7','src8','src9') THEN 1.0 ELSE 0.5 END
        |ORDER BY doc_id""".stripMargin,

    "q_lingd_eval" -> linGdEvalOracle(2, 0.01),

    "q_logreg" -> logRegOracle(3, 1.0, scoring = false),

    "q_logreg_score" -> logRegOracle(3, 1.0, scoring = true),


    "q_lingd" -> linGdOracle(2, 0.01),

    "q_quantile_reg" -> quantGdOracle(0.75, 10.0, 3),

    "q_poisson" -> poissonOracle(6, 1.0),


    // Rank-sum AUC over the scored-probability histogram (the scored
    // subquery is the full q_logreg_score replay with the label riding
    // along); doubled average ranks keep every term an exact integer.
    "q_auc" -> {
      val scored = logRegOracle(3, 1.0, scoring = true, withLabel = true)
      s"""WITH hist AS (
         |  SELECT CAST(round(probability * 1000000) AS BIGINT) AS s,
         |    CAST(count(*) AS BIGINT) AS cnt,
         |    CAST(sum(CAST(y AS BIGINT)) AS BIGINT) AS pos
         |  FROM ($scored) scored GROUP BY 1),
         |c AS (SELECT s, cnt, pos, sum(cnt) OVER (ORDER BY s) AS cum FROM hist),
         |a AS (SELECT CAST(sum(pos) AS BIGINT) AS n_pos,
         |        CAST(sum(cnt) - sum(pos) AS BIGINT) AS n_neg,
         |        CAST(sum(pos * (2 * (cum - cnt) + cnt + 1)) AS BIGINT) AS rank2 FROM c)
         |SELECT n_pos, n_neg, rank2 - n_pos * (n_pos + 1) AS u2,
         |  round(CAST(rank2 - n_pos * (n_pos + 1) AS DOUBLE) / (2.0 * n_pos * n_neg), 6) AS auc
         |FROM a""".stripMargin
    },


    // The q_auc rank-sum partitioned by source over the same scored
    // subquery; NULL auc on single-class slices.
    "q_auc_grouped" -> {
      val scored = logRegOracle(3, 1.0, scoring = true, withLabel = true)
      s"""WITH sc AS ($scored),
         |j AS (SELECT sc.doc_id, sc.probability, sc.y, d2.source
         |      FROM sc JOIN documents d2 USING (doc_id)),
         |hist AS (
         |  SELECT source, CAST(round(probability * 1000000) AS BIGINT) AS s,
         |    CAST(count(*) AS BIGINT) AS cnt,
         |    CAST(sum(CAST(y AS BIGINT)) AS BIGINT) AS pos
         |  FROM j GROUP BY 1, 2),
         |c AS (SELECT source, s, cnt, pos,
         |        sum(cnt) OVER (PARTITION BY source ORDER BY s) AS cum
         |      FROM hist),
         |a AS (SELECT source, CAST(sum(pos) AS BIGINT) AS n_pos,
         |        CAST(sum(cnt) - sum(pos) AS BIGINT) AS n_neg,
         |        CAST(sum(pos * (2 * (cum - cnt) + cnt + 1)) AS BIGINT)
         |          AS rank2
         |      FROM c GROUP BY 1)
         |SELECT source, n_pos, n_neg,
         |  rank2 - n_pos * (n_pos + 1) AS u2,
         |  CASE WHEN n_pos > 0 AND n_neg > 0
         |    THEN round(CAST(rank2 - n_pos * (n_pos + 1) AS DOUBLE)
         |               / (2.0 * n_pos * n_neg), 6) END AS auc
         |FROM a ORDER BY source""".stripMargin
    },


    // Exact decimal squared residuals per source; one rounded
    // division per row.
    "q_brier_grouped" -> {
      val scored = logRegOracle(3, 1.0, scoring = true, withLabel = true)
      s"""WITH sc AS ($scored),
         |j AS (SELECT sc.probability, sc.y, d2.source
         |      FROM sc JOIN documents d2 USING (doc_id)),
         |r AS (SELECT source,
         |        CAST((CAST(probability AS DECIMAL(18,6))
         |              - CAST(y AS DECIMAL(18,6)))
         |             * (CAST(probability AS DECIMAL(18,6))
         |                - CAST(y AS DECIMAL(18,6)))
         |             AS DECIMAL(38,12)) AS sq
         |      FROM j)
         |SELECT source, CAST(count(*) AS BIGINT) AS n,
         |  round(CAST(sum(sq) AS DOUBLE) / count(*), 6) AS brier
         |FROM r GROUP BY 1 ORDER BY 1""".stripMargin
    },


    // The q_calibration bins keyed by source, rolled to the weighted
    // |gap| scalar on the same rounded per-bin rates.
    "q_ece_grouped" -> {
      val scored = logRegOracle(3, 1.0, scoring = true, withLabel = true)
      s"""WITH sc AS ($scored),
         |j AS (SELECT sc.doc_id, sc.probability, sc.y, d2.source
         |      FROM sc JOIN documents d2 USING (doc_id)),
         |b AS (
         |  SELECT source,
         |    CAST(LEAST(CAST(floor(probability * 10) AS BIGINT), 9) AS INT)
         |      AS bin,
         |    CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(CAST(y AS BIGINT)) AS BIGINT) AS n_pos,
         |    sum(CAST(probability AS DECIMAL(18,6))) AS sum_p
         |  FROM j GROUP BY 1, 2),
         |r AS (SELECT source, n,
         |        round(CAST(sum_p AS DOUBLE) / n, 6) AS ms,
         |        round(CAST(n_pos AS DOUBLE) / n, 6) AS fp
         |      FROM b)
         |SELECT source, CAST(sum(n) AS BIGINT) AS n,
         |  CAST(count(*) AS BIGINT) AS n_bins,
         |  round(sum(n * abs(ms - fp)) / sum(n), 6) AS ece
         |FROM r GROUP BY 1 ORDER BY 1""".stripMargin
    },


    // The q_auc rank-sum wrapper over the CV-replayed scored subquery
    // (train folds 1-4, score fold 0 only).
    "q_cv_eval" -> {
      val scored = logRegOracle(3, 1.0, scoring = true, withLabel = true,
        cvSalt = "cv9")
      s"""WITH hist AS (
         |  SELECT CAST(round(probability * 1000000) AS BIGINT) AS s,
         |    CAST(count(*) AS BIGINT) AS cnt,
         |    CAST(sum(CAST(y AS BIGINT)) AS BIGINT) AS pos
         |  FROM ($scored) scored GROUP BY 1),
         |c AS (SELECT s, cnt, pos, sum(cnt) OVER (ORDER BY s) AS cum FROM hist),
         |a AS (SELECT CAST(sum(pos) AS BIGINT) AS n_pos,
         |        CAST(sum(cnt) - sum(pos) AS BIGINT) AS n_neg,
         |        CAST(sum(pos * (2 * (cum - cnt) + cnt + 1)) AS BIGINT) AS rank2 FROM c)
         |SELECT n_pos, n_neg, rank2 - n_pos * (n_pos + 1) AS u2,
         |  round(CAST(rank2 - n_pos * (n_pos + 1) AS DOUBLE) / (2.0 * n_pos * n_neg), 6) AS auc
         |FROM a""".stripMargin
    },


    // Equal-width score bins over the same scored subquery; exact
    // (n, n_pos, decimal score sum) per bin, ratios at the end.
    "q_calibration" -> {
      val scored = logRegOracle(3, 1.0, scoring = true, withLabel = true)
      s"""WITH b AS (
         |  SELECT CAST(LEAST(CAST(floor(probability * 10) AS BIGINT), 9) AS INT) AS bin,
         |    CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(CAST(y AS BIGINT)) AS BIGINT) AS n_pos,
         |    sum(CAST(probability AS DECIMAL(18,6))) AS sum_p
         |  FROM ($scored) scored GROUP BY 1)
         |SELECT bin, n, n_pos,
         |  round(CAST(sum_p AS DOUBLE) / n, 6) AS mean_score,
         |  round(CAST(n_pos AS DOUBLE) / n, 6) AS frac_pos
         |FROM b ORDER BY bin""".stripMargin
    },


    // Within-basket pair counts, directed rule expansion, exact-count
    // ratios — mirrors AssocRules.rules stage for stage.
    "q_assoc_rules" ->
      """WITH items AS (
        |  SELECT DISTINCT l_orderkey AS bk, l_partkey AS it
        |  FROM lineitem WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL),
        |nb AS (SELECT CAST(count(DISTINCT bk) AS BIGINT) AS n_baskets FROM items),
        |cnt AS (SELECT it, CAST(count(*) AS BIGINT) AS n_item FROM items GROUP BY it),
        |co AS (
        |  SELECT x.it AS a, y.it AS b, CAST(count(*) AS BIGINT) AS pair_n
        |  FROM items x JOIN items y ON x.bk = y.bk AND x.it < y.it
        |  GROUP BY 1, 2 HAVING count(*) >= 3),
        |directed AS (
        |  SELECT a AS antecedent, b AS consequent, pair_n FROM co
        |  UNION ALL
        |  SELECT b AS antecedent, a AS consequent, pair_n FROM co)
        |SELECT d.antecedent, d.consequent, d.pair_n,
        |  ca.n_item AS n_ant, cc.n_item AS n_cons,
        |  round(CAST(d.pair_n AS DOUBLE) / (SELECT n_baskets FROM nb), 6) AS support,
        |  round(CAST(d.pair_n AS DOUBLE) / ca.n_item, 6) AS confidence,
        |  round(CAST(d.pair_n * (SELECT n_baskets FROM nb) AS DOUBLE)
        |    / CAST(ca.n_item * cc.n_item AS DOUBLE), 6) AS lift
        |FROM directed d
        |JOIN cnt ca ON d.antecedent = ca.it
        |JOIN cnt cc ON d.consequent = cc.it
        |ORDER BY d.antecedent, d.consequent""".stripMargin,


    // fold = md5-60(salt|doc_id) mod 5; per-stratum balance audit.
    "q_fold_assign" ->
      """WITH f AS (
        |  SELECT lang,
        |    CAST(('0x' || substr(md5('cv9|' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 5 AS INT) AS fold,
        |    n_chars
        |  FROM documents)
        |SELECT lang, fold, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(n_chars AS BIGINT)) AS BIGINT) AS sum_chars
        |FROM f GROUP BY 1, 2 ORDER BY lang, fold""".stripMargin,


    // Exact-histogram replay: HUGEINT sufficient statistics, the same
    // running totals, the same double closed form per candidate split,
    // the same (sse, q) argmin.
    "q_stump" ->
      """WITH b AS (
        |  SELECT CAST(round(l_quantity) AS BIGINT) AS q,
        |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
        |  FROM lineitem),
        |h AS (SELECT q, CAST(count(*) AS BIGINT) AS n,
        |        sum(CAST(c AS HUGEINT)) AS sy,
        |        sum(CAST(c AS HUGEINT) * CAST(c AS HUGEINT)) AS syy
        |      FROM b GROUP BY 1),
        |t AS (SELECT CAST(sum(n) AS BIGINT) AS nt,
        |        CAST(sum(sy) AS DOUBLE) AS syt,
        |        CAST(sum(syy) AS DOUBLE) AS syyt FROM h),
        |cw AS (SELECT q,
        |        sum(n) OVER w AS cn, sum(sy) OVER w AS csy,
        |        sum(syy) OVER w AS csyy
        |      FROM h WINDOW w AS (ORDER BY q ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |s AS (SELECT q, CAST(cn AS BIGINT) AS cn,
        |        CAST(csy AS DOUBLE) AS csy, CAST(csyy AS DOUBLE) AS csyy,
        |        t.nt, t.syt, t.syyt
        |      FROM cw, t WHERE cn < t.nt),
        |e AS (SELECT q, cn, nt - cn AS rn,
        |        csy, syt - csy AS rsy,
        |        (csyy - csy * csy / cn)
        |          + ((syyt - csyy) - (syt - csy) * (syt - csy) / (nt - cn)) AS sse,
        |        syyt - syt * syt / nt AS sse_root
        |      FROM s)
        |SELECT q AS split_q, cn AS n_left, CAST(rn AS BIGINT) AS n_right,
        |  round(csy / cn, 6) AS mean_left,
        |  round(rsy / rn, 6) AS mean_right,
        |  round(1.0 - sse / sse_root, 6) AS gain
        |FROM e ORDER BY sse, q LIMIT 1""".stripMargin,


    // Same md5 fold assignment; leave-fold-out means from exact sums.
    "q_target_encoding" ->
      """WITH o AS (
        |  SELECT o_orderpriority AS cat,
        |    CAST(('0x' || substr(md5('te|' || CAST(o_orderkey AS VARCHAR)), 1, 15))::BIGINT % 5 AS INT) AS fold,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |  FROM orders),
        |pf AS (SELECT cat, fold, CAST(count(*) AS BIGINT) AS nf,
        |         CAST(sum(cents) AS BIGINT) AS syf
        |       FROM o GROUP BY 1, 2),
        |pc AS (SELECT cat, CAST(count(*) AS BIGINT) AS nt,
        |         CAST(sum(cents) AS BIGINT) AS syt
        |       FROM o GROUP BY 1)
        |SELECT pf.cat, pf.fold, pf.nf,
        |  round(CAST(pc.syt - pf.syf AS DOUBLE) / (pc.nt - pf.nf), 6) AS enc
        |FROM pf JOIN pc ON pf.cat = pc.cat
        |ORDER BY pf.cat, pf.fold""".stripMargin,


    // Same floor rank→bin arithmetic over a row_number total order —
    // per-bin stats are multiset-determined under ties.
    "q_binning" ->
      """WITH b AS (
        |  SELECT CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |  FROM lineitem),
        |r AS (SELECT cents, row_number() OVER (ORDER BY cents) AS rk,
        |        count(*) OVER () AS n FROM b)
        |SELECT ((rk - 1) * 10) // n AS bin, CAST(count(*) AS BIGINT) AS n,
        |  CAST(min(cents) AS BIGINT) AS lo, CAST(max(cents) AS BIGINT) AS hi,
        |  CAST(sum(cents) AS BIGINT) AS mass
        |FROM r GROUP BY 1 ORDER BY bin""".stripMargin,


    // Root split replayed from the level-1 histogram, both child
    // splits from the level-2 (side, value) histogram — the same
    // exact algebra partitioned by side.
    "q_tree2" ->
      """WITH b AS (
        |  SELECT CAST(round(l_quantity) AS BIGINT) AS q,
        |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
        |  FROM lineitem),
        |h AS (SELECT q, CAST(count(*) AS BIGINT) AS n,
        |        sum(CAST(c AS HUGEINT)) AS sy,
        |        sum(CAST(c AS HUGEINT) * CAST(c AS HUGEINT)) AS syy
        |      FROM b GROUP BY 1),
        |t1 AS (SELECT CAST(sum(n) AS BIGINT) AS nt, sum(sy) AS syt,
        |         sum(syy) AS syyt FROM h),
        |c1 AS (SELECT q, sum(n) OVER w AS cn, sum(sy) OVER w AS csy,
        |         sum(syy) OVER w AS csyy
        |       FROM h
        |       WINDOW w AS (ORDER BY q ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |e1 AS (SELECT q,
        |         (CAST(csyy AS DOUBLE)
        |            - CAST(csy AS DOUBLE) * CAST(csy AS DOUBLE) / CAST(cn AS BIGINT))
        |         + ((CAST(t.syyt AS DOUBLE) - CAST(csyy AS DOUBLE))
        |            - (CAST(t.syt AS DOUBLE) - CAST(csy AS DOUBLE))
        |              * (CAST(t.syt AS DOUBLE) - CAST(csy AS DOUBLE))
        |              / (t.nt - cn)) AS sse,
        |         CAST(t.syyt AS DOUBLE)
        |           - CAST(t.syt AS DOUBLE) * CAST(t.syt AS DOUBLE) / t.nt AS sse_root
        |       FROM c1, t1 t WHERE cn < t.nt),
        |s1 AS (SELECT q AS t, sse, sse_root FROM e1 ORDER BY sse, q LIMIT 1),
        |h2 AS (SELECT CASE WHEN q <= (SELECT t FROM s1) THEN 0 ELSE 1 END AS side,
        |         q, n, sy, syy FROM h),
        |t2 AS (SELECT side, CAST(sum(n) AS BIGINT) AS nt, sum(sy) AS syt,
        |         sum(syy) AS syyt FROM h2 GROUP BY 1),
        |c2 AS (SELECT side, q, sum(n) OVER w AS cn, sum(sy) OVER w AS csy,
        |         sum(syy) OVER w AS csyy
        |       FROM h2
        |       WINDOW w AS (PARTITION BY side ORDER BY q
        |                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |e2 AS (SELECT c2.side, c2.q, CAST(c2.cn AS BIGINT) AS cn,
        |         (CAST(c2.csyy AS DOUBLE)
        |            - CAST(c2.csy AS DOUBLE) * CAST(c2.csy AS DOUBLE) / CAST(c2.cn AS BIGINT))
        |         + ((CAST(t.syyt AS DOUBLE) - CAST(c2.csyy AS DOUBLE))
        |            - (CAST(t.syt AS DOUBLE) - CAST(c2.csy AS DOUBLE))
        |              * (CAST(t.syt AS DOUBLE) - CAST(c2.csy AS DOUBLE))
        |              / (t.nt - c2.cn)) AS sse,
        |         CAST(t.syyt AS DOUBLE)
        |           - CAST(t.syt AS DOUBLE) * CAST(t.syt AS DOUBLE) / t.nt AS sse_root
        |       FROM c2 JOIN t2 t ON c2.side = t.side WHERE c2.cn < t.nt),
        |r2 AS (SELECT side, q, cn, sse, sse_root,
        |         row_number() OVER (PARTITION BY side ORDER BY sse, q) AS rn
        |       FROM e2)
        |SELECT 'root' AS node, (SELECT t FROM s1) AS split_q,
        |  CAST(-1 AS BIGINT) AS n_left,
        |  round(1.0 - (SELECT sse FROM s1) / (SELECT sse_root FROM s1), 6) AS gain
        |UNION ALL
        |SELECT CASE WHEN side = 0 THEN 'left' ELSE 'right' END, q, cn,
        |  round(1.0 - sse / sse_root, 6)
        |FROM r2 WHERE rn = 1
        |ORDER BY node""".stripMargin,


    // Bootstrap weights replayed from the same md5 inverse-CDF
    // (stats/Bootstrap.poissonWeightSql keeps the thresholds from
    // drifting), then the q_feature_gain algebra with a tree dimension.
    "q_forest" -> {
      val u = "(('0x' || substr(md5('rf11|' || CAST(tree AS VARCHAR) || " +
        "'|' || rid), 1, 15))::BIGINT / 1152921504606846976.0)"
      s"""WITH b AS (
         |  SELECT CAST(l_orderkey AS VARCHAR) || '#' ||
         |      CAST(l_linenumber AS VARCHAR) AS rid,
         |    CAST(round(l_quantity) AS BIGINT) AS qty,
         |    CAST(CAST(l_discount AS DECIMAL(18,2)) * 10000 AS BIGINT) AS disc_bp,
         |    CAST(CAST(l_tax AS DECIMAL(18,2)) * 10000 AS BIGINT) AS tax_bp,
         |    l_partkey % 97 AS pk_mod,
         |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
         |  FROM lineitem),
         |fan AS (
         |  SELECT b.*, reps.range AS tree,
         |    ${graft.stats.Bootstrap.poissonWeightSql(u)} AS w
         |  FROM b, range(8) reps),
         |fw AS (SELECT * FROM fan WHERE w > 0),
         |l AS (
         |  SELECT tree, 'qty' AS f, qty AS v, w, c FROM fw
         |  UNION ALL SELECT tree, 'disc_bp', disc_bp, w, c FROM fw
         |  UNION ALL SELECT tree, 'tax_bp', tax_bp, w, c FROM fw
         |  UNION ALL SELECT tree, 'pk_mod', pk_mod, w, c FROM fw),
         |h AS (SELECT tree, f, v, CAST(sum(w) AS BIGINT) AS n,
         |        sum(w * CAST(c AS HUGEINT)) AS sy,
         |        sum(w * CAST(c AS HUGEINT) * CAST(c AS HUGEINT)) AS syy
         |      FROM l GROUP BY 1, 2, 3),
         |t AS (SELECT tree, f, CAST(sum(n) AS BIGINT) AS nt, sum(sy) AS syt,
         |        sum(syy) AS syyt FROM h GROUP BY 1, 2),
         |cw AS (SELECT tree, f, v, sum(n) OVER w AS cn, sum(sy) OVER w AS csy,
         |         sum(syy) OVER w AS csyy
         |       FROM h
         |       WINDOW w AS (PARTITION BY tree, f ORDER BY v
         |                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         |e AS (SELECT cw.tree, cw.f, cw.v, CAST(cw.cn AS BIGINT) AS cn,
         |        (CAST(cw.csyy AS DOUBLE)
         |           - CAST(cw.csy AS DOUBLE) * CAST(cw.csy AS DOUBLE) / CAST(cw.cn AS BIGINT))
         |        + ((CAST(t.syyt AS DOUBLE) - CAST(cw.csyy AS DOUBLE))
         |           - (CAST(t.syt AS DOUBLE) - CAST(cw.csy AS DOUBLE))
         |             * (CAST(t.syt AS DOUBLE) - CAST(cw.csy AS DOUBLE))
         |             / (t.nt - cw.cn)) AS sse,
         |        CAST(t.syyt AS DOUBLE)
         |          - CAST(t.syt AS DOUBLE) * CAST(t.syt AS DOUBLE) / t.nt AS sse_root
         |      FROM cw JOIN t ON cw.tree = t.tree AND cw.f = t.f
         |      WHERE cw.cn < t.nt),
         |pf AS (SELECT tree, f, v, cn, sse, sse_root,
         |         row_number() OVER (PARTITION BY tree, f ORDER BY sse, v) AS rn
         |       FROM e),
         |pt AS (SELECT tree, f, v, cn, sse, sse_root,
         |         row_number() OVER (PARTITION BY tree ORDER BY sse, f) AS rt
         |       FROM pf WHERE rn = 1)
         |SELECT tree, f AS feature, v AS split_v, cn AS n_left,
         |  round(1.0 - sse / sse_root, 6) AS gain
         |FROM pt WHERE rt = 1 ORDER BY tree""".stripMargin
    },


    // One long-format union of the four feature extractions, the same
    // exact-histogram split algebra per feature, per-feature argmin
    // via (sse, v) row_number, ranked by gain.
    "q_feature_gain" ->
      """WITH b AS (
        |  SELECT CAST(round(l_quantity) AS BIGINT) AS qty,
        |    CAST(CAST(l_discount AS DECIMAL(18,2)) * 10000 AS BIGINT) AS disc_bp,
        |    CAST(CAST(l_tax AS DECIMAL(18,2)) * 10000 AS BIGINT) AS tax_bp,
        |    l_partkey % 97 AS pk_mod,
        |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
        |  FROM lineitem),
        |l AS (
        |  SELECT 'qty' AS f, qty AS v, c FROM b
        |  UNION ALL SELECT 'disc_bp', disc_bp, c FROM b
        |  UNION ALL SELECT 'tax_bp', tax_bp, c FROM b
        |  UNION ALL SELECT 'pk_mod', pk_mod, c FROM b),
        |h AS (SELECT f, v, CAST(count(*) AS BIGINT) AS n,
        |        sum(CAST(c AS HUGEINT)) AS sy,
        |        sum(CAST(c AS HUGEINT) * CAST(c AS HUGEINT)) AS syy
        |      FROM l GROUP BY 1, 2),
        |t AS (SELECT f, CAST(sum(n) AS BIGINT) AS nt, sum(sy) AS syt,
        |        sum(syy) AS syyt FROM h GROUP BY 1),
        |cw AS (SELECT f, v, sum(n) OVER w AS cn, sum(sy) OVER w AS csy,
        |         sum(syy) OVER w AS csyy
        |       FROM h
        |       WINDOW w AS (PARTITION BY f ORDER BY v
        |                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |e AS (SELECT cw.f, cw.v, CAST(cw.cn AS BIGINT) AS cn,
        |        (CAST(cw.csyy AS DOUBLE)
        |           - CAST(cw.csy AS DOUBLE) * CAST(cw.csy AS DOUBLE) / CAST(cw.cn AS BIGINT))
        |        + ((CAST(t.syyt AS DOUBLE) - CAST(cw.csyy AS DOUBLE))
        |           - (CAST(t.syt AS DOUBLE) - CAST(cw.csy AS DOUBLE))
        |             * (CAST(t.syt AS DOUBLE) - CAST(cw.csy AS DOUBLE))
        |             / (t.nt - cw.cn)) AS sse,
        |        CAST(t.syyt AS DOUBLE)
        |          - CAST(t.syt AS DOUBLE) * CAST(t.syt AS DOUBLE) / t.nt AS sse_root
        |      FROM cw JOIN t ON cw.f = t.f WHERE cw.cn < t.nt),
        |r AS (SELECT f, v, cn, sse, sse_root,
        |        row_number() OVER (PARTITION BY f ORDER BY sse, v) AS rn
        |      FROM e)
        |SELECT f AS feature, v AS split_v, cn AS n_left,
        |  round(1.0 - sse / sse_root, 6) AS gain
        |FROM r WHERE rn = 1 ORDER BY gain DESC, feature""".stripMargin,


    // The same minimax enumeration over the exact histogram: prefix
    // sums, interval means from HUGEINT sums, max-of-min per value.
    "q_isotonic" ->
      """WITH b AS (
        |  SELECT CAST(round(l_quantity) AS BIGINT) AS q,
        |    CAST(CAST(l_discount AS DECIMAL(18,2)) * 10000 AS BIGINT) AS y
        |  FROM lineitem),
        |h AS (SELECT q, CAST(count(*) AS BIGINT) AS n,
        |        sum(CAST(y AS HUGEINT)) AS sy FROM b GROUP BY 1),
        |c AS (SELECT q, n,
        |        sum(n) OVER w AS cn, sum(sy) OVER w AS csy,
        |        sum(n) OVER w - n AS pn, sum(sy) OVER w - sy AS psy
        |      FROM h
        |      WINDOW w AS (ORDER BY q ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |p AS (SELECT a.q AS qi, b2.q AS qj,
        |        CAST(b2.csy - a.psy AS DOUBLE) / (b2.cn - a.pn) AS mean
        |      FROM c a JOIN c b2 ON a.q <= b2.q),
        |i AS (SELECT k.q AS k, k.n AS kn, p.qi, min(p.mean) AS mn
        |      FROM c k JOIN p ON p.qi <= k.q AND p.qj >= k.q
        |      GROUP BY 1, 2, 3)
        |SELECT k AS q, kn AS n, round(max(mn), 6) AS fit
        |FROM i GROUP BY 1, 2 ORDER BY q""".stripMargin,


    // md5 folds → train-fold stump (same floor-div preds as q_gbt) →
    // calibration rank statistic → exact test coverage counts.
    "q_conformal" -> {
      def fdivSql(a: String, b: String): String =
        s"(($a) - ((($a) % ($b) + ($b)) % ($b))) / ($b)"
      s"""WITH b AS (
         |  SELECT CAST(('0x' || substr(md5('conf|' ||
         |      CAST(l_orderkey * 8 + l_linenumber AS VARCHAR)), 1, 15))::BIGINT
         |      % 5 AS INT) AS fold,
         |    CAST(round(l_quantity) AS BIGINT) AS q,
         |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
         |  FROM lineitem),
         |h AS (SELECT q, CAST(count(*) AS BIGINT) AS n,
         |        sum(CAST(c AS HUGEINT)) AS sy,
         |        sum(CAST(c AS HUGEINT) * CAST(c AS HUGEINT)) AS syy
         |      FROM b WHERE fold <= 2 GROUP BY 1),
         |t1 AS (SELECT CAST(sum(n) AS BIGINT) AS nt, sum(sy) AS syt,
         |         sum(syy) AS syyt FROM h),
         |c1 AS (SELECT q, sum(n) OVER w AS cn, sum(sy) OVER w AS csy,
         |         sum(syy) OVER w AS csyy
         |       FROM h
         |       WINDOW w AS (ORDER BY q ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         |e1 AS (SELECT q, CAST(cn AS BIGINT) AS cn, csy, t.nt, t.syt,
         |         (CAST(csyy AS DOUBLE)
         |            - CAST(csy AS DOUBLE) * CAST(csy AS DOUBLE) / CAST(cn AS BIGINT))
         |         + ((CAST(t.syyt AS DOUBLE) - CAST(csyy AS DOUBLE))
         |            - (CAST(t.syt AS DOUBLE) - CAST(csy AS DOUBLE))
         |              * (CAST(t.syt AS DOUBLE) - CAST(csy AS DOUBLE))
         |              / (t.nt - cn)) AS sse
         |       FROM c1, t1 t WHERE cn < t.nt),
         |s1 AS (SELECT q AS t,
         |         ${fdivSql("2 * csy + cn", "2 * cn")} AS pl,
         |         ${fdivSql("2 * (syt - csy) + (nt - cn)", "2 * (nt - cn)")} AS pr
         |       FROM e1 ORDER BY sse, q LIMIT 1),
         |pr AS (SELECT fold, c,
         |         CASE WHEN q <= (SELECT t FROM s1)
         |              THEN CAST((SELECT pl FROM s1) AS BIGINT)
         |              ELSE CAST((SELECT pr FROM s1) AS BIGINT) END AS pred
         |       FROM b WHERE fold >= 3),
         |cal AS (SELECT abs(c - pred) AS r FROM pr WHERE fold = 3),
         |kk AS (SELECT CAST(count(*) AS BIGINT) AS n_cal,
         |         CAST(ceil((count(*) + 1) * 0.9) AS BIGINT) AS k FROM cal),
         |qh AS (SELECT r AS qhat FROM (
         |         SELECT r, row_number() OVER (ORDER BY r) AS rk FROM cal)
         |       WHERE rk = (SELECT k FROM kk)),
         |tst AS (SELECT CAST(count(*) AS BIGINT) AS n_test,
         |          CAST(sum(CASE WHEN abs(c - pred) <= (SELECT qhat FROM qh)
         |                    THEN 1 ELSE 0 END) AS BIGINT) AS n_covered
         |        FROM pr WHERE fold = 4)
         |SELECT (SELECT t FROM s1) AS split_q,
         |  CAST((SELECT pl FROM s1) AS BIGINT) AS pred_left,
         |  CAST((SELECT pr FROM s1) AS BIGINT) AS pred_right,
         |  kk.n_cal, kk.k, (SELECT qhat FROM qh) AS qhat,
         |  tst.n_test, tst.n_covered,
         |  round(CAST(tst.n_covered AS DOUBLE) / tst.n_test, 6) AS coverage
         |FROM kk, tst""".stripMargin
    },


    // Three unrolled boosting rounds: each round adjusts the exact
    // HUGEINT histogram by the accumulated integer offsets (Σr =
    // Σy−n·f, Σr² = Σy²−2fΣy+nf²), takes the same (sse, q) argmin,
    // and rounds means with the same floor((2Σ+n)/2n) rule (floor
    // division spelled out since HUGEINT `/` truncates).
    "q_gbt" -> {
      def fdivSql(a: String, b: String): String =
        s"(($a) - ((($a) % ($b) + ($b)) % ($b))) / ($b)"
      def offsetExpr(r: Int): String =
        if (r == 0) "CAST(0 AS HUGEINT)"
        else (1 to r).map(i =>
          s"(CASE WHEN q <= (SELECT t FROM s$i) THEN (SELECT pl FROM s$i) " +
            s"ELSE (SELECT pr FROM s$i) END)").mkString(" + ")
      val rounds = (1 to 3).map { r =>
        s"""h$r AS (
           |  SELECT q, n, sy - n * o AS sy, syy - 2 * o * sy + n * o * o AS syy
           |  FROM (SELECT q, n, sy, syy, ${offsetExpr(r - 1)} AS o FROM h)),
           |t$r AS (SELECT CAST(sum(n) AS BIGINT) AS nt, sum(sy) AS syt,
           |          sum(syy) AS syyt FROM h$r),
           |c$r AS (SELECT q, sum(n) OVER w AS cn, sum(sy) OVER w AS csy,
           |          sum(syy) OVER w AS csyy
           |        FROM h$r
           |        WINDOW w AS (ORDER BY q ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
           |e$r AS (SELECT q, CAST(cn AS BIGINT) AS cn, csy, t.nt, t.syt,
           |          (CAST(csyy AS DOUBLE)
           |             - CAST(csy AS DOUBLE) * CAST(csy AS DOUBLE) / CAST(cn AS BIGINT))
           |          + ((CAST(t.syyt AS DOUBLE) - CAST(csyy AS DOUBLE))
           |             - (CAST(t.syt AS DOUBLE) - CAST(csy AS DOUBLE))
           |               * (CAST(t.syt AS DOUBLE) - CAST(csy AS DOUBLE))
           |               / (t.nt - cn)) AS sse,
           |          CAST(t.syyt AS DOUBLE)
           |            - CAST(t.syt AS DOUBLE) * CAST(t.syt AS DOUBLE) / t.nt AS sse_root
           |        FROM c$r, t$r t WHERE cn < t.nt),
           |s$r AS (SELECT q AS t,
           |          ${fdivSql("2 * csy + cn", "2 * cn")} AS pl,
           |          ${fdivSql("2 * (syt - csy) + (nt - cn)", "2 * (nt - cn)")} AS pr,
           |          sse, sse_root
           |        FROM e$r ORDER BY sse, q LIMIT 1)""".stripMargin
      }.mkString(",\n")
      def row(r: Int): String =
        s"""SELECT CAST($r AS BIGINT) AS round,
           |  (SELECT t FROM s$r) AS split_q,
           |  CAST((SELECT pl FROM s$r) AS BIGINT) AS pred_left,
           |  CAST((SELECT pr FROM s$r) AS BIGINT) AS pred_right,
           |  round(1.0 - (SELECT sse FROM s$r) / (SELECT sse_root FROM s$r), 6) AS gain""".stripMargin
      s"""WITH b AS (
         |  SELECT CAST(round(l_quantity) AS BIGINT) AS q,
         |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
         |  FROM lineitem),
         |h AS (SELECT q, CAST(count(*) AS BIGINT) AS n,
         |        sum(CAST(c AS HUGEINT)) AS sy,
         |        sum(CAST(c AS HUGEINT) * CAST(c AS HUGEINT)) AS syy
         |      FROM b GROUP BY 1),
         |$rounds
         |${row(1)}
         |UNION ALL
         |${row(2)}
         |UNION ALL
         |${row(3)}
         |ORDER BY round""".stripMargin
    },


    "q_ols" ->
      """WITH sums AS (
        |  SELECT l_returnflag, count(*) AS n,
        |    sum(CAST(l_quantity AS DECIMAL(18,2))) AS sx,
        |    sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS sy,
        |    sum(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS sxy,
        |    sum(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS sxx,
        |    sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS syy
        |  FROM lineitem
        |  WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
        |  GROUP BY l_returnflag),
        |d AS (
        |  SELECT l_returnflag, n, CAST(n AS DOUBLE) AS nd,
        |    CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd,
        |    CAST(sxy AS DOUBLE) AS sxyd, CAST(sxx AS DOUBLE) AS sxxd,
        |    CAST(syy AS DOUBLE) AS syyd
        |  FROM sums)
        |SELECT l_returnflag, n,
        |  round(CASE WHEN nd * sxxd - sxd * sxd <> 0.0
        |    THEN (nd * sxyd - sxd * syd) / (nd * sxxd - sxd * sxd) END, 6) AS slope,
        |  round(CASE WHEN nd * sxxd - sxd * sxd <> 0.0
        |    THEN (syd - ((nd * sxyd - sxd * syd) / (nd * sxxd - sxd * sxd)) * sxd) / nd
        |    END, 6) AS intercept,
        |  round(CASE WHEN nd * sxxd - sxd * sxd <> 0.0
        |    THEN ((nd * sxyd - sxd * syd) * (nd * sxyd - sxd * syd))
        |         / ((nd * sxxd - sxd * sxd) * (nd * syyd - syd * syd)) END, 6) AS r2
        |FROM d
        |ORDER BY l_returnflag""".stripMargin,


    // Two unrolled alternations, each half-step one join + one keyed
    // aggregate on exact HUGEINT moments, factors re-quantized to
    // micros per solve — CTEs generated from one template so the two
    // directions (and the Spark expression shapes) can't drift.
    "q_als" ->
      s"""WITH $alsOracleCtes,
         |e AS (
         |  SELECT CAST(r.r * 1000000000000 -
         |    (u.f1 * i.f1 + u.f2 * i.f2) AS BIGINT) AS e
         |  FROM ratings r JOIN uf2 u ON r.u = u.id JOIN if2 i ON r.i = i.id),
         |st AS (SELECT sum(CAST(e AS HUGEINT) * CAST(e AS HUGEINT)) AS sse,
         |         CAST(count(*) AS BIGINT) AS n FROM e)
         |SELECT u.id AS suppkey, u.f1, u.f2,
         |  round(sqrt(CAST(sse AS DOUBLE) / n) / 1e12, 6) AS rmse
         |FROM uf2 u, st ORDER BY suppkey""".stripMargin,


    // The shared ALS factor CTEs plus the serving tail: mask rated
    // pairs, exact integer dots, rank-3 per user.
    "q_als_recs" ->
      s"""WITH $alsOracleCtes,
         |sc AS (
         |  SELECT u.id AS u, i.id AS i, u.f1 * i.f1 + u.f2 * i.f2 AS dot
         |  FROM uf2 u CROSS JOIN if2 i
         |  WHERE NOT EXISTS (SELECT 1 FROM ratings r
         |                    WHERE r.u = u.id AND r.i = i.id)),
         |rk AS (SELECT u, i, dot,
         |         row_number() OVER (PARTITION BY u ORDER BY dot DESC, i) AS rank
         |       FROM sc)
         |SELECT u AS suppkey, CAST(rank AS INTEGER) AS rank, i AS partkey,
         |  CAST(dot AS BIGINT) AS dot
         |FROM rk WHERE rank <= 3 ORDER BY suppkey, rank""".stripMargin,


    // The same nine exact decimal moments; per-λ rows from an unnest,
    // every double expression shape identical to ml/Ridge.
    "q_ridge" -> {
      val c11 = "(sx1x1d - sx1d * sx1d / nd)"
      val c22 = "(sx2x2d - sx2d * sx2d / nd)"
      val c12 = "(sx1x2d - sx1d * sx2d / nd)"
      val c1y = "(sx1yd - sx1d * syd / nd)"
      val c2y = "(sx2yd - sx2d * syd / nd)"
      val a11 = s"($c11 + lam)"
      val a22 = s"($c22 + lam)"
      val det = s"($a11 * $a22 - $c12 * $c12)"
      val w1 = s"(($c1y * $a22 - $c2y * $c12) / $det)"
      val w2 = s"(($a11 * $c2y - $c12 * $c1y) / $det)"
      s"""WITH sums AS (
         |  SELECT count(*) AS n,
         |    sum(CAST(l_quantity AS DECIMAL(18,2))) AS sx1,
         |    sum(CAST(l_discount AS DECIMAL(18,2))) AS sx2,
         |    sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS sy,
         |    sum(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS sx1x1,
         |    sum(CAST(l_discount AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS sx2x2,
         |    sum(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS sx1x2,
         |    sum(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS sx1y,
         |    sum(CAST(l_discount AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS sx2y
         |  FROM lineitem
         |  WHERE l_quantity IS NOT NULL AND l_discount IS NOT NULL
         |    AND l_extendedprice IS NOT NULL),
         |d AS (
         |  SELECT n, CAST(n AS DOUBLE) AS nd,
         |    CAST(sx1 AS DOUBLE) AS sx1d, CAST(sx2 AS DOUBLE) AS sx2d,
         |    CAST(sy AS DOUBLE) AS syd,
         |    CAST(sx1x1 AS DOUBLE) AS sx1x1d, CAST(sx2x2 AS DOUBLE) AS sx2x2d,
         |    CAST(sx1x2 AS DOUBLE) AS sx1x2d,
         |    CAST(sx1y AS DOUBLE) AS sx1yd, CAST(sx2y AS DOUBLE) AS sx2yd
         |  FROM sums),
         |lams AS (SELECT unnest([CAST(0 AS DOUBLE), CAST(1000 AS DOUBLE),
         |                        CAST(1000000 AS DOUBLE)]) AS lam)
         |SELECT lam, n,
         |  round(CASE WHEN $det <> 0.0 THEN $w1 END, 6) AS w1,
         |  round(CASE WHEN $det <> 0.0 THEN $w2 END, 6) AS w2,
         |  round(CASE WHEN $det <> 0.0
         |    THEN (syd - $w1 * sx1d - $w2 * sx2d) / nd END, 6) AS intercept
         |FROM d, lams
         |ORDER BY lam""".stripMargin
    },


    // The q_bm25 scoring CTEs ranked to 20; graded relevance from
    // list_contains; ideal nDCG ranking as the grade-count closed
    // form over positions 1..10.
    "q_ir_eval" ->
      """WITH b2 AS (
        |  SELECT doc_id,
        |    list_filter(regexp_split_to_array(lower(text), '\s+'), x -> len(x) > 0) AS toks
        |  FROM documents WHERE text IS NOT NULL),
        |rel AS (
        |  SELECT doc_id,
        |    (CASE WHEN list_contains(toks, 'spark') THEN 1 ELSE 0 END
        |     + CASE WHEN list_contains(toks, 'sort') THEN 1 ELSE 0 END
        |     + CASE WHEN list_contains(toks, 'hash') THEN 1 ELSE 0 END) AS rel
        |  FROM b2),
        |relq AS (SELECT * FROM rel WHERE rel > 0),
        |gc AS (SELECT
        |    CAST(sum(CASE WHEN rel = 3 THEN 1 ELSE 0 END) AS BIGINT) AS n3,
        |    CAST(sum(CASE WHEN rel = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
        |    CAST(sum(CASE WHEN rel = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1
        |  FROM relq),
        |b3 AS (SELECT doc_id, toks, len(toks) AS l FROM b2),
        |consts AS (SELECT count(*) AS n, CAST(sum(l) AS DOUBLE) / count(*) AS avglen FROM b3),
        |post AS (
        |  SELECT doc_id, l, t, count(*) AS tf FROM (
        |    SELECT doc_id, l, unnest(toks) AS t FROM b3)
        |  WHERE t IN ('spark', 'sort', 'hash') GROUP BY 1, 2, 3),
        |dfreq AS (SELECT t, count(DISTINCT doc_id) AS df FROM post GROUP BY 1),
        |lex AS (
        |  SELECT doc_id,
        |    round(sum(
        |      ln(1 + ((SELECT n FROM consts) - df + 0.5) / (df + 0.5))
        |        * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * l / (SELECT avglen FROM consts)))), 6) AS score
        |  FROM post JOIN dfreq USING (t) GROUP BY doc_id),
        |ranked AS (
        |  SELECT doc_id,
        |    CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS INT) AS rank
        |  FROM lex QUALIFY rank <= 20),
        |judged AS (
        |  SELECT ranked.rank, coalesce(rel.rel, 0) AS rel
        |  FROM ranked LEFT JOIN rel USING (doc_id)),
        |m AS (SELECT
        |    round(max(CASE WHEN rel >= 2
        |      THEN CAST(1 AS DOUBLE) / rank ELSE 0.0 END), 6) AS mrr,
        |    CAST(sum(CASE WHEN rank <= 10 AND rel > 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS p10_hits,
        |    CAST(sum(CASE WHEN rel > 0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS rel_retrieved,
        |    round(sum(CASE WHEN rank <= 10
        |      THEN (pow(2.0, rel) - 1.0) / log2(rank + 1)
        |      ELSE 0.0 END), 6) AS dcg10
        |  FROM judged),
        |ideal AS (
        |  SELECT round(sum((pow(2.0, g) - 1.0) / log2(r + 1)), 6) AS idcg10
        |  FROM (SELECT r,
        |          CASE WHEN r <= n3 THEN 3
        |               WHEN r <= n3 + n2 THEN 2
        |               WHEN r <= n3 + n2 + n1 THEN 1
        |               ELSE 0 END AS g
        |        FROM gc CROSS JOIN UNNEST(range(1, 11)) AS t(r)))
        |SELECT (n3 + n2 + n1) AS n_relevant, mrr, p10_hits, rel_retrieved,
        |  round(CAST(rel_retrieved AS DOUBLE) / (n3 + n2 + n1), 6) AS recall20,
        |  dcg10, idcg10, round(dcg10 / idcg10, 6) AS ndcg10
        |FROM m CROSS JOIN ideal CROSS JOIN gc""".stripMargin,


    // Same md5-prefix-60 bucket arithmetic as the Sampling oracles.
    "q_feature_hash" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    unnest(list_filter(regexp_split_to_array(lower(text), '\s+'), x -> len(x) > 0)) AS tok
        |  FROM documents WHERE text IS NOT NULL)
        |SELECT doc_id,
        |  ('0x' || substr(md5(tok), 1, 15))::BIGINT % 256 AS bucket,
        |  count(*) AS tf
        |FROM t GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,


    // The smoothed-count product as a recursive CTE: base = one prior
    // division then ((prior·num)/den); step = ((s·num)/den) — the
    // identical left-assoc IEEE op sequence the Spark recurrence runs.
    "q_naive_bayes" ->
      """WITH RECURSIVE d AS (
        |  SELECT doc_id, lang, text FROM documents WHERE text IS NOT NULL),
        |train AS (SELECT * FROM d WHERE doc_id % 2 = 0),
        |test AS (SELECT * FROM d WHERE doc_id % 2 = 1),
        |ttok AS (
        |  SELECT lang, unnest(list_filter(regexp_split_to_array(lower(text), '\s+'),
        |    x -> len(x) > 0)) AS t
        |  FROM train),
        |cnt AS (SELECT lang, t, CAST(count(*) AS BIGINT) AS c FROM ttok GROUP BY 1, 2),
        |tot AS (SELECT lang, CAST(count(*) AS BIGINT) AS tot FROM ttok GROUP BY 1),
        |vocab AS (SELECT CAST(count(DISTINCT t) AS BIGINT) AS v FROM ttok),
        |prior AS (
        |  SELECT lang, CAST(count(*) AS BIGINT) AS nc,
        |    (SELECT CAST(count(*) AS BIGINT) FROM train) AS nn
        |  FROM train GROUP BY 1),
        |toks AS (
        |  SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '\s+'),
        |    x -> len(x) > 0) AS ts
        |  FROM test),
        |pos0 AS (
        |  SELECT doc_id, ts, unnest(range(1, least(len(ts), 40) + 1)) AS k FROM toks),
        |pos AS (
        |  SELECT doc_id, CAST(k AS BIGINT) AS k, ts[CAST(k AS INT)] AS t FROM pos0),
        |factors AS (
        |  SELECT p.doc_id, pr.lang, p.k,
        |    COALESCE(cnt.c, 0) + 1 AS num,
        |    tot.tot + (SELECT v FROM vocab) AS den,
        |    pr.nc, pr.nn
        |  FROM pos p
        |  CROSS JOIN prior pr
        |  JOIN tot ON tot.lang = pr.lang
        |  LEFT JOIN cnt ON cnt.lang = pr.lang AND cnt.t = p.t),
        |rec AS (
        |  SELECT doc_id, lang, k,
        |    ((CAST(nc AS DOUBLE) / nn) * num) / den AS s
        |  FROM factors WHERE k = 1
        |  UNION ALL
        |  SELECT f.doc_id, f.lang, f.k, (r.s * f.num) / f.den
        |  FROM rec r JOIN factors f
        |    ON f.doc_id = r.doc_id AND f.lang = r.lang AND f.k = r.k + 1),
        |last AS (
        |  SELECT doc_id, lang, arg_max(s, k) AS score
        |  FROM rec GROUP BY doc_id, lang),
        |ranked AS (
        |  SELECT doc_id, lang, score,
        |    row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, lang) AS rn
        |  FROM last)
        |SELECT t.doc_id, t.lang, r.lang AS pred, (t.lang = r.lang) AS correct,
        |  r.score
        |FROM ranked r JOIN test t ON t.doc_id = r.doc_id
        |WHERE r.rn = 1 ORDER BY t.doc_id""".stripMargin,
  )
}
