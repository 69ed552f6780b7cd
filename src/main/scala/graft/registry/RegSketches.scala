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

/** Sketches slice of the [[SparkEntry]] query/oracle registry. Split from
  * the former single 15k-line entry file so scalac parallelizes across
  * domains and no single Map literal dominates compile time or method
  * size. Entry names, bodies, and oracle SQL are the driver contract,
  * byte-for-byte as they were in SparkEntry; shared fixtures and
  * oracle CTE builders stay on [[SparkEntry]] (private[graft]). */
private[graft] object RegSketches {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "q_topk" -> { (s, dir) =>
      Tables.load(s, dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(10)
    },


    // Per-group top-k through a BOUNDED mergeable aggregate
    // (stats/TopK): ≤ k elements per partial buffer anywhere in the
    // exchange — the scale-safe replacement for the row_number-window
    // idiom, which sorts every row of every group to keep k. Struct
    // child carries (rank key, payload); lexicographic order with the
    // id tiebreak makes output deterministic.
    "q_topk_grouped" -> { (s, dir) =>
      Tables.load(s, dir, "documents")
        .groupBy("source")
        .agg(graft.stats.TopK.topK(
          struct(col("n_chars"), col("doc_id")), 3).as("top"))
        .select(col("source"), explode(col("top")).as("t"))
        .select(col("source"), col("t.n_chars").as("n_chars"),
          col("t.doc_id").as("doc_id"))
        .orderBy(col("source"), col("n_chars").desc, col("doc_id").desc)
    },


    // Equi-DEPTH histogram (equal row counts per bucket, vs
    // q_histogram's equal widths) — decile bounds of extendedprice
    // via the DISTRIBUTED global rank, never a single-partition
    // window: bucket = (rank−1)·10 div n.
    "q_histogram_eqdepth" -> { (s, dir) =>
      val li = Tables.load(s, dir, "lineitem")
        .select(col("l_extendedprice").as("v"), col("l_orderkey"), col("l_linenumber"))
      val n = li.count()
      graft.operators.GlobalRank.withGlobalRank(li,
        Seq(col("v"), col("l_orderkey"), col("l_linenumber")))
        .withColumn("bucket", ((col("rank") - 1) * 10 / lit(n)).cast("long"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"),
          round(min(col("v")), 2).as("lo"), round(max(col("v")), 2).as("hi"))
        .orderBy("bucket")
    },


    // GROUPED count-min: one bounded sketch per source under a keyed
    // exchange — the per-source corpus-audit form, completing the
    // grouped-sketch quartet (GK quantiles, Misra-Gries, KMV, CMS).
    "q_count_min_grouped" -> { (s, dir) =>
      Tables.load(s, dir, "documents")
        .filter(col("text").isNotNull)
        .select(col("source"), explode(TextFunctions.tokens(col("text"))).as("t"))
        .groupBy("source")
        .agg(graft.stats.CountMin.countMinEstimates(
          col("t"), depth = 4, width = 64, keys = Seq("join", "vector")).as("e"))
        .select(col("source"), explode(col("e")).as("x"))
        .select(col("source"), col("x.item").as("item"), col("x.est").as("est"))
        .orderBy("source", "item")
    },


    // Count-min sketch over the corpus token stream: depth×width
    // bounded counters (8·4·64 bytes/partial here), pointwise-additive
    // merge, answering point-frequency for keys chosen AFTER the scan
    // — the complement of Misra-Gries' top-k. The md5-prefix hash
    // makes the filled sketch partitioning-invariant, so the oracle
    // replays cells AND estimates exactly (including the deliberate
    // collision overestimates at width 64 and the absent key).
    "q_count_min" -> { (s, dir) =>
      val toks = Tables.load(s, dir, "documents")
        .filter(col("text").isNotNull)
        .select(explode(TextFunctions.tokens(col("text"))).as("t"))
      toks.agg(graft.stats.CountMin.countMinEstimates(
          col("t"), depth = 4, width = 64,
          keys = Seq("join", "hash", "scan", "zzzz")).as("e"))
        .select(explode(col("e")).as("x"))
        .select(col("x.item").as("item"), col("x.est").as("est"))
        .orderBy("item")
    },


    // Grouped HLL: distinct customers per order priority — the
    // HLL member of the grouped-sketch family (kmv/count-min/MG all
    // have grouped forms). Register table is ≤ 64 rows per group;
    // exact-bigint harmonic sum per group.
    "q_hll_grouped" -> { (s, dir) =>
      val o = Tables.load(s, dir, "orders")
      graft.stats.Hll.summaryGrouped(o, "o_custkey", Seq("o_orderpriority"))
        .orderBy("o_orderpriority")
    },


    // 2-D histogram (price × quantity) — the heatmap aggregation every
    // profiling UI draws: clamped integer bin ids on both axes off one
    // keyed agg, exact counts. The bin keyspace is bins², independent
    // of corpus size.
    "q_histogram2d" -> { (s, dir) =>
      val li = Tables.load(s, dir, "lineitem")
      def bin(c: org.apache.spark.sql.Column, lo: Double, hi: Double, n: Int) =
        least(greatest(
          floor((c - lit(lo)) / lit((hi - lo) / n)).cast("int"), lit(0)),
          lit(n - 1))
      li.select(
          bin(col("l_extendedprice"), 900.0, 105000.0, 16).as("bin_price"),
          bin(col("l_quantity"), 1.0, 51.0, 10).as("bin_qty"))
        .groupBy("bin_price", "bin_qty")
        .agg(count(lit(1)).as("n"))
        .orderBy("bin_price", "bin_qty")
    },


    // Equi-width histogram over l_extendedprice: 32 bins, clamped ends
    // — one map-side-combinable groupBy on the bin id
    // (graft.stats.Histogram).
    "q_histogram" -> { (s, dir) =>
      graft.stats.Histogram.equiWidth(Tables.load(s, dir, "lineitem"),
        "l_extendedprice", lo = 900.0, hi = 105000.0, bins = 32)
        .orderBy("bin")
    },


    // KMV distinct-count sketch over document texts: k smallest 60-bit
    // md5 hashes → (k−1)/(h₍ₖ₎/2⁶⁰). Unlike HLL++ the order-statistic
    // sketch is exactly SQL-reproducible, so the estimate itself faces
    // the oracle gate. Executors ship ≤ k hashes each; no value shuffle.
    // kth_hash is a raw 60-bit order statistic — emitted as two 30-bit
    // halves (never a >18-digit numeric output column; VERDICT r10).
    "q_distinct_kmv" -> { (s, dir) =>
      DistinctSketch.kmv(Tables.load(s, dir, "documents"), "text", k = 128)
        .select(col("k_used"),
          shiftright(col("kth_hash"), 30).as("kth_hash_hi"),
          col("kth_hash").bitwiseAND(lit(1073741823L)).as("kth_hash_lo"),
          col("est_distinct"))
    },


    // KMV SET ALGEBRA: union / intersection / Jaccard estimates for
    // two customer populations (urgent-order vs low-priority buyers)
    // from their k-min sketches ALONE — the corpus-bookkeeping move
    // that answers "how much do these two sources overlap?" without
    // ever co-shuffling them (stats/DistinctSketch.kmvSetOps). The
    // estimates are order statistics of md5 hashes, so they face the
    // oracle exactly; exact counts ride along as the cross-check.
    "q_kmv_setops" -> { (s, dir) =>
      val o = Tables.load(s, dir, "orders").where(col("o_custkey").isNotNull)
      val a = o.where(col("o_orderpriority") === "1-URGENT").select("o_custkey")
      val b = o.where(col("o_orderpriority") === "5-LOW").select("o_custkey")
      val est = DistinctSketch.kmvSetOps(a, b, "o_custkey", k = 256)
      val exact = o.groupBy("o_custkey").agg(
        max(when(col("o_orderpriority") === "1-URGENT", 1L).otherwise(0L))
          .as("ia"),
        max(when(col("o_orderpriority") === "5-LOW", 1L).otherwise(0L))
          .as("ib"))
        .agg(sum(col("ia")).as("exact_a"), sum(col("ib")).as("exact_b"),
          sum(col("ia") * col("ib")).as("exact_inter"))
      est.crossJoin(exact)
    },


    // The KMV sketch under a KEYED exchange: per-source distinct-text
    // estimates through a bounded mergeable k-min buffer (≤ 64 longs
    // per group per partial — never the full distinct-hash set through
    // the shuffle). Completes the grouped-sketch trifecta beside
    // q_quantiles_gk_grouped and q_heavy_hitters_grouped; the order-
    // statistic output is SQL-exact, so the estimate faces the oracle.
    "q_distinct_kmv_grouped" -> { (s, dir) =>
      DistinctSketch.kmvGrouped(
        Tables.load(s, dir, "documents").filter(col("text").isNotNull),
        "text", Seq("source"), k = 64)
        .select(col("source"), col("k_used"),
          shiftright(col("kth_hash"), 30).as("kth_hash_hi"),
          col("kth_hash").bitwiseAND(lit(1073741823L)).as("kth_hash_lo"),
          col("est_distinct"))
        .orderBy("source")
    },


    // HyperLogLog distinct sketch in the SQL-replayable formulation
    // (trailing-zero rho, exact bigint-scaled harmonic sum — see
    // stats/Hll.scala): one 64-register map-side-combinable pass,
    // estimate cross-checked against the exact distinct in the same
    // row. Completes the distinct-sketch pair next to KMV.
    "q_hll" -> { (s, dir) =>
      val o = Tables.load(s, dir, "orders")
      graft.stats.Hll.summary(o, "o_custkey")
        .crossJoin(o.agg(
          countDistinct(col("o_custkey")).as("exact_distinct")))
    },


    // HLL SET ALGEBRA, the lossy complement of q_kmv_setops: per-side
    // HLL estimates plus the union estimate (an HLL over the union
    // input ≡ the register-max merge of the two sketches — the merge
    // property expressed relationally), intersection via
    // inclusion-exclusion. I-E error compounds — the exact counts ride
    // along to show by how much, next to KMV's direct intersection.
    "q_hll_setops" -> { (s, dir) =>
      val o = Tables.load(s, dir, "orders").where(col("o_custkey").isNotNull)
      def est(df: DataFrame, name: String) =
        graft.stats.Hll.summary(df, "o_custkey")
          .select(col("est_distinct").as(name))
      val a = o.where(col("o_orderpriority") === "1-URGENT")
      val b = o.where(col("o_orderpriority") === "5-LOW")
      val u = o.where(col("o_orderpriority").isin("1-URGENT", "5-LOW"))
      val exact = o.groupBy("o_custkey").agg(
        max(when(col("o_orderpriority") === "1-URGENT", 1L).otherwise(0L))
          .as("ia"),
        max(when(col("o_orderpriority") === "5-LOW", 1L).otherwise(0L))
          .as("ib"))
        .agg(sum(col("ia")).as("exact_a"), sum(col("ib")).as("exact_b"),
          sum(col("ia") * col("ib")).as("exact_inter"))
      est(a, "est_a").crossJoin(est(b, "est_b"))
        .crossJoin(est(u, "est_union"))
        .withColumn("est_inter_ie",
          round(col("est_a") + col("est_b") - col("est_union"), 4))
        .crossJoin(exact)
    },


    // Exact interpolated quantiles (percentile ≡ ANSI quantile_cont).
    // One array-form percentile per column — N separate percentile
    // aggregates each re-collect the column's value multiset.
    //
    // SCALE BOUNDARY: exact `percentile` is a TypedImperativeAggregate
    // that buffers the column's full value multiset in one final
    // buffer — correct and fast at bench scale, an OOM by design at
    // 100 TB. The 100 TB form is `approx_percentile` (Greenwald-Khanna,
    // bounded sketch, mergeable map-side) or a t-digest; it returns a
    // member value with rank error ≤ n/accuracy rather than the
    // interpolated quantile, so it cannot share this oracle — exact is
    // kept here for oracle parity, the boundary is this comment.
    "q_quantiles" -> { (s, dir) =>
      val li = Tables.load(s, dir, "lineitem")
      // HARD ROW-CAP GUARD: exact percentile buffers the full value
      // multiset in ONE aggregation buffer, so this query shape is
      // forbidden beyond a size where that buffer is executor-safe.
      // The guard fails LOUDLY instead of OOMing three stages later —
      // at 100 TB use q_quantiles_gk / q_quantiles_approx (bounded,
      // mergeable sketches; this query is their exact cross-check).
      // LIMIT-probe, not count() (the round-8 guard was a FULL
      // empty-schema pass before failing): limit(cap+1) stops the scan
      // as soon as cap+1 rows surface, so an over-cap 100 TB input is
      // refused after reading ~5e7 rows, and an under-cap input pays
      // at most the one scan the percentile pass repeats anyway.
      val cap = 50L * 1000 * 1000
      val probe = li.limit((cap + 1).toInt).count()
      require(probe <= cap,
        s"q_quantiles is the EXACT cross-check tier: refusing > $cap " +
          "rows; use the GK sketch forms at scale")
      li.agg(
        expr("percentile(l_extendedprice, array(0.25, 0.5, 0.75))").as("pe"),
        expr("percentile(l_quantity, 0.9)").as("pq"))
        .select(
          round(element_at(col("pe"), 1), 6).as("p25"),
          round(element_at(col("pe"), 2), 6).as("p50"),
          round(element_at(col("pe"), 3), 6).as("p75"),
          round(col("pq"), 6).as("q90"))
    },


    // The 100 TB form of q_quantiles: Greenwald-Khanna sketch
    // (approx_percentile) whose memory is O((1/eps)·log(eps·N)) —
    // bounded regardless of input size — vs exact percentile's
    // full-multiset buffer (the documented scale boundary above). At
    // oracle scale the sketch is EXACT: accuracy 1e6 > N=60k means GK
    // never compresses, and its discrete-rank answer equals DuckDB's
    // quantile_disc (verified bit-for-bit; tools/ApproxQProbe.scala),
    // so this gets a full hash oracle, not a rows-only check. At
    // production accuracy (default 1e4) answers are ±1e-4-rank
    // approximate and no SQL oracle could reproduce them.
    "q_quantiles_approx" -> { (s, dir) =>
      val li = Tables.load(s, dir, "lineitem")
      li.agg(
        expr("approx_percentile(l_extendedprice, array(0.25, 0.5, 0.75), 1000000)").as("pe"),
        expr("approx_percentile(l_quantity, 0.9, 1000000)").as("pq"))
        .select(
          round(element_at(col("pe"), 1), 6).as("p25"),
          round(element_at(col("pe"), 2), 6).as("p50"),
          round(element_at(col("pe"), 3), 6).as("p75"),
          round(col("pq"), 6).as("q90"))
    },


    // The PRIMARY 100 TB quantile path: graft's own Greenwald-Khanna
    // TypedImperativeAggregate (graft.stats.QuantileSketch) — bounded
    // O((1/eps)·log(eps·N)) memory, mergeable partial buffers, vs exact
    // percentile's full-multiset buffer (kept above as the small-scale
    // cross-check). Run here at eps=1e-7, whose exact regime covers
    // N < 5M — so at oracle scale the sketch IS the sorted multiset
    // and rank-matches DuckDB quantile_disc bit for bit; the
    // approximate regime's 2eps·N rank bound is pinned in
    // QuantileSketchSpec instead (no SQL oracle can reproduce it).
    "q_quantiles_gk" -> { (s, dir) =>
      val li = Tables.load(s, dir, "lineitem")
      li.agg(
        QuantileSketch.gkQuantiles(col("l_extendedprice"),
          Seq(0.25, 0.5, 0.75), eps = 1e-7).as("pe"),
        QuantileSketch.gkQuantiles(col("l_quantity"),
          Seq(0.9), eps = 1e-7).as("pq"))
        .select(
          round(element_at(col("pe"), 1), 6).as("p25"),
          round(element_at(col("pe"), 2), 6).as("p50"),
          round(element_at(col("pe"), 3), 6).as("p75"),
          round(element_at(col("pq"), 1), 6).as("q90"))
    },


    // The GK sketch under a KEYED exchange: per-returnflag quantiles
    // through partial/merge across the group shuffle — what q_skyline
    // _agg proves for the skyline aggregate, proven here for the
    // quantile sketch (same exact-at-accuracy oracle trick).
    "q_quantiles_gk_grouped" -> { (s, dir) =>
      Tables.load(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(QuantileSketch.gkQuantiles(col("l_extendedprice"),
          Seq(0.5, 0.9), eps = 1e-7).as("pe"))
        .select(
          col("l_returnflag"),
          round(element_at(col("pe"), 1), 6).as("p50"),
          round(element_at(col("pe"), 2), 6).as("p90"))
        .orderBy("l_returnflag")
    },


    // Exact distinct aggregation (count + sum of distincts per group).
    "q_distinct_agg" -> { (s, dir) =>
      Tables.load(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          countDistinct(col("l_suppkey")).as("n_supp"),
          countDistinct(col("l_partkey")).as("n_part"),
          round(sum_distinct(col("l_quantity")), 2).as("sum_d_qty"))
        .orderBy("l_returnflag")
    },
  )

  val oracles: Map[String, String] = Map(

    "q_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin,


    // The window idiom the bounded aggregate replaces — identical
    // output by construction.
    "q_topk_grouped" ->
      """WITH r AS (
        |  SELECT source, n_chars, doc_id,
        |    row_number() OVER (PARTITION BY source
        |                       ORDER BY n_chars DESC, doc_id DESC) AS rn
        |  FROM documents)
        |SELECT source, n_chars, doc_id FROM r WHERE rn <= 3
        |ORDER BY source, n_chars DESC, doc_id DESC""".stripMargin,


    // Global rank replay; bucket = (rank−1)·10 floor-div n.
    "q_histogram_eqdepth" ->
      """WITH r AS (
        |  SELECT l_extendedprice AS v,
        |    row_number() OVER (ORDER BY l_extendedprice, l_orderkey,
        |                       l_linenumber) AS rank
        |  FROM lineitem),
        |nn AS (SELECT count(*) AS n FROM r)
        |SELECT CAST(((rank - 1) * 10) // (SELECT n FROM nn) AS BIGINT) AS bucket,
        |  count(*) AS n, round(min(v), 2) AS lo, round(max(v), 2) AS hi
        |FROM r GROUP BY 1 ORDER BY 1""".stripMargin,


    // Per-source cell replay — the q_count_min CTEs with `source`
    // threaded through vocabulary, cells, and estimates.
    "q_count_min_grouped" ->
      """WITH toks AS (
        |  SELECT source,
        |    unnest(list_filter(regexp_split_to_array(lower(text), '\s+'),
        |                       x -> len(x) > 0)) AS t
        |  FROM documents WHERE text IS NOT NULL),
        |vc AS (SELECT source, t, count(*) AS c FROM toks GROUP BY 1, 2),
        |js AS (SELECT unnest([0, 1, 2, 3]) AS j),
        |cells AS (
        |  SELECT vc.source, js.j,
        |    (('0x' || substr(md5(js.j || ':' || vc.t), 1, 15))::BIGINT % 64) AS cell,
        |    sum(vc.c) AS s
        |  FROM vc CROSS JOIN js GROUP BY 1, 2, 3),
        |srcs AS (SELECT DISTINCT source FROM toks),
        |q AS (SELECT unnest(['join', 'vector']) AS item),
        |qh AS (
        |  SELECT srcs.source, q.item, js.j,
        |    (('0x' || substr(md5(js.j || ':' || q.item), 1, 15))::BIGINT % 64) AS cell
        |  FROM srcs CROSS JOIN q CROSS JOIN js)
        |SELECT qh.source, qh.item, CAST(min(coalesce(cells.s, 0)) AS BIGINT) AS est
        |FROM qh LEFT JOIN cells
        |  ON qh.source = cells.source AND qh.j = cells.j AND qh.cell = cells.cell
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,


    // Cell-exact count-min replay: rebuild every row's cells from the
    // token counts (sum of counts of ALL tokens hashing to the cell),
    // then estimate = min over rows of the queried cell; empty cell →
    // 0 via the LEFT JOIN coalesce.
    "q_count_min" ->
      """WITH toks AS (
        |  SELECT unnest(list_filter(regexp_split_to_array(lower(text), '\s+'),
        |                            x -> len(x) > 0)) AS t
        |  FROM documents WHERE text IS NOT NULL),
        |vc AS (SELECT t, count(*) AS c FROM toks GROUP BY 1),
        |js AS (SELECT unnest([0, 1, 2, 3]) AS j),
        |cells AS (
        |  SELECT js.j,
        |    (('0x' || substr(md5(js.j || ':' || vc.t), 1, 15))::BIGINT % 64) AS cell,
        |    sum(vc.c) AS s
        |  FROM vc CROSS JOIN js GROUP BY 1, 2),
        |q AS (SELECT unnest(['join', 'hash', 'scan', 'zzzz']) AS item),
        |qh AS (
        |  SELECT q.item, js.j,
        |    (('0x' || substr(md5(js.j || ':' || q.item), 1, 15))::BIGINT % 64) AS cell
        |  FROM q CROSS JOIN js)
        |SELECT qh.item, CAST(min(coalesce(cells.s, 0)) AS BIGINT) AS est
        |FROM qh LEFT JOIN cells ON qh.j = cells.j AND qh.cell = cells.cell
        |GROUP BY 1 ORDER BY 1""".stripMargin,


    // Per-group mirror of q_hll: same register algebra with every
    // stage keyed by o_orderpriority.
    "q_hll_grouped" ->
      """WITH h AS (
        |  SELECT o_orderpriority AS g,
        |    ('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 15))::BIGINT AS h
        |  FROM orders WHERE o_custkey IS NOT NULL),
        |r AS (
        |  SELECT g, h % 64 AS reg,
        |    CASE WHEN h // 64 = 0 THEN 55
        |         ELSE CAST(round(log2((h // 64) & -(h // 64))) AS INT) + 1 END AS rho
        |  FROM h),
        |regs AS (SELECT g, reg, max(rho) AS mrho FROM r GROUP BY g, reg),
        |base AS (SELECT g, max(mrho) AS r_max, count(*) AS present FROM regs GROUP BY g),
        |ag AS (
        |  SELECT regs.g, b.r_max,
        |         CAST(64 - b.present AS BIGINT) AS zeros,
        |         sum(CAST(1 AS BIGINT) << (b.r_max - regs.mrho)) AS sum_present
        |  FROM regs JOIN base b ON regs.g = b.g
        |  GROUP BY regs.g, b.r_max, b.present),
        |s AS (SELECT g, r_max, zeros,
        |        sum_present + zeros * (CAST(1 AS BIGINT) << r_max) AS sum_scaled
        |      FROM ag)
        |SELECT g AS o_orderpriority, 64 AS m, zeros, r_max,
        |  CAST(sum_scaled AS BIGINT) AS sum_scaled,
        |  round(CASE WHEN (CAST(0.709 AS DOUBLE) * 4096
        |                   * CAST(CAST(1 AS BIGINT) << r_max AS DOUBLE)
        |                   / CAST(sum_scaled AS DOUBLE)) <= 160.0 AND zeros > 0
        |        THEN 64.0 * ln(64.0 / CAST(zeros AS DOUBLE))
        |        ELSE CAST(0.709 AS DOUBLE) * 4096
        |             * CAST(CAST(1 AS BIGINT) << r_max AS DOUBLE)
        |             / CAST(sum_scaled AS DOUBLE) END, 4) AS est_distinct
        |FROM s ORDER BY g""".stripMargin,


    "q_histogram2d" ->
      """WITH b AS (
        |  SELECT
        |    LEAST(GREATEST(CAST(floor((l_extendedprice - 900.0) / 6506.25) AS INT), 0), 15) AS bin_price,
        |    LEAST(GREATEST(CAST(floor((l_quantity - 1.0) / 5.0) AS INT), 0), 9) AS bin_qty
        |  FROM lineitem)
        |SELECT bin_price, bin_qty, CAST(count(*) AS BIGINT) AS n
        |FROM b GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,


    // Identical clamp-and-floor bin arithmetic; w = 104100/32 is a
    // power-of-two division, exact in binary on both engines.
    "q_histogram" ->
      """SELECT least(greatest(CAST(floor((l_extendedprice - 900.0) / 3253.125) AS BIGINT), 0), 31) AS bin,
        |  count(*) AS n,
        |  round(min(l_extendedprice), 6) AS lo_seen,
        |  round(max(l_extendedprice), 6) AS hi_seen
        |FROM lineitem WHERE l_extendedprice IS NOT NULL
        |GROUP BY 1 ORDER BY bin""".stripMargin,


    // KMV replayed literally: distinct 60-bit hashes, 128 smallest,
    // same two-division estimate expression.
    "q_distinct_kmv" ->
      """WITH h AS (
        |  SELECT DISTINCT ('0x' || substr(md5(text), 1, 15))::BIGINT AS h
        |  FROM documents WHERE text IS NOT NULL),
        |k AS (SELECT h FROM h ORDER BY h LIMIT 128)
        |SELECT CAST(count(*) AS BIGINT) AS k_used,
        |  CAST(max(h) // 1073741824 AS BIGINT) AS kth_hash_hi,
        |  CAST(max(h) % 1073741824 AS BIGINT) AS kth_hash_lo,
        |  round(CASE WHEN count(*) < 128 THEN CAST(count(*) AS DOUBLE)
        |        ELSE CAST(count(*) - 1 AS DOUBLE) / (CAST(max(h) AS DOUBLE) / 1152921504606846976.0) END, 4) AS est_distinct
        |FROM k""".stripMargin,


    // Set algebra replayed with DuckDB lists: L = k smallest of the
    // sketch union; ρ = |L ∩ S_A ∩ S_B| / |L| drives inter/Jaccard.
    "q_kmv_setops" ->
      """WITH ha AS (
        |  SELECT DISTINCT ('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 15))::BIGINT AS h
        |  FROM orders WHERE o_orderpriority = '1-URGENT' AND o_custkey IS NOT NULL),
        |ka AS (SELECT list(h ORDER BY h) AS a FROM (SELECT h FROM ha ORDER BY h LIMIT 256)),
        |hb AS (
        |  SELECT DISTINCT ('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 15))::BIGINT AS h
        |  FROM orders WHERE o_orderpriority = '5-LOW' AND o_custkey IS NOT NULL),
        |kb AS (SELECT list(h ORDER BY h) AS b FROM (SELECT h FROM hb ORDER BY h LIMIT 256)),
        |m AS (
        |  SELECT a, b,
        |    list_slice(list_sort(list_distinct(list_concat(a, b))), 1, 256) AS ul
        |  FROM ka, kb),
        |m2 AS (
        |  SELECT len(ul) AS ku,
        |    len(list_filter(ul, x -> list_contains(a, x) AND list_contains(b, x))) AS c,
        |    CASE WHEN len(a) < 256 THEN CAST(len(a) AS DOUBLE)
        |         ELSE CAST(len(a) - 1 AS DOUBLE) / (CAST(a[len(a)] AS DOUBLE) / 1152921504606846976.0) END AS ea,
        |    CASE WHEN len(b) < 256 THEN CAST(len(b) AS DOUBLE)
        |         ELSE CAST(len(b) - 1 AS DOUBLE) / (CAST(b[len(b)] AS DOUBLE) / 1152921504606846976.0) END AS eb,
        |    CASE WHEN len(ul) < 256 THEN CAST(len(ul) AS DOUBLE)
        |         ELSE CAST(len(ul) - 1 AS DOUBLE) / (CAST(ul[len(ul)] AS DOUBLE) / 1152921504606846976.0) END AS eu
        |  FROM m),
        |fl AS (
        |  SELECT o_custkey,
        |    max(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS ia,
        |    max(CASE WHEN o_orderpriority = '5-LOW' THEN 1 ELSE 0 END) AS ib
        |  FROM orders WHERE o_custkey IS NOT NULL GROUP BY 1),
        |ex AS (
        |  SELECT CAST(sum(ia) AS BIGINT) AS exact_a,
        |         CAST(sum(ib) AS BIGINT) AS exact_b,
        |         CAST(sum(ia * ib) AS BIGINT) AS exact_inter
        |  FROM fl)
        |SELECT CAST(ku AS BIGINT) AS ku, CAST(c AS BIGINT) AS c,
        |  round(ea, 4) AS est_a, round(eb, 4) AS est_b,
        |  round(eu, 4) AS est_union,
        |  round(CAST(c AS DOUBLE) / ku * eu, 4) AS est_inter,
        |  round(CAST(c AS DOUBLE) / ku, 6) AS est_jaccard,
        |  exact_a, exact_b, exact_inter
        |FROM m2, ex""".stripMargin,


    // Per-group k smallest distinct hashes via a window; the engine
    // side ships ≤ k per group per partial instead (KMinAgg).
    "q_distinct_kmv_grouped" ->
      """WITH h AS (
        |  SELECT DISTINCT source, ('0x' || substr(md5(text), 1, 15))::BIGINT AS h
        |  FROM documents WHERE text IS NOT NULL),
        |r AS (SELECT source, h,
        |        row_number() OVER (PARTITION BY source ORDER BY h) AS rn
        |      FROM h)
        |SELECT source, CAST(count(*) AS BIGINT) AS k_used,
        |  CAST(max(h) // 1073741824 AS BIGINT) AS kth_hash_hi,
        |  CAST(max(h) % 1073741824 AS BIGINT) AS kth_hash_lo,
        |  round(CASE WHEN count(*) < 64 THEN CAST(count(*) AS DOUBLE)
        |        ELSE CAST(count(*) - 1 AS DOUBLE) / (CAST(max(h) AS DOUBLE) / 1152921504606846976.0) END, 4) AS est_distinct
        |FROM r WHERE rn <= 64 GROUP BY source ORDER BY source""".stripMargin,


    "q_hll" ->
      """WITH h AS (
        |  SELECT ('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 15))::BIGINT AS h
        |  FROM orders WHERE o_custkey IS NOT NULL),
        |r AS (
        |  SELECT h % 64 AS reg,
        |    CASE WHEN h // 64 = 0 THEN 55
        |         ELSE CAST(round(log2((h // 64) & -(h // 64))) AS INT) + 1 END AS rho
        |  FROM h),
        |regs AS (SELECT reg, max(rho) AS mrho FROM r GROUP BY reg),
        |base AS (SELECT max(mrho) AS r_max, count(*) AS present FROM regs),
        |ag AS (
        |  SELECT (SELECT r_max FROM base) AS r_max,
        |         CAST(64 - (SELECT present FROM base) AS BIGINT) AS zeros,
        |         sum(CAST(1 AS BIGINT) << ((SELECT r_max FROM base) - mrho)) AS sum_present
        |  FROM regs),
        |s AS (SELECT r_max, zeros,
        |        sum_present + zeros * (CAST(1 AS BIGINT) << r_max) AS sum_scaled
        |      FROM ag)
        |SELECT 64 AS m, zeros, r_max, CAST(sum_scaled AS BIGINT) AS sum_scaled,
        |  round(CASE WHEN (CAST(0.709 AS DOUBLE) * 4096
        |                   * CAST(CAST(1 AS BIGINT) << r_max AS DOUBLE)
        |                   / CAST(sum_scaled AS DOUBLE)) <= 160.0 AND zeros > 0
        |        THEN 64.0 * ln(64.0 / CAST(zeros AS DOUBLE))
        |        ELSE CAST(0.709 AS DOUBLE) * 4096
        |             * CAST(CAST(1 AS BIGINT) << r_max AS DOUBLE)
        |             / CAST(sum_scaled AS DOUBLE) END, 4) AS est_distinct,
        |  (SELECT count(DISTINCT o_custkey) FROM orders) AS exact_distinct
        |FROM s""".stripMargin,


    // Three replay chains from one generator; inclusion-exclusion over
    // the rounded per-side estimates.
    "q_hll_setops" -> {
      def chain(p: String, where: String): String =
        s"""${p}h AS (
           |  SELECT ('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 15))::BIGINT AS h
           |  FROM orders WHERE o_custkey IS NOT NULL AND ($where)),
           |${p}r AS (
           |  SELECT h % 64 AS reg,
           |    CASE WHEN h // 64 = 0 THEN 55
           |         ELSE CAST(round(log2((h // 64) & -(h // 64))) AS INT) + 1 END AS rho
           |  FROM ${p}h),
           |${p}regs AS (SELECT reg, max(rho) AS mrho FROM ${p}r GROUP BY reg),
           |${p}base AS (SELECT max(mrho) AS r_max, count(*) AS present FROM ${p}regs),
           |${p}ag AS (
           |  SELECT (SELECT r_max FROM ${p}base) AS r_max,
           |         CAST(64 - (SELECT present FROM ${p}base) AS BIGINT) AS zeros,
           |         sum(CAST(1 AS BIGINT) << ((SELECT r_max FROM ${p}base) - mrho)) AS sum_present
           |  FROM ${p}regs),
           |${p}fin AS (SELECT r_max, zeros,
           |        sum_present + zeros * (CAST(1 AS BIGINT) << r_max) AS sum_scaled
           |      FROM ${p}ag),
           |${p}e AS (
           |  SELECT round(CASE WHEN (CAST(0.709 AS DOUBLE) * 4096
           |                   * CAST(CAST(1 AS BIGINT) << r_max AS DOUBLE)
           |                   / CAST(sum_scaled AS DOUBLE)) <= 160.0 AND zeros > 0
           |        THEN 64.0 * ln(64.0 / CAST(zeros AS DOUBLE))
           |        ELSE CAST(0.709 AS DOUBLE) * 4096
           |             * CAST(CAST(1 AS BIGINT) << r_max AS DOUBLE)
           |             / CAST(sum_scaled AS DOUBLE) END, 4) AS est
           |  FROM ${p}fin)""".stripMargin
      s"""WITH ${chain("a", "o_orderpriority = '1-URGENT'")},
         |${chain("b", "o_orderpriority = '5-LOW'")},
         |${chain("u", "o_orderpriority IN ('1-URGENT', '5-LOW')")},
         |fl AS (
         |  SELECT o_custkey,
         |    max(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS ia,
         |    max(CASE WHEN o_orderpriority = '5-LOW' THEN 1 ELSE 0 END) AS ib
         |  FROM orders WHERE o_custkey IS NOT NULL GROUP BY 1),
         |ex AS (
         |  SELECT CAST(sum(ia) AS BIGINT) AS exact_a,
         |         CAST(sum(ib) AS BIGINT) AS exact_b,
         |         CAST(sum(ia * ib) AS BIGINT) AS exact_inter
         |  FROM fl)
         |SELECT ae.est AS est_a, be.est AS est_b, ue.est AS est_union,
         |  round(ae.est + be.est - ue.est, 4) AS est_inter_ie,
         |  exact_a, exact_b, exact_inter
         |FROM ae, be, ue, ex""".stripMargin
    },


    "q_quantiles" ->
      """SELECT
        |  round(quantile_cont(l_extendedprice, 0.25), 6) AS p25,
        |  round(quantile_cont(l_extendedprice, 0.5), 6) AS p50,
        |  round(quantile_cont(l_extendedprice, 0.75), 6) AS p75,
        |  round(quantile_cont(l_quantity, 0.9), 6) AS q90
        |FROM lineitem""".stripMargin,


    // Discrete quantiles: GK at accuracy > N is exact and rank-agrees
    // with quantile_disc (see the query's comment).
    "q_quantiles_approx" ->
      """SELECT
        |  round(quantile_disc(l_extendedprice, 0.25), 6) AS p25,
        |  round(quantile_disc(l_extendedprice, 0.5), 6) AS p50,
        |  round(quantile_disc(l_extendedprice, 0.75), 6) AS p75,
        |  round(quantile_disc(l_quantity, 0.9), 6) AS q90
        |FROM lineitem""".stripMargin,


    // graft's own GK sketch in its exact regime: same quantile_disc
    // rank convention (element at rank max(1, ceil(phi*N))).
    "q_quantiles_gk" ->
      """SELECT
        |  round(quantile_disc(l_extendedprice, 0.25), 6) AS p25,
        |  round(quantile_disc(l_extendedprice, 0.5), 6) AS p50,
        |  round(quantile_disc(l_extendedprice, 0.75), 6) AS p75,
        |  round(quantile_disc(l_quantity, 0.9), 6) AS q90
        |FROM lineitem""".stripMargin,


    "q_quantiles_gk_grouped" ->
      """SELECT l_returnflag,
        |  round(quantile_disc(l_extendedprice, 0.5), 6) AS p50,
        |  round(quantile_disc(l_extendedprice, 0.9), 6) AS p90
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,


    "q_distinct_agg" ->
      """SELECT l_returnflag,
        |  count(DISTINCT l_suppkey) AS n_supp,
        |  count(DISTINCT l_partkey) AS n_part,
        |  round(sum(DISTINCT l_quantity), 2) AS sum_d_qty
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
  )
}
