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

/** Rel slice of the [[SparkEntry]] query/oracle registry. Split from
  * the former single 15k-line entry file so scalac parallelizes across
  * domains and no single Map literal dominates compile time or method
  * size. Entry names, bodies, and oracle SQL are the driver contract,
  * byte-for-byte as they were in SparkEntry; shared fixtures and
  * oracle CTE builders stay on [[SparkEntry]] (private[graft]). */
private[graft] object RegRel {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> { (s, dir) =>
      Tables.load(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },


    // Broadcast star join: 600k-row fact × 10-row and 25-row dims.
    "q_join_agg" -> { (s, dir) =>
      val li = Tables.load(s, dir, "lineitem")
      val sup = Tables.load(s, dir, "supplier")
      val nat = Tables.load(s, dir, "nation")
      li.join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("n_name"))
    },


    "q_window" -> { (s, dir) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      Tables.load(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
        .orderBy("o_custkey", "rn")
    },


    // Skew-mitigated join: orders (the "skewed" probe side) salted into
    // 8 sub-keys, customer replicated per salt. Result must be
    // IDENTICAL to the plain join — the oracle is the unsalted SQL, so
    // the gate proves salting is a pure physical rewrite.
    "q_salted_join" -> { (s, dir) =>
      val orders = Tables.load(s, dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
      val cust = Tables.load(s, dir, "customer")
        .select(col("c_custkey").as("o_custkey"), col("c_mktsegment"))
      Salting.saltedJoin(orders, cust, Seq("o_custkey"), salts = 8)
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"),
          round(sum("o_totalprice"), 2).as("sum_price"))
        .orderBy("c_mktsegment")
    },


    // Runtime bloom-filter semi-join pruning: a selective dim filter
    // (urgent + high-value orders, ~12%) becomes a bloom filter over
    // the dim keys, probed on the fact side BEFORE the join's shuffle
    // (graft.operators.BloomJoin, codegen graft_might_contain). The
    // 100 TB lever: shuffled fact volume drops to selectivity + fpp of
    // the input. Answer-invariant by construction — the oracle is the
    // plain join.
    "q_bloom_join" -> { (s, dir) =>
      val li = Tables.load(s, dir, "lineitem")
        .select("l_orderkey", "l_quantity", "l_extendedprice")
      val sel = Tables.load(s, dir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT" && col("o_totalprice") > 200000)
        .select("o_orderkey", "o_orderpriority")
      BloomJoin.bloomPrunedJoin(li, sel, "l_orderkey", "o_orderkey")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"),
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_price"))
        .orderBy("o_orderpriority")
    },


    // Per-registrable-domain aggregation off the same canonical key —
    // the grouping every per-domain quality signal (grouped sketches,
    // PageRank priors) hangs off.
    "q_domain_stats" -> { (s, dir) =>
      val u = syntheticUrls(s, dir)
      u.select(graft.text.UrlOps.host(col("url")).as("host"),
          graft.text.UrlOps.urlDomain(col("url")).as("domain"))
        .groupBy("domain")
        .agg(count(lit(1)).as("n_urls"),
          countDistinct(col("host")).as("n_hosts"))
        .orderBy("domain")
    },


    // Wide→long reshape (unpivot via stack): three measure columns
    // melted to (measure, val) rows — the normalization step before
    // long-form stats — then re-aggregated to stay compact.
    "q_unpivot" -> { (s, dir) =>
      Tables.load(s, dir, "lineitem")
        .select(expr("stack(3, 'discount', l_discount, 'quantity', l_quantity, " +
          "'tax', l_tax) AS (measure, val)"))
        .groupBy("measure")
        .agg(count(lit(1)).as("n"), round(sum(col("val")), 2).as("sum_val"))
        .orderBy("measure")
    },


    // Per-group decile bucketing (feature binning): ntile(10) within
    // each market segment, ordered by (acctbal, custkey) so ties are
    // deterministic. Scale note: the sort is per-SEGMENT (keyed window
    // shuffle), not a global order — the form that survives 100 TB;
    // a global ntile would single-partition the sort.
    "q_ntile" -> { (s, dir) =>
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("c_acctbal"), col("c_custkey"))
      Tables.load(s, dir, "customer")
        .select(col("c_custkey"), col("c_mktsegment"),
          ntile(10).over(w).as("decile"))
        .orderBy("c_custkey")
    },


    // Star-join rollup across the full dimension chain (region →
    // nation → customer → orders): revenue per region per order year.
    // Every dimension is broadcast (region 5 rows, nation 25, customer
    // corpus-fraction-sized but dimension-class) so the fact table
    // never shuffles for the joins — the canonical 100 TB star shape.
    "q_star_join" -> { (s, dir) =>
      val region = Tables.load(s, dir, "region")
        .select(col("r_regionkey"), col("r_name"))
      val nation = Tables.load(s, dir, "nation")
        .select(col("n_nationkey"), col("n_regionkey"))
      val customer = Tables.load(s, dir, "customer")
        .select(col("c_custkey"), col("c_nationkey"))
      val orders = Tables.load(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderdate"), col("o_totalprice"))
      orders
        .join(broadcast(customer), col("o_custkey") === col("c_custkey"))
        .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), year(col("o_orderdate")).as("o_year"))
        .agg(count(lit(1)).as("n_orders"),
          round(sum(col("o_totalprice")), 2).as("revenue"))
        .orderBy("r_name", "o_year")
    },


    // AMS / count-sketch join-cardinality estimation (the optimizer
    // statistic): |orders ⋈ events| predicted from two independently
    // built signed-hash sketches — the join itself never runs; the
    // median of per-row inner products is an unbiased estimate with
    // stderr ≈ √(F₂·F₂/width) (stats/AmsJoinSize). Cell and sign read
    // disjoint md5 bits, the estimate is an integer order statistic,
    // so it faces the oracle; the exact size (computed join-free from
    // per-key counts) rides along as the cross-check.
    "q_join_size" -> { (s, dir) =>
      val o = Tables.load(s, dir, "orders").select("o_custkey")
      val e = Tables.load(s, dir, "events").select("user_id")
      val est = graft.stats.AmsJoinSize.estimate(
        o, "o_custkey", e, "user_id", depth = 5, width = 1024)
      val ca = o.where(col("o_custkey").isNotNull)
        .groupBy(col("o_custkey").as("k")).agg(count(lit(1)).as("na"))
      val cb = e.where(col("user_id").isNotNull)
        .groupBy(col("user_id").as("k")).agg(count(lit(1)).as("nb"))
      val exact = ca.join(cb, "k")
        .agg(sum(col("na") * col("nb")).as("exact_join"))
      est.crossJoin(exact)
        .withColumn("err_pct",
          round(abs(col("est_join") - col("exact_join")).cast("double") /
            col("exact_join") * 100, 4))
    },


    // The registered SQL-function surface end to end under the oracle
    // gate: a pure spark.sql query through graft_doc_profile — the
    // fingerprint/token-count/quality/lang-id quartet fused into ONE
    // scan kernel (graft.text.DocProfileExpr; the four individual
    // functions each re-tokenize, ~12 regex passes per row — they
    // remain registered for à-la-carte use and GraftFunctionsSpec pins
    // kernel ≡ singles). Same output schema and oracle as the
    // four-function form it replaced; only the pass count changed.
    "q_sql_functions" -> { (s, dir) =>
      graft.sql.GraftFunctions.register(s)
      Tables.load(s, dir, "documents").createOrReplaceTempView("graft_docs_fn")
      s.sql(
        """SELECT doc_id, p.fp AS fp, p.n_tokens AS n_tokens,
          |  p.quality AS quality, p.lang_pred AS lang_pred
          |FROM (SELECT doc_id, graft_doc_profile(text) AS p FROM graft_docs_fn)
          |ORDER BY doc_id""".stripMargin)
    },


    // Range join (point-in-interval) via bucket decomposition — an
    // equi-join on bucket ids, never the BroadcastNestedLoopJoin the
    // naive BETWEEN theta-join plans to (graft.operators.RangeJoin).
    // 25 overlapping price bands from nation × 600k lineitem points.
    "q_range_join" -> { (s, dir) =>
      val li = Tables.load(s, dir, "lineitem")
      val bands = Tables.load(s, dir, "nation").select(
        col("n_nationkey").as("band_id"),
        (col("n_nationkey") * 4000.0).as("lo"),
        (col("n_nationkey") * 4000.0 + 12000.0).as("hi"))
      RangeJoin.pointInInterval(li, "l_extendedprice", bands, "lo", "hi",
        bucketWidth = 4000.0)
        .groupBy(col("band_id"))
        .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("qty"))
        .orderBy("band_id")
    },


    // Pivot (crosstab aggregation) with a fixed value list.
    "q_pivot" -> { (s, dir) =>
      Tables.load(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(round(sum(col("l_quantity")), 2))
        .orderBy("l_returnflag")
    },


    // As-of join: each click matched to the user's most recent purchase
    // at or before the click (union+window plan — one keyed shuffle, no
    // inequality join blow-up; graft.operators.AsofJoin).
    "q_asof" -> { (s, dir) =>
      val ev = Tables.loadEvents(s, dir)
      val clicks = ev.filter(col("event_type") === "click")
        .select("event_id", "user_id", "ts", "value")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts", "value")
      AsofJoin.leftAsof(clicks, purchases, Seq("user_id"), "ts", "ts",
        payload = Seq("event_id", "value", "ts"), tiebreak = "event_id")
        .select(col("event_id"), col("user_id"),
          col("asof_event_id"),
          round(col("asof_value"), 6).as("asof_value"),
          expr("(unix_micros(ts) - unix_micros(asof_ts)) div 1000000").as("gap_s"))
        .orderBy("event_id")
    },


    // NEAREST as-of (pandas direction='nearest') completes the
    // backward/forward pair: closest purchase either way per click,
    // exact gap ties to the backward match. Two keyed windows joined
    // on the unique left id.
    "q_asof_nearest" -> { (s, dir) =>
      val ev = Tables.loadEvents(s, dir)
      val clicks = ev.filter(col("event_type") === "click")
        .select("event_id", "user_id", "ts", "value")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts", "value")
      AsofJoin.leftAsofNearest(clicks, purchases, Seq("user_id"),
        leftId = "event_id", leftTs = "ts", rightTs = "ts",
        payload = Seq("event_id", "value", "ts"), tiebreak = "event_id")
        .select(col("event_id"), col("user_id"),
          col("asof_event_id"),
          round(col("asof_value"), 6).as("asof_value"),
          expr("abs(unix_micros(ts) - unix_micros(asof_ts)) div 1000000")
            .as("gap_s"))
        .orderBy("event_id")
    },


    // FORWARD as-of join (pandas merge_asof direction='forward'): each
    // click matched to the user's NEXT purchase at or after the click
    // — the conversion-attribution shape. Same union+window plan,
    // frame mirrored (currentRow..following, first ignoreNulls); ties
    // at equal ts resolve to the smallest purchase event_id.
    "q_asof_forward" -> { (s, dir) =>
      val ev = Tables.loadEvents(s, dir)
      val clicks = ev.filter(col("event_type") === "click")
        .select("event_id", "user_id", "ts", "value")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts", "value")
      AsofJoin.leftAsofForward(clicks, purchases, Seq("user_id"), "ts", "ts",
        payload = Seq("event_id", "value", "ts"), tiebreak = "event_id")
        .select(col("event_id"), col("user_id"),
          col("asof_event_id"),
          round(col("asof_value"), 6).as("asof_value"),
          expr("(unix_micros(asof_ts) - unix_micros(ts)) div 1000000").as("gap_s"))
        .orderBy("event_id")
    },


    // Backward as-of with a TOLERANCE horizon: matches older than 6
    // hours null out (merge_asof tolerance semantics) — "recent state
    // or nothing", the cache-validity join shape.
    "q_asof_tolerance" -> { (s, dir) =>
      val ev = Tables.loadEvents(s, dir)
      val clicks = ev.filter(col("event_type") === "click")
        .select("event_id", "user_id", "ts", "value")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts", "value")
      AsofJoin.leftAsof(clicks, purchases, Seq("user_id"), "ts", "ts",
        payload = Seq("event_id", "value", "ts"), tiebreak = "event_id",
        toleranceMicros = Some(6L * 3600 * 1000000))
        .select(col("event_id"), col("user_id"),
          col("asof_event_id"),
          round(col("asof_value"), 6).as("asof_value"))
        .orderBy("event_id")
    },


    // Set operations: customers with orders over the median-ish bar in
    // both halves of the date range (INTERSECT), and only-first-half
    // (EXCEPT) — distinct set semantics, shuffle on the key.
    "q_setops" -> { (s, dir) =>
      val o = Tables.load(s, dir, "orders")
      val firstHalf = o.filter(col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
        .select("o_custkey")
      val secondHalf = o.filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp"))
        .select("o_custkey")
      val both = firstHalf.intersect(secondHalf).withColumn("tag", lit("both"))
      val onlyFirst = firstHalf.except(secondHalf).withColumn("tag", lit("first_only"))
      both.unionByName(onlyFirst).orderBy("tag", "o_custkey")
    },


    // ROLLUP grouping sets with explicit subtotal labels.
    // Explicit GROUPING SETS (the general form rollup/cube sugar over):
    // two non-hierarchical aggregation grains in one pass, plus
    // grouping_id to disambiguate NULL-as-ALL from NULL data.
    "q_grouping_sets" -> { (s, dir) =>
      Tables.load(s, dir, "lineitem").createOrReplaceTempView("li_gs")
      s.sql(
        """SELECT coalesce(l_returnflag, 'ALL') AS rf,
          |  coalesce(l_linestatus, 'ALL') AS ls,
          |  grouping(l_returnflag) * 2 + grouping(l_linestatus) AS gid,
          |  count(*) AS n, round(sum(l_extendedprice), 2) AS rev
          |FROM li_gs
          |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
          |ORDER BY gid, rf, ls""".stripMargin)
    },


    "q_rollup" -> { (s, dir) =>
      Tables.load(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("qty"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
          col("n"), col("qty"))
        .orderBy("rf", "ls")
    },


    // CUBE sibling of q_rollup: all 2^d grouping sets (adds the
    // (·, linestatus) margins rollup omits). Same single-shuffle
    // Expand-based plan family.
    "q_cube" -> { (s, dir) =>
      Tables.load(s, dir, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("qty"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
          col("n"), col("qty"))
        .orderBy("rf", "ls")
    },


    // Grid-blocked ε-neighbor spatial self-join: every customer pair
    // within 4000 integer units on a deterministic md5-derived 100k ×
    // 100k plane. The oracle is the O(n²) brute-force distance join —
    // the hash match proves the 9-cell grid plan loses no boundary
    // pair (exact integer dist², no float circle). The registered plan
    // is the one-shuffle blocked join; brute force exists only inside
    // the oracle.
    "q_spatial_join" -> { (s, dir) =>
      def coord(salt: String) = conv(substring(md5(
        concat(lit(salt + "|"), col("c_custkey").cast("string"))),
        1, 15), 16, 10).cast("long") % 100000L
      val pts = Tables.load(s, dir, "customer").select(
        col("c_custkey").as("id"),
        coord("sx9").as("x"), coord("sy9").as("y"))
      graft.operators.SpatialJoin.epsNeighbors(pts, "id", "x", "y", 4000L)
        .orderBy("a_id", "b_id")
    },
  )

  val oracles: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc,
        |  count(*) AS n
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,


    "q_join_agg" ->
      """SELECT n_name,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,


    "q_window" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        |  FROM orders) WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,


    // The UNSALTED join — salting is a physical rewrite, the answer
    // must not move.
    "q_salted_join" ->
      """SELECT c_mktsegment, count(*) AS n,
        |  round(sum(o_totalprice), 2) AS sum_price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,


    // The plain join — bloom pruning is a physical-plan optimization,
    // the answer must not move (false positives die in the join).
    "q_bloom_join" ->
      """SELECT o_orderpriority, count(*) AS n,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_price
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 200000
        |GROUP BY 1 ORDER BY 1""".stripMargin,


    "q_domain_stats" ->
      ("WITH " + urlCanonCtes() + """
        |SELECT domain, CAST(count(*) AS BIGINT) AS n_urls,
        |  CAST(count(DISTINCT host) AS BIGINT) AS n_hosts
        |FROM canon GROUP BY 1 ORDER BY 1""".stripMargin),


    "q_unpivot" ->
      """SELECT measure, count(*) AS n, round(sum(val), 2) AS sum_val
        |FROM (
        |  SELECT 'discount' AS measure, l_discount AS val FROM lineitem
        |  UNION ALL SELECT 'quantity', l_quantity FROM lineitem
        |  UNION ALL SELECT 'tax', l_tax FROM lineitem)
        |GROUP BY 1 ORDER BY 1""".stripMargin,


    "q_ntile" ->
      """SELECT c_custkey, c_mktsegment,
        |  CAST(ntile(10) OVER (PARTITION BY c_mktsegment
        |                       ORDER BY c_acctbal, c_custkey) AS INT) AS decile
        |FROM customer ORDER BY c_custkey""".stripMargin,


    "q_star_join" ->
      """SELECT r.r_name, CAST(year(o.o_orderdate) AS INT) AS o_year,
        |  CAST(count(*) AS BIGINT) AS n_orders,
        |  round(sum(o.o_totalprice), 2) AS revenue
        |FROM orders o
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |JOIN region r ON n.n_regionkey = r.r_regionkey
        |GROUP BY 1, 2 ORDER BY r.r_name, o_year""".stripMargin,


    // Sketches replayed cell-for-cell; sign = the md5 bit above the
    // cell bits; median = 3rd of the 5 sorted per-row inner products.
    "q_join_size" ->
      """WITH js AS (SELECT unnest([0, 1, 2, 3, 4]) AS j),
        |ca AS (
        |  SELECT js.j,
        |    (('0x' || substr(md5(js.j || ':' || CAST(o_custkey AS VARCHAR)), 1, 15))::BIGINT % 1024) AS cell,
        |    sum(CASE WHEN ((('0x' || substr(md5(js.j || ':' || CAST(o_custkey AS VARCHAR)), 1, 15))::BIGINT // 1024) % 2) = 0
        |             THEN 1 ELSE -1 END) AS sa
        |  FROM orders CROSS JOIN js WHERE o_custkey IS NOT NULL GROUP BY 1, 2),
        |cb AS (
        |  SELECT js.j,
        |    (('0x' || substr(md5(js.j || ':' || CAST(user_id AS VARCHAR)), 1, 15))::BIGINT % 1024) AS cell,
        |    sum(CASE WHEN ((('0x' || substr(md5(js.j || ':' || CAST(user_id AS VARCHAR)), 1, 15))::BIGINT // 1024) % 2) = 0
        |             THEN 1 ELSE -1 END) AS sb
        |  FROM events CROSS JOIN js WHERE user_id IS NOT NULL GROUP BY 1, 2),
        |ip AS (SELECT ca.j, sum(ca.sa * cb.sb) AS ip
        |       FROM ca JOIN cb ON ca.j = cb.j AND ca.cell = cb.cell GROUP BY 1),
        |f AS (SELECT js.j, coalesce(ip.ip, 0) AS ip FROM js LEFT JOIN ip ON js.j = ip.j),
        |est AS (SELECT list_sort(list(ip)) AS ips FROM f),
        |exa AS (
        |  SELECT CAST(sum(na * nb) AS BIGINT) AS exact_join FROM
        |    (SELECT o_custkey AS k, count(*) AS na FROM orders
        |     WHERE o_custkey IS NOT NULL GROUP BY 1) a
        |    JOIN
        |    (SELECT user_id AS k, count(*) AS nb FROM events
        |     WHERE user_id IS NOT NULL GROUP BY 1) b USING (k))
        |SELECT CAST(5 AS BIGINT) AS depth, CAST(1024 AS BIGINT) AS width,
        |  CAST(ips[3] AS BIGINT) AS est_join, exact_join,
        |  round(abs(CAST(ips[3] AS BIGINT) - exact_join) / CAST(exact_join AS DOUBLE) * 100, 4) AS err_pct
        |FROM est, exa""".stripMargin,


    // The md5 fingerprint, token count, quality formula, and lang
    // argmax — exactly the q_dedup_exact / q_text_stats / q_lang_id
    // expression trees, through the SQL-function names.
    "q_sql_functions" ->
      """WITH t AS (
        |  SELECT doc_id, text,
        |    list_filter(regexp_split_to_array(lower(text), '\s+'), x -> len(x) > 0) AS toks,
        |    regexp_replace(text, '\s+', '', 'g') AS nosp
        |  FROM documents),
        |m AS (
        |  SELECT doc_id,
        |    md5(array_to_string(toks, ' ')) AS fp,
        |    len(toks) AS n_tokens,
        |    CASE WHEN len(toks) > 0
        |      THEN CAST(len(list_filter(toks, x -> x IN ('the','a','an','of','to','and','in','is','it','that'))) AS DOUBLE) / len(toks)
        |      ELSE 0.0 END AS stopword_ratio,
        |    CASE WHEN len(nosp) > 0
        |      THEN CAST(len(regexp_replace(nosp, '[a-zA-Z0-9]', '', 'g')) AS DOUBLE) / len(nosp)
        |      ELSE 0.0 END AS punct_ratio,
        |    len(list_filter(toks, x -> x IN ('der','die','das','und','nicht','ist'))) AS s_de,
        |    len(list_filter(toks, x -> x IN ('the','a','of','and','is','to'))) AS s_en,
        |    len(list_filter(toks, x -> x IN ('el','la','de','que','y','es'))) AS s_es,
        |    len(list_filter(toks, x -> x IN ('le','la','les','et','est','que'))) AS s_fr,
        |    len(list_filter(toks, x -> x IN ('de5','shi4','le5','bu4','wo3','ni3'))) AS s_zh
        |  FROM t)
        |SELECT doc_id, fp, n_tokens,
        |  round(0.5 * (least(CAST(n_tokens AS DOUBLE) / 20.0, 1.0)
        |               * least(1.0, 500.0 / greatest(CAST(n_tokens AS DOUBLE), 1.0)))
        |      + 0.3 * least(stopword_ratio * 5.0, 1.0)
        |      + 0.2 * (1.0 - least(punct_ratio * 2.0, 1.0)), 6) AS quality,
        |  CASE WHEN greatest(s_de, s_en, s_es, s_fr, s_zh) = 0 THEN 'und'
        |       WHEN s_de = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'de'
        |       WHEN s_en = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'en'
        |       WHEN s_es = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'es'
        |       WHEN s_fr = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'fr'
        |       ELSE 'zh' END AS lang_pred
        |FROM m ORDER BY doc_id""".stripMargin,


    "q_range_join" ->
      """SELECT n_nationkey AS band_id, count(*) AS n,
        |  round(sum(l_quantity), 2) AS qty
        |FROM nation JOIN lineitem
        |  ON l_extendedprice >= n_nationkey * 4000.0
        | AND l_extendedprice <= n_nationkey * 4000.0 + 12000.0
        |GROUP BY 1 ORDER BY 1""".stripMargin,


    "q_pivot" ->
      """SELECT l_returnflag,
        |  round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2) AS F,
        |  round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2) AS O
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,


    // Window-reformulated as-of join (DuckDB's native ASOF JOIN leaves
    // equal-ts ties implementation-defined; the explicit row_number
    // formulation pins the same tie-break as the engine: latest ts,
    // then max event_id).
    "q_asof" ->
      """WITH clicks AS (
        |  SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'click'),
        |purch AS (
        |  SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'),
        |j AS (
        |  SELECT c.event_id, c.user_id,
        |    p.event_id AS asof_event_id,
        |    round(p.value, 6) AS asof_value,
        |    (epoch_us(c.ts) - epoch_us(p.ts)) // 1000000 AS gap_s,
        |    row_number() OVER (PARTITION BY c.event_id
        |      ORDER BY p.ts DESC, p.event_id DESC) AS rn
        |  FROM clicks c LEFT JOIN purch p
        |    ON p.user_id = c.user_id AND p.ts <= c.ts)
        |SELECT event_id, user_id, asof_event_id, asof_value, gap_s
        |FROM j WHERE rn = 1 ORDER BY event_id""".stripMargin,


    // Both direction candidates ranked, then the identical
    // choose-backward-on-tie arbitration.
    "q_asof_nearest" ->
      """WITH clicks AS (
        |  SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'click'),
        |purch AS (
        |  SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'),
        |b AS (
        |  SELECT c.event_id, p.event_id AS b_id, p.value AS b_value, p.ts AS b_ts,
        |    row_number() OVER (PARTITION BY c.event_id
        |      ORDER BY p.ts DESC, p.event_id DESC) AS rn
        |  FROM clicks c LEFT JOIN purch p
        |    ON p.user_id = c.user_id AND p.ts <= c.ts),
        |f AS (
        |  SELECT c.event_id, p.event_id AS f_id, p.value AS f_value, p.ts AS f_ts,
        |    row_number() OVER (PARTITION BY c.event_id
        |      ORDER BY p.ts ASC, p.event_id ASC) AS rn
        |  FROM clicks c LEFT JOIN purch p
        |    ON p.user_id = c.user_id AND p.ts >= c.ts),
        |j AS (
        |  SELECT c.event_id, c.user_id, c.ts,
        |    CASE WHEN b.b_ts IS NOT NULL AND (f.f_ts IS NULL
        |           OR epoch_us(c.ts) - epoch_us(b.b_ts) <= epoch_us(f.f_ts) - epoch_us(c.ts))
        |         THEN b.b_id ELSE f.f_id END AS asof_event_id,
        |    CASE WHEN b.b_ts IS NOT NULL AND (f.f_ts IS NULL
        |           OR epoch_us(c.ts) - epoch_us(b.b_ts) <= epoch_us(f.f_ts) - epoch_us(c.ts))
        |         THEN b.b_value ELSE f.f_value END AS asof_value,
        |    CASE WHEN b.b_ts IS NOT NULL AND (f.f_ts IS NULL
        |           OR epoch_us(c.ts) - epoch_us(b.b_ts) <= epoch_us(f.f_ts) - epoch_us(c.ts))
        |         THEN b.b_ts ELSE f.f_ts END AS asof_ts
        |  FROM clicks c
        |  JOIN b ON b.event_id = c.event_id AND b.rn = 1
        |  JOIN f ON f.event_id = c.event_id AND f.rn = 1)
        |SELECT event_id, user_id, asof_event_id,
        |  round(asof_value, 6) AS asof_value,
        |  abs(epoch_us(ts) - epoch_us(asof_ts)) // 1000000 AS gap_s
        |FROM j ORDER BY event_id""".stripMargin,


    // Forward mirror: earliest purchase at/after the click, ties to
    // the smallest event_id.
    "q_asof_forward" ->
      """WITH clicks AS (
        |  SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'click'),
        |purch AS (
        |  SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'),
        |j AS (
        |  SELECT c.event_id, c.user_id,
        |    p.event_id AS asof_event_id,
        |    round(p.value, 6) AS asof_value,
        |    (epoch_us(p.ts) - epoch_us(c.ts)) // 1000000 AS gap_s,
        |    row_number() OVER (PARTITION BY c.event_id
        |      ORDER BY p.ts ASC, p.event_id ASC) AS rn
        |  FROM clicks c LEFT JOIN purch p
        |    ON p.user_id = c.user_id AND p.ts >= c.ts)
        |SELECT event_id, user_id, asof_event_id, asof_value, gap_s
        |FROM j WHERE rn = 1 ORDER BY event_id""".stripMargin,


    // Backward join with the 6-hour lookback applied AFTER match
    // selection (a too-old match nulls out, it does not fall through
    // to an older-still row) — the merge_asof tolerance contract.
    "q_asof_tolerance" ->
      """WITH clicks AS (
        |  SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'click'),
        |purch AS (
        |  SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'),
        |j AS (
        |  SELECT c.event_id, c.user_id, c.ts AS cts, p.ts AS pts,
        |    p.event_id AS m_event_id, round(p.value, 6) AS m_value,
        |    row_number() OVER (PARTITION BY c.event_id
        |      ORDER BY p.ts DESC, p.event_id DESC) AS rn
        |  FROM clicks c LEFT JOIN purch p
        |    ON p.user_id = c.user_id AND p.ts <= c.ts)
        |SELECT event_id, user_id,
        |  CASE WHEN epoch_us(cts) - epoch_us(pts) <= 21600000000 THEN m_event_id END AS asof_event_id,
        |  CASE WHEN epoch_us(cts) - epoch_us(pts) <= 21600000000 THEN m_value END AS asof_value
        |FROM j WHERE rn = 1 ORDER BY event_id""".stripMargin,


    "q_setops" ->
      """WITH f AS (SELECT DISTINCT o_custkey FROM orders
        |           WHERE o_orderdate < TIMESTAMP '1997-01-01'),
        |     s AS (SELECT DISTINCT o_custkey FROM orders
        |           WHERE o_orderdate >= TIMESTAMP '1997-01-01')
        |SELECT o_custkey, tag FROM (
        |  SELECT o_custkey, 'both' AS tag
        |  FROM (SELECT o_custkey FROM f INTERSECT SELECT o_custkey FROM s)
        |  UNION ALL
        |  SELECT o_custkey, 'first_only' AS tag
        |  FROM (SELECT o_custkey FROM f EXCEPT SELECT o_custkey FROM s))
        |ORDER BY tag, o_custkey""".stripMargin,


    "q_grouping_sets" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS rf,
        |  coalesce(l_linestatus, 'ALL') AS ls,
        |  grouping(l_returnflag) * 2 + grouping(l_linestatus) AS gid,
        |  count(*) AS n, round(sum(l_extendedprice), 2) AS rev
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY gid, rf, ls""".stripMargin,


    "q_rollup" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS rf,
        |  coalesce(l_linestatus, 'ALL') AS ls,
        |  count(*) AS n, round(sum(l_quantity), 2) AS qty
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY rf, ls""".stripMargin,


    "q_cube" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS rf,
        |  coalesce(l_linestatus, 'ALL') AS ls,
        |  count(*) AS n, round(sum(l_quantity), 2) AS qty
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY rf, ls""".stripMargin,


    // Brute-force distance self-join — the lossless mirror of the
    // 9-cell grid plan. Same md5 coordinate derivation, exact integer
    // dist² at the boundary circle.
    "q_spatial_join" ->
      """WITH p AS (
        |  SELECT c_custkey AS id,
        |    ('0x' || substr(md5('sx9|' || CAST(c_custkey AS VARCHAR)), 1, 15))::BIGINT % 100000 AS x,
        |    ('0x' || substr(md5('sy9|' || CAST(c_custkey AS VARCHAR)), 1, 15))::BIGINT % 100000 AS y
        |  FROM customer)
        |SELECT a.id AS a_id, b.id AS b_id,
        |  (a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y) AS dist2
        |FROM p a JOIN p b
        |  ON a.id < b.id
        |  AND (a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y) <= 4000*4000
        |ORDER BY a_id, b_id""".stripMargin,
  )
}
