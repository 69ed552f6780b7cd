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

/** Graph slice of the [[SparkEntry]] query/oracle registry. Split from
  * the former single 15k-line entry file so scalac parallelizes across
  * domains and no single Map literal dominates compile time or method
  * size. Entry names, bodies, and oracle SQL are the driver contract,
  * byte-for-byte as they were in SparkEntry; shared fixtures and
  * oracle CTE builders stay on [[SparkEntry]] (private[graft]). */
private[graft] object RegGraph {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // HIERARCHICAL SUBTREE ROLLUP (BOM explosion) over the formula
    // tree parent(k)=k DIV 7 on customer ids: every ancestor's
    // order-count and cents totals. NOT a recursive self-join per
    // level — the ancestor closure is an in-row array, so the whole
    // rollup is one explode + ONE keyed aggregate regardless of depth
    // (graft.operators.Hierarchy; scalar-equivalence in
    // HierarchySpec). Output: the 57 depth-≤2 ancestors.
    "q_hierarchy_rollup" -> { (s, dir) =>
      val vals = Tables.load(s, dir, "orders")
        .groupBy(col("o_custkey").as("node"))
        .agg(count(lit(1)).as("n_orders"),
          sum((col("o_totalprice").cast("decimal(18,2)") * 100)
            .cast("long")).as("cents"))
      graft.operators.Hierarchy.rollup(vals, "node", fanout = 7,
          levels = 10, measures = Seq("n_orders", "cents"))
        .filter(col("anc") < 57)
        .orderBy("anc")
    },


    // Deterministic PageRank over the customer→supplier purchase graph
    // (damped power iteration, dangling-mass redistribution; supplier
    // node ids offset by 1e6 to disjoin the two key spaces). The
    // host/domain quality prior of a web-scale corpus pipeline, under
    // a fully unrolled 3-iteration CTE replay — the k-means oracle
    // treatment applied to graph iteration (graft.graph.PageRank).
    "q_pagerank" -> { (s, dir) =>
      val o = Tables.load(s, dir, "orders").select("o_orderkey", "o_custkey")
      val li = Tables.load(s, dir, "lineitem").select("l_orderkey", "l_suppkey")
      val edges = o.join(li, col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("src"),
          (col("l_suppkey") + 1000000L).as("dst"))
        .distinct()
      graft.graph.PageRank.pageRank(edges, "src", "dst", iters = 3)
        .orderBy("id")
    },


    // HOST-level PageRank from URLs — the composition VERDICT r8
    // motivated (PageRank as a crawl-source quality prior needs an
    // edge list PRODUCED from URLs): each synthetic page links to the
    // page of a key-shifted customer, both endpoints reduced to hosts
    // through the REAL UrlOps parser (trim → authority → userinfo/port
    // strip → lowercase), self-links dropped, then 3 damped
    // iterations over the ~200-host graph. At 100 TB the host graph
    // is tiny next to the page corpus — exactly why host rank is the
    // practical prior.
    "q_host_rank" -> { (s, dir) =>
      val o = Tables.load(s, dir, "orders")
      val src = graft.text.UrlOps.host(
        syntheticUrlExpr(col("o_custkey"), col("o_orderkey")))
      val dst = graft.text.UrlOps.host(
        syntheticUrlExpr(pmod(col("o_custkey") * 7 + 3, lit(1000)),
          col("o_orderkey") + 1))
      // Exchange barrier before filter/distinct: CollapseProject would
      // re-inline the URL host expressions into every consumer (~4-6
      // evaluations per row — the Triangles.count lesson).
      val edges = o.select(src.as("src"), dst.as("dst"))
        .repartition(col("src"), col("dst"))
        .filter(col("src") =!= col("dst"))
        .distinct()
      graft.graph.PageRank.pageRank(edges, "src", "dst", iters = 3)
        .orderBy("id")
    },


    // HITS hub/authority over the same host graph (graph/Hits) — the
    // PageRank complement: hubs seed a crawl frontier, authorities
    // weight documents. Runs UNNORMALIZED on exact DECIMAL(38,0)
    // accumulators (h₀=1, every score an integer sum of integers — no
    // float order risk anywhere), max-normalizing only at the end with
    // one double division per side. Two cached edge layouts (by src
    // and by dst) give both join directions a co-located read; each
    // half-iteration is one keyed join+agg and a lineage-truncating
    // snapshot.
    "q_hits" -> { (s, dir) =>
      val o = Tables.load(s, dir, "orders")
      val src = graft.text.UrlOps.host(
        syntheticUrlExpr(col("o_custkey"), col("o_orderkey")))
      val dst = graft.text.UrlOps.host(
        syntheticUrlExpr(pmod(col("o_custkey") * 7 + 3, lit(1000)),
          col("o_orderkey") + 1))
      val edges = o.select(src.as("src"), dst.as("dst"))
        .repartition(col("src"), col("dst"))
        .filter(col("src") =!= col("dst"))
        .distinct()
      graft.graph.Hits.hits(edges, "src", "dst", iters = 2)
        .orderBy("id")
    },


    // PERSONALIZED PageRank from a trusted seed set (the .example.com
    // hosts): teleports land on the seeds, so authority flows OUTWARD
    // from them — the crawl-seed-expansion / trust-propagation
    // primitive. Same one-action-per-iteration scaffold as q_pagerank
    // (NULL-keyed dangling row, in-plan base, round-to-6 contract);
    // the only driver scalar is |seeds|.
    "q_ppr" -> { (s, dir) =>
      val o = Tables.load(s, dir, "orders")
      val src = graft.text.UrlOps.host(
        syntheticUrlExpr(col("o_custkey"), col("o_orderkey")))
      val dst = graft.text.UrlOps.host(
        syntheticUrlExpr(pmod(col("o_custkey") * 7 + 3, lit(1000)),
          col("o_orderkey") + 1))
      val edges = o.select(src.as("src"), dst.as("dst"))
        .repartition(col("src"), col("dst"))
        .filter(col("src") =!= col("dst"))
        .distinct()
      graft.graph.PageRank.personalized(edges, "src", "dst",
          seedPred = col("id").endsWith(".example.com"), iters = 3)
        .orderBy("id")
    },


    // Degree audit of the same host graph (crawl-frontier health:
    // fan-out per host, link-farm outliers): in/out/total degree per
    // node over the deduped directed edges, top-10 by (total desc,
    // id) — two keyed aggs + one outer merge, WindowGroupLimit trim.
    "q_graph_degrees" -> { (s, dir) =>
      val o = Tables.load(s, dir, "orders")
      val src = graft.text.UrlOps.host(
        syntheticUrlExpr(col("o_custkey"), col("o_orderkey")))
      val dst = graft.text.UrlOps.host(
        syntheticUrlExpr(pmod(col("o_custkey") * 7 + 3, lit(1000)),
          col("o_orderkey") + 1))
      val edges = o.select(src.as("src"), dst.as("dst"))
        .repartition(col("src"), col("dst"))
        .filter(col("src") =!= col("dst"))
        .distinct()
      val outDeg = edges.groupBy(col("src").as("id"))
        .agg(count(lit(1)).as("out_deg"))
      val inDeg = edges.groupBy(col("dst").as("id"))
        .agg(count(lit(1)).as("in_deg"))
      outDeg.join(inDeg, Seq("id"), "full_outer")
        .select(col("id"),
          coalesce(col("in_deg"), lit(0L)).as("in_deg"),
          coalesce(col("out_deg"), lit(0L)).as("out_deg"))
        .withColumn("total_deg", col("in_deg") + col("out_deg"))
        .orderBy(col("total_deg").desc, col("id").asc)
        .limit(10)
    },


    // BFS hop distance in the (symmetrized) customer–supplier purchase
    // graph from the smallest node — "how many purchase hops away is
    // everyone from this customer", the reachability/graph-distance
    // feature of a link or interaction graph. Pregel-style frontier
    // expansion against the src-co-located edge cache, one keyed join
    // + one anti-join per round, until the frontier drains (4 layers
    // here). Distances are exact integers; the oracle replays the
    // frontier as a depth-capped recursive CTE.
    "q_bfs" -> { (s, dir) =>
      val o = Tables.load(s, dir, "orders").select("o_orderkey", "o_custkey")
      val li = Tables.load(s, dir, "lineitem").select("l_orderkey", "l_suppkey")
      val base = o.join(li, col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("src"),
          (col("l_suppkey") + 1000000L).as("dst"))
        .distinct()
      val edges = base.unionAll(
        base.select(col("dst").as("src"), col("src").as("dst")))
      val nodes = edges.select(col("src").as("id")).distinct()
      val seed = nodes.orderBy("id").limit(1)
      graft.graph.ShortestPath.hopDistances(edges, "src", "dst", seed,
        maxIters = 10).orderBy("id")
    },


    // Closeness centrality of the 4 lowest-id customers over the same
    // bipartite customer–supplier host graph as q_bfs: per-seed BFS
    // with (seed, id)-keyed frontier state (graph/Closeness — k seeds
    // share one edge co-location, NOT k sequential passes). Exact
    // integer output (n_reached, sum_dist, ecc); the closeness ratio
    // (n_reached−1)/sum_dist stays rational, never floated.
    "q_closeness" -> { (s, dir) =>
      val o = Tables.load(s, dir, "orders").select("o_orderkey", "o_custkey")
      val li = Tables.load(s, dir, "lineitem").select("l_orderkey", "l_suppkey")
      val base = o.join(li, col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("src"),
          (col("l_suppkey") + 1000000L).as("dst"))
        .distinct()
      val edges = base.unionAll(
        base.select(col("dst").as("src"), col("src").as("dst")))
      val seeds = edges.select(col("src").as("id")).distinct()
        .orderBy("id").limit(4)
      graft.graph.Closeness.closeness(edges, "src", "dst", seeds,
        maxIters = 10).orderBy("seed")
    },


    // Harmonic centrality of the same seeds — the disconnection-robust
    // centrality (unreachable nodes contribute 0, not ∞), exact in
    // 1/2520 units: 2520 = lcm(1..10) divides every ≤10-hop distance,
    // so Σ 2520/d is pure integer algebra (graph/Closeness).
    "q_harmonic" -> { (s, dir) =>
      val o = Tables.load(s, dir, "orders").select("o_orderkey", "o_custkey")
      val li = Tables.load(s, dir, "lineitem").select("l_orderkey", "l_suppkey")
      val base = o.join(li, col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("src"),
          (col("l_suppkey") + 1000000L).as("dst"))
        .distinct()
      val edges = base.unionAll(
        base.select(col("dst").as("src"), col("src").as("dst")))
      val seeds = edges.select(col("src").as("id")).distinct()
        .orderBy("id").limit(4)
      graft.graph.Closeness.harmonic2520(edges, "src", "dst", seeds,
        maxIters = 10).orderBy("seed")
    },


    // DOUBLE-SWEEP diameter estimate (the iFUB/BFS-heuristic lower
    // bound every graph profiler runs first): BFS from the lowest id
    // → farthest node u (tie: min id), BFS from u → ecc(u), which
    // lower-bounds the diameter and is exact on trees. Two frontier
    // BFS passes over the shared edge cache; all-integer output
    // (graph/Closeness.perSeedDistances reused as-is).
    "q_graph_diameter" -> { (s, dir) =>
      // Same 25% sampled host graph as q_betweenness — the "sampled
      // graph profile" family shares one fixture; two full-graph BFS
      // sweeps would double the q_bfs bench cost for the same plan
      // evidence.
      val o = Tables.load(s, dir, "orders")
        .filter(col("o_orderkey") % 4 === 0)
        .select("o_orderkey", "o_custkey")
      val li = Tables.load(s, dir, "lineitem").select("l_orderkey", "l_suppkey")
      val base = o.join(li, col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("src"),
          (col("l_suppkey") + 1000000L).as("dst"))
        .distinct()
      // cache the symmetric edge frame ONCE: both sweeps (and the
      // per-sweep src-co-located copy inside perSeedDistances) read
      // it instead of re-running the o⋈li distinct per sweep.
      val edges = base.unionAll(
          base.select(col("dst").as("src"), col("src").as("dst")))
        .cache()
      val seed1 = edges.agg(min("src")).head().getLong(0)
      import s.implicits._
      def sweep(from: Long): (Long, Int, Long) = {
        val d = graft.graph.Closeness.perSeedDistances(edges, "src", "dst",
          Seq(from).toDF("id"), maxIters = 10)
        val far = d.agg(max(struct(col("dist"), (-col("id")).as("nid"))))
          .head().getStruct(0)
        (from, far.getInt(0), -far.getLong(1))
      }
      val (_, ecc1, u) = sweep(seed1)
      val (_, ecc2, w) = sweep(u)
      edges.unpersist()
      Seq((seed1, ecc1, u, ecc2, w))
        .toDF("seed", "ecc_seed", "far_node", "diameter_lb", "periphery")
    },


    // Seed-sampled Brandes betweenness of the same host graph — the
    // brokerage centrality (which nodes sit ON the shortest paths,
    // vs closeness/harmonic's "how near is everything"). Forward
    // per-seed BFS carries exact path counts σ; the backward pass
    // accumulates dependencies in EXACT 1e-6 units (the DAG only has
    // level-(L)→(L+1) edges, so ⌊σv·(10⁶+δw)/σw⌋ is pure integer
    // algebra both engines replay term-for-term). Top-20 via the
    // bounded TopK aggregate — never a global sort
    // (graft.graph.Betweenness; replica-verified in BetweennessSpec).
    "q_betweenness" -> { (s, dir) =>
      // 25% order subset (the q_triangles projection discipline): the
      // estimator's cost is rounds × |E|, and the pilot-seed form is
      // already a sample — sampling edges the same way keeps the
      // 7-round bench cost proportional without changing the plan.
      val o = Tables.load(s, dir, "orders")
        .filter(col("o_orderkey") % 4 === 0)
        .select("o_orderkey", "o_custkey")
      val li = Tables.load(s, dir, "lineitem").select("l_orderkey", "l_suppkey")
      val base = o.join(li, col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("src"),
          (col("l_suppkey") + 1000000L).as("dst"))
        .distinct()
      val edges = base.unionAll(
        base.select(col("dst").as("src"), col("src").as("dst")))
      val seeds = edges.select(col("src").as("id")).distinct()
        .orderBy("id").limit(4)
      graft.graph.Betweenness.topMicro(edges, "src", "dst", seeds,
        maxLevel = 4, k = 20).orderBy("rank")
    },


    // Triangle census of the same host graph (community structure /
    // link-farm signal on a crawl graph): degree-ordered orientation
    // caps the wedge join's fan-out at O(√m) per node — the form that
    // survives a star host at 100 TB — and every triangle counts once
    // at its orientation-minimum vertex (graft.graph.Triangles).
    // All-integer output: edges, oriented wedges, triangles.
    "q_triangles" -> { (s, dir) =>
      val o = Tables.load(s, dir, "orders")
      val src = graft.text.UrlOps.host(
        syntheticUrlExpr(col("o_custkey"), col("o_orderkey")))
      val dst = graft.text.UrlOps.host(
        syntheticUrlExpr(pmod(col("o_custkey") * 7 + 3, lit(1000)),
          col("o_orderkey") + 1))
      graft.graph.Triangles.count(
        o.select(src.as("src"), dst.as("dst")), "src", "dst")
    },


    // Weighted single-source shortest path (Bellman-Ford relaxation,
    // graph/BellmanFord): the weighted complement of q_bfs — exact
    // ≤8-edge shortest costs from the seed over symmetric integer
    // weights. Per round one keyed join from the IMPROVED-only
    // frontier + one keyed min-agg, lineage-truncated; the oracle
    // unrolls the same 8 full-relaxation rounds (frontier BF ≡ full BF
    // round-for-round).
    "q_sssp" -> { (s, dir) =>
      val o = Tables.load(s, dir, "orders").select("o_orderkey", "o_custkey")
      val li = Tables.load(s, dir, "lineitem").select("l_orderkey", "l_suppkey")
      val base = o.join(li, col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("src"),
          (col("l_suppkey") + 1000000L).as("dst"))
        .distinct()
      val eu = base
        .unionAll(base.select(col("dst").as("src"), col("src").as("dst")))
        .withColumn("w", lit(1L) + pmod(col("src") + col("dst"), lit(5L)))
      val seed = eu.agg(min(col("src")).as("id"))
      graft.graph.BellmanFord.distances(eu, "src", "dst", "w", seed,
          rounds = 8)
        .orderBy("id")
    },


    // k-core decomposition of the customer–supplier interaction graph
    // (graph-density gate: which buyers/suppliers sit in the densely
    // connected trading core vs the sparse periphery — the link-farm /
    // hub primitive on a crawl graph). k self-scales as the exact
    // 25th-percentile degree (a fixed k goes trivial as density grows
    // with SF), then iterative peeling deletes deg<k vertices to
    // fixpoint — per round one endpoint-count agg + two anti-joins,
    // lineage-truncated (graft.graph.KCore). All-integer output; the
    // oracle replays the percentile and 3 unrolled peel rounds (the
    // fixture reaches fixpoint in 1; divergence would hash-fail).
    "q_kcore" -> { (s, dir) =>
      val o = Tables.load(s, dir, "orders").select("o_orderkey", "o_custkey")
      val li = Tables.load(s, dir, "lineitem").select("l_orderkey", "l_suppkey")
      val edges = o.join(li, col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("src"),
          (col("l_suppkey") + 1000000L).as("dst"))
      val k = graft.graph.KCore.percentileDegree(edges, "src", "dst", 0.25)
      graft.graph.KCore.kCore(edges, "src", "dst", k, maxIters = 10)
        .withColumn("k", lit(k.toLong))
        .orderBy("v")
    },


    // First-order Markov transition matrix of the event stream: per
    // user, consecutive event-type pairs under a deterministic
    // (ts, event_id) order, then global transition counts and row-
    // normalized probabilities (exact-integer division — the behavioral
    // "what happens after X" model behind session analytics and
    // next-action features). One window pass + one keyed agg.
    "q_markov" -> { (s, dir) =>
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val trans = Tables.loadEvents(s, dir)
        .withColumn("next_type", lead(col("event_type"), 1).over(w))
        .filter(col("next_type").isNotNull)
        .groupBy(col("event_type").as("from_type"), col("next_type").as("to_type"))
        .agg(count(lit(1)).as("cnt"))
      trans.withColumn("prob",
        round(col("cnt").cast("double") /
          sum(col("cnt")).over(Window.partitionBy("from_type")), 6))
        .orderBy("from_type", "to_type")
    },


    // Weakly-connected components of the host link graph (the
    // q_host_rank edges): crawl-frontier connectivity — which host
    // clusters are reachable from each other. Hosts hash to the
    // repo-wide 60-bit md5 longs (cross-engine reproducible), then
    // the large/small-star rounds; names join back at the end.
    "q_host_components" -> { (s, dir) =>
      val o = Tables.load(s, dir, "orders")
      val src = graft.text.UrlOps.host(
        syntheticUrlExpr(col("o_custkey"), col("o_orderkey")))
      val dst = graft.text.UrlOps.host(
        syntheticUrlExpr(pmod(col("o_custkey") * 7 + 3, lit(1000)),
          col("o_orderkey") + 1))
      // ONE url-extract scan: the distinct host-pair set is
      // vocabulary²-bounded (tiny next to the orders scan), so it goes
      // to an at-rest artifact once and BOTH consumers below (the CC
      // rounds, which run their own count actions, and the name-map
      // join) read the small parquet instead of re-running the regex
      // scan — the containment-pairs at-rest lesson; was the #2 bench
      // row (9.0 s at sf0.1) with the scan in the lineage twice.
      val tag = stageTag(dir)
      val path =
        s"${System.getProperty("java.io.tmpdir")}/graft_hostedges_$tag"
      o.select(src.as("src"), dst.as("dst"))
        .repartition(col("src"), col("dst"))
        .filter(col("src") =!= col("dst"))
        .distinct()
        .write.mode("overwrite").parquet(path)
      val edges = s.read.parquet(path)
      def h(c: org.apache.spark.sql.Column) =
        conv(substring(md5(c), 1, 15), 16, 10).cast("long")
      val comps = graft.dedup.Clusters.connectedComponents(
        edges.select(h(col("src")).as("ha"), h(col("dst")).as("hb")),
        "ha", "hb")
      val nodes = edges.select(col("src").as("host"))
        .unionByName(edges.select(col("dst").as("host")))
        .distinct()
        .withColumn("id", h(col("host")))
      // component is a min-of-60-bit-hashes label — two 30-bit halves
      // keep every output numeric ≤ 18 digits (VERDICT r10).
      nodes.join(comps, "id")
        .select(col("host"),
          shiftright(col("component"), 30).as("component_hi"),
          col("component").bitwiseAND(lit(1073741823L)).as("component_lo"))
        .orderBy("host")
    },


    // LABEL-PROPAGATION community detection on the synthetic host
    // graph (graph/LabelProp): 3 synchronous plurality rounds, ties to
    // the smallest label — the deterministic LPA formulation both
    // engines replay round-for-round. Communities are finer than
    // q_host_components' connected components (plurality splits a
    // component along its dense cores) and labels stay STRINGS (host
    // names), so no 60-bit hash ever reaches the output. One keyed
    // join + two keyed aggs per round.
    "q_label_prop" -> { (s, dir) =>
      val o = Tables.load(s, dir, "orders")
      val src = graft.text.UrlOps.host(
        syntheticUrlExpr(col("o_custkey"), col("o_orderkey")))
      val dst = graft.text.UrlOps.host(
        syntheticUrlExpr(pmod(col("o_custkey") * 7 + 3, lit(1000)),
          col("o_orderkey") + 1))
      graft.graph.LabelProp.communities(
        o.select(src.as("src"), dst.as("dst")), "src", "dst", rounds = 3)
        .select(col("id").as("host"), col("community"))
        .orderBy("host")
    },


    // MODULARITY of the LPA partition — the quality score that makes
    // community detection auditable (Newman 2004): Q = within/m −
    // Σ_c degsum_c²/(4m²), every term an exact BIGINT until the one
    // closed-form double. Canonical undirected edges; the same 3
    // plurality rounds as q_label_prop; bounded driver scalars only.
    "q_modularity" -> { (s, dir) =>
      val o = Tables.load(s, dir, "orders")
      val src = graft.text.UrlOps.host(
        syntheticUrlExpr(col("o_custkey"), col("o_orderkey")))
      val dst = graft.text.UrlOps.host(
        syntheticUrlExpr(pmod(col("o_custkey") * 7 + 3, lit(1000)),
          col("o_orderkey") + 1))
      val e = o.select(src.as("a"), dst.as("b"))
        .filter(col("a") =!= col("b"))
        .select(least(col("a"), col("b")).as("u"),
          greatest(col("a"), col("b")).as("v"))
        .distinct().persist()
      val m = e.count()
      val comm = graft.graph.LabelProp.communities(e, "u", "v", rounds = 3)
      val withC = e
        .join(comm.select(col("id").as("u"), col("community").as("cu")), "u")
        .join(comm.select(col("id").as("v"), col("community").as("cv")), "v")
      val within = withC.filter(col("cu") === col("cv")).count()
      val deg = e.select(col("u").as("id"))
        .unionAll(e.select(col("v").as("id")))
        .groupBy("id").agg(count(lit(1)).as("d"))
      val dc = deg.join(comm, "id").groupBy("community")
        .agg(sum(col("d")).as("ds"))
      val r = dc.agg(sum(col("ds") * col("ds")).as("dsq"),
        count(lit(1)).as("nc")).head
      val dsq = r.getLong(0)
      val nc = r.getLong(1)
      e.unpersist()
      val q = within.toDouble / m - dsq.toDouble / (4.0 * m * m)
      s.range(1).select(
        lit(m).as("m"), lit(within).as("within_edges"),
        lit(nc).as("n_communities"),
        round(lit(q), 6).as("modularity"))
    },


    // Component-size histogram of the host graph (the crawl-graph
    // sibling of q_cluster_stats' dedup histogram): how many isolated
    // pairs vs one giant component — frontier-health at a glance.
    "q_component_stats" -> { (s, dir) =>
      val o = Tables.load(s, dir, "orders")
      val src = graft.text.UrlOps.host(
        syntheticUrlExpr(col("o_custkey"), col("o_orderkey")))
      val dst = graft.text.UrlOps.host(
        syntheticUrlExpr(pmod(col("o_custkey") * 7 + 3, lit(1000)),
          col("o_orderkey") + 1))
      val tag = stageTag(dir)
      val path =
        s"${System.getProperty("java.io.tmpdir")}/graft_hostedges2_$tag"
      o.select(src.as("src"), dst.as("dst"))
        .repartition(col("src"), col("dst"))
        .filter(col("src") =!= col("dst"))
        .distinct()
        .write.mode("overwrite").parquet(path)
      val edges = s.read.parquet(path)
      def h(c: org.apache.spark.sql.Column) =
        conv(substring(md5(c), 1, 15), 16, 10).cast("long")
      graft.dedup.Clusters.sizeHistogram(
        graft.dedup.Clusters.connectedComponents(
          edges.select(h(col("src")).as("ha"), h(col("dst")).as("hb")),
          "ha", "hb"))
        .orderBy("csize")
    },


    // Degree assortativity (Newman 2002) of the customer–supplier
    // graph: do hubs trade with hubs? All moments are exact integers
    // (each edge contributes both orientations, collapsing the x/y
    // marginals), one double division at the end
    // (graft.graph.GraphStats).
    "q_assortativity" -> { (s, dir) =>
      val o = Tables.load(s, dir, "orders").select("o_orderkey", "o_custkey")
      val li = Tables.load(s, dir, "lineitem").select("l_orderkey", "l_suppkey")
      val edges = o.join(li, col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("src"),
          (col("l_suppkey") + 1000000L).as("dst"))
      graft.graph.GraphStats.assortativity(edges, "src", "dst")
    },


    // Per-node local clustering coefficient on the co-purchase graph
    // (parts sharing an order, restricted to a deterministic 20% part
    // subset so the projection graph stays bench-sized: 4.5k edges /
    // 3.1k triangles at sf0.01 — the host graph is triangle-free, the
    // hollow-gate lesson). Exact integer (degree, tri, wedges) per
    // vertex; the coefficient is tri/wedges, left unrationed.
    "q_clustering_coef" -> { (s, dir) =>
      val li = Tables.load(s, dir, "lineitem")
        .filter(col("l_partkey") % 5 === 0)
        .select(col("l_orderkey"), col("l_partkey"))
      val e = li.as("x").join(li.as("y"),
          col("x.l_orderkey") === col("y.l_orderkey") &&
            col("x.l_partkey") < col("y.l_partkey"))
        .select(col("x.l_partkey").as("pa"), col("y.l_partkey").as("pb"))
      graft.graph.Triangles.perNode(e, "pa", "pb").orderBy("v")
    },


    // Link prediction on the same co-purchase projection: rank
    // non-adjacent part pairs at distance 2 by shared-neighbor count
    // (graph/LinkPred — wedge equi-join candidate generation, exact
    // integer common-neighbor / rational-Jaccard / preferential-
    // attachment scores). Top 100 by (cn desc, a, b): unique pair key
    // makes the cut deterministic; TakeOrdered, never a global sort.
    "q_link_pred" -> { (s, dir) =>
      val li = Tables.load(s, dir, "lineitem")
        .filter(col("l_partkey") % 5 === 0)
        .select(col("l_orderkey"), col("l_partkey"))
      val e = li.as("x").join(li.as("y"),
          col("x.l_orderkey") === col("y.l_orderkey") &&
            col("x.l_partkey") < col("y.l_partkey"))
        .select(col("x.l_partkey").as("pa"), col("y.l_partkey").as("pb"))
      graft.graph.LinkPred.commonNeighborScores(e, "pa", "pb",
          minCommon = 2L)
        .orderBy(col("cn").desc, col("a"), col("b")).limit(100)
    },
  )

  val oracles: Map[String, String] = Map(

    // Same formula closure: each value node unnests its ≤10 division
    // ancestors, then one grouped sum.
    "q_hierarchy_rollup" ->
      """WITH v AS (
        |  SELECT o_custkey AS node, CAST(count(*) AS BIGINT) AS n_orders,
        |    CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
        |      AS BIGINT)) AS BIGINT) AS cents
        |  FROM orders GROUP BY 1),
        |a AS (
        |  SELECT unnest(list_distinct([node, node//7, node//49, node//343,
        |    node//2401, node//16807, node//117649, node//823543,
        |    node//5764801, node//40353607])) AS anc, n_orders, cents
        |  FROM v)
        |SELECT anc, CAST(count(*) AS BIGINT) AS n_desc,
        |  CAST(sum(n_orders) AS BIGINT) AS subtree_n_orders,
        |  CAST(sum(cents) AS BIGINT) AS subtree_cents
        |FROM a WHERE anc < 57 GROUP BY anc ORDER BY anc""".stripMargin,


    "q_pagerank" -> pageRankOracle(3),


    // Host-graph replay: the same two fixture URLs per order (link
    // target key-shifted), hosts through the identical extract stages,
    // self-links dropped — then the shared PageRank CTE chain.
    "q_host_rank" -> pageRankOracle(3,
      "he AS (SELECT " +
        hostSqlExpr(urlSqlExpr("o_custkey", "o_orderkey")) + " AS src, " +
        hostSqlExpr(urlSqlExpr("(o_custkey * 7 + 3) % 1000", "(o_orderkey + 1)")) +
        " AS dst FROM orders), " +
        "e AS (SELECT DISTINCT src, dst FROM he WHERE src <> dst)"),


    // Same host edges; two unrolled mutual-reinforcement rounds on
    // HUGEINT (exact, like Spark's DECIMAL(38,0)), max-normalized at
    // the end by one double division per side.
    "q_hits" -> {
      "WITH he AS (SELECT " +
        hostSqlExpr(urlSqlExpr("o_custkey", "o_orderkey")) + " AS src, " +
        hostSqlExpr(urlSqlExpr("(o_custkey * 7 + 3) % 1000", "(o_orderkey + 1)")) +
        " AS dst FROM orders),\n" +
        """e AS (SELECT DISTINCT src, dst FROM he WHERE src <> dst),
          |nodes AS (SELECT src AS id FROM e UNION SELECT dst AS id FROM e),
          |h0 AS (SELECT id, CAST(1 AS HUGEINT) AS s FROM nodes),
          |a1 AS (SELECT n.id, coalesce(t.v, CAST(0 AS HUGEINT)) AS s
          |       FROM nodes n LEFT JOIN (
          |         SELECT e.dst AS id, sum(h0.s) AS v
          |         FROM e JOIN h0 ON e.src = h0.id GROUP BY 1) t USING (id)),
          |h1 AS (SELECT n.id, coalesce(t.v, CAST(0 AS HUGEINT)) AS s
          |       FROM nodes n LEFT JOIN (
          |         SELECT e.src AS id, sum(a1.s) AS v
          |         FROM e JOIN a1 ON e.dst = a1.id GROUP BY 1) t USING (id)),
          |a2 AS (SELECT n.id, coalesce(t.v, CAST(0 AS HUGEINT)) AS s
          |       FROM nodes n LEFT JOIN (
          |         SELECT e.dst AS id, sum(h1.s) AS v
          |         FROM e JOIN h1 ON e.src = h1.id GROUP BY 1) t USING (id)),
          |h2 AS (SELECT n.id, coalesce(t.v, CAST(0 AS HUGEINT)) AS s
          |       FROM nodes n LEFT JOIN (
          |         SELECT e.src AS id, sum(a2.s) AS v
          |         FROM e JOIN a2 ON e.dst = a2.id GROUP BY 1) t USING (id))
          |SELECT a2.id, CAST(a2.s AS BIGINT) AS auth_raw,
          |  CAST(h2.s AS BIGINT) AS hub_raw,
          |  round(CAST(a2.s AS DOUBLE)
          |        / (SELECT CAST(max(s) AS DOUBLE) FROM a2), 6) AS auth,
          |  round(CAST(h2.s AS DOUBLE)
          |        / (SELECT CAST(max(s) AS DOUBLE) FROM h2), 6) AS hub
          |FROM a2 JOIN h2 USING (id) ORDER BY id""".stripMargin
    },


    "q_ppr" -> pprOracle(3, "%.example.com",
      "he AS (SELECT " +
        hostSqlExpr(urlSqlExpr("o_custkey", "o_orderkey")) + " AS src, " +
        hostSqlExpr(urlSqlExpr("(o_custkey * 7 + 3) % 1000", "(o_orderkey + 1)")) +
        " AS dst FROM orders), " +
        "e AS (SELECT DISTINCT src, dst FROM he WHERE src <> dst)"),


    // Same host edges; per-node in/out counts, full-outer merged.
    "q_graph_degrees" ->
      ("WITH he AS (SELECT " +
        hostSqlExpr(urlSqlExpr("o_custkey", "o_orderkey")) + " AS src, " +
        hostSqlExpr(urlSqlExpr("(o_custkey * 7 + 3) % 1000", "(o_orderkey + 1)")) +
        " AS dst FROM orders),\n" +
        """e AS (SELECT DISTINCT src, dst FROM he WHERE src <> dst),
          |od AS (SELECT src AS id, count(*) AS out_deg FROM e GROUP BY 1),
          |idg AS (SELECT dst AS id, count(*) AS in_deg FROM e GROUP BY 1)
          |SELECT coalesce(od.id, idg.id) AS id,
          |  coalesce(in_deg, 0) AS in_deg, coalesce(out_deg, 0) AS out_deg,
          |  coalesce(in_deg, 0) + coalesce(out_deg, 0) AS total_deg
          |FROM od FULL JOIN idg ON od.id = idg.id
          |ORDER BY total_deg DESC, id LIMIT 10""".stripMargin),


    "q_bfs" ->
      """WITH RECURSIVE b AS (
        |  SELECT DISTINCT o_custkey AS src, 1000000 + l_suppkey AS dst
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        |e AS (SELECT src, dst FROM b UNION ALL SELECT dst, src FROM b),
        |nodes AS (SELECT DISTINCT src AS id FROM e),
        |seed AS (SELECT min(id) AS id FROM nodes),
        |reach(id, d) AS (
        |  SELECT id, 0 FROM seed
        |  UNION
        |  SELECT e.dst, r.d + 1 FROM reach r JOIN e ON e.src = r.id
        |  WHERE r.d < 10)
        |SELECT id, min(d) AS dist FROM reach GROUP BY id
        |ORDER BY id""".stripMargin,


    // Same host graph; per-seed BFS replayed as a (seed, id, d)
    // recursive CTE from the 4 lowest-id nodes, min-d per pair, then
    // the integer closeness summary.
    "q_closeness" ->
      """WITH RECURSIVE b AS (
        |  SELECT DISTINCT o_custkey AS src, 1000000 + l_suppkey AS dst
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        |e AS (SELECT src, dst FROM b UNION ALL SELECT dst, src FROM b),
        |seeds AS (SELECT DISTINCT src AS id FROM e ORDER BY id LIMIT 4),
        |reach(seed, id, d) AS (
        |  SELECT id, id, 0 FROM seeds
        |  UNION
        |  SELECT r.seed, e.dst, r.d + 1 FROM reach r JOIN e ON e.src = r.id
        |  WHERE r.d < 10),
        |md AS (SELECT seed, id, min(d) AS d FROM reach GROUP BY seed, id)
        |SELECT seed, count(*) AS n_reached,
        |  CAST(sum(d) AS BIGINT) AS sum_dist, max(d) AS ecc
        |FROM md GROUP BY seed ORDER BY seed""".stripMargin,


    // Same per-seed BFS; Σ 2520 // d over non-seed reached nodes.
    "q_harmonic" ->
      """WITH RECURSIVE b AS (
        |  SELECT DISTINCT o_custkey AS src, 1000000 + l_suppkey AS dst
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        |e AS (SELECT src, dst FROM b UNION ALL SELECT dst, src FROM b),
        |seeds AS (SELECT DISTINCT src AS id FROM e ORDER BY id LIMIT 4),
        |reach(seed, id, d) AS (
        |  SELECT id, id, 0 FROM seeds
        |  UNION
        |  SELECT r.seed, e.dst, r.d + 1 FROM reach r JOIN e ON e.src = r.id
        |  WHERE r.d < 10),
        |md AS (SELECT seed, id, min(d) AS d FROM reach GROUP BY seed, id)
        |SELECT seed, count(*) AS n_reached,
        |  CAST(sum(2520 // d) AS BIGINT) AS h2520
        |FROM md WHERE d > 0 GROUP BY seed ORDER BY seed""".stripMargin,


    // Two recursive-CTE sweeps; farthest tie-break (dist desc, id asc)
    // mirrors the max-struct with negated id.
    "q_graph_diameter" ->
      """WITH RECURSIVE b AS (
        |  SELECT DISTINCT o_custkey AS src, 1000000 + l_suppkey AS dst
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |  WHERE o_orderkey % 4 = 0),
        |e AS (SELECT src, dst FROM b UNION ALL SELECT dst, src FROM b),
        |s1 AS (SELECT min(src) AS id FROM e),
        |r1(id, d) AS (
        |  SELECT id, 0 FROM s1
        |  UNION
        |  SELECT e.dst, r1.d + 1 FROM r1 JOIN e ON e.src = r1.id
        |  WHERE r1.d < 10),
        |m1 AS (SELECT id, min(d) AS d FROM r1 GROUP BY id),
        |f1 AS (SELECT id, d FROM m1 ORDER BY d DESC, id LIMIT 1),
        |r2(id, d) AS (
        |  SELECT id, 0 FROM f1
        |  UNION
        |  SELECT e.dst, r2.d + 1 FROM r2 JOIN e ON e.src = r2.id
        |  WHERE r2.d < 10),
        |m2 AS (SELECT id, min(d) AS d FROM r2 GROUP BY id),
        |f2 AS (SELECT id, d FROM m2 ORDER BY d DESC, id LIMIT 1)
        |SELECT (SELECT id FROM s1) AS seed,
        |  CAST((SELECT d FROM f1) AS INTEGER) AS ecc_seed,
        |  (SELECT id FROM f1) AS far_node,
        |  CAST((SELECT d FROM f2) AS INTEGER) AS diameter_lb,
        |  (SELECT id FROM f2) AS periphery""".stripMargin,


    // Same per-seed BFS, 4-hop horizon; sigma per level from the
    // previous level's sums, then the backward dependency unrolled
    // d3→d1 with the identical ⌊σv·(10⁶+δw)/σw⌋ integer term.
    "q_betweenness" ->
      """WITH RECURSIVE b AS (
        |  SELECT DISTINCT o_custkey AS src, 1000000 + l_suppkey AS dst
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |  WHERE o_orderkey % 4 = 0),
        |e AS (SELECT src, dst FROM b UNION ALL SELECT dst, src FROM b),
        |seeds AS (SELECT DISTINCT src AS id FROM e ORDER BY id LIMIT 4),
        |reach(seed, id, d) AS (
        |  SELECT id, id, 0 FROM seeds
        |  UNION
        |  SELECT r.seed, e.dst, r.d + 1 FROM reach r JOIN e ON e.src = r.id
        |  WHERE r.d < 4),
        |md AS (SELECT seed, id, min(d) AS d FROM reach GROUP BY seed, id),
        |s0 AS (SELECT id AS seed, id, CAST(1 AS BIGINT) AS sigma FROM seeds),
        |s1 AS (SELECT m.seed, m.id, CAST(sum(p.sigma) AS BIGINT) AS sigma
        |       FROM md m JOIN e ON e.dst = m.id
        |       JOIN s0 p ON p.seed = m.seed AND p.id = e.src
        |       WHERE m.d = 1 GROUP BY m.seed, m.id),
        |s2 AS (SELECT m.seed, m.id, CAST(sum(p.sigma) AS BIGINT) AS sigma
        |       FROM md m JOIN e ON e.dst = m.id
        |       JOIN s1 p ON p.seed = m.seed AND p.id = e.src
        |       WHERE m.d = 2 GROUP BY m.seed, m.id),
        |s3 AS (SELECT m.seed, m.id, CAST(sum(p.sigma) AS BIGINT) AS sigma
        |       FROM md m JOIN e ON e.dst = m.id
        |       JOIN s2 p ON p.seed = m.seed AND p.id = e.src
        |       WHERE m.d = 3 GROUP BY m.seed, m.id),
        |s4 AS (SELECT m.seed, m.id, CAST(sum(p.sigma) AS BIGINT) AS sigma
        |       FROM md m JOIN e ON e.dst = m.id
        |       JOIN s3 p ON p.seed = m.seed AND p.id = e.src
        |       WHERE m.d = 4 GROUP BY m.seed, m.id),
        |d4 AS (SELECT seed, id, sigma, CAST(0 AS BIGINT) AS delta FROM s4),
        |d3 AS (SELECT v.seed, v.id, v.sigma,
        |         CAST(coalesce(sum((v.sigma * (1000000 + w.delta)) // w.sigma),
        |                       0) AS BIGINT) AS delta
        |       FROM s3 v
        |       LEFT JOIN e ON e.src = v.id
        |       LEFT JOIN d4 w ON w.seed = v.seed AND w.id = e.dst
        |       GROUP BY v.seed, v.id, v.sigma),
        |d2 AS (SELECT v.seed, v.id, v.sigma,
        |         CAST(coalesce(sum((v.sigma * (1000000 + w.delta)) // w.sigma),
        |                       0) AS BIGINT) AS delta
        |       FROM s2 v
        |       LEFT JOIN e ON e.src = v.id
        |       LEFT JOIN d3 w ON w.seed = v.seed AND w.id = e.dst
        |       GROUP BY v.seed, v.id, v.sigma),
        |d1 AS (SELECT v.seed, v.id, v.sigma,
        |         CAST(coalesce(sum((v.sigma * (1000000 + w.delta)) // w.sigma),
        |                       0) AS BIGINT) AS delta
        |       FROM s1 v
        |       LEFT JOIN e ON e.src = v.id
        |       LEFT JOIN d2 w ON w.seed = v.seed AND w.id = e.dst
        |       GROUP BY v.seed, v.id, v.sigma),
        |bc AS (SELECT id, CAST(sum(delta) AS BIGINT) AS bc_micro
        |       FROM (SELECT id, delta FROM d1
        |             UNION ALL SELECT id, delta FROM d2
        |             UNION ALL SELECT id, delta FROM d3)
        |       GROUP BY id)
        |SELECT CAST(row_number() OVER (ORDER BY bc_micro DESC, id) AS INT)
        |         AS rank,
        |       id, bc_micro
        |FROM bc ORDER BY bc_micro DESC, id LIMIT 20""".stripMargin,


    // Same host edges; canonicalize, orient from the (degree, id)-
    // smaller endpoint, wedge-join on the center, close against the
    // canonical set.
    "q_triangles" ->
      ("WITH he AS (SELECT " +
        hostSqlExpr(urlSqlExpr("o_custkey", "o_orderkey")) + " AS src, " +
        hostSqlExpr(urlSqlExpr("(o_custkey * 7 + 3) % 1000", "(o_orderkey + 1)")) +
        " AS dst FROM orders),\n" +
        """und AS (
          |  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
          |  FROM he WHERE src <> dst),
          |deg AS (
          |  SELECT v, count(*) AS d
          |  FROM (SELECT a AS v FROM und UNION ALL SELECT b FROM und)
          |  GROUP BY 1),
          |o AS (
          |  SELECT CASE WHEN da.d < db.d OR (da.d = db.d AND a < b)
          |              THEN a ELSE b END AS u,
          |         CASE WHEN da.d < db.d OR (da.d = db.d AND a < b)
          |              THEN b ELSE a END AS w
          |  FROM und JOIN deg da ON da.v = a JOIN deg db ON db.v = b),
          |wed AS (
          |  SELECT e1.w AS x, e2.w AS y
          |  FROM o e1 JOIN o e2 ON e1.u = e2.u AND e1.w < e2.w)
          |SELECT (SELECT count(*) FROM und) AS n_edges,
          |  (SELECT count(*) FROM wed) AS n_wedges,
          |  (SELECT count(*) FROM wed JOIN und ON und.a = wed.x AND und.b = wed.y)
          |    AS n_triangles""".stripMargin),


    // 8 full-relaxation rounds unrolled; ≤8-edge shortest distances.
    "q_sssp" -> {
      val rounds = 8
      val relax = (1 to rounds).map { r =>
        s"""d$r AS (SELECT id, min(dist) AS dist FROM (
           |  SELECT id, dist FROM d${r - 1}
           |  UNION ALL
           |  SELECT eu.dst AS id, d${r - 1}.dist + eu.w AS dist
           |  FROM d${r - 1} JOIN eu ON eu.src = d${r - 1}.id) GROUP BY id)""".stripMargin
      }.mkString(",\n")
      s"""WITH e AS (
         |  SELECT DISTINCT o_custkey AS src, l_suppkey + 1000000 AS dst
         |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
         |eu AS (
         |  SELECT src, dst, 1 + (src + dst) % 5 AS w FROM e
         |  UNION ALL
         |  SELECT dst, src, 1 + (src + dst) % 5 FROM e),
         |seed AS (SELECT min(src) AS id FROM eu),
         |d0 AS (SELECT id, CAST(0 AS BIGINT) AS dist FROM seed),
         |$relax
         |SELECT id, dist FROM d$rounds ORDER BY id""".stripMargin
    },


    // Percentile-k replayed as a cumulative sum over distinct degrees,
    // then 3 unrolled peel rounds (fixture converges in 1 — extra
    // rounds are identity; non-convergence would hash-mismatch).
    "q_kcore" ->
      """WITH e0 AS (
        |  SELECT DISTINCT least(o_custkey, l_suppkey + 1000000) AS a,
        |                  greatest(o_custkey, l_suppkey + 1000000) AS b
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |  WHERE o_custkey <> l_suppkey + 1000000),
        |d0 AS (SELECT v, count(*) AS d
        |       FROM (SELECT a AS v FROM e0 UNION ALL SELECT b FROM e0)
        |       GROUP BY 1),
        |dc AS (SELECT d, count(*) AS cnt FROM d0 GROUP BY 1),
        |kv AS (
        |  SELECT min(d) AS k FROM (
        |    SELECT d, sum(cnt) OVER (ORDER BY d) AS cum,
        |           sum(cnt) OVER () AS n
        |    FROM dc)
        |  WHERE cum >= ceil(0.25 * n)),
        |b1 AS (SELECT v FROM d0, kv WHERE d < k),
        |e1 AS (SELECT a, b FROM e0
        |       WHERE a NOT IN (SELECT v FROM b1)
        |         AND b NOT IN (SELECT v FROM b1)),
        |d1 AS (SELECT v, count(*) AS d
        |       FROM (SELECT a AS v FROM e1 UNION ALL SELECT b FROM e1)
        |       GROUP BY 1),
        |b2 AS (SELECT v FROM d1, kv WHERE d < k),
        |e2 AS (SELECT a, b FROM e1
        |       WHERE a NOT IN (SELECT v FROM b2)
        |         AND b NOT IN (SELECT v FROM b2)),
        |d2 AS (SELECT v, count(*) AS d
        |       FROM (SELECT a AS v FROM e2 UNION ALL SELECT b FROM e2)
        |       GROUP BY 1),
        |b3 AS (SELECT v FROM d2, kv WHERE d < k),
        |e3 AS (SELECT a, b FROM e2
        |       WHERE a NOT IN (SELECT v FROM b3)
        |         AND b NOT IN (SELECT v FROM b3)),
        |d3 AS (SELECT v, count(*) AS d
        |       FROM (SELECT a AS v FROM e3 UNION ALL SELECT b FROM e3)
        |       GROUP BY 1)
        |SELECT v, d AS core_degree, (SELECT k FROM kv) AS k
        |FROM d3 ORDER BY v""".stripMargin,


    "q_markov" ->
      """WITH t AS (
        |  SELECT event_type AS from_type,
        |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
        |  FROM events),
        |c AS (
        |  SELECT from_type, to_type, count(*) AS cnt
        |  FROM t WHERE to_type IS NOT NULL GROUP BY from_type, to_type)
        |SELECT from_type, to_type, cnt,
        |  round(CAST(cnt AS DOUBLE) / sum(cnt) OVER (PARTITION BY from_type), 6) AS prob
        |FROM c
        |ORDER BY from_type, to_type""".stripMargin,


    // Host edges (the q_host_rank replay), 60-bit host hashes, then a
    // recursive min-label closure — the star-root components.
    "q_host_components" -> {
      val he = "he AS (SELECT " +
        hostSqlExpr(urlSqlExpr("o_custkey", "o_orderkey")) + " AS src, " +
        hostSqlExpr(urlSqlExpr("(o_custkey * 7 + 3) % 1000", "(o_orderkey + 1)")) +
        " AS dst FROM orders)"
      s"""WITH RECURSIVE $he,
         |e AS (SELECT DISTINCT src, dst FROM he WHERE src <> dst),
         |ed AS (SELECT DISTINCT
         |    ('0x' || substr(md5(src), 1, 15))::BIGINT AS u,
         |    ('0x' || substr(md5(dst), 1, 15))::BIGINT AS v FROM e),
         |sym AS (SELECT u, v FROM ed UNION SELECT v, u FROM ed),
         |reach(id, comp) AS (
         |  SELECT u, u FROM sym
         |  UNION
         |  SELECT s.v, r.comp FROM reach r JOIN sym s ON s.u = r.id),
         |comp AS (SELECT id, min(comp) AS component FROM reach GROUP BY id),
         |nodes AS (
         |  SELECT DISTINCT host,
         |    ('0x' || substr(md5(host), 1, 15))::BIGINT AS id
         |  FROM (SELECT src AS host FROM e UNION SELECT dst AS host FROM e))
         |SELECT n.host,
         |  CAST(c.component // 1073741824 AS BIGINT) AS component_hi,
         |  CAST(c.component % 1073741824 AS BIGINT) AS component_lo
         |FROM nodes n JOIN comp c ON n.id = c.id
         |ORDER BY n.host""".stripMargin
    },


    // The same three plurality rounds unrolled; ties to the smaller
    // label via (count DESC, label ASC) row_number — binary string
    // order in both engines on these ASCII hosts.
    "q_label_prop" -> {
      val he = "he AS (SELECT " +
        hostSqlExpr(urlSqlExpr("o_custkey", "o_orderkey")) + " AS src, " +
        hostSqlExpr(urlSqlExpr("(o_custkey * 7 + 3) % 1000", "(o_orderkey + 1)")) +
        " AS dst FROM orders)"
      val rounds = (1 to 3).map { i =>
        s"""c$i AS (
           |  SELECT s.u AS id, l.community, count(*) AS c
           |  FROM sym s JOIN l${i - 1} l ON s.v = l.id GROUP BY 1, 2),
           |l$i AS (
           |  SELECT id, community FROM (
           |    SELECT id, community,
           |      row_number() OVER (PARTITION BY id ORDER BY c DESC, community) AS rn
           |    FROM c$i) WHERE rn = 1)""".stripMargin
      }.mkString(",\n")
      s"""WITH $he,
         |e AS (SELECT DISTINCT src, dst FROM he WHERE src <> dst),
         |sym AS (SELECT src AS u, dst AS v FROM e UNION SELECT dst, src FROM e),
         |l0 AS (SELECT DISTINCT u AS id, u AS community FROM sym),
         |$rounds
         |SELECT id AS host, community FROM l3 ORDER BY host""".stripMargin
    },


    // LPA replay + the modularity algebra over exact BIGINT terms.
    "q_modularity" -> {
      val he = "he AS (SELECT " +
        hostSqlExpr(urlSqlExpr("o_custkey", "o_orderkey")) + " AS src, " +
        hostSqlExpr(urlSqlExpr("(o_custkey * 7 + 3) % 1000", "(o_orderkey + 1)")) +
        " AS dst FROM orders)"
      val rounds = (1 to 3).map { i =>
        s"""c$i AS (
           |  SELECT s.u AS id, l.community, count(*) AS c
           |  FROM sym s JOIN l${i - 1} l ON s.v = l.id GROUP BY 1, 2),
           |l$i AS (
           |  SELECT id, community FROM (
           |    SELECT id, community,
           |      row_number() OVER (PARTITION BY id ORDER BY c DESC, community) AS rn
           |    FROM c$i) WHERE rn = 1)""".stripMargin
      }.mkString(",\n")
      s"""WITH $he,
         |ce AS (SELECT DISTINCT LEAST(src, dst) AS u, GREATEST(src, dst) AS v
         |       FROM he WHERE src <> dst),
         |sym AS (SELECT u, v FROM ce UNION SELECT v, u FROM ce),
         |l0 AS (SELECT DISTINCT u AS id, u AS community FROM sym),
         |$rounds,
         |mm AS (SELECT CAST(count(*) AS BIGINT) AS m FROM ce),
         |wi AS (SELECT CAST(count(*) AS BIGINT) AS w
         |       FROM ce e JOIN l3 a ON e.u = a.id JOIN l3 b ON e.v = b.id
         |       WHERE a.community = b.community),
         |deg AS (SELECT id, CAST(count(*) AS BIGINT) AS d FROM (
         |          SELECT u AS id FROM ce UNION ALL SELECT v FROM ce)
         |        GROUP BY 1),
         |dc AS (SELECT a.community, CAST(sum(d.d) AS BIGINT) AS ds
         |       FROM deg d JOIN l3 a ON d.id = a.id GROUP BY 1),
         |dq AS (SELECT CAST(sum(ds * ds) AS BIGINT) AS dsq,
         |              CAST(count(*) AS BIGINT) AS nc FROM dc)
         |SELECT m, w AS within_edges, nc AS n_communities,
         |  round(CAST(w AS DOUBLE) / m
         |    - CAST(dsq AS DOUBLE) / (4.0 * m * m), 6) AS modularity
         |FROM mm, wi, dq""".stripMargin
    },


    // The recursive closure of the host edges → component sizes →
    // histogram (the q_cluster_stats shape on the crawl graph).
    "q_component_stats" -> {
      val he = "he AS (SELECT " +
        hostSqlExpr(urlSqlExpr("o_custkey", "o_orderkey")) + " AS src, " +
        hostSqlExpr(urlSqlExpr("(o_custkey * 7 + 3) % 1000", "(o_orderkey + 1)")) +
        " AS dst FROM orders)"
      s"""WITH RECURSIVE $he,
         |e AS (SELECT DISTINCT src, dst FROM he WHERE src <> dst),
         |ed AS (SELECT DISTINCT
         |    ('0x' || substr(md5(src), 1, 15))::BIGINT AS u,
         |    ('0x' || substr(md5(dst), 1, 15))::BIGINT AS v FROM e),
         |sym AS (SELECT u, v FROM ed UNION SELECT v, u FROM ed),
         |reach(id, comp) AS (
         |  SELECT u, u FROM sym
         |  UNION
         |  SELECT s.v, r.comp FROM reach r JOIN sym s ON s.u = r.id),
         |comp AS (SELECT id, min(comp) AS component FROM reach GROUP BY id),
         |sz AS (SELECT component, CAST(count(*) AS BIGINT) AS csize
         |       FROM comp GROUP BY 1)
         |SELECT csize, CAST(count(*) AS BIGINT) AS n_clusters
         |FROM sz GROUP BY 1 ORDER BY csize""".stripMargin
    },


    // Exact-integer moments; both orientations collapse the marginals.
    "q_assortativity" ->
      """WITH e0 AS (
        |  SELECT DISTINCT least(o_custkey, l_suppkey + 1000000) AS a,
        |                  greatest(o_custkey, l_suppkey + 1000000) AS b
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |  WHERE o_custkey <> l_suppkey + 1000000),
        |deg AS (SELECT v, count(*) AS d
        |        FROM (SELECT a AS v FROM e0 UNION ALL SELECT b FROM e0)
        |        GROUP BY 1),
        |j AS (SELECT da.d AS da, db.d AS db
        |      FROM e0 JOIN deg da ON da.v = e0.a JOIN deg db ON db.v = e0.b),
        |m AS (SELECT 2 * count(*) AS n,
        |        CAST(sum(da + db) AS BIGINT) AS sx,
        |        CAST(2 * sum(da * db) AS BIGINT) AS sxy,
        |        CAST(sum(da * da + db * db) AS BIGINT) AS sx2
        |      FROM j)
        |SELECT CAST(n / 2 AS BIGINT) AS n_edges,
        |  round(CASE WHEN n * sx2 - sx * sx <> 0
        |        THEN CAST(n * sxy - sx * sx AS DOUBLE) /
        |             CAST(n * sx2 - sx * sx AS DOUBLE) END, 6) AS r
        |FROM m""".stripMargin,


    // Triangle triple-join mirror (a<b<c), each triangle credited to
    // its three corners; wedges = d(d−1)/2 exact.
    "q_clustering_coef" ->
      """WITH li AS (
        |  SELECT l_orderkey, l_partkey FROM lineitem WHERE l_partkey % 5 = 0),
        |e AS (
        |  SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
        |  FROM li x JOIN li y
        |    ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey),
        |deg AS (
        |  SELECT v, CAST(count(*) AS BIGINT) AS d FROM (
        |    SELECT a AS v FROM e UNION ALL SELECT b AS v FROM e)
        |  GROUP BY v),
        |tri AS (
        |  SELECT e1.a AS a, e1.b AS b, e2.b AS c
        |  FROM e e1 JOIN e e2 ON e2.a = e1.b
        |    JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
        |pv AS (
        |  SELECT v, CAST(count(*) AS BIGINT) AS tri FROM (
        |    SELECT a AS v FROM tri UNION ALL SELECT b AS v FROM tri
        |    UNION ALL SELECT c AS v FROM tri)
        |  GROUP BY v)
        |SELECT deg.v, deg.d, COALESCE(pv.tri, 0) AS tri,
        |  deg.d * (deg.d - 1) // 2 AS wedges
        |FROM deg LEFT JOIN pv ON pv.v = deg.v
        |ORDER BY deg.v""".stripMargin,


    // Same projection edges; wedge join on the shared neighbor, the
    // NOT EXISTS mirror of the Spark anti-join, integer scores.
    "q_link_pred" ->
      """WITH li AS (
        |  SELECT l_orderkey, l_partkey FROM lineitem WHERE l_partkey % 5 = 0),
        |und AS (
        |  SELECT DISTINCT x.l_partkey AS u, y.l_partkey AS v
        |  FROM li x JOIN li y
        |    ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey),
        |sym AS (SELECT u AS c, v AS n FROM und
        |        UNION ALL SELECT v, u FROM und),
        |deg AS (SELECT c, CAST(count(*) AS BIGINT) AS d FROM sym GROUP BY c),
        |wed AS (
        |  SELECT s1.n AS x, s2.n AS y, CAST(count(*) AS BIGINT) AS cn
        |  FROM sym s1 JOIN sym s2 ON s1.c = s2.c AND s1.n < s2.n
        |  GROUP BY s1.n, s2.n HAVING count(*) >= 2),
        |cand AS (
        |  SELECT w.* FROM wed w WHERE NOT EXISTS
        |    (SELECT 1 FROM und WHERE und.u = w.x AND und.v = w.y))
        |SELECT c.x AS a, c.y AS b, c.cn, c.cn AS jac_num,
        |  da.d + db.d - c.cn AS jac_den, da.d * db.d AS pa
        |FROM cand c
        |JOIN deg da ON da.c = c.x JOIN deg db ON db.c = c.y
        |ORDER BY c.cn DESC, a, b LIMIT 100""".stripMargin,
  )
}
