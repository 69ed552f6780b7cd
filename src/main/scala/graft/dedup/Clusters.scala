package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed connected components over near-duplicate PAIRS — the
  * cluster-resolution stage a dedup pipeline needs between "these two
  * documents are near-dups" ([[Dedup.jaccardPairs]], [[MinHashLsh]],
  * [[SimHash]], [[graft.sim.VectorSim.cosinePairs]]) and "keep exactly
  * one representative per duplicate set". Near-dup similarity is not
  * transitive, but dedup treats it as if it were: a↔b and b↔c puts all
  * three in one cluster, and the cluster keeps its smallest id.
  *
  * Hybrid execution: the distinct edge set is counted first; at or
  * below [[DriverEdgeLimit]] it collects and resolves with a driver
  * union-find (near-dup edge sets are tiny relative to the corpus —
  * milliseconds vs ~log n Spark jobs), beyond it the distributed
  * algorithm below runs. Both produce identical (id, min-reachable-id)
  * labels (spec-asserted on random graphs).
  *
  * Distributed algorithm: alternating large-star / small-star (Kiveris
  * et al., "Connected Components in MapReduce and Beyond", SoCC 2014) —
  * the standard O(log n)-round MapReduce formulation:
  *
  *  - large-star: for every node u, connect each STRICTLY LARGER
  *    neighbor v > u to m(u) = min(Γ(u) ∪ {u});
  *  - small-star: orient every edge large→small; for every node u,
  *    connect u and each (≤) neighbor to m(u).
  *
  * Both steps preserve connectivity and monotonically pull every node
  * toward its component's minimum; the edge set converges to a star
  * rooted at each component's min id in O(log n) alternations (near-dup
  * components are shallow in practice — a handful of rounds).
  *
  * Scale shape: each half-round is one keyed groupBy (min per node) and
  * one keyed join (re-attach m(u) to u's edges) — no collect_list of
  * neighborhoods (a hub node's neighbor ARRAY would OOM a task at web
  * scale; the groupBy+join form keeps hubs as ordinary skewed keys that
  * AQE splits), no driver-side graph, nothing quadratic. Convergence is
  * detected by an order-insensitive (count, hash-sum) signature of
  * the canonical edge set — one tiny agg job per round, no except().
  */
object Clusters {

  /** Maximum large+small-star alternations before FAILING (the proven
    * worst-case bound is O(log² n) rounds, not O(log n) — 200 covers
    * any graph that fits an edge DataFrame; typical near-dup graphs
    * converge in < 10). Non-convergence throws rather than silently
    * returning a non-star edge set as component labels.
    */
  val MaxRounds = 200

  /** Distinct-edge count under which components resolve with a driver
    * union-find instead of distributed star rounds. Near-dup EDGE sets
    * are orders of magnitude smaller than the corpus (a pair is two
    * documents the sketch already called ≈identical), so the common
    * case fits comfortably: 1M collected (Long, Long) edges is
    * ~50-100 MB of driver heap WITH JVM boxing overhead (the honest
    * number, not the 16-byte raw payload), resolved in well under a
    * second vs ~log n Spark jobs. Same bounded-metadata-collect
    * discipline as [[Dedup.BroadcastVerifyDocLimit]]; beyond the bound
    * the distributed path takes over with no semantic change.
    */
  val DriverEdgeLimit = 1000000L

  /** Connected components of the undirected pair graph. Input: any
    * DataFrame with two integral id columns (one row per edge; dupes,
    * self-loops, and either orientation are fine). Output:
    * `(id, component)` — one row per node that appears in at least one
    * pair WITH A DISTINCT PARTNER, `component` = the smallest id
    * reachable from it. Nodes in no pair — including nodes whose only
    * pairs are self-loops, which the `a =!= b` filter drops — are
    * absent (callers union them back as singletons; see [[survivors]],
    * which keeps such rows, so no data loss).
    *
    * @param driverEdgeLimit distinct-edge count up to which the driver
    *        union-find path is used (0 forces the distributed rounds)
    */
  def connectedComponents(pairs: DataFrame, aCol: String, bCol: String,
                          driverEdgeLimit: Long = DriverEdgeLimit): DataFrame = {
    val spark = pairs.sparkSession

    // Canonical undirected edge set, oriented u > v.
    var edges = pairs
      .select(col(aCol).cast("long").as("a"), col(bCol).cast("long").as("b"))
      .filter(col("a") =!= col("b") && col("a").isNotNull && col("b").isNotNull)
      .select(greatest(col("a"), col("b")).as("u"), least(col("a"), col("b")).as("v"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val nEdges = edges.count()
    if (nEdges <= driverEdgeLimit) {
      import spark.implicits._
      val result = driverComponents(spark, edges.as[(Long, Long)].collect())
      edges.unpersist()
      return result
    }

    var signature = edgeSignature(edges)
    var rounds = 0
    var converged = signature._1 == 0L // empty graph: nothing to do
    while (!converged && rounds < MaxRounds) {
      val next = truncateLineage(smallStar(largeStar(edges)))
      val nextSig = edgeSignature(next) // materializes next's cache
      edges.unpersist()
      edges = next
      converged = nextSig == signature
      signature = nextSig
      rounds += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge after $MaxRounds star rounds " +
          s"(${signature._1} edges still changing) — refusing to emit wrong labels")

    // Stars: every edge is (member u, root v). Roots appear only on the
    // v side; emit them as their own component rows. The final round's
    // edge cache backs the returned DataFrame lazily and cannot be
    // dropped here — Spark's ContextCleaner frees it when the result
    // goes out of scope (same note as Dedup's persisted shingle sets);
    // batch harnesses call clearCache() between queries.
    val members = edges.select(col("u").as("id"), col("v").as("component"))
    val roots = edges.select(col("v").as("id")).distinct()
      .withColumn("component", col("id"))
    members.unionByName(roots).distinct()
  }

  /** Path-compressing union-find over a collected edge array — the
    * small-graph fast path. Roots are component minima (union always
    * points the larger root at the smaller), matching the distributed
    * fixpoint exactly.
    */
  private def driverComponents(spark: SparkSession,
                               edgeArr: Array[(Long, Long)]): DataFrame = {
    val parent = new java.util.HashMap[Long, Long]()
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrDefault(r, r) != r) r = parent.get(r)
      var c = x // path compression
      while (parent.getOrDefault(c, c) != r) { val n = parent.get(c); parent.put(c, r); c = n }
      r
    }
    edgeArr.foreach { case (a, b) =>
      parent.putIfAbsent(a, a); parent.putIfAbsent(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent.put(math.max(ra, rb), math.min(ra, rb))
    }
    val rows = new scala.collection.mutable.ArrayBuffer[(Long, Long)](parent.size)
    parent.keySet.forEach(k => rows += ((k, find(k))))
    // parallelize, not createDataset: a LocalRelation would embed up to
    // 2M rows into every plan that references the result
    spark.createDataFrame(spark.sparkContext.parallelize(rows.toSeq, 1))
      .toDF("id", "component")
  }

  /** Large-star: connect every neighbor v > u to m(u) = min(Γ(u) ∪ {u}).
    * Keyed groupBy for m(u), keyed join to re-emit — no neighborhood
    * arrays. Edges arrive and leave in canonical (u > v) orientation.
    */
  private def largeStar(edges: DataFrame): DataFrame = {
    val sym = edges.select(col("u"), col("v"))
      .unionAll(edges.select(col("v").as("u"), col("u").as("v")))
    // v ranges over Γ(u); min(v) already ≤ u whenever u has any smaller
    // neighbor, and m(u) must also consider u itself.
    val m = sym.groupBy("u").agg(least(min(col("v")), col("u")).as("m"))
    sym.join(m, "u")
      .filter(col("v") > col("u"))
      .select(col("v").as("u"), col("m").as("v")) // v > u ≥ m, canonical
      .distinct()
  }

  /** Small-star: edges already oriented u > v; connect u and every
    * smaller neighbor to m(u) = min over them.
    */
  private def smallStar(edges: DataFrame): DataFrame = {
    val m = edges.groupBy("u").agg(min(col("v")).as("m")) // all v < u
    val reattached = edges.join(m, "u")
    val uToM = reattached.select(col("u"), col("m").as("v"))
    val vToM = reattached.filter(col("v") =!= col("m"))
      .select(col("v").as("u"), col("m").as("v"))
    uToM.unionAll(vToM).distinct()
  }

  /** Cut the LOGICAL plan between rounds. Each star round references the
    * previous edge set several times (symmetrization + the min join), so
    * without truncation the analyzed plan TREE grows ~4× per round —
    * exponential analysis/canonicalization cost and eventually a stack
    * overflow, regardless of caching (persist() memoizes execution, not
    * the plan). Rebuilding from the round's RDD resets the plan to a
    * single scan. The loop unpersists round i-1 as soon as round i's
    * cache is materialized, so should an executor later evict one of
    * round i's MEMORY_AND_DISK blocks, the recompute walks the RDD
    * lineage through the already-unpersisted earlier rounds — correct
    * but potentially a full replay, not a one-round hop. Accepted:
    * eviction of a just-materialized small edge set is rare, and
    * holding two rounds cached would double peak footprint. Lineage
    * depth stays bounded by [[MaxRounds]].
    */
  private def truncateLineage(df: DataFrame): DataFrame =
    df.sparkSession.createDataFrame(df.rdd, df.schema)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

  /** Order-insensitive multiset signature of the canonical edge set:
    * (row count, sum of per-edge 64-bit hashes mod 2⁶⁴ — summed in
    * decimal(38,0) so no overflow before the final truncation). One
    * small agg job; collision probability ~2⁻⁶⁴ per comparison.
    */
  private def edgeSignature(edges: DataFrame): (Long, Long) = {
    val r = edges.agg(
      count(lit(1)),
      coalesce(expr("sum(cast(xxhash64(u, v) as decimal(38,0)))"), lit(0))).head()
    (r.getLong(0), if (r.isNullAt(1)) 0L else r.getDecimal(1).longValue())
  }

  /** Dedup audit: duplicate-cluster size histogram — how many clusters
    * of 2, of 3, … (singletons are rows in no pair and never appear in
    * `components`). THE first sanity check on a dedup run: a handful of
    * huge clusters usually means boilerplate or a degenerate shingle
    * choice, not genuine duplication. Two keyed aggregations over the
    * (already tiny) component labels.
    */
  def sizeHistogram(components: DataFrame): DataFrame =
    components.groupBy(col("component")).agg(count(lit(1)).as("csize"))
      .groupBy(col("csize")).agg(count(lit(1)).as("n_clusters"))

  /** Near-dup survivors: every row of `df` except non-representative
    * cluster members (the smallest id per connected component of
    * `pairs` survives; rows in no pair trivially survive). One
    * anti-join against the loser set — `df` itself is never shuffled
    * on content.
    */
  def survivors(df: DataFrame, idCol: String, pairs: DataFrame,
                aCol: String, bCol: String): DataFrame = {
    val losers = connectedComponents(pairs, aCol, bCol)
      .filter(col("id") =!= col("component"))
      .select(col("id"))
    df.join(losers.withColumnRenamed("id", idCol), Seq(idCol), "left_anti")
  }
}
