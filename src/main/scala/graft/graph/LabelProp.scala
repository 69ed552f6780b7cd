package graft.graph

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Synchronous label-propagation community detection (Raghavan et al.
  * 2007) in the deterministic formulation every engine replays: each
  * round, every node adopts the label carried by the PLURALITY of its
  * neighbors, ties broken to the smallest label, all nodes updating
  * from the previous round's labels simultaneously (no in-round
  * mutation, no randomized visit order — the two places the published
  * algorithm is nondeterministic). A fixed round budget replaces the
  * usual convergence test, so the oracle can unroll the exact same
  * rounds.
  *
  * Scale shape: one keyed equi-join (neighbor label lookup) + two
  * keyed aggregations per round — the PageRank/Bellman-Ford discipline
  * (graph/PageRank.scala, BellmanFord.scala); labels live in a
  * (node, label) frame that shuffles by node id, never wider than the
  * node set, and the edge frame is shuffle-partitioned once and reused
  * every round.
  */
object LabelProp {

  /** (id, community) per node of the undirected graph, after `rounds`
    * synchronous updates from label(v) = v. Ids/labels may be any
    * orderable type — string hosts stay strings (no hash step whose
    * 60-bit values would then need splitting at the output).
    */
  def communities(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      rounds: Int): DataFrame = {
    require(rounds >= 0, "rounds must be >= 0")
    val sym = edges
      .select(col(srcCol).as("u"), col(dstCol).as("v"))
      .unionAll(edges.select(col(dstCol).as("u"), col(srcCol).as("v")))
      .filter(col("u") =!= col("v"))
      .distinct()
      .repartition(col("u"))
      .persist()
    sym.count()
    var labels = sym.select(col("u").as("id")).distinct()
      .withColumn("community", col("id"))
    for (_ <- 1 to rounds) {
      val neigh = sym.join(
        labels.select(col("id").as("v"), col("community")), "v")
      val cnt = neigh.groupBy(col("u").as("id"), col("community"))
        .agg(count(lit(1)).as("c"))
      // Plurality label, ties to the smallest: min over the unique
      // (-count, label) ordering — deterministic because the ordering
      // key is unique within each group.
      // Truncate lineage EVERY round (the PageRank/Hits/Closeness
      // discipline): without this, plan depth grows linearly with the
      // round budget and analysis/codegen blow up long before the data
      // does.
      labels = cnt.groupBy("id")
        .agg(min_by(col("community"),
          struct((-col("c")).as("nc"), col("community"))).as("community"))
        .localCheckpoint(true)
    }
    // rounds == 0 still needs its lineage severed from sym before the
    // unpersist below; rounds >= 1 is already checkpointed.
    val out = if (rounds == 0) labels.localCheckpoint(true) else labels
    sym.unpersist()
    out
  }

  /** Community size histogram: (csize, n_communities). */
  def sizeHistogram(communities: DataFrame): DataFrame =
    communities.groupBy("community").agg(count(lit(1)).as("csize"))
      .groupBy("csize").agg(count(lit(1)).as("n_communities"))
}
