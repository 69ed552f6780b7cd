package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic distributed HITS (Kleinberg 1999, "Authoritative
  * sources in a hyperlinked environment") — the hub/authority
  * complement of [[PageRank]] for crawl-source weighting: a host that
  * LINKS TO many good sources (hub) is a different quality signal
  * than a host many good hubs POINT AT (authority), and a training-
  * data pipeline uses both (hubs seed the frontier, authorities
  * weight the documents).
  *
  * Mutual recurrence per iteration k:
  *   a_k(i) = Σ_{j→i} h_{k−1}(j)      h_k(i) = Σ_{i→j} a_k(j)
  *
  * Exactness discipline: unlike the float PageRank (whose per-
  * iteration round-to-6 contract still accepts within-Σ order risk),
  * HITS here runs UNNORMALIZED on exact DECIMAL(38,0) accumulators —
  * h₀ = 1, every subsequent score is an integer sum of integers, so
  * there is NO summation-order sensitivity at all and the recurrence
  * replays exactly on any engine. Score growth is bounded by
  * (max_degree)^{2·iters} · |V|: for the 2-iteration default that is
  * deg⁴·|V|, inside DECIMAL(38,0) until max degree ~10⁸ — not a 100 TB
  * constraint (web host graphs top out around 10⁶-10⁷ fan-in). The
  * classical normalized scores are recovered at the END by a single
  * double division per side (score / max(score)) — one deterministic
  * op, not an accumulation.
  *
  * Execution shape per iteration: two keyed join+aggregate rounds
  * (auth keys the edge join on src and groups by dst; hub the
  * reverse), each followed by a lineage-truncating snapshot (the
  * PageRank lesson — constant plan depth, one action per round). The
  * edges are cached TWICE, once hash-partitioned by src and once by
  * dst, so BOTH join directions read a co-located cached layout and
  * no iteration re-shuffles the edge set; the score frames (|V| rows)
  * are what moves.
  */
object Hits {

  /** Unnormalized exact (auth, hub) scores plus max-normalized doubles
    * after `iters` mutual-reinforcement rounds over directed `edges`.
    * Returns (id, auth_raw, hub_raw, auth, hub), one row per node.
    */
  def hits(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iters: Int = 2): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    val reliable = edges.sparkSession.sparkContext.getCheckpointDir.isDefined
    def snapshot(df: DataFrame): DataFrame =
      if (reliable) df.checkpoint(eager = true) else df.localCheckpoint(eager = true)
    val eSrc = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .repartition(col("src")).cache()
    val eDst = eSrc.repartition(col("dst")).cache()
    val nodes = eSrc.select(col("src").as("id"))
      .union(eSrc.select(col("dst").as("id"))).distinct().cache()

    var hub = snapshot(nodes.select(col("id"),
      lit(1).cast("decimal(38,0)").as("s")))
    var auth: DataFrame = null
    for (_ <- 1 to iters) {
      val aIn = eSrc.join(hub, eSrc("src") === hub("id"))
        .groupBy(col("dst").as("nid")).agg(sum(col("s")).as("v"))
      auth = snapshot(nodes.join(aIn, nodes("id") === aIn("nid"), "left")
        .select(col("id"),
          coalesce(col("v"), lit(0).cast("decimal(38,0)")).as("s")))
      val hOut = eDst.join(auth, eDst("dst") === auth("id"))
        .groupBy(col("src").as("nid")).agg(sum(col("s")).as("v"))
      hub = snapshot(nodes.join(hOut, nodes("id") === hOut("nid"), "left")
        .select(col("id"),
          coalesce(col("v"), lit(0).cast("decimal(38,0)")).as("s")))
    }
    val mx = auth.agg(max(col("s")).as("ma"))
      .crossJoin(hub.agg(max(col("s")).as("mh")))
    val out = auth.select(col("id"), col("s").as("ar"))
      .join(hub.select(col("id"), col("s").as("hr")), Seq("id"))
      .crossJoin(broadcast(mx))
      .select(col("id"),
        col("ar").cast("long").as("auth_raw"),
        col("hr").cast("long").as("hub_raw"),
        round(col("ar").cast("double") / col("ma").cast("double"), 6)
          .as("auth"),
        round(col("hr").cast("double") / col("mh").cast("double"), 6)
          .as("hub"))
    val mat = out.localCheckpoint(true)
    eSrc.unpersist(); eDst.unpersist(); nodes.unpersist()
    mat
  }
}
