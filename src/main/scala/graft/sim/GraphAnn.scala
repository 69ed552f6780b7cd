package graft.sim

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** GRAPH-tier ANN (VERDICT r13 directive #7, the HNSW/NSW family):
  * a distributed k-NN-graph build plus beam-search serving — the
  * highest-recall-per-probe serving structure modern RAG stacks
  * default to, re-expressed in Spark's execution model instead of the
  * sequential insert loop the single-node HNSW paper uses:
  *
  *  - BUILD = NN-Descent (Dong et al., WWW'11): seed each node's
  *    neighbor list from TWO independent hash blockings (quadratic
  *    only within a block — never corpus²), then refinement rounds of
  *    the NN-Descent step: a node's candidates are its neighbors'
  *    neighbors plus its reverse neighbors; only NEW pairs are scored
  *    (anti-join against the current list); each node keeps its top-k.
  *    Every round is two self-joins + one bounded window top-k —
  *    O(n·k²) candidate pairs, shuffled on id, no driver loop over
  *    rows. The final graph is symmetrized and degree-capped (the
  *    DiskANN discipline), which is what makes greedy search escape
  *    local entry points.
  *  - LAYOUT = one parquet table (id, vec, norm, nbrs) — adjacency
  *    and vectors co-located, so serving reads one relation.
  *  - SERVE = distributed best-first beam search for a BATCH of
  *    queries: per round, the per-query frontier (top `beam` of the
  *    newly-scored nodes) expands through the adjacency (one join +
  *    explode), already-visited nodes are anti-joined away, and only
  *    the new nodes are scored against the broadcast queries. Per
  *    round per query the work is ≤ beam·degree candidate rows —
  *    bounded by the graph, never by the corpus.
  *
  * Scores are the exact tier's own expression (round(cosine, 6) via
  * the codegen [[VectorSim.dot]] kernel, ties by id), so a search
  * that visits the true neighbors returns BIT-IDENTICAL rows to
  * [[VectorSim.topKBatch]] — which is how the recall audit and the
  * oracle face it.
  */
object GraphAnn {

  private def scoreCol: Column = {
    val nn = col("n_a") * col("n_b")
    round(when(nn > 0, VectorSim.dot(col("v_a"), col("v_b")) / nn)
      .otherwise(lit(0.0)), 6)
  }

  private def topPerId(edges: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("id")
      .orderBy(col("score").desc, col("nbr").asc)
    edges.withColumn("__r", row_number().over(w))
      .filter(col("__r") <= k).drop("__r")
  }

  /** Build the k-NN graph: (id, nbr, score) edges, degree ≤ k after
    * symmetrization. `blocks` bounds the seed block size (quadratic
    * within a block); `rounds` NN-Descent refinement rounds. */
  def buildGraph(
      df: DataFrame, idCol: String, vecCol: String,
      k: Int, rounds: Int, blocks: Int): DataFrame = {
    val v = df.select(col(idCol).cast("long").as("id"),
        col(vecCol).cast("array<double>").as("vec"))
      .withColumn("n", VectorSim.norm(col("vec")))
    val va = v.select(col("id").as("id_a"), col("vec").as("v_a"),
      col("n").as("n_a"))
    val vb = v.select(col("id").as("id_b"), col("vec").as("v_b"),
      col("n").as("n_b"))

    // two independent deterministic blockings seed diverse neighbors
    def seedPass(salt: Int): DataFrame = {
      val blk = pmod(xxhash64(col("id"), lit(salt)), lit(blocks.toLong))
      val a = v.withColumn("blk", blk)
        .select(col("blk"), col("id").as("id_a"), col("vec").as("v_a"),
          col("n").as("n_a"))
      val b = v.withColumn("blk", blk)
        .select(col("blk"), col("id").as("id_b"), col("vec").as("v_b"),
          col("n").as("n_b"))
      a.join(b, "blk").filter(col("id_a") =!= col("id_b"))
        .withColumn("score", scoreCol)
        .select(col("id_a").as("id"), col("id_b").as("nbr"), col("score"))
    }
    var adj = topPerId(
      seedPass(0).union(seedPass(1)).dropDuplicates("id", "nbr"), k)
      .localCheckpoint(true)

    for (_ <- 1 to rounds) {
      val fwd = adj.select(col("id"), col("nbr").as("mid"))
        .join(adj.select(col("id").as("mid"), col("nbr").as("cand")), "mid")
        .select(col("id"), col("cand").as("nbr"))
      val rev = adj.select(col("nbr").as("id"), col("id").as("nbr"))
      val cands = fwd.union(rev)
        .filter(col("id") =!= col("nbr"))
        .dropDuplicates("id", "nbr")
        .join(adj.select("id", "nbr"), Seq("id", "nbr"), "left_anti")
      val scored = cands
        .join(va.withColumnRenamed("id_a", "id"), "id")
        .join(vb.withColumnRenamed("id_b", "nbr"), "nbr")
        .withColumn("score", scoreCol)
        .select("id", "nbr", "score")
      adj = topPerId(adj.union(scored), k).localCheckpoint(true)
    }
    // symmetrize, then cap the degree (DiskANN-style bounded out-degree)
    topPerId(
      adj.union(adj.select(col("nbr").as("id"), col("id").as("nbr"),
        col("score"))).dropDuplicates("id", "nbr"), k)
  }

  /** Materialize the at-rest layout: (id, vec, n, nbrs) parquet —
    * adjacency co-located with vectors for one-relation serving. */
  def writeGraph(
      spark: SparkSession, df: DataFrame, idCol: String, vecCol: String,
      path: String, k: Int, rounds: Int, blocks: Int): Unit = {
    val v = df.select(col(idCol).cast("long").as("id"),
        col(vecCol).cast("array<double>").as("vec"))
      .withColumn("n", VectorSim.norm(col("vec")))
    val adj = buildGraph(df, idCol, vecCol, k, rounds, blocks)
      .groupBy("id")
      .agg(collect_list(struct(col("nbr"), col("score"))).as("nbrs"))
    v.join(adj, Seq("id"), "left")
      .write.mode("overwrite").parquet(path)
  }

  /** Distributed best-first beam search for a batch of queries over
    * the at-rest graph. Entry points are the `entries` smallest ids
    * (deterministic). Returns (qid, id, score, rank), rank 1..k. */
  def searchGraph(
      spark: SparkSession, path: String,
      queries: DataFrame, qidCol: String, qvecCol: String,
      k: Int, beam: Int, iters: Int, entries: Int): DataFrame = {
    val g = spark.read.parquet(path)
    val q = broadcast(queries.select(col(qidCol).as("qid"),
        col(qvecCol).cast("array<double>").as("qv"))
      .withColumn("qn", VectorSim.norm(col("qv"))))
    def score(nodes: DataFrame): DataFrame = {
      val nn = col("n") * col("qn")
      nodes.join(g.select("id", "vec", "n"), "id")
        .join(q, "qid")
        .withColumn("score",
          round(when(nn > 0, VectorSim.dot(col("vec"), col("qv")) / nn)
            .otherwise(lit(0.0)), 6))
        .select("qid", "id", "score")
    }
    val entry = g.select("id").orderBy("id").limit(entries)
    var visited = score(q.select("qid").crossJoin(entry))
      .localCheckpoint(true)
    var frontier = visited
    for (_ <- 1 to iters) {
      val cand = frontier
        .join(g.select(col("id"), col("nbrs")), "id")
        .select(col("qid"), explode(col("nbrs")).as("e"))
        .select(col("qid"), col("e.nbr").as("id"))
        .dropDuplicates("qid", "id")
        .join(visited.select("qid", "id"), Seq("qid", "id"), "left_anti")
      val fresh = score(cand).localCheckpoint(true)
      visited = visited.union(fresh).localCheckpoint(true)
      val w = Window.partitionBy("qid")
        .orderBy(col("score").desc, col("id").asc)
      frontier = fresh.withColumn("__r", row_number().over(w))
        .filter(col("__r") <= beam).drop("__r")
    }
    val w = Window.partitionBy("qid")
      .orderBy(col("score").desc, col("id").asc)
    visited.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }
}
