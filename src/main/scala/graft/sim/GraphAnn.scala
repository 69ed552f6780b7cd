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
  *
  * Known boundary, shared by the whole graph-ANN family: EXACT
  * DUPLICATE vectors form cliques whose members crowd each other out
  * of outsiders' neighbor lists, leaving the clique island-like and
  * greedy search unable to enter it. The remedy is the pipeline this
  * engine already ships — dedup the corpus first (exact/semantic
  * dedup tier), index representatives (GraphAnnSpec pins the
  * composition). Hash-diverse entry points bound the residual risk.
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

  /** One NN-Descent refinement round: score the NEW neighbor-of-
    * neighbor + reverse-neighbor pairs of `adj` against the vector
    * table `v` (columns id, vec, n) and keep each node's top-k. */
  private def refineRound(adj: DataFrame, v: DataFrame, k: Int)
      : DataFrame = {
    val va = v.select(col("id"), col("vec").as("v_a"), col("n").as("n_a"))
    val vb = v.select(col("id").as("nbr"), col("vec").as("v_b"),
      col("n").as("n_b"))
    val fwd = adj.select(col("id"), col("nbr").as("mid"))
      .join(adj.select(col("id").as("mid"), col("nbr").as("cand")), "mid")
      .select(col("id"), col("cand").as("nbr"))
    val rev = adj.select(col("nbr").as("id"), col("id").as("nbr"))
    val cands = fwd.union(rev)
      .filter(col("id") =!= col("nbr"))
      .dropDuplicates("id", "nbr")
      .join(adj.select("id", "nbr"), Seq("id", "nbr"), "left_anti")
    val scored = cands
      .join(va, "id")
      .join(vb, "nbr")
      .withColumn("score", scoreCol)
      .select("id", "nbr", "score")
    topPerId(adj.union(scored), k)
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

    for (_ <- 1 to rounds)
      adj = refineRound(adj, v, k).localCheckpoint(true)
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

  /** INCREMENTAL APPEND (the IVF family's no-rebuild contract, on the
    * graph tier): new vectors join the at-rest graph without touching
    * the old adjacency's quality — each new point beam-searches the
    * EXISTING graph for its true neighborhood (the same routine
    * serving uses, so insertion quality equals serving quality — the
    * HNSW insert idea), adopts its top-k as out-edges, and donates
    * BACK-edges to the nodes it found, with every touched node's
    * degree re-capped at k. One search + two bounded window top-ks;
    * the rewritten layout is the same one-relation parquet. */
  def appendToGraph(
      spark: SparkSession, path: String,
      df: DataFrame, idCol: String, vecCol: String,
      k: Int, beam: Int, iters: Int, entries: Int): Unit = {
    val newV = df.select(col(idCol).cast("long").as("id"),
        col(vecCol).cast("array<double>").as("vec"))
      .withColumn("n", VectorSim.norm(col("vec")))
    val found = searchGraph(spark, path,
      newV.select(col("id").as("qid"), col("vec").as("qv")),
      "qid", "qv", k, beam, iters, entries)
    val outE = found.select(col("qid").as("id"), col("id").as("nbr"),
      col("score"))
    // Back-edges carry a RESERVED per-node quota (k/2) instead of
    // competing against the old top-k: in a dense region every old
    // neighbor outscores a newcomer by luck of ties, and capped-away
    // back-edges would leave new nodes unreachable. Total old-node
    // degree stays bounded at 2k across any number of appends (the
    // final cap below).
    val backE = topPerId(found.select(col("id"),
      col("qid").as("nbr"), col("score")), math.max(1, k / 2))
    // the batch's INTERNAL neighborhood — new points can be each
    // other's true neighbors, which the old graph cannot express
    val internal = buildGraph(newV, "id", "vec", k,
      rounds = 1, blocks = math.max(2, entries))
    val g = spark.read.parquet(path)
    val oldE = g.filter(col("nbrs").isNotNull)
      .select(col("id"), explode(col("nbrs")).as("e"))
      .select(col("id"), col("e.nbr").as("nbr"), col("e.score").as("score"))
    val allV = g.select("id", "vec", "n").union(newV)
    // one NN-Descent round over the MERGED graph repairs cross-batch
    // neighborhoods (an old node whose true neighbor arrived in this
    // batch finds it through the batch's out-edges) — bounded O(n·k²)
    // work, same as one build round
    val merged = refineRound(
      topPerId(oldE.union(outE).union(backE).union(internal)
        .dropDuplicates("id", "nbr"), 2 * k),
      allV, 2 * k)
    val adj = merged
      .groupBy("id")
      .agg(collect_list(struct(col("nbr"), col("score"))).as("nbrs"))
    val out = allV.join(adj, Seq("id"), "left")
    // stage-then-swap: never read and overwrite the same files in one job
    val tmp = path + "_stage"
    out.write.mode("overwrite").parquet(tmp)
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(conf)
    fs.delete(new org.apache.hadoop.fs.Path(path), true)
    fs.rename(new org.apache.hadoop.fs.Path(tmp),
      new org.apache.hadoop.fs.Path(path))
  }

  /** Distributed best-first beam search for a batch of queries over
    * the at-rest graph, with a COARSE ENTRY PHASE (the two-layer NSW
    * idea): a deterministic ~√n hash-sample of the nodes is scored
    * exhaustively against the broadcast queries — one pass over a
    * SMALL relation — and each query takes its own top-`entries` as
    * personalized entry points. A flat kNN graph of well-separated
    * clusters is DISCONNECTED by construction (true neighbors are
    * always in-cluster), so fixed entries can strand a query in the
    * wrong component; the √n sample hits every non-trivial component
    * and costs O(√n · queries), the coarse-probe shape IVF pays per
    * query anyway. Returns (qid, id, score, rank), rank 1..k. */
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
    val nSample = math.max(entries,
      math.ceil(math.sqrt(g.count().toDouble)).toInt)
    val sample = g.select("id")
      .orderBy(xxhash64(col("id")), col("id")).limit(nSample)
    val wEntry = Window.partitionBy("qid")
      .orderBy(col("score").desc, col("id").asc)
    var visited = score(q.select("qid").crossJoin(sample))
      .withColumn("__r", row_number().over(wEntry))
      .filter(col("__r") <= entries).drop("__r")
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
