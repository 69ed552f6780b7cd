package graft.sim

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Embedding similarity search over an `array<float>`/`array<double>`
  * column. All scoring is pure Catalyst expressions (`zip_with` +
  * `aggregate`) — codegen'd, no UDFs, column-pruned down to the scan.
  *
  * Three shapes, by scale:
  *  - [[topK]]: brute-force top-k against ONE broadcast query vector —
  *    a single scan + TakeOrderedAndProject; the right plan at any
  *    scale for single-query lookup (100 TB = one pass, no shuffle
  *    beyond the k-row result).
  *  - [[cosinePairs]]: all pairs ≥ threshold within join-key blocks —
  *    exact, quadratic only inside a block; the block key bounds the
  *    fanout (like a sharded GEMM).
  *  - [[AnnLsh]] (separate file): random-hyperplane bucketed search
  *    when there is no natural block key and all-pairs is off the
  *    table.
  */
object VectorSim {

  /** Dot product of two array columns (element type coerced to
    * double). Routed through the fused native [[DotExpr]] — one
    * codegen loop over the two buffers, bit-identical to the composed
    * `aggregate(zip_with(...))` fold it replaces (~2.3× on the kernel,
    * tools/DotProbe; parity pinned in DotExprSpec). */
  def dot(a: Column, b: Column): Column = DotExpr(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; 0.0 when either vector has zero norm. */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val nn = norm(a) * norm(b)
    when(nn > 0, d / nn).otherwise(lit(0.0))
  }

  /** Exact top-k rows by cosine similarity to one query vector.
    * The query vector is inlined as a literal array (broadcast with the
    * plan); Spark plans orderBy+limit as TakeOrderedAndProject — each
    * partition keeps its own top k, only k·partitions rows move.
    * Ties broken by `tieBreak` ascending for determinism.
    */
  def topK(
      df: DataFrame,
      vecCol: String,
      query: Array[Double],
      k: Int,
      tieBreak: String): DataFrame = {
    val q = array(query.map(lit): _*)
    // The query norm is a constant but HOF expressions don't constant-
    // fold — compute it driver-side (same left-to-right sum as the
    // aggregate() form, so the double result is bit-identical).
    val qNorm = math.sqrt(query.foldLeft(0.0)((acc, x) => acc + x * x))
    val nn = norm(col(vecCol)) * lit(qNorm)
    val score = when(nn > 0, dot(col(vecCol), q) / nn).otherwise(lit(0.0))
    df.withColumn("score", round(score, 6))
      .orderBy(col("score").desc, col(tieBreak).asc)
      .limit(k)
  }

  /** Exact cosine near-neighbor pairs within blocks of `blockCol`.
    * Quadratic only inside each block: the self-join is a real equi-join
    * on the block key, so Spark shuffles each block to one place and
    * never materializes cross-block pairs. Output (id_a, id_b, score),
    * id_a < id_b.
    */
  /** JVM pair-scoring kernel: appends `score` = round(dot/(n_a·n_b), 6)
    * from columns (v_a, v_b, n_a, n_b). Bit-identical to the Column
    * form — same left-to-right double sum as `aggregate(zip_with(...))`
    * and the same HALF_UP BigDecimal round Spark's `round` applies to
    * doubles — but one tight loop per pair instead of a per-pair array
    * allocation (the verification stage dominated both pair operators).
    */
  private[sim] def scorePairs(joined: DataFrame): DataFrame = {
    val schema = joined.schema.add("score", DoubleType)
    val enc = Encoders.row(schema)
    val vaI = joined.schema.fieldIndex("v_a")
    val vbI = joined.schema.fieldIndex("v_b")
    val naI = joined.schema.fieldIndex("n_a")
    val nbI = joined.schema.fieldIndex("n_b")
    joined.mapPartitions { it =>
      it.map { r =>
        val va = r.getSeq[Double](vaI)
        val vb = r.getSeq[Double](vbI)
        val nn = r.getDouble(naI) * r.getDouble(nbI)
        val raw = if (nn > 0) {
          var d = 0.0
          var i = 0
          val n = math.min(va.length, vb.length)
          while (i < n) { d += va(i) * vb(i); i += 1 }
          d / nn
        } else 0.0
        val score = java.math.BigDecimal.valueOf(raw)
          .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
        Row.fromSeq(r.toSeq :+ score)
      }
    }(enc)
  }

  /** Exact top-k per query for a BATCH of query vectors — the serving
    * shape when many lookups amortize one corpus pass. The query set is
    * broadcast (small side by definition), scoring stays codegen'd
    * Catalyst, and the per-query limit is a `row_number() <= k` rank
    * filter that Spark 3.5+ plans as WindowGroupLimit: each task keeps
    * only its local top k per query BEFORE the shuffle (asserted in
    * VectorSimSpec), so the exchange moves ≤ k·queries rows per
    * partition, never the scored cross product. One scan, one bounded
    * shuffle, any corpus size.
    *
    * @param queries DataFrame of (qidCol, qvecCol) — must fit a
    *                broadcast; thousands of queries are fine
    * @return (qid, corpus columns, score, rank), rank 1..k per qid,
    *         ties broken by `tieBreak` ascending
    */
  def topKBatch(
      corpus: DataFrame,
      vecCol: String,
      queries: DataFrame,
      qidCol: String,
      qvecCol: String,
      k: Int,
      tieBreak: String): DataFrame = {
    val q = broadcast(
      queries.select(col(qidCol).as("qid"),
        col(qvecCol).cast("array<double>").as("__qv"))
        .withColumn("__qn", norm(col("__qv"))))
    // corpus norm computed ONCE per row, not once per (row, query)
    val c = corpus.withColumn("__cn", norm(col(vecCol).cast("array<double>")))
    val nn = col("__cn") * col("__qn")
    val score = when(nn > 0, dot(col(vecCol), col("__qv")) / nn).otherwise(lit(0.0))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("score").desc, col(tieBreak).asc)
    c.crossJoin(q)
      .withColumn("score", round(score, 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .drop("__qv", "__qn", "__cn")
  }

  def cosinePairs(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      blockCol: String,
      threshold: Double): DataFrame = {
    // Precompute each row's norm ONCE before the join — computing
    // cosine(v_a, v_b) per pair re-derives both norms |block| times.
    val withNorm = df.select(
      col(blockCol).as("blk"), col(idCol).as("id"),
      col(vecCol).cast("array<double>").as("v"))
      .withColumn("nrm", norm(col("v")))
    val a = withNorm.select(col("blk"), col("id").as("id_a"), col("v").as("v_a"), col("nrm").as("n_a"))
    val b = withNorm.select(col("blk"), col("id").as("id_b"), col("v").as("v_b"), col("nrm").as("n_b"))
    val joined = a.join(b, Seq("blk")).filter(col("id_a") < col("id_b"))
    scorePairs(joined)
      .filter(col("score") >= threshold)
      .select(col("blk"), col("id_a"), col("id_b"), col("score"))
  }
}
