package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** E2LSH-style Euclidean ANN — the L2 sibling of the sign-LSH cosine
  * family (AnnLsh.scala): bucket = ⌊proj(x) + b⌋ on a unit-width lattice
  * (Datar et al. 2004's h(x) = ⌊(a·x + b)/w⌋ with w = 1), g buckets
  * concatenated per table, L tables OR-ed for recall. Near points in
  * L2 land in the same lattice cell in at least one table with high
  * probability; far points rarely do — candidate generation is a plain
  * equi-join on the composite bucket key, never all-pairs.
  *
  * Determinism: projections are the Rademacher chained sums of
  * RandomProjection (Achlioptas 2003 — JL-grade, and exactly
  * replayable in SQL, unlike Gaussian draws); offsets b_j are
  * md5-derived doubles in [0, 1); ⌊y + b⌋ is one exactly-rounded add
  * then an exact floor. The exact re-rank distance is a left-to-right
  * chained sum of squared differences. Every number the operator emits
  * is therefore bit-reproducible by a SQL mirror.
  *
  * Scale shape: L·n bucket rows, one equi-join per candidate
  * generation (shuffle on the bucket key), re-rank only on candidates.
  * Tuning is the standard LSH dial: more tables → recall, longer keys
  * (g) → precision. The exact top-k tier (VectorSim) remains the
  * cross-check; this is the 100 TB path for L2 metrics where the
  * cosine family's normalization is wrong (e.g. un-normalized image
  * embeddings).
  */
object EuclideanLsh {

  /** Offset b_j ∈ [0, 1) for lane j — md5-derived, embeddable in SQL
    * as a round-tripping double literal.
    */
  def offset(seed: String, j: Int): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"$seed|b|$j".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 15)
    java.lang.Long.parseLong(hex, 16) / 1152921504606846976.0 // / 2^60
  }

  /** (id, t, bkey) bucket rows: for each of the `tables` tables, the
    * composite key of `g` lattice cells over the Rademacher
    * projections of `vecCol` (length `d`).
    */
  def buckets(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      d: Int,
      g: Int,
      tables: Int,
      seed: String): DataFrame = {
    require(g > 0 && tables > 0, "g and tables must be positive")
    val m = g * tables
    val proj = RandomProjection.project(df, vecCol, d, m, seed, "__y")
    val keyOfTable: Seq[Column] = (1 to tables).map { t =>
      val cells = (1 to g).map { i =>
        val j = (t - 1) * g + i
        floor(element_at(col("__y"), j) + lit(offset(seed, j))).cast("long")
      }
      struct(lit(t).as("t"), concat_ws(",", cells: _*).as("bkey"))
    }
    proj.select(col(idCol).as("id"), explode(array(keyOfTable: _*)).as("e"))
      .select(col("id"), col("e.t").as("t"), col("e.bkey").as("bkey"))
  }

  /** Bucket-pruned exact-re-ranked top-k: for each row of `queries`,
    * the k L2-nearest corpus rows among its LSH candidates (self
    * excluded). Returns (q_id, rank, cand_id, dist2).
    */
  def annTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      d: Int,
      g: Int,
      tables: Int,
      seed: String,
      k: Int): DataFrame = {
    val cb = buckets(corpus, idCol, vecCol, d, g, tables, seed)
    val qb = buckets(queries, idCol, vecCol, d, g, tables, seed)
      .withColumnRenamed("id", "q_id")
    val cand = qb.join(cb, Seq("t", "bkey"))
      .where(col("id") =!= col("q_id"))
      .select(col("q_id"), col("id").as("cand_id"))
      .distinct()
    val qv = queries.select(col(idCol).as("q_id"), col(vecCol).as("__qv"))
    val cv = corpus.select(col(idCol).as("cand_id"), col(vecCol).as("__cv"))
    val dist2 = (1 to d).foldLeft(lit(0.0)) { (acc, i) =>
      val dx = element_at(col("__qv"), i).cast("double") -
        element_at(col("__cv"), i).cast("double")
      acc + dx * dx
    }
    val w = Window.partitionBy("q_id").orderBy(col("dist2"), col("cand_id"))
    cand.join(qv, "q_id").join(cv, "cand_id")
      .select(col("q_id"), col("cand_id"), dist2.as("dist2"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("cand_id"), col("dist2"))
  }
}
