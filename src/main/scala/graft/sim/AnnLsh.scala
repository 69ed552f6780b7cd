package graft.sim

import scala.util.Random
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate nearest neighbors via random-hyperplane (sign) LSH —
  * the scale path when brute-force cosine ([[VectorSim]]) is too hot
  * and there is no natural blocking key.
  *
  * Sign-LSH (Charikar '02): for hyperplane r, h_r(v) = sign(r·v); for
  * unit-ish vectors P[h_a(u)=h_a(v)] = 1 − θ(u,v)/π, so vectors at high
  * cosine collide on whole sign-bit blocks with high probability.
  *
  *  - `tables` independent hash tables, each `bits` hyperplanes →
  *    bucket key = (table, packed sign bits);
  *  - candidates = bucket-mates in ≥1 table (equi-join on bucket);
  *  - exact cosine verification on candidates.
  *
  * Miss probability for a pair at angle θ: (1 − (1−θ/π)^bits)^tables.
  * All hyperplanes are generated driver-side from a fixed seed and
  * inlined as literals — deterministic run-over-run, broadcast with
  * the plan.
  */
object AnnLsh {

  /** `tables` bucket keys per vector, as array<struct<tbl,sig>>. */
  def bucketKeys(vecCol: Column, dim: Int, bits: Int, tables: Int, seed: Long): Column = {
    val rnd = new Random(seed)
    val keys = (0 until tables).map { t =>
      val sig = (0 until bits).map { i =>
        val plane = array(Array.fill(dim)(lit(rnd.nextGaussian())): _*)
        when(VectorSim.dot(vecCol, plane) >= 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
      }.reduce((a, b) => a.bitwiseOR(b))
      struct(lit(t).as("tbl"), sig.as("sig"))
    }
    array(keys: _*)
  }

  /** Approximate cosine near-neighbor pairs (id_a < id_b, score ≥
    * threshold, exact-verified). Probabilistic recall — see class doc.
    */
  def nearNeighborPairs(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      dim: Int,
      threshold: Double,
      bits: Int = 8,
      tables: Int = 8,
      seed: Long = 42L): DataFrame = {
    val bucketed = df
      .select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("bucket", explode(bucketKeys(col("v"), dim, bits, tables, seed)))

    val a = bucketed.select(col("id").as("id_a"), col("v").as("v_a"), col("bucket"))
    val b = bucketed.select(col("id").as("id_b"), col("v").as("v_b"), col("bucket"))
    a.join(b, a("bucket") === b("bucket") && col("id_a") < col("id_b"))
      .select("id_a", "id_b", "v_a", "v_b")
      .distinct()
      .withColumn("score", round(VectorSim.cosine(col("v_a"), col("v_b")), 6))
      .filter(col("score") >= threshold)
      .select("id_a", "id_b", "score")
  }

  /** Approximate top-k for one query vector: probe only the query's
    * buckets, then exact-score the candidates. At scale this reads a
    * bucket-partitioned table instead of the full scan [[VectorSim.topK]]
    * does.
    */
  def topK(
      df: DataFrame,
      vecCol: String,
      query: Array[Double],
      k: Int,
      tieBreak: String,
      bits: Int = 8,
      tables: Int = 8,
      seed: Long = 42L): DataFrame = {
    val dim = query.length
    val spark = df.sparkSession
    import spark.implicits._
    // The query's buckets, computed with the same literal hyperplanes.
    val qdf = Seq(1).toDF("one").select(
      explode(bucketKeys(array(query.map(lit): _*), dim, bits, tables, seed)).as("bucket"))
    val bucketed = df
      .withColumn("bucket", explode(bucketKeys(col(vecCol), dim, bits, tables, seed)))
    bucketed
      .join(qdf, "bucket")
      .drop("bucket")
      .distinct()
      .withColumn("score", round(VectorSim.cosine(col(vecCol), array(query.map(lit): _*)), 6))
      .orderBy(col("score").desc, col(tieBreak).asc)
      .limit(k)
  }
}
