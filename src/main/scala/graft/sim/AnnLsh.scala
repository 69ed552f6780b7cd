package graft.sim

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, LongType}
import graft.util.Md5Hash

/** Approximate nearest neighbors via random-hyperplane (sign) LSH —
  * the scale path when brute-force cosine ([[VectorSim]]) is too hot
  * and there is no natural blocking key.
  *
  * Sign-LSH (Charikar '02): for hyperplane r, h_r(v) = sign(r·v); for
  * unit-ish vectors P[h_a(u)=h_a(v)] = 1 − θ(u,v)/π, so vectors at high
  * cosine collide on whole sign-bit blocks with high probability.
  *
  * Hyperplanes are sparse Achlioptas projections (components +1/0/−1
  * with probability 1/6 / 2/3 / 1/6 — Achlioptas '01,
  * "Database-friendly random projections"), each component derived
  * from the md5 of "seed:table:bit:component". Two wins over
  * seeded-PRNG Gaussians: integer-exact reproducibility in a SQL
  * oracle (no RNG stream to replay, no ln/cos whose last-ulp behavior
  * differs across engines), and 3× fewer multiplies per projection.
  *
  *  - `tables` independent hash tables, each `bits` hyperplanes →
  *    bucket key = (table << bits) | packed sign bits (injective, so
  *    table t's signature can only match table t's), computed in one
  *    `mapPartitions` JVM pass over a broadcast plane matrix (the
  *    tables×bits×dim literal expression tree overflowed codegen and
  *    ran interpreted — the JVM loop is the same math);
  *  - candidates = bucket-mates in ≥1 table — a skinny equi-join on
  *    the bucket key, vectors re-attached per pair afterwards;
  *  - exact cosine verification on candidates.
  *
  * Miss probability for a pair at angle θ: (1 − (1−θ/π)^bits)^tables.
  */
object AnnLsh {

  /** Sparse ±1/0 hyperplanes: tables × bits rows of `dim` components,
    * component (t,i,j) = md5("seed:t:i:j") mod 6 mapped 0→+1, 5→−1,
    * else 0 — the exact construction the DuckDB oracle replays.
    */
  private[sim] def planes(dim: Int, bits: Int, tables: Int, seed: Long): Array[Array[Double]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(tables * bits) { ti =>
      val t = ti / bits
      val i = ti % bits
      Array.tabulate(dim) { j =>
        java.lang.Long.remainderUnsigned(Md5Hash.prefix64(s"$seed:$t:$i:$j", md), 6L) match {
          case 0L => 1.0
          case 5L => -1.0
          case _ => 0.0
        }
      }
    }
  }

  /** JVM kernel: per-table bucket key (table << bits) | sign bits. */
  private def signatures(
      v: Array[Double], ps: Array[Array[Double]], bits: Int, tables: Int): Array[Long] =
    Array.tabulate(tables) { t =>
      var sig = 0L
      var i = 0
      while (i < bits) {
        val plane = ps(t * bits + i)
        var d = 0.0
        var j = 0
        while (j < v.length) { d += v(j) * plane(j); j += 1 }
        if (d >= 0) sig |= (1L << i)
        i += 1
      }
      (t.toLong << bits) | sig
    }

  /** Attach the per-table bucket array (one mapPartitions pass). */
  private def bucketed(
      df: DataFrame, vecCol: String, idCol: String,
      dim: Int, bits: Int, tables: Int, seed: Long): DataFrame = {
    val src = graft.util.Partitioning.parallelize(
      df.select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v")))
    val schema = src.schema.add("buckets", ArrayType(LongType, containsNull = false))
    val enc = Encoders.row(schema)
    val spark = df.sparkSession
    val bcPlanes = spark.sparkContext.broadcast(planes(dim, bits, tables, seed))
    src.mapPartitions { it =>
      it.map { r =>
        val v = r.getSeq[Double](1).toArray
        Row(r.get(0), r.get(1), signatures(v, bcPlanes.value, bits, tables).toSeq)
      }
    }(enc)
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
    val b = bucketed(df, vecCol, idCol, dim, bits, tables, seed)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val skinny = b.select(col("id"), explode(col("buckets")).as("sig"))
    val candidates = skinny.as("a")
      .join(skinny.as("b"), col("a.sig") === col("b.sig") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()

    val vecs = b.select(col("id"), col("v")).withColumn("nrm", VectorSim.norm(col("v")))
    val joined = candidates
      .join(vecs.select(col("id").as("id_a"), col("v").as("v_a"), col("nrm").as("n_a")), "id_a")
      .join(vecs.select(col("id").as("id_b"), col("v").as("v_b"), col("nrm").as("n_b")), "id_b")
    VectorSim.scorePairs(joined)
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
    val qSigs = signatures(query, planes(dim, bits, tables, seed), bits, tables)
    val idCol = tieBreak
    val b = bucketed(df.withColumnRenamed(vecCol, "__v"), "__v", idCol,
      dim, bits, tables, seed)
    val qdf = qSigs.toSeq.toDF("sig")
    val hits = b.select(col("id"), explode(col("buckets")).as("sig"))
      .join(qdf, "sig")
      .select("id").distinct()
    df.join(hits.withColumnRenamed("id", tieBreak), tieBreak)
      .withColumn("score", round(VectorSim.cosine(
        col(vecCol).cast("array<double>"), array(query.map(lit): _*)), 6))
      .orderBy(col("score").desc, col(tieBreak).asc)
      .limit(k)
  }
}
