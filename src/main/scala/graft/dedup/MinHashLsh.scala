package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.text.TextFunctions

/** MinHash + banded LSH near-duplicate detection — the sketch-based
  * scale path for dedup when even prefix-filtered joins (see
  * [[Dedup.jaccardPairs]]) are too hot.
  *
  * Pipeline (all Catalyst expressions + keyed joins, no UDFs):
  *  1. shingle each document (distinct n-grams);
  *  2. k minhashes per doc: h_j(S) = min over s∈S of ((a_j·x + b_j) mod p)
  *     where x = xxhash64(shingle) — one `transform` + `array_min` per
  *     hash, vectorized over the shingle array;
  *  3. group the k hashes into b bands of r rows; band signature =
  *     hash of the band's minhash tuple;
  *  4. candidate pairs = docs sharing any (band index, band signature)
  *     bucket — an equi-join on the bucket key, never all-pairs;
  *  5. verify candidates with exact Jaccard on the carried shingle sets.
  *
  * Probability a true pair at Jaccard s is missed: (1 - s^r)^b — with
  * the defaults (r=2, b=64) a 0.5-similar pair is missed with
  * probability (1-0.25)^64 ≈ 1e-8.
  *
  * At scale the bucket join shuffles one row per (doc, band); bucket
  * skew (a degenerate signature shared by many docs) is the standard
  * failure mode — cap exploded bucket sizes upstream or raise r.
  */
object MinHashLsh {

  /** Modulus 2^31−1 (Mersenne prime): keeps x·a + b < 2^62 for
    * x, a, b < P so the affine permutation never overflows a long —
    * a silent 2^63 wrap would make "mod P" a lie.
    */
  private val P = 2147483647L

  /** Deterministic (a, b) parameters for hash j — a ∈ [1, P), b ∈ [0, P),
    * fixed seed so results are reproducible run-over-run.
    */
  private def hashParams(k: Int): Seq[(Long, Long)] =
    (0 until k).map { j =>
      val a = math.abs((1103515245L * (j + 1) + 12345L) % (P - 1)) + 1
      val b = math.abs((6364136223846793005L * (j + 1) + 1442695040888963407L) % P)
      (a, b)
    }

  /** k-minhash signature column (array<bigint>) over a shingle-set
    * column. `pmod(xxhash64(s), P)` maps each shingle to [0, P); each
    * row of the signature is the min of an affine permutation of those.
    */
  def signature(shingleSet: Column, k: Int): Column = {
    val hashed = transform(shingleSet, s => pmod(xxhash64(s), lit(P)))
    array(hashParams(k).map { case (a, b) =>
      array_min(transform(hashed, x => pmod(x * lit(a) + lit(b), lit(P))))
    }: _*)
  }

  /** Near-duplicate pairs with exact-Jaccard verification of LSH
    * candidates. Output: (id_a, id_b, jaccard), id_a < id_b.
    *
    * `bands`×`rows` minhashes are computed; only pairs colliding in ≥1
    * band are verified. Exact w.r.t. the candidate set; the candidate
    * set itself is probabilistic with miss rate (1-s^r)^b (see class
    * doc) — the recall test in MinHashLshSpec pins it at 1.0 on the
    * fixture data.
    */
  def nearDupPairs(
      df: DataFrame,
      textCol: String,
      idCol: String,
      n: Int = 3,
      threshold: Double = 0.5,
      bands: Int = 64,
      rows: Int = 2): DataFrame = {
    val docs = df
      .select(col(idCol).as("id"), TextFunctions.shingles(col(textCol), n).as("sh"))
      .filter(size(col("sh")) > 0)
      .withColumn("sig", signature(col("sh"), bands * rows))

    // band i's signature = xxhash64 over its r minhash values.
    val bandCols = (0 until bands).map { i =>
      struct(lit(i).as("band"),
        xxhash64(slice(col("sig"), i * rows + 1, rows)).as("bsig"))
    }
    val bucketed = docs
      .withColumn("bucket", explode(array(bandCols: _*)))
      .select("id", "sh", "bucket")

    val a = bucketed.select(col("id").as("id_a"), col("sh").as("sh_a"), col("bucket"))
    val b = bucketed.select(col("id").as("id_b"), col("sh").as("sh_b"), col("bucket"))
    a.join(b, a("bucket") === b("bucket") && col("id_a") < col("id_b"))
      .select("id_a", "id_b", "sh_a", "sh_b")
      .distinct()
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))).cast("double"))
      .withColumn("jaccard",
        round(col("inter") / (size(col("sh_a")) + size(col("sh_b")) - col("inter")), 6))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }
}
