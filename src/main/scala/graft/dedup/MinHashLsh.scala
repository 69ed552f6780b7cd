package graft.dedup

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, LongType}
import graft.text.TextFunctions
import graft.util.Hash64

/** MinHash + banded LSH near-duplicate detection — the sketch-based
  * scale path for dedup when even prefix-filtered joins (see
  * [[Dedup.jaccardPairs]]) are too hot.
  *
  * Pipeline:
  *  1. shingle each document (distinct n-grams, Catalyst expressions);
  *  2. per doc, one `mapPartitions` pass computes the k minhashes
  *     h_j(S) = min over s∈S of ((a_j·x + b_j) mod p), x = Hash64(s),
  *     then folds each band of r minhashes into one 64-bit band
  *     signature — a tight JVM loop. (The same math as a Column
  *     expression tree is 128 array traversals per row and overflows
  *     janino codegen → interpreted eval, ~8× slower end to end.)
  *  3. explode only (doc id, band, signature) — candidates are doc
  *     pairs sharing any band bucket, found by a SKINNY equi-join on
  *     (band, signature): no shingle arrays travel through the join;
  *  4. distinct candidate pairs re-join the per-doc shingle sets (one
  *     keyed join per side) and are verified with exact Jaccard.
  *
  * Probability a true pair at Jaccard s is missed: (1 - s^r)^b — with
  * the defaults (r=2, b=64) a 0.5-similar pair is missed with
  * probability (1-0.25)^64 ≈ 1e-8.
  *
  * At scale the bucket join shuffles one 24-byte row per (doc, band);
  * bucket skew (a degenerate signature shared by many docs) is the
  * standard failure mode — cap exploded bucket sizes upstream or
  * raise r.
  */
object MinHashLsh {

  /** Modulus 2^31−1 (Mersenne prime): keeps x·a + b < 2^62 for
    * x, a, b < P so the affine permutation never overflows a long.
    */
  private val P = 2147483647L

  /** Deterministic (a, b) parameters for hash j — a ∈ [1, P), b ∈ [0, P),
    * fixed seed so results are reproducible run-over-run.
    */
  private[dedup] def hashParams(k: Int): Array[(Long, Long)] =
    Array.tabulate(k) { j =>
      val a = math.abs((1103515245L * (j + 1) + 12345L) % (P - 1)) + 1
      val b = math.abs((6364136223846793005L * (j + 1) + 1442695040888963407L) % P)
      (a, b)
    }

  /** k minhashes of one shingle set (JVM kernel). */
  private[dedup] def minhash(shingles: Seq[String], params: Array[(Long, Long)]): Array[Long] = {
    val hs = shingles.map(s => java.lang.Math.floorMod(Hash64(s), P)).toArray
    val sig = Array.fill(params.length)(Long.MaxValue)
    var j = 0
    while (j < params.length) {
      val (a, b) = params(j)
      var i = 0
      var mn = Long.MaxValue
      while (i < hs.length) {
        val v = (hs(i) * a + b) % P
        if (v < mn) mn = v
        i += 1
      }
      sig(j) = mn
      j += 1
    }
    sig
  }

  /** Band signatures: band i hashes its r minhash values (with the band
    * index folded in, so identical minhash runs in different bands
    * cannot collide).
    */
  private def bandSigs(sig: Array[Long], bands: Int, rows: Int): Array[Long] =
    Array.tabulate(bands) { i =>
      var h = Hash64.mix(i.toLong)
      var j = i * rows
      while (j < (i + 1) * rows) { h = Hash64.combine(h, sig(j)); j += 1 }
      h
    }

  /** Docs with shingle sets + per-band LSH signatures: (id, sh, bsig). */
  private def sketched(
      df: DataFrame, textCol: String, idCol: String,
      n: Int, bands: Int, rows: Int): DataFrame = {
    val docs = graft.util.Partitioning.parallelize(df)
      .select(col(idCol).as("id"), TextFunctions.shingles(col(textCol), n).as("sh"))
      .filter(size(col("sh")) > 0)
    val schema = docs.schema.add("bsig", ArrayType(LongType, containsNull = false))
    val enc = Encoders.row(schema)
    val params = hashParams(bands * rows)
    docs.mapPartitions { it =>
      it.map { r =>
        val sh = r.getSeq[String](1)
        val sig = minhash(sh, params)
        Row(r.get(0), sh, bandSigs(sig, bands, rows).toSeq)
      }
    }(enc)
  }

  /** Near-duplicate pairs with exact-Jaccard verification of LSH
    * candidates. Output: (id_a, id_b, jaccard), id_a < id_b.
    */
  def nearDupPairs(
      df: DataFrame,
      textCol: String,
      idCol: String,
      n: Int = 3,
      threshold: Double = 0.5,
      bands: Int = 64,
      rows: Int = 2): DataFrame = {
    val docs = sketched(df, textCol, idCol, n, bands, rows)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // Skinny bucket rows: (id, set size, band, sig) — 4 scalars per
    // row. The size predicate is the length filter (J ≥ t ⇒
    // min(|A|,|B|) ≥ t·max(|A|,|B|)), pruning candidates before the
    // distinct.
    val buckets = docs.select(col("id"), size(col("sh")).as("sz"),
      posexplode(col("bsig")).as(Seq("band", "sig")))
    val candidates = buckets.as("a")
      .join(buckets.as("b"),
        col("a.band") === col("b.band") && col("a.sig") === col("b.sig") &&
          col("a.id") < col("b.id") &&
          col("a.sz") >= col("b.sz") * threshold &&
          col("b.sz") >= col("a.sz") * threshold)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()

    // Exact-verify the surviving pairs (broadcast map-side under the
    // doc limit, array-reattach joins above it — Dedup.verifyPairs).
    Dedup.verifyPairs(candidates, docs.select(col("id"), col("sh")), threshold)
  }
}
