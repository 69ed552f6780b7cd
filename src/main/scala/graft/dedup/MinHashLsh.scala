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

  /** At-rest MinHash band index — the NEAR-dup twin of
    * [[Dedup.writeFingerprintIndex]]: the corpus is sketched once and
    * its (band-signature, id, set-size) rows persist bucketed+sorted
    * by signature; every arriving batch then probes the index with its
    * own band signatures and only candidate-matched corpus docs are
    * ever re-read. The corpus never reshuffles per batch — the at-rest
    * discipline of `IvfFlat.writeIndex` applied to LSH buckets.
    *
    * The band index is already folded into each signature
    * ([[bandSigs]] mixes it in), so the signature alone is the join
    * key; a spurious cross-band signature collision is a 64-bit hash
    * collision and dies in exact verification anyway.
    */
  def writeBandIndex(
      df: DataFrame,
      textCol: String,
      idCol: String,
      table: String,
      n: Int = 3,
      bands: Int = 64,
      rows: Int = 2,
      buckets: Int = 32): Unit =
    graft.sources.BucketedTables.writeBucketed(
      sketched(df, textCol, idCol, n, bands, rows)
        .select(explode(col("bsig")).as("sig"), col("id"),
          size(col("sh")).as("sz")),
      table, "sig", buckets, sortCol = Some("sig"))

  /** Incremental NEAR-dup dedup of a batch against an at-rest
    * [[writeBandIndex]] corpus: batch docs whose exact n-gram Jaccard
    * with SOME corpus doc reaches `threshold` are dropped; survivors
    * pass through unchanged.
    *
    * Plan shape: the batch is sketched (one scan), its skinny
    * (sig, id, sz) rows probe the index with the LSH length filter
    * inline; only DISTINCT candidate corpus ids are fetched back from
    * `corpus` (a semi-join — at 100 TB this reads a vanishing fraction
    * of history) and re-shingled for exact verification. Parameters
    * must match the ones the index was written with, and batch ids
    * must be disjoint from corpus ids (the incremental contract —
    * new arrivals carry new ids).
    */
  def incrementalNearDupSurvivors(
      batch: DataFrame,
      textCol: String,
      idCol: String,
      corpus: DataFrame,
      indexTable: String,
      n: Int = 3,
      threshold: Double = 0.5,
      bands: Int = 64,
      rows: Int = 2): DataFrame = {
    val spark = batch.sparkSession
    val docs = sketched(batch, textCol, idCol, n, bands, rows)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val probes = docs.select(col("id").as("bid"), size(col("sh")).as("bsz"),
      explode(col("bsig")).as("sig"))
    val idx = spark.table(indexTable)
    val candidates = probes.join(idx, "sig")
      .filter(col("bsz") >= col("sz") * threshold &&
        col("sz") >= col("bsz") * threshold)
      .select(col("bid").as("id_a"), col("id").as("id_b"))
      .distinct()

    // Fetch ONLY the candidate corpus docs and re-shingle them for the
    // exact check; batch shingles ride along from the sketch pass.
    val corpusSets = corpus
      .join(candidates.select(col("id_b").as(idCol)).distinct(), Seq(idCol),
        "left_semi")
      .select(col(idCol).as("id"), TextFunctions.shingles(col(textCol), n).as("sh"))
    val sets = docs.select(col("id"), col("sh")).unionByName(corpusSets)
    val dropped = Dedup.verifyPairs(candidates, sets, threshold)
      .select(col("id_a").as(idCol)).distinct()

    val out = batch.join(dropped, Seq(idCol), "left_anti")
    docs.unpersist()
    out
  }
}
