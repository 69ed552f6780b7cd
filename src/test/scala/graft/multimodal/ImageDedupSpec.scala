package graft.multimodal

import scala.util.Random
import org.apache.spark.sql.Row
import org.apache.spark.sql.types.{BinaryType, LongType, StructField, StructType}
import graft.SparkSpec

class ImageDedupSpec extends SparkSpec {

  /** Left-dark/right-bright step image: a resize/tone-invariant
    * dHash fixture (the edge sits at the same RELATIVE position at
    * any even width, so every scale samples the same 9×8 structure).
    */
  private def step(w: Int, h: Int, tone: Int): Array[Array[Int]] =
    Array.tabulate(h, w)((_, x) => if (x * 2 < w) 50 + tone else 200 + tone)

  test("near-identical images (tone shift, resize) hash identically; distinct do not") {
    val base = ImageDedup.dHash(Multimodal.encodeGrayPng(step(32, 16, 0))).get
    // Global tone shift: every gradient sign unchanged.
    val toned = ImageDedup.dHash(Multimodal.encodeGrayPng(step(32, 16, 9))).get
    assert(base == toned)
    // 2× downscale of the same picture: same 9×8 structure.
    val resized = ImageDedup.dHash(Multimodal.encodeGrayPng(step(16, 8, 0))).get
    assert(base == resized)
    // A vertically-varying picture is a different hash entirely.
    val other = ImageDedup.dHash(Multimodal.encodeGrayPng(
      Array.tabulate(16, 32)((y, _) => if (y * 2 < 16) 50 else 200))).get
    assert(base != other)
    // The step fixture has exactly one rising edge per row.
    assert(java.lang.Long.bitCount(base._1) + java.lang.Long.bitCount(base._2) == 8)
  }

  test("hash halves stay in 32 unsigned bits") {
    val (hi, lo) = ImageDedup.dHash(Multimodal.encodeGrayPng(step(32, 16, 0))).get
    assert(hi >= 0L && hi <= 0xFFFFFFFFL)
    assert(lo >= 0L && lo <= 0xFFFFFFFFL)
  }

  test("recall: band-blocked pairs == brute force at Hamming ≤ 3 (pigeonhole is lossless)") {
    // 120 random 64-bit hashes + planted near-dups at distances 0-3.
    val rnd = new Random(11)
    val basePts = Seq.tabulate(120)(i => (i.toLong, rnd.nextLong() & 0xFFFFFFFFL, rnd.nextLong() & 0xFFFFFFFFL))
    val planted = (0 to 3).map { d =>
      val (_, hi, lo) = basePts(d * 7)
      // flip d bits spread across both halves
      val hi2 = (0 until d / 2).foldLeft(hi)((a, k) => a ^ (1L << (3 * k)))
      val lo2 = (0 until d - d / 2).foldLeft(lo)((a, k) => a ^ (1L << (5 * k + 1)))
      (1000L + d, hi2, lo2)
    }
    val all = basePts ++ planted
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("hash_hi", LongType), StructField("hash_lo", LongType)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(all.map(t => Row(t._1, t._2, t._3)), 4), schema)
    val got = ImageDedup.nearDupPairs(df, "id", maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val brute = (for {
      a <- all; b <- all if a._1 < b._1
      d = java.lang.Long.bitCount(a._2 ^ b._2) + java.lang.Long.bitCount(a._3 ^ b._3)
      if d <= 3
    } yield (a._1, b._1, d)).toSet
    assert(got == brute)
    assert(brute.size >= 4, s"planted pairs missing: ${brute.size}")
  }

  test("survivors keep exactly one representative per identical-hash cluster") {
    // 3 clusters of 4: a 9×8 image (resample identity) with one
    // bright COLUMN at cls+1 — the rising edge sits at x=cls in all 8
    // rows, so classes differ by 16 bits (> 3) while tones vary per
    // doc inside a class (distance 0). Images built driver-side (the
    // encode helper must not ride a task closure off the suite).
    val rows = (0L until 12L).map { id =>
      val cls = (id % 3).toInt
      val px = Array.tabulate(8, 9)((_, x) =>
        if (x == cls + 1) 200 + (id % 5).toInt else 50 + (id % 3).toInt)
      Row(id, Multimodal.encodeGrayPng(px))
    }
    val imgs = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2),
      StructType(Seq(StructField("doc_id", LongType), StructField("payload", BinaryType))))
    val hashes = ImageDedup.withDHash(imgs, "payload", "doc_id")
    val pairs = ImageDedup.nearDupPairs(hashes, "doc_id")
    // Within-class pairs only: C(4,2) × 3 = 18, all at distance 0.
    val got = pairs.collect()
    assert(got.length == 18 && got.forall(_.getInt(2) == 0))
    val kept = ImageDedup.survivors(imgs, "doc_id", pairs)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(0L, 1L, 2L))
  }
}
