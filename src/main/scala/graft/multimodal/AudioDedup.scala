package graft.multimodal

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Perceptual audio dedup — the audio counterpart of
  * [[ImageDedup]]'s dHash: a volume-normalized energy-envelope hash
  * over REAL codec decode, so re-encoded / gain-adjusted copies of the
  * same recording collapse into one bucket while exact byte dedup sees
  * them as distinct.
  *
  * Hash: channel 0 is split into `frames` equal integer-floor frames
  * (frame f covers sample [f·n/F, (f+1)·n/F) — exact integer index
  * arithmetic, the resampleNearest discipline); per-frame energy is
  * the EXACT long Σ s² over raw PCM16 samples; bit f of the hash is
  * e_f > e_f₊₁ (the dHash gradient trick applied to the energy
  * envelope). A gain change scales every energy by amp² and preserves
  * every comparison, so the hash is amplitude-invariant by
  * construction — no float normalization anywhere, which is what lets
  * a SQL oracle replay the whole thing.
  *
  * Scale shape: scan-local decode + hash (one pass, no shuffle), then
  * dedup is the standard hash-groupBy. (frames−1) ≤ 63 bits per row
  * ship to the shuffle, not samples.
  */
object AudioDedup {

  val DefaultFrames = 32

  /** (frames−1)-bit energy-gradient hash of one channel's samples. */
  def energyHash(samples: Array[Short], frames: Int = DefaultFrames): Long = {
    require(frames >= 2 && frames <= 64, "2..64 frames")
    val n = samples.length
    val e = new Array[Long](frames)
    var f = 0
    while (f < frames) {
      val lo = (f.toLong * n / frames).toInt
      val hi = ((f + 1).toLong * n / frames).toInt
      var s = 0L
      var i = lo
      while (i < hi) { val v = samples(i).toLong; s += v * v; i += 1 }
      e(f) = s
      f += 1
    }
    var h = 0L
    f = 0
    while (f < frames - 1) {
      if (e(f) > e(f + 1)) h |= (1L << f)
      f += 1
    }
    h
  }

  /** (idCol, ahash, n_frames) per decodable row; undecodable payloads
    * are dropped (the [[Multimodal]] quarantine contract — route them
    * through a separate audit, not the dedup key space).
    */
  def audioHashes(
      df: DataFrame,
      binCol: String,
      idCol: String,
      frames: Int = DefaultFrames): DataFrame = {
    val binIdx = df.schema.fieldIndex(binCol)
    val idIdx = df.schema.fieldIndex(idCol)
    val outSchema = StructType(Seq(
      df.schema(idIdx),
      StructField("ahash", LongType, nullable = false),
      StructField("n_frames", LongType, nullable = false)))
    val enc = Encoders.row(outSchema)
    df.mapPartitions { it =>
      it.flatMap { r =>
        val bytes = r.getAs[Array[Byte]](binIdx)
        Multimodal.decodePcm16(bytes).map { case (_, chans) =>
          Row(r.get(idIdx), energyHash(chans(0), frames), chans(0).length.toLong)
        }
      }
    }(enc)
  }

  /** Dedup buckets: one row per hash with the kept (smallest) id and
    * the duplicate count — same output contract as exact dedup, keyed
    * by the perceptual hash.
    */
  def dedupBuckets(
      df: DataFrame,
      binCol: String,
      idCol: String,
      frames: Int = DefaultFrames): DataFrame =
    audioHashes(df, binCol, idCol, frames)
      .groupBy("ahash")
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dupes"))
}
