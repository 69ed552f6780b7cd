package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.text.TextFunctions

/** SimHash near-duplicate detection: 64-bit locality-sensitive content
  * hash (Charikar '02); near-dup ⟺ small Hamming distance.
  *
  * Signature: for each bit position i, sum +1/−1 over the tokens'
  * xxhash64 bit i; bit i of the simhash = sign of the sum. Expressed as
  * 64 codegen'd `aggregate` folds over the token-hash array — no UDFs.
  *
  * Pair search uses the pigeonhole block trick: for Hamming distance
  * ≤ k, split the 64 bits into k+1 blocks — matching pairs must agree
  * exactly on ≥1 block, so candidates come from k+1 equi-joins on
  * block values (scalable; never all-pairs), verified by exact
  * `bit_count(xor)`. The block join is EXACT: no true pair at distance
  * ≤ k can be missed.
  */
object SimHash {

  /** 64-bit simhash of the whitespace-token stream (bigint column). */
  def simhash(text: Column): Column = {
    val hashes = transform(TextFunctions.tokens(text), t => xxhash64(t))
    // bit i: +1 when set, −1 when clear, summed over tokens.
    val bits = (0 until 64).map { i =>
      val vote = aggregate(hashes, lit(0L),
        (acc, h) => acc + when(shiftright(h, i).bitwiseAND(lit(1L)) === 1L, 1L).otherwise(-1L))
      when(vote > 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Hamming distance between two simhash columns. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** All pairs within Hamming distance `maxDist` of each other's
    * simhash. Output: (id_a, id_b, dist), id_a < id_b. Exact — the
    * (maxDist+1)-block pigeonhole candidate join cannot miss a pair.
    */
  def nearDupPairs(
      df: DataFrame,
      textCol: String,
      idCol: String,
      maxDist: Int = 3): DataFrame = {
    val blocks = maxDist + 1
    val width = 64 / blocks
    val signed = df.select(col(idCol).as("id"), simhash(col(textCol)).as("sh"))

    // one bucket row per (doc, block): block index + that block's bits.
    val blockCols = (0 until blocks).map { i =>
      // last block takes the remaining high bits
      val w = if (i == blocks - 1) 64 - i * width else width
      val mask = if (w == 64) -1L else (1L << w) - 1
      struct(lit(i).as("blk"),
        shiftright(col("sh"), i * width).bitwiseAND(lit(mask)).as("bits"))
    }
    val bucketed = signed
      .withColumn("bucket", explode(array(blockCols: _*)))
      .select("id", "sh", "bucket")

    val a = bucketed.select(col("id").as("id_a"), col("sh").as("sh_a"), col("bucket"))
    val b = bucketed.select(col("id").as("id_b"), col("sh").as("sh_b"), col("bucket"))
    a.join(b, a("bucket") === b("bucket") && col("id_a") < col("id_b"))
      .select("id_a", "id_b", "sh_a", "sh_b")
      .distinct()
      .withColumn("dist", hamming(col("sh_a"), col("sh_b")))
      .filter(col("dist") <= maxDist)
      .select("id_a", "id_b", "dist")
  }
}
