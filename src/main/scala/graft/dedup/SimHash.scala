package graft.dedup

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import graft.text.TextFunctions
import graft.util.Hash64

/** SimHash near-duplicate detection: 64-bit locality-sensitive content
  * hash (Charikar '02); near-dup ⟺ small Hamming distance.
  *
  * Signature: for each bit position i, sum +1/−1 over the tokens'
  * Hash64 bit i; bit i of the simhash = sign of the sum. Computed in
  * one `mapPartitions` JVM pass per row (the same math as 64 Column
  * `aggregate` folds overflows janino codegen and falls back to
  * interpreted eval — 64 array traversals per row).
  *
  * Pair search uses the pigeonhole block trick: for Hamming distance
  * ≤ k, split the 64 bits into k+1 blocks — matching pairs must agree
  * exactly on ≥1 block, so candidates come from an equi-join on
  * (block index, block bits) — scalable, never all-pairs — verified by
  * exact `bit_count(xor)`. The block join is EXACT: no true pair at
  * distance ≤ k can be missed.
  */
object SimHash {

  /** JVM kernel: simhash of a token sequence. */
  private[dedup] def simhash64(tokens: Seq[String]): Long = {
    val votes = new Array[Int](64)
    tokens.foreach { t =>
      val h = Hash64(t)
      var i = 0
      while (i < 64) {
        if (((h >>> i) & 1L) == 1L) votes(i) += 1 else votes(i) -= 1
        i += 1
      }
    }
    var out = 0L
    var i = 0
    while (i < 64) {
      if (votes(i) > 0) out |= (1L << i)
      i += 1
    }
    out
  }

  /** Append a 64-bit simhash column computed from the whitespace-token
    * stream of `textCol`. One mapPartitions pass, no shuffle.
    */
  def withSimhash(df: DataFrame, textCol: String, outCol: String): DataFrame = {
    val withToks = df.withColumn("__toks", TextFunctions.tokens(col(textCol)))
    val tokIdx = withToks.schema.fieldIndex("__toks")
    val schema = withToks.schema.add(outCol, LongType, nullable = false)
    val enc = Encoders.row(schema)
    withToks.mapPartitions { it =>
      it.map { r =>
        // NULL text → NULL token array; hash as an empty stream.
        val toks = if (r.isNullAt(tokIdx)) Seq.empty[String] else r.getSeq[String](tokIdx)
        Row.fromSeq(r.toSeq :+ simhash64(toks))
      }
    }(enc).drop("__toks")
  }

  /** Hamming distance between two simhash columns. */
  def hamming(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    bit_count(a.bitwiseXOR(b))

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
    val signed = withSimhash(
      graft.util.Partitioning.parallelize(df.select(col(idCol).as("id"), col(textCol))), textCol, "sh")
      .select("id", "sh")

    // one bucket row per (doc, block): block index + that block's bits.
    // Disjoint column names per join side — a self-join keyed through
    // the SAME attribute (a("bucket") === b("bucket")) resolves both
    // sides to one column, Spark drops the "trivially true" predicate,
    // and the join degenerates to a nested loop over all id pairs.
    val blockCols = (0 until blocks).map { i =>
      val w = if (i == blocks - 1) 64 - i * width else width
      val mask = if (w == 64) -1L else (1L << w) - 1
      struct(lit(i).as("blk"),
        shiftright(col("sh"), i * width).bitwiseAND(lit(mask)).as("bits"))
    }
    val bucketed = signed
      .withColumn("bucket", explode(array(blockCols: _*)))
      .select("id", "sh", "bucket")

    val a = bucketed.select(col("id").as("id_a"), col("sh").as("sh_a"), col("bucket").as("bucket_a"))
    val b = bucketed.select(col("id").as("id_b"), col("sh").as("sh_b"), col("bucket").as("bucket_b"))
    a.join(b, col("bucket_a") === col("bucket_b") && col("id_a") < col("id_b"))
      // exact-verify BEFORE distinct: bit_count(xor) per joined row is
      // cheaper than hashing every duplicate candidate into the
      // distinct's aggregation map.
      .withColumn("dist", hamming(col("sh_a"), col("sh_b")))
      .filter(col("dist") <= maxDist)
      .select("id_a", "id_b", "dist")
      .distinct()
  }
}
