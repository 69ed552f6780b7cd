package graft.sim

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, IntegerType}

/** Product quantization for embedding compression (Jégou et al., "Product
  * Quantization for Nearest Neighbor Search", PAMI'11 §II-III): split
  * each vector into `m` subvectors, train an independent `k`-centroid
  * quantizer per subspace ([[KMeans]] — deterministic, so the whole
  * model is SQL-replayable), and store each vector as `m` small codes.
  * At dim 64 / m=4 / k=8 a float vector compresses 256 bytes → 4 (the
  * codes index per-subspace centroids) — the difference between an
  * embedding corpus that fits executor memory at 100 TB and one that
  * doesn't. Complements [[IvfFlat]]: IVF prunes WHICH vectors to
  * score, PQ shrinks WHAT is stored and scored.
  *
  * Query scoring is ADC (asymmetric distance computation): one
  * (m × k) table of query-subvector→centroid squared distances, then
  * each candidate's approximate distance is `m` table lookups summed —
  * no decompression. Table build is driver-side (m·k·subDim flops);
  * scoring is a broadcast mapPartitions, no shuffle.
  *
  * Training cost: m independent KMeans runs over sliced projections —
  * each is `iters` scans of one slice with mergeable partials; at
  * scale you train on a sample and encode the full corpus in one
  * broadcast pass ([[encode]]).
  */
object ProductQuantizer {

  /** Per-subspace (rank, centroid) lists; `subDim` = dim / m. */
  final case class Model(m: Int, subDim: Int,
      cents: Array[Array[(Int, Array[Double])]]) extends Serializable

  /** Train the m sub-quantizers. Subspace `s` trains on
    * `vec[s·subDim, (s+1)·subDim)` with salt `"{salt}{s}"` (its own
    * deterministic md5 seed draw).
    */
  def fit(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      dim: Int,
      m: Int,
      k: Int,
      iters: Int,
      salt: String = "pq"): Model = {
    require(m >= 1 && dim % m == 0, s"m=$m must divide dim=$dim")
    val subDim = dim / m
    val cents = (0 until m).map { s =>
      val sliced = df
        .filter(col(vecCol).isNotNull)
        .select(col(idCol),
          slice(col(vecCol).cast("array<double>"), s * subDim + 1, subDim).as("__sv"))
      KMeans.fit(sliced, "__sv", idCol, k, iters, salt = s"$salt$s").toArray
    }.toArray
    Model(m, subDim, cents)
  }

  private def nearestIn(
      v: Seq[Double], offset: Int, cents: Array[(Int, Array[Double])]): Int = {
    var best = cents(0)._1
    var bestD = Double.PositiveInfinity
    var ci = 0
    while (ci < cents.length) {
      val (rank, c) = cents(ci)
      var d = 0.0
      var i = 0
      while (i < c.length) { val x = v(offset + i) - c(i); d += x * x; i += 1 }
      if (d < bestD) { bestD = d; best = rank }
      ci += 1
    }
    best
  }

  /** Append the `array<int>` code column — one broadcast mapPartitions
    * pass, no shuffle; NULL vectors get NULL codes. Vectors shorter
    * than the model's `m · subDim` fail with a clear contract error
    * (not an index-out-of-bounds deep inside an executor task).
    */
  def encode(df: DataFrame, vecCol: String, model: Model,
      outCol: String = "code"): DataFrame = {
    val spark = df.sparkSession
    val bc = spark.sparkContext.broadcast(model)
    val src = df.withColumn("__v", col(vecCol).cast("array<double>"))
    val vIdx = src.schema.fieldIndex("__v")
    val schema = src.schema.add(outCol, ArrayType(IntegerType, containsNull = false))
    val enc = Encoders.row(schema)
    src.mapPartitions { it =>
      val mdl = bc.value
      it.map { r =>
        val code: Any =
          if (r.isNullAt(vIdx)) null
          else {
            val v = r.getSeq[Double](vIdx)
            require(v.length >= mdl.m * mdl.subDim,
              s"vector length ${v.length} < model dim ${mdl.m * mdl.subDim}" +
                s" (m=${mdl.m} × subDim=${mdl.subDim})")
            (0 until mdl.m).map(s => nearestIn(v, s * mdl.subDim, mdl.cents(s)))
          }
        Row.fromSeq(r.toSeq :+ code)
      }
    }(enc).drop("__v")
  }

  /** Approximate top-k nearest to `query` by ADC over the codes:
    * (original columns, adc) with `adc` the summed per-subspace
    * query→centroid squared distance, rounded to 6, ascending, ties by
    * `tieBreak`. TakeOrderedAndProject plan — k·partitions rows move.
    */
  def topKAdc(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      model: Model,
      query: Array[Double],
      k: Int): DataFrame = {
    val encoded = encode(df, vecCol, model, "__code")
    // ADC lookup table: table(s)(rank) = sqdist(query_s, centroid).
    val table: Map[(Int, Int), Double] = (0 until model.m).flatMap { s =>
      model.cents(s).map { case (rank, c) =>
        var d = 0.0
        var i = 0
        while (i < c.length) { val x = query(s * model.subDim + i) - c(i); d += x * x; i += 1 }
        (s, rank) -> d
      }
    }.toMap
    val spark = df.sparkSession
    val bc = spark.sparkContext.broadcast(table)
    val schema = encoded.schema.add("adc", org.apache.spark.sql.types.DoubleType)
    val enc = Encoders.row(schema)
    val cIdx = encoded.schema.fieldIndex("__code")
    encoded.filter(col("__code").isNotNull)
      .mapPartitions { it =>
        val t = bc.value
        it.map { r =>
          val code = r.getSeq[Int](cIdx)
          var d = 0.0
          var s = 0
          while (s < code.length) { d += t((s, code(s))); s += 1 }
          Row.fromSeq(r.toSeq :+ d)
        }
      }(enc)
      .withColumn("adc", round(col("adc"), 6))
      .orderBy(col("adc").asc, col(idCol).asc)
      .limit(k)
      .drop("__code")
  }
}
