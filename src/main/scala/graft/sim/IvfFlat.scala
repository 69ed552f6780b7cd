package graft.sim

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

/** IVF-Flat approximate nearest-neighbor search: a coarse quantizer
  * partitions the corpus into `nLists` inverted lists; a query probes
  * only its `nProbe` nearest lists and exact-scores just those
  * candidates — the classic memory-resident ANN layout (Jégou et al.,
  * "Product Quantization for Nearest Neighbor Search", PAMI'11, §IV.A;
  * the Flat variant stores raw vectors). Complements [[AnnLsh]]: IVF
  * wins when queries cluster (locality → few probed lists), LSH when
  * the metric is angular and data is unclusterable.
  *
  * The quantizer is deliberately *hash-random*, not k-means: centroids
  * are the `nLists` corpus vectors with the smallest md5("ivf:" + id)
  * — a seedless deterministic sample both Spark and a SQL oracle
  * reproduce byte-for-byte, with no Lloyd iterations to replay.
  * Random-member centroids are the standard cheap baseline quantizer;
  * swapping in trained centroids changes only [[centroids]].
  *
  * Scale shape: the assignment pass is one mapPartitions over a
  * broadcast (nLists × dim) matrix — no shuffle; at rest the corpus
  * would be written partitioned by `list` so a probe reads nProbe/nLists
  * of the data (partition pruning does the candidate selection).
  */
object IvfFlat {

  /** The nLists (rank, centroid-vector) pairs, rank = position in
    * ascending md5-hex order (lowercase hex compares identically as a
    * string in the JVM and SQL binary collation).
    */
  private[sim] def centroids(
      df: DataFrame, vecCol: String, idCol: String, nLists: Int): Array[Array[Double]] =
    df.select(md5(concat(lit("ivf:"), col(idCol).cast("string"))).as("h"),
        col(vecCol).cast("array<double>").as("v"))
      .orderBy("h")
      .limit(nLists)
      .collect()
      .map(r => r.getSeq[Double](1).toArray)

  /** Squared L2, left-to-right. */
  private def sqDist(v: Seq[Double], c: Array[Double]): Double = {
    var d = 0.0
    var i = 0
    val n = math.min(v.length, c.length)
    while (i < n) { val x = v(i) - c(i); d += x * x; i += 1 }
    d
  }

  /** Nearest-centroid rank; ties to the smaller rank. */
  private def nearest(v: Seq[Double], cents: Array[Array[Double]]): Int = {
    var best = 0
    var bestD = Double.PositiveInfinity
    var i = 0
    while (i < cents.length) {
      val d = sqDist(v, cents(i))
      if (d < bestD) { bestD = d; best = i }
      i += 1
    }
    best
  }

  /** Append the inverted-list id (`outCol` int) — one broadcast
    * mapPartitions pass, no shuffle.
    */
  def assign(
      df: DataFrame, vecCol: String, idCol: String,
      nLists: Int, outCol: String = "list"): DataFrame =
    assignWith(df, vecCol, centroids(df, vecCol, idCol, nLists), outCol)

  private def assignWith(
      df: DataFrame, vecCol: String,
      cents: Array[Array[Double]], outCol: String): DataFrame = {
    val spark = df.sparkSession
    val bc = spark.sparkContext.broadcast(cents)
    val src = df.withColumn("__v", col(vecCol).cast("array<double>"))
    val vIdx = src.schema.fieldIndex("__v")
    val schema = src.schema.add(outCol, IntegerType, nullable = false)
    val enc = Encoders.row(schema)
    src.mapPartitions { it =>
      val cs = bc.value
      it.map(r => Row.fromSeq(r.toSeq :+ nearest(r.getSeq[Double](vIdx), cs)))
    }(enc).drop("__v")
  }

  /** Approximate top-k by cosine for one query vector: probe the
    * query's `nProbe` nearest lists, exact-score only their members.
    */
  def topK(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      query: Array[Double],
      k: Int,
      nLists: Int = 16,
      nProbe: Int = 4): DataFrame = {
    val cents = centroids(df, vecCol, idCol, nLists)
    val probed = cents.zipWithIndex
      .map { case (c, i) => (sqDist(query.toSeq, c), i) }
      .sorted.take(nProbe).map(_._2)
    val assigned = assignWith(df, vecCol, cents, "list")
    VectorSim.topK(
      assigned.filter(col("list").isin(probed.map(Integer.valueOf): _*)).drop("list"),
      vecCol, query, k, tieBreak = idCol)
  }
}
