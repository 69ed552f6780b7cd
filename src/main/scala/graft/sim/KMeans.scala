package graft.sim

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

/** Deterministic distributed k-means (Lloyd iterations) for embedding
  * columns — the trained coarse quantizer behind [[IvfFlat]] and the
  * clustering stage of SemDedup-style semantic dedup.
  *
  * Everything is reproducible by a SQL oracle, which forces three
  * deliberate choices:
  *
  *  - **Init**: the k corpus vectors with the smallest
  *    md5(salt + ":" + id) — the repo-wide seedless deterministic
  *    sample ([[IvfFlat.centroids]] uses the same trick); rank =
  *    position in md5 order.
  *  - **Fixed iteration count**, not convergence tests: a convergence
  *    threshold on floating point would make the round count itself
  *    engine-dependent.
  *  - **Centroids rounded to 6 decimals after every mean step**: the
  *    per-dimension mean is a distributed double sum whose addition
  *    order differs between Spark partials and a SQL engine's
  *    aggregate; rounding both sides to 6 decimals absorbs the
  *    ~1e-13 relative discrepancy so each iteration starts from
  *    bit-identical centroids in both engines. (A mean landing within
  *    ~1e-12 of a half-ulp-of-1e-6 rounding boundary could still
  *    flip — vanishingly unlikely and detected by the oracle, not
  *    hidden.)
  *
  * Assignment ties go to the smaller rank (strict `<` scan in rank
  * order = `row_number() OVER (ORDER BY dist, rank)` in SQL). Clusters
  * that lose every member DROP OUT (their rank simply stops existing)
  * rather than keeping a stale centroid — the only semantics a pure
  * SQL replay reproduces.
  *
  * Scale shape per iteration: one broadcast of the (k × dim) centroid
  * matrix, one mapPartitions pass accumulating per-cluster
  * (sum-vector, count) partials — mergeable, so the shuffle moves at
  * most k × partitions small records (`reduceByKey`) — and a k-row
  * collect. Nothing driver-side ever holds data rows; total cost is
  * `iters` corpus scans, each cheaper than one shuffle of the corpus.
  */
object KMeans {

  /** Trained (rank, centroid) pairs after `iters` Lloyd iterations.
    * Ranks are init ranks (0..k-1); empty clusters drop out, so the
    * result can have fewer than k entries. Vectors with NULL
    * embeddings are ignored.
    */
  def fit(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      k: Int,
      iters: Int,
      salt: String = "km"): Seq[(Int, Array[Double])] = {
    require(k >= 1 && iters >= 0, "k >= 1, iters >= 0")
    val init: Seq[(Int, Array[Double])] = df
      .filter(col(vecCol).isNotNull)
      .select(md5(concat(lit(s"$salt:"), col(idCol).cast("string"))).as("h"),
        col(vecCol).cast("array<double>").as("v"))
      .orderBy("h")
      .limit(k)
      .collect()
      .toSeq
      .zipWithIndex
      .map { case (r, i) => (i, r.getSeq[Double](1).toArray) }
    (1 to iters).foldLeft(init)((cents, _) => meanStep(df, vecCol, cents))
  }

  /** One Lloyd step: assign every vector to its nearest centroid, then
    * per-cluster per-dimension means rounded to 6 decimals (HALF_UP —
    * away from zero on .5, matching Spark SQL and DuckDB `round`).
    */
  private def meanStep(
      df: DataFrame, vecCol: String,
      cents: Seq[(Int, Array[Double])]): Seq[(Int, Array[Double])] = {
    val spark = df.sparkSession
    val bc = spark.sparkContext.broadcast(cents.toArray)
    val partials = df
      .filter(col(vecCol).isNotNull)
      .select(col(vecCol).cast("array<double>"))
      .rdd
      .mapPartitions { it =>
        val cs = bc.value
        val acc = scala.collection.mutable.HashMap.empty[Int, (Array[Double], Long)]
        it.foreach { row =>
          val v = row.getSeq[Double](0)
          val rank = nearestRank(v, cs)
          val (sum, c) = acc.getOrElseUpdate(rank, (new Array[Double](v.length), 0L))
          var i = 0
          val n = math.min(v.length, sum.length)
          while (i < n) { sum(i) += v(i); i += 1 }
          acc(rank) = (sum, c + 1)
        }
        acc.iterator
      }
      .reduceByKey { (a: (Array[Double], Long), b: (Array[Double], Long)) =>
        val (s1, c1) = a
        val (s2, c2) = b
        var i = 0
        while (i < s1.length) { s1(i) += s2(i); i += 1 }
        (s1, c1 + c2)
      }
      .collect()
    partials.sortBy(_._1).toSeq.map { case (rank, (sum, c)) =>
      (rank, sum.map(x => BigDecimal(x / c)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
    }
  }

  /** Nearest centroid by squared L2; ties to the smallest rank (strict
    * `<` over ascending rank order). Distance accumulates left to
    * right in dimension order — the one deterministic order both a JVM
    * loop and a SQL `sum` over an index join can share... modulo the
    * SQL engine's own aggregate order; exact ties on distance are the
    * case that matters and rank ordering settles them identically.
    */
  private[sim] def nearestRank(v: Seq[Double], cents: Array[(Int, Array[Double])]): Int = {
    var best = cents(0)._1
    var bestD = Double.PositiveInfinity
    var ci = 0
    while (ci < cents.length) {
      val (rank, c) = cents(ci)
      var d = 0.0
      var i = 0
      val n = math.min(v.length, c.length)
      while (i < n) { val x = v(i) - c(i); d += x * x; i += 1 }
      if (d < bestD) { bestD = d; best = rank }
      ci += 1
    }
    best
  }

  /** Append the nearest-centroid rank as `outCol` (int): one broadcast
    * mapPartitions pass, no shuffle. NULL vectors get cluster NULL.
    */
  def assignWith(
      df: DataFrame, vecCol: String,
      cents: Seq[(Int, Array[Double])], outCol: String = "cluster"): DataFrame = {
    val spark = df.sparkSession
    val bc = spark.sparkContext.broadcast(cents.toArray)
    val src = df.withColumn("__v", col(vecCol).cast("array<double>"))
    val vIdx = src.schema.fieldIndex("__v")
    val schema = src.schema.add(outCol, IntegerType)
    val enc = Encoders.row(schema)
    src.mapPartitions { it =>
      val cs = bc.value
      it.map { r =>
        val cl: Any =
          if (r.isNullAt(vIdx)) null else nearestRank(r.getSeq[Double](vIdx), cs)
        Row.fromSeq(r.toSeq :+ cl)
      }
    }(enc).drop("__v")
  }

  /** Train-and-assign: [[fit]] then one more assignment pass under the
    * final centroids — `iters` refinement rounds, `iters + 1`
    * assignment passes total (matching an unrolled SQL replay of the
    * same depth).
    */
  def assignments(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      k: Int,
      iters: Int,
      salt: String = "km",
      outCol: String = "cluster"): DataFrame =
    assignWith(df, vecCol, fit(df, vecCol, idCol, k, iters, salt), outCol)
}
