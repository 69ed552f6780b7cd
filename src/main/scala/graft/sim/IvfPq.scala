package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** IVF-PQ: the composed ANN serving layout (Jégou et al., PAMI'11 §IV
  * — the structure FAISS ships as IndexIVFPQ): the coarse quantizer
  * routes a query to `nProbe` of `nLists` inverted lists
  * ([[IvfFlat]]), and candidates are scored from their PRODUCT-
  * QUANTIZED codes by ADC ([[ProductQuantizer]]) — so a probe reads
  * nProbe/nLists of the corpus and scores it at m bytes per vector
  * with no decompression. Routing prunes the candidate READ; PQ
  * shrinks the candidate BYTES; together they are the
  * billion-vector-on-a-cluster shape.
  *
  * Two encodings:
  *
  *  - [[topK]] — codes quantize RAW vectors. One code book, the
  *    memory-constrained deployment; coarse cell width leaks into the
  *    codes (each list's offset burns code-book resolution).
  *  - [[topKResidual]] — codes quantize per-list RESIDUALS
  *    v − centroid(list(v)) (Jégou §IV.B), ONE code book shared
  *    across lists trained on the residual distribution. Residuals
  *    concentrate near 0 regardless of which list a vector sits in,
  *    so the same m×kSub budget spends entirely on local detail —
  *    the accuracy-per-byte winner on clustered data (A/B'd in
  *    ProductQuantizerSpec) and what serving stacks default to. ADC
  *    tables become per-probed-list (query residual differs per
  *    list): nProbe × m × kSub entries, still driver-trivial.
  *
  * Scale shape: everything is broadcast mapPartitions + one
  * TakeOrderedAndProject — the at-rest form writes `list` as a
  * partition column and `code` as a stored column ([[IvfFlat
  * .writeIndex]] + [[ProductQuantizer.encode]] compose), after which
  * a probe reads only its lists' code columns.
  */
object IvfPq {

  def topK(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      dim: Int,
      query: Array[Double],
      k: Int,
      nLists: Int = 16,
      nProbe: Int = 4,
      m: Int = 4,
      kSub: Int = 8,
      pqIters: Int = 1): DataFrame = {
    val cents = IvfFlat.centroids(df, vecCol, idCol, nLists)
    val probed = IvfFlat.probeLists(query, cents, nProbe)
    val model = ProductQuantizer.fit(df, vecCol, idCol, dim, m, kSub, pqIters)
    val candidates = KMeans.assignWith(
      df, vecCol, cents.zipWithIndex.map { case (c, i) => (i, c) }.toSeq, "__list")
      .filter(col("__list").isin(probed.map(Integer.valueOf): _*))
      .drop("__list")
    ProductQuantizer.topKAdc(candidates, vecCol, idCol, model, query, k)
  }

  private def centroidPath(path: String): String = s"$path/_centroids"
  private def codebookPath(path: String): String = s"$path/_codebook"

  /** Build the at-rest IVF-PQ index — the serving layout both halves
    * compose to: rows land in `list=<r>` partition directories
    * ([[IvfFlat.writeIndex]]'s router) and carry their m-byte PQ
    * `code` INSTEAD of the raw vector (the vector column is dropped at
    * rest — that is the whole point: a probe reads nProbe/nLists of
    * the rows at m bytes each, never a float vector). Coarse centroids
    * and the PQ code book persist as sidecars.
    */
  def writeIndex(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      dim: Int,
      path: String,
      nLists: Int = 16,
      m: Int = 4,
      kSub: Int = 8,
      pqIters: Int = 1): Unit = {
    val spark = df.sparkSession
    import spark.implicits._
    val cents = IvfFlat.centroids(df, vecCol, idCol, nLists)
    val model = ProductQuantizer.fit(df, vecCol, idCol, dim, m, kSub, pqIters)
    val assigned = KMeans.assignWith(
      df, vecCol, cents.zipWithIndex.map { case (c, i) => (i, c) }.toSeq, "list")
    ProductQuantizer.encode(assigned, vecCol, model, "code")
      .filter(col("list").isNotNull)
      .drop(vecCol)
      .write.mode("overwrite").partitionBy("list").parquet(path)
    cents.zipWithIndex.toSeq.map { case (c, i) => (i, c.toSeq) }
      .toDF("rank", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(centroidPath(path))
    model.cents.zipWithIndex.toSeq
      .flatMap { case (subs, s) => subs.map { case (r, c) => (s, r, c.toSeq) } }
      .toDF("s", "rank", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(codebookPath(path))
  }

  /** INCREMENTAL index maintenance — the IVF-PQ half of round-10
    * directive #7 (the IvfFlat.appendToIndex pattern): new vectors are
    * routed with the EXISTING centroid sidecar and encoded with the
    * EXISTING codebook, then their list-partitioned code files append
    * in place. Neither sidecar changes, so [[topKIndexed]] serves the
    * merged index exactly as a rebuild with the same quantizers would
    * (pinned in IvfPqSpec); per-batch cost is one assignment + one
    * encode pass over the DELTA only.
    */
  def appendToIndex(
      spark: org.apache.spark.sql.SparkSession,
      delta: DataFrame,
      vecCol: String,
      path: String): Unit = {
    val cents = spark.read.parquet(centroidPath(path))
      .orderBy("rank").collect()
      .map(r => (r.getInt(r.fieldIndex("rank")),
        r.getSeq[Double](r.fieldIndex("centroid")).toArray))
    val model = readCodebook(spark, path)
    val assigned = KMeans.assignWith(delta, vecCol, cents.toSeq, "list")
    ProductQuantizer.encode(assigned, vecCol, model, "code")
      .filter(col("list").isNotNull)
      .drop(vecCol)
      .write.mode("append").partitionBy("list").parquet(path)
  }

  /** The PQ model reconstructed from a written index's codebook
    * sidecar. */
  private def readCodebook(
      spark: org.apache.spark.sql.SparkSession, path: String): ProductQuantizer.Model = {
    val cb = spark.read.parquet(codebookPath(path))
      .collect()
      .map(r => (r.getInt(r.fieldIndex("s")), r.getInt(r.fieldIndex("rank")),
        r.getSeq[Double](r.fieldIndex("centroid")).toArray))
    val m = cb.map(_._1).max + 1
    val subDim = cb.head._3.length
    val cents = Array.tabulate(m)(s =>
      cb.filter(_._1 == s).sortBy(_._2).map { case (_, r, c) => (r, c) })
    ProductQuantizer.Model(m, subDim, cents)
  }

  /** Serve a query from the at-rest index: probe lists from the
    * centroid sidecar, scan ONLY those `list=` partitions (the isin
    * filter lands in PartitionFilters — asserted in spec), and ADC-
    * score the STORED codes — no vectors read, no encode pass, no
    * shuffle but the final TakeOrderedAndProject.
    */
  def topKIndexed(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      idCol: String,
      query: Array[Double],
      k: Int,
      nProbe: Int = 4): DataFrame = {
    val cents = spark.read.parquet(centroidPath(path))
      .orderBy("rank").collect()
      .map(r => r.getSeq[Double](r.fieldIndex("centroid")).toArray)
    val cb = spark.read.parquet(codebookPath(path))
      .collect()
      .map(r => (r.getInt(r.fieldIndex("s")), r.getInt(r.fieldIndex("rank")),
        r.getSeq[Double](r.fieldIndex("centroid")).toArray))
    val subDim = cb.head._3.length
    val probed = IvfFlat.probeLists(query, cents, nProbe)
    // Raw-vector codes → ONE global ADC table (independent of list).
    val table: Map[(Int, Int), Double] = cb.map { case (s, rank, c) =>
      var d = 0.0
      var i = 0
      while (i < c.length) { val x = query(s * subDim + i) - c(i); d += x * x; i += 1 }
      (s, rank) -> d
    }.toMap
    val bc = spark.sparkContext.broadcast(table)
    val src = spark.read.parquet(path)
      .filter(col("list").isin(probed.map(Integer.valueOf): _*))
      .filter(col("code").isNotNull)
    val schema = src.schema.add("adc", org.apache.spark.sql.types.DoubleType)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val cIdx = src.schema.fieldIndex("code")
    src.mapPartitions { it =>
        val t = bc.value
        it.map { r =>
          val code = r.getSeq[Int](cIdx)
          var d = 0.0
          var s = 0
          while (s < code.length) { d += t((s, code(s))); s += 1 }
          org.apache.spark.sql.Row.fromSeq(r.toSeq :+ d)
        }
      }(enc)
      .withColumn("adc", round(col("adc"), 6))
      .orderBy(col("adc").asc, col(idCol).asc)
      .limit(k)
      .drop("code", "list")
  }

  /** Residual-encoded IVF-PQ (Jégou §IV.B): codes quantize
    * v − centroid(list(v)); scoring uses a per-probed-list ADC table
    * built from the query's residual against THAT list's centroid.
    * Same scale shape as [[topK]] — the residual subtraction is a
    * broadcast-hash-join of the (nLists × dim) centroid table plus a
    * `zip_with`, everything else is broadcast mapPartitions + one
    * TakeOrderedAndProject.
    */
  def topKResidual(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      dim: Int,
      query: Array[Double],
      k: Int,
      nLists: Int = 16,
      nProbe: Int = 4,
      m: Int = 4,
      kSub: Int = 8,
      pqIters: Int = 1,
      salt: String = "pqr"): DataFrame = {
    require(m >= 1 && dim % m == 0, s"m=$m must divide dim=$dim")
    val spark = df.sparkSession
    val subDim = dim / m
    val cents = IvfFlat.centroids(df, vecCol, idCol, nLists)
    val probed = IvfFlat.probeLists(query, cents, nProbe)

    // Residual column: broadcast-join the tiny (list, centroid) table,
    // subtract inside Catalyst (zip_with — codegen'd, no extra pass).
    import spark.implicits._
    val centDf = broadcast(
      cents.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toSeq
        .toDF("__list", "__cent"))
    val assigned = KMeans.assignWith(
      df, vecCol, cents.zipWithIndex.map { case (c, i) => (i, c) }.toSeq, "__list")
    val withRes = assigned.join(centDf, Seq("__list"))
      .withColumn("__res",
        zip_with(col(vecCol).cast("array<double>"), col("__cent"), (x, c) => x - c))
      .drop("__cent")

    // One shared code book trained on ALL residuals (the §IV.B shape).
    val model = ProductQuantizer.fit(withRes, "__res", idCol, dim, m, kSub, pqIters, salt)

    // Per-probed-list ADC tables: the query's residual vs list l is
    // (q − c_l), so table(l, s, rank) = ‖(q − c_l)_s − cent_{s,rank}‖².
    val table: Map[(Int, Int, Int), Double] = probed.flatMap { l =>
      (0 until m).flatMap { s =>
        model.cents(s).map { case (rank, c) =>
          var d = 0.0
          var i = 0
          while (i < c.length) {
            val x = (query(s * subDim + i) - cents(l)(s * subDim + i)) - c(i)
            d += x * x
            i += 1
          }
          (l, s, rank) -> d
        }
      }
    }.toMap

    val candidates = withRes
      .filter(col("__list").isin(probed.map(Integer.valueOf): _*))
    val encoded = ProductQuantizer.encode(candidates, "__res", model, "__code")
    val bc = spark.sparkContext.broadcast(table)
    val schema = encoded.schema.add("adc", org.apache.spark.sql.types.DoubleType)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val cIdx = encoded.schema.fieldIndex("__code")
    val lIdx = encoded.schema.fieldIndex("__list")
    encoded.filter(col("__code").isNotNull)
      .mapPartitions { it =>
        val t = bc.value
        it.map { r =>
          val code = r.getSeq[Int](cIdx)
          val l = r.getInt(lIdx)
          var d = 0.0
          var s = 0
          while (s < code.length) { d += t((l, s, code(s))); s += 1 }
          org.apache.spark.sql.Row.fromSeq(r.toSeq :+ d)
        }
      }(enc)
      .withColumn("adc", round(col("adc"), 6))
      .orderBy(col("adc").asc, col(idCol).asc)
      .limit(k)
      .drop("__code", "__list", "__res")
  }
}
