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
  * Simplification vs the paper, documented deliberately: codes
  * quantize RAW vectors, not per-list residuals (v − coarse centroid).
  * Residual encoding recovers accuracy lost to coarse cell width at
  * the cost of per-list code books; the raw-vector variant keeps ONE
  * code book, which is both the common memory-constrained deployment
  * and what a SQL oracle can replay without nLists × m Lloyd chains.
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
}
