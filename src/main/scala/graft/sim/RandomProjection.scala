package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Rademacher (±1) random projection — Johnson-Lindenstrauss dimension
  * reduction with a sign matrix instead of Gaussians (Achlioptas 2003:
  * ±1 entries satisfy the JL lemma with the same m = O(log n / ε²)
  * guarantee and no float matrix to store). The projection
  *   y_j = Σ_i s(i,j)·x_i,   s(i,j) ∈ {−1, +1} derived from md5,
  * preserves ‖x‖² in expectation: E[‖y‖²/m] = ‖x‖². Used as the cheap
  * front-stage of similarity pipelines (project 64-d → 16-d before
  * LSH/clustering) and as a layout-free alternative to trained PCA.
  *
  * Determinism discipline: the sign matrix is a data-independent
  * constant (md5 of "seed|i|j", bit 0), and every dot product is a
  * strict LEFT-TO-RIGHT chained double sum — the one float-summation
  * order every engine parses identically — so projected values and
  * distortions are bit-reproducible in SQL (no engine-internal
  * aggregation order anywhere). Scale shape: scan-local,
  * whole-stage-codegen arithmetic, zero shuffles and zero state.
  */
object RandomProjection {

  /** +1 or −1 for matrix cell (i, j) under `seed` — low bit of the
    * md5-derived 60-bit integer, the repo's standard hash family.
    */
  def sign(seed: String, i: Int, j: Int): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"$seed|$i|$j".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 15)
    if ((java.lang.Long.parseLong(hex, 16) & 1L) == 0L) 1 else -1
  }

  /** `df` plus `outCol` = array<double> of the `m` projected
    * coordinates of `vecCol` (array<float|double>, fixed length `d`).
    */
  def project(df: DataFrame, vecCol: String, d: Int, m: Int,
      seed: String, outCol: String = "proj"): DataFrame = {
    require(d > 0 && m > 0, "d and m must be positive")
    val ys = (1 to m).map { j =>
      (1 to d).foldLeft(lit(0.0)) { (acc, i) =>
        val x = element_at(col(vecCol), i).cast("double")
        if (sign(seed, i, j) > 0) acc + x else acc - x
      }
    }
    df.withColumn(outCol, array(ys: _*))
  }

  /** Per-row JL distortion audit: ‖x‖², ‖y‖²/m, and their ratio
    * (≈ 1 ± 2/√m). Chained-sum norms — same order discipline.
    */
  def distortion(df: DataFrame, vecCol: String, d: Int, m: Int,
      seed: String): DataFrame = {
    val x2 = (1 to d).foldLeft(lit(0.0)) { (acc, i) =>
      val x = element_at(col(vecCol), i).cast("double")
      acc + x * x
    }
    val projected = project(df, vecCol, d, m, seed, "__y")
    val y2 = (1 to m).foldLeft(lit(0.0)) { (acc, j) =>
      val y = element_at(col("__y"), j)
      acc + y * y
    }
    projected
      .withColumn("x_norm2", x2)
      .withColumn("y_norm2_m", y2 / m)
      .where(col("x_norm2") > 0)
      .withColumn("distortion", col("y_norm2_m") / col("x_norm2"))
      .drop("__y")
  }
}
