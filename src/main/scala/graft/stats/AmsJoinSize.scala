package graft.stats

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** AMS / count-sketch join-cardinality estimation (Alon-Matias-Szegedy
  * STOC'96; the Fast-AGMS form of Cormode-Garofalakis) — the
  * optimizer-statistics primitive: |A ⋈ B| equals the inner product of
  * the two key-frequency vectors, and signed-hash sketches estimate
  * that inner product UNBIASEDLY from depth×width counters per table,
  * with stderr ≈ √(F₂(A)·F₂(B)/width). Each table is sketched
  * independently (possibly at different times — sketches are additive
  * and mergeable), so "how big would this join be?" never runs the
  * join.
  *
  * Determinism: cell = md5₆₀("j:"‖key) mod width (the CountMin hash
  * family) and the sign is the NEXT md5 bit (width is a power of two,
  * so cell and sign read disjoint bits); the sketch and the median
  * estimate are integer order statistics — SQL-replayable, no RNG.
  *
  * Scale shape: explode ×depth then one keyed aggregate per table
  * (map-side combinable to ≤ depth·width rows per partition); the
  * estimate joins two depth·width-row frames. Driver state: none.
  */
object AmsJoinSize {

  /** Signed-count cell frame of `keyCol`: (j, cell, s = Σ ±1), at most
    * depth·width rows.
    */
  def cellFrame(df: DataFrame, keyCol: String, depth: Int, width: Int): DataFrame = {
    require(depth > 0, "depth must be positive")
    require(width > 0 && (width & (width - 1)) == 0,
      s"width must be a power of two (sign reads the bit above the " +
        s"cell bits), got $width")
    val h = conv(substring(md5(concat(col("j").cast("string"), lit(":"),
      col(keyCol).cast("string"))), 1, 15), 16, 10).cast("long")
    df.where(col(keyCol).isNotNull)
      .select(col(keyCol),
        explode(array((0 until depth).map(j => lit(j)): _*)).as("j"))
      .withColumn("__h", h)
      .select(col("j"), pmod(col("__h"), lit(width)).as("cell"),
        when(expr(s"__h div $width") % 2 === 0, 1L)
          .otherwise(-1L).as("sgn"))
      .groupBy("j", "cell").agg(sum(col("sgn")).as("s"))
  }

  /** One-row estimate of |a ⋈ b| on a(keyA) = b(keyB): the median of
    * the per-row inner products of the two sketches (depth odd
    * recommended; median = element (depth+1)/2 of the sorted per-j
    * values — an exact order statistic).
    */
  def estimate(a: DataFrame, keyA: String, b: DataFrame, keyB: String,
      depth: Int, width: Int): DataFrame = {
    val ca = cellFrame(a, keyA, depth, width).withColumnRenamed("s", "sa")
    val cb = cellFrame(b, keyB, depth, width).withColumnRenamed("s", "sb")
    val perJ = ca.join(cb, Seq("j", "cell"))
      .groupBy("j").agg(sum(col("sa") * col("sb")).as("ip"))
    val js = a.sparkSession.range(depth).toDF("j")
    js.join(perJ, Seq("j"), "left")
      .select(coalesce(col("ip"), lit(0L)).as("ip"))
      .agg(sort_array(collect_list(col("ip"))).as("ips"))
      .select(
        lit(depth.toLong).as("depth"), lit(width.toLong).as("width"),
        element_at(col("ips"), (depth + 1) / 2).as("est_join"))
  }
}
