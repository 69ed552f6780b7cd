package graft.util

import org.apache.spark.sql.DataFrame

/** Input-shaping helpers shared by the sketch/similarity operators. */
object Partitioning {

  /** Spread an under-partitioned input across the cluster before
    * CPU-bound per-row work (a small parquet arrives as one partition →
    * one task does all tokenization/hashing). No-op when the source is
    * already parallel enough — at real scale inputs have thousands of
    * partitions and a blind repartition would be a full extra shuffle.
    */
  def parallelize(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < math.max(2, target / 2)) df.repartition(target) else df
  }
}
