package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Quantile normalization across sources — the batch-effect correction
  * of bioinformatics (Bolstad et al. 2003) applied to corpus features:
  * each source's value distribution is mapped ONTO the pooled
  * distribution, so downstream thresholds ("drop the shortest 10 %")
  * mean the same thing for every source even when one crawler
  * systematically over/under-measures. A row at rank r of n within its
  * source takes the pooled value at global rank ⌈r·N/n⌉ — rank
  * arithmetic is exact integers (⌈a/b⌉ = (a+b−1) div b), and both rank
  * orders carry an id tiebreak, so the mapping is deterministic and
  * SQL-replayable.
  *
  * Scale shape: one keyed window per source (bounded by the source's
  * rows), the pooled ranking through [[GlobalRank]] (range-partitioned,
  * no single-partition window), and one equi-join on the computed
  * rank. Driver state: GlobalRank's partition counts + one total.
  */
object QuantileNorm {

  /** `df` with `outCol` = the pooled-distribution value at this row's
    * per-`groupCol` quantile position. `idCol` breaks value ties
    * (must be unique) so ranks are total orders.
    */
  def normalize(df: DataFrame, valueCol: String, idCol: String,
      groupCol: String, outCol: String = "qnorm"): DataFrame = {
    val wSrc = Window.partitionBy(col(groupCol))
      .orderBy(col(valueCol), col(idCol))
    val src = df
      .withColumn("__r", row_number().over(wSrc))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(col(groupCol))))
    val pooled = GlobalRank.withGlobalRank(
        df.select(col(valueCol), col(idCol)),
        Seq(col(valueCol), col(idCol)), rankCol = "__k")
      .select(col("__k"), col(valueCol).as(outCol))
    // "__tot", not "__N": Spark resolves case-insensitively, so "__N"
    // would collide with "__n".
    val total = df.agg(count(lit(1)).as("__tot"))
    src.crossJoin(total)
      .withColumn("__k", expr("(__r * __tot + __n - 1) div __n"))
      .join(pooled, "__k")
      .drop("__r", "__n", "__tot", "__k")
  }
}
