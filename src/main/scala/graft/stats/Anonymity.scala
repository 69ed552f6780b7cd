package graft.stats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** k-anonymity / l-diversity audit (Sweeney 2002; Machanavajjhala
  * et al. 2007) — the privacy gate a dataset release runs before
  * anyone shares "anonymized" rows: every quasi-identifier (QI)
  * combination must be shared by ≥ k rows (else the combination
  * re-identifies), and each QI group must contain ≥ l distinct values
  * of the sensitive attribute (else membership in the group leaks the
  * attribute even at high k).
  *
  * One keyed aggregate over the QI columns: group size and distinct
  * sensitive values; `risky_k` flags the re-identifiable groups. The
  * dataset's k-anonymity level is the min group size of the output.
  * Scale: exactly one shuffle on the QI key; the distinct count is a
  * per-group expand, bounded by the sensitive domain.
  */
object Anonymity {

  def audit(df: DataFrame, qiCols: Seq[String], sensitive: Column,
      k: Int): DataFrame = {
    require(qiCols.nonEmpty, "at least one quasi-identifier column")
    require(k >= 1, "k must be >= 1")
    df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        countDistinct(sensitive).as("l_distinct"))
      .withColumn("risky_k", col("n") < k)
  }
}
