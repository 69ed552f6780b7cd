package graft.stats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations — the pre-training gate a
  * corpus pipeline runs before a shard is admitted (null-rate bounds,
  * value ranges, key uniqueness, referential integrity), returned as
  * one (check, metric, pass) report row per expectation.
  *
  * Execution shape: every scalar expectation (null fraction, range
  * violations) folds into ONE aggregation pass over the table —
  * adding a check adds a column to the agg, not a job. Key uniqueness
  * is one keyed groupBy; referential integrity one left-anti join
  * sized by the orphan side. Nothing collects corpus rows; each
  * check's result is a single metric double.
  *
  * Determinism: metrics are ratios of exact long counts (round 6) or
  * raw counts — bit-identical cross-engine (q_dq oracle).
  */
object DataQuality {

  sealed trait Check
  /** Null fraction of `column` must be ≤ `maxNullFrac`. */
  final case class NotNull(column: String, maxNullFrac: Double = 0.0) extends Check
  /** Count of non-null values outside [lo, hi] must be ≤ `maxViolations`. */
  final case class InRange(column: String, lo: Double, hi: Double,
      maxViolations: Long = 0L) extends Check
  /** Number of key groups with > 1 row must be 0. */
  final case class UniqueKey(columns: Seq[String]) extends Check
  /** Count of rows whose `column` has no match in `ref(refColumn)`
    * must be 0 (NULLs don't count as orphans).
    */
  final case class RefIntegrity(column: String, ref: DataFrame,
      refColumn: String) extends Check

  /** Run all checks; returns (check_name: string, metric: double,
    * pass: boolean), one row per check, ordered by check name.
    */
  def run(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "at least one check")
    val spark = df.sparkSession
    import spark.implicits._

    val scalar = checks.collect {
      case NotNull(c, maxFrac) =>
        val metric = round(
          sum(when(col(c).isNull, 1L).otherwise(0L)).cast("double") /
            count(lit(1)), 6)
        (s"not_null:$c", metric, (m: Column) => m <= maxFrac)
      case InRange(c, lo, hi, maxViol) =>
        val metric = sum(when(col(c).isNotNull &&
          (col(c) < lo || col(c) > hi), 1L).otherwise(0L)).cast("double")
        (s"in_range:$c", metric, (m: Column) => m <= maxViol.toDouble)
    }
    val scalarReport: Option[DataFrame] =
      if (scalar.isEmpty) None
      else {
        val row = df.agg(scalar.head._2.as("m0"),
          scalar.tail.zipWithIndex.map { case ((_, m, _), i) => m.as(s"m${i + 1}") }: _*)
        Some(row.select(scalar.zipWithIndex.map { case ((name, _, passFn), i) =>
          struct(lit(name).as("check_name"), col(s"m$i").as("metric"),
            passFn(col(s"m$i")).as("pass")).as(s"s$i")
        }: _*).select(explode(array(scalar.indices.map(i => col(s"s$i")): _*)).as("r"))
          .select(col("r.check_name"), col("r.metric"), col("r.pass")))
      }

    val keyed = checks.collect {
      case UniqueKey(cols) =>
        val dups = df.groupBy(cols.map(col): _*)
          .agg(count(lit(1)).as("__n")).filter(col("__n") > 1).count()
        (s"unique_key:${cols.mkString(",")}", dups.toDouble, dups == 0L)
      case RefIntegrity(c, ref, rc) =>
        val orphans = df.filter(col(c).isNotNull)
          .join(ref.select(col(rc).as(c)).distinct(), Seq(c), "left_anti").count()
        (s"ref_integrity:$c", orphans.toDouble, orphans == 0L)
    }
    val keyedReport: Option[DataFrame] =
      if (keyed.isEmpty) None
      else Some(keyed.toDF("check_name", "metric", "pass"))

    (scalarReport.toSeq ++ keyedReport.toSeq)
      .reduce(_.unionByName(_))
      .orderBy("check_name")
  }
}
