package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Partition-spec EVOLUTION (Iceberg §partition-evolution): a table's
  * early data sits under one partitioning (say year=YYYY), newer data
  * under a finer one (month=YYYY-MM), and readers must prune BOTH
  * layouts from one logical predicate without rewriting history. At
  * 100 TB, re-partitioning old data to adopt a finer spec is exactly
  * the rewrite you can't afford — evolution makes the spec a property
  * of each file batch, not of the table.
  *
  * Each layout is written hive-partitioned by a date_format of the
  * event date at that layout's granularity. A date-range read
  * compiles the predicate per layout into (a) a partition-column
  * range — lexicographic on yyyy[-MM[-dd]] IS chronological, so the
  * string bounds prune directories before any file is opened — and
  * (b) the exact row-level date filter. The union is by name; the
  * partition column stays layout-local and a `layout` tag marks
  * provenance.
  */
object PartitionEvolution {

  /** One partition spec epoch: where it lives, its tag, and its
    * granularity as a date_format pattern whose lexicographic order
    * matches time (yyyy, yyyy-MM, yyyy-MM-dd). */
  final case class Layout(name: String, dir: String, fmt: String)

  /** Stage `df` rows under `layout`, partitioned at its granularity. */
  def write(df: DataFrame, dateCol: String, layout: Layout): Unit =
    df.withColumn("__part", date_format(col(dateCol), layout.fmt))
      .write.mode("overwrite").partitionBy("__part").parquet(layout.dir)

  /** Read a date range across all layout epochs: per layout, the
    * partition-range predicate (directory pruning) plus the row-level
    * date predicate, tagged and unioned. `lo`/`hi` are inclusive
    * yyyy-MM-dd strings.
    */
  def readRange(spark: SparkSession, layouts: Seq[Layout],
      dateCol: String, lo: String, hi: String): DataFrame =
    layouts.map { l =>
      val n = l.fmt.length
      // Hive partition-value inference types year dirs as int and
      // month dirs as string; normalize to string so epochs union.
      // The cast predicate still references only the partition
      // column, so directory pruning survives (plan-pinned in spec).
      spark.read.parquet(l.dir)
        .withColumn("__part", col("__part").cast("string"))
        .filter(col("__part") >= lo.take(n) && col("__part") <= hi.take(n))
        .filter(col(dateCol) >= lo && col(dateCol) <= hi)
        .withColumn("layout", lit(l.name))
        .withColumnRenamed("__part", "part_value")
    }.reduce(_ unionByName _)
}
