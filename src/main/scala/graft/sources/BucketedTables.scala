package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table helpers: persist both sides of a recurring join
  * bucketed by the join key so the join runs shuffle-free forever
  * after (each bucket pair joins locally; the exchange disappears from
  * the plan — asserted in BucketedTablesSpec).
  *
  * This is the 100 TB answer for fact-fact joins that repeat across
  * a pipeline: pay the bucketed write once, then every downstream
  * join/aggregation on the bucket key is exchange-free. Bucket count
  * should target ~128 MB–1 GB per bucket at production scale; it must
  * match on both sides for the co-located join.
  */
object BucketedTables {

  /** Write `df` as a bucketed managed table (overwriting). Robust to an
    * ORPHANED location: the default (Derby) metastore is per-JVM, so a
    * managed table written by a previous session leaves its warehouse
    * directory behind with no catalog entry, and `saveAsTable` refuses
    * with LOCATION_ALREADY_EXISTS. Drop + clear the default location
    * first so re-runs behave like Overwrite across sessions too.
    */
  def writeBucketed(
      df: DataFrame,
      table: String,
      bucketCol: String,
      buckets: Int,
      sortCol: Option[String] = None): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val warehouse = spark.conf.get("spark.sql.warehouse.dir")
    val loc = new org.apache.hadoop.fs.Path(warehouse, table.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    val w = df.write
      .mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(buckets, bucketCol)
    sortCol.fold(w)(c => w.sortBy(c)).saveAsTable(table)
  }

  def read(spark: SparkSession, table: String): DataFrame = spark.table(table)
}
