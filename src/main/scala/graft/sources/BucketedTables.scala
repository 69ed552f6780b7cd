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
    // Pre-partition by the bucket column with the SAME hash the bucket
    // layout uses: without this, every write task emits a file into
    // every bucket (tasks × buckets small files — 1024 for a 32-task
    // 32-bucket write, paid again by every probe's file listing);
    // with it, each task holds exactly one bucket → `buckets` files
    // total. One skinny shuffle at write time buys the at-rest layout
    // the operator exists for.
    val w = df.repartition(buckets, org.apache.spark.sql.functions.col(bucketCol))
      .write
      .mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(buckets, bucketCol)
    sortCol.fold(w)(c => w.sortBy(c)).saveAsTable(table)
  }

  def read(spark: SparkSession, table: String): DataFrame = spark.table(table)
}
