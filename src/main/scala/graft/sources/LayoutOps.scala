package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions.col

/** Sort-clustered parquet layout — the third at-rest discipline next to
  * [[BucketedTables]] (co-located joins) and `IvfFlat.writeIndex`
  * (partition-pruned probes): cluster the FILE CONTENTS by the columns
  * queries filter on, so parquet row-group min/max statistics become
  * selective and the reader SKIPS whole row groups for range/equality
  * predicates on the sort key.
  *
  * Unsorted data leaves every row group's [min, max] spanning the whole
  * domain — stats prune nothing and a selective filter still reads
  * 100 TB. After `repartitionByRange` + `sortWithinPartitions`, each
  * row group covers a narrow key slice: a point/range predicate reads
  * only the matching groups (verified by scan-metric assertion in
  * LayoutOpsSpec). This composes with partition pruning: coarse
  * partitionBy directories first, sort-cluster within.
  */
object LayoutOps {

  /** Write `df` range-partitioned AND sorted by `sortCols`. One range
    * shuffle (sampled bounds) at write time buys row-group pruning on
    * every later read. `repartitionByRange(numFiles)` yields one file
    * per range partition, each covering a disjoint key interval.
    */
  def writeSorted(df: DataFrame, path: String, sortCols: Seq[String], numFiles: Int): Unit =
    df.repartitionByRange(numFiles, sortCols.map(col): _*)
      .sortWithinPartitions(sortCols.map(col): _*)
      .write.mode(SaveMode.Overwrite).parquet(path)
}
