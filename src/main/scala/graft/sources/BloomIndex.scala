package graft.sources

import graft.operators.GlobalRank
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-file BLOOM data-skipping index — the equality-probe complement
  * of [[MinMaxIndex]]: zone maps prune RANGE probes on clustered
  * layouts, but on a hash-ordered (or just unclustered) layout every
  * file's [min, max] spans the whole domain and a point lookup scans
  * the table. A per-file Bloom filter over the probe column prunes
  * exactly there — the file-skipping trick Parquet bloom filters /
  * Iceberg puffin files play at 100 TB, made explicit and
  * oracle-replayable.
  *
  * Determinism discipline: the k bit positions of a value are
  * md5-derived (the repo's hash standard — replayable in any engine),
  * and the "bitset" is materialized as the SORTED ARRAY of set
  * positions, so index rows are plain comparable data. No false
  * negatives by construction: a file containing v sets all k of v's
  * positions, so a probe only ever skips files that cannot hold v.
  *
  * Scale shape: the index is one [[GlobalRank]] pass (deterministic
  * file = rank div rowsPerFile, the MinMaxIndex contract) plus one
  * keyed aggregate of exploded positions — index size is
  * O(files × min(bits, rows)); probing is a driver-side lookup over
  * the bounded index frame, never a scan of the table.
  */
object BloomIndex {

  /** The k md5-derived positions of `v` in [0, bits). */
  def positions(v: Column, k: Int, bits: Int): Seq[Column] =
    (0 until k).map { i =>
      pmod(conv(substring(md5(concat(lit(s"bl$i|"), v.cast("string"))),
        1, 15), 16, 10).cast("long"), lit(bits.toLong))
    }

  /** Per-file bloom rows: (file_id, n, bloom: sorted array of set
    * positions) for `valueCol` under the `sortCols` total order.
    */
  def buildIndex(df: DataFrame, valueCol: String, sortCols: Seq[Column],
      rowsPerFile: Long, k: Int = 4, bits: Int = 16384): DataFrame = {
    require(rowsPerFile > 0 && k > 0 && bits > 0)
    val pos = positions(col(valueCol), k, bits)
    GlobalRank.withGlobalRank(df, sortCols, rankCol = "__rk")
      .withColumn("file_id", expr(s"(__rk - 1) div $rowsPerFile"))
      .select(col("file_id"), explode(array(pos: _*)).as("p"))
      .groupBy("file_id")
      .agg(count(lit(1)).as("n_positions"),
        sort_array(collect_set(col("p"))).as("bloom"))
  }

  /** Index rows annotated with whether an equality probe for `v` must
    * read the file: true iff ALL k positions of v are set.
    */
  def annotateProbe(index: DataFrame, v: Column, k: Int = 4,
      bits: Int = 16384): DataFrame = {
    val pos = positions(v, k, bits)
    index.withColumn("reads_for_probe",
      pos.map(p => array_contains(col("bloom"), p)).reduce(_ && _))
  }
}
