package graft.text

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Dense vocabulary id assignment at corpus scale: ids 0..V-1 in
  * (count desc, token asc) order — the tokenizer-vocab / feature
  * dictionary build every training pipeline runs before encoding.
  *
  * The naive form, `row_number() OVER (ORDER BY cnt DESC, token)`,
  * funnels the ENTIRE vocabulary through one partition (Window with
  * no PARTITION BY) — the q_rrf_fusion scale-killer shape. This
  * instead range-partitions the distinct tokens by the target order,
  * sorts within partitions, and numbers globally with
  * `zipWithIndex` — whose only driver-side state is one row count
  * per partition (bounded by the partition count, not the
  * vocabulary). Range-bound sampling only decides WHICH partition a
  * token lands in, never the total order, so the assignment is
  * deterministic regardless of the sampler.
  *
  * The reference engine has no text surface; north-star extension
  * territory (vocab build feeds the BPE/token-budget family,
  * text/Bpe.scala).
  */
object Vocab {

  /** Assign dense ids 0..V-1 to `counts` rows ordered by
    * (`countCol` desc, `tokenCol` asc). Output columns: the input's
    * plus `id`. `parts` bounds the per-partition sort size — size it
    * so V/parts rows fit an executor's sort buffer.
    */
  def assignIds(counts: DataFrame, tokenCol: String, countCol: String,
      parts: Int): DataFrame = {
    require(parts >= 1)
    val spark = counts.sparkSession
    val sorted = counts
      .repartitionByRange(parts, col(countCol).desc, col(tokenCol).asc)
      .sortWithinPartitions(col(countCol).desc, col(tokenCol).asc)
    val schema = sorted.schema.add("id", LongType, nullable = false)
    val withId = sorted.rdd.zipWithIndex.map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ i)
    }
    spark.createDataFrame(withId, schema)
  }

  /** Incremental vocab update with STABLE ids — the production
    * constraint a rebuild breaks: already-encoded corpora reference
    * the old ids, so existing tokens must keep theirs while a new
    * batch's unseen tokens append at V, V+1, … in (delta count desc,
    * token asc) order. One full-outer keyed join for the count merge,
    * the same window-free assignment for the new tail, one bounded
    * driver scalar (V). Output: (token, cnt, id, is_new) with cnt =
    * merged count.
    */
  def updateIds(baseIds: DataFrame, deltaCounts: DataFrame,
      tokenCol: String, countCol: String, parts: Int): DataFrame = {
    val base = baseIds.select(col(tokenCol),
      col(countCol).as("__bc"), col("id").as("__bid"))
    val delta = deltaCounts.select(col(tokenCol), col(countCol).as("__dc"))
    val merged = base.join(delta, Seq(tokenCol), "full_outer")
    val existing = merged.filter(col("__bid").isNotNull)
      .select(col(tokenCol),
        (col("__bc") + coalesce(col("__dc"), lit(0L))).as(countCol),
        col("__bid").as("id"), lit(false).as("is_new"))
    val vocabSize = baseIds.count() // bounded driver scalar
    val fresh = assignIds(
      merged.filter(col("__bid").isNull)
        .select(col(tokenCol), col("__dc").as(countCol)),
      tokenCol, countCol, parts)
      .select(col(tokenCol), col(countCol),
        (col("id") + vocabSize).as("id"), lit(true).as("is_new"))
    existing.unionAll(fresh)
  }
}
