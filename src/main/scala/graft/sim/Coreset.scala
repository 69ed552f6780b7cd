package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Greedy k-center coreset selection (Gonzalez farthest-point) — the
  * diversity-sampling step of embedding-based data curation: pick k
  * corpus exemplars so every vector is near some exemplar
  * (2-approximation of the optimal k-center cover). Used to seed
  * diverse finetuning subsets, dedup cluster exemplars, and IVF
  * coarse quantizers that cover the tails instead of the modes.
  *
  * Distances are EXACT INTEGERS: vectors are int8-quantized once
  * against per-dimension [min,max] (the q_ann_sq8 / FAISS-SQ8
  * recipe), and squared L2 over codes is pure integer algebra — no
  * float accumulation order anywhere, so a SQL oracle replays every
  * selection bit-for-bit, ties broken by id.
  *
  * Scale shape: one stats pass (64 bounded rows to the driver, the
  * KMeans-centroid precedent), one quantization projection cached,
  * then k rounds of {narrow min-distance update, one max-struct agg}
  * — each round is a map + aggregate over the cached codes, no
  * shuffle, no driver state beyond the k chosen rows. At 100 TB you
  * run this on the corpus sample/centroid tier, not raw rows — k
  * passes over a full corpus is the wrong tool, and the cover
  * guarantee only needs the sample.
  */
object Coreset {

  private def distSq(c: Column, center: Column): Column =
    aggregate(zip_with(c, center, (a, b) => (a - b) * (a - b)),
      lit(0L), (acc, x) => acc + x)

  /** (round, vec_id, dist_sq) for the k selected centers in selection
    * order; dist_sq is the max-min distance that made the point the
    * farthest (0 for the seed = lowest id). */
  def kCenters(e: DataFrame, embCol: String, idCol: String,
      k: Int): DataFrame = {
    require(k >= 1)
    val spark = e.sparkSession
    val ev = e.filter(col(embCol).isNotNull)
      .select(col(idCol).cast("long").as("vec_id"),
        posexplode(col(embCol)).as(Seq("i", "xf")))
      .select(col("vec_id"), col("i"), col("xf").cast("double").as("x"))
    val mm = ev.groupBy("i").agg(min("x").as("lo"), max("x").as("hi"))
      .orderBy("i").collect() // bounded: one row per dimension
    val los = typedlit(mm.map(_.getDouble(1)).toSeq)
    val his = typedlit(mm.map(_.getDouble(2)).toSeq)
    val codesExpr = transform(col(embCol).cast("array<double>"),
      (x, i) => {
        val l = element_at(los, i + 1)
        val h = element_at(his, i + 1)
        when(h > l, round((x - l) / (h - l) * 254, 0))
          .otherwise(lit(0.0)).cast("long") - 127
      })
    val codes = e.filter(col(embCol).isNotNull)
      .select(col(idCol).cast("long").as("vec_id"), codesExpr.as("c"))
      .cache()

    def codesOf(id: Long): Seq[Long] =
      codes.filter(col("vec_id") === id).head().getSeq[Long](1)

    val seed = codes.agg(min("vec_id")).head().getLong(0)
    var chosen = Vector((1, seed, 0L))
    var state = codes.withColumn("d",
      distSq(col("c"), typedlit(codesOf(seed))))
    var r = 1
    while (r < k) {
      r += 1
      val ids = chosen.map(_._2)
      val best = state.filter(!col("vec_id").isin(ids: _*))
        .agg(max(struct(col("d"), (-col("vec_id")).as("nid")))).head()
        .getStruct(0)
      val (d, id) = (best.getLong(0), -best.getLong(1))
      chosen :+= ((r, id, d))
      if (r < k) state = state.withColumn("d",
        least(col("d"), distSq(col("c"), typedlit(codesOf(id)))))
    }
    codes.unpersist()
    import spark.implicits._
    chosen.toDF("round", "vec_id", "dist_sq")
  }
}
