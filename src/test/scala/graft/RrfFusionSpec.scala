package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-10 directive #4: q_rrf_fusion's serving-list ranks must come
  * from the bounded top-k aggregate, never from `row_number() OVER
  * (ORDER BY score)` — the window form single-partition-sorts the full
  * BM25-matched frame (df-scaled: every doc containing a query term)
  * before trimming to 50. Pins (a) plan shape: ZERO Window operators
  * anywhere in the executed plan, and (b) rank semantics: the
  * TopK-array ranks are exactly the window-form ranks on the same
  * scored frame.
  */
class RrfFusionSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("q_rrf_fusion plan contains no Window operator") {
    val df = SparkEntry.queries("q_rrf_fusion")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      s"unpartitioned/any Window found in plan:\n$plan")
    assert(df.count() > 0)
  }

  test("TopK-array ranks == window-form ranks on the scored BM25 frame") {
    val docs = Tables.load(spark, sfDir, "documents")
    val scored = graft.text.Bm25
      .score(docs, "text", "doc_id", Seq("spark", "sort", "hash"))
      .select(col("doc_id"), col("score"))
    val windowed = scored
      .withColumn("r",
        row_number().over(Window.orderBy(col("score").desc, col("doc_id").asc)))
      .filter(col("r") <= 50)
      .select(col("doc_id"), col("r"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    val topk = scored
      .agg(graft.stats.TopK.topK(
        struct(col("score").as("s"), (-col("doc_id")).as("nid")), 50).as("top"))
      .select(posexplode(col("top")).as(Seq("p", "v")))
      .select((-col("v.nid")).as("doc_id"), (col("p") + 1).cast("int").as("r"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(topk == windowed)
    assert(topk.nonEmpty)
  }
}
