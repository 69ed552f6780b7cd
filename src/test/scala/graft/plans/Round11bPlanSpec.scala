package graft.plans

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Plan-shape pins for the round-11 continuation wave: the scale
  * claims in the scaladocs, asserted against the optimizer output. */
class Round11bPlanSpec extends SparkSpec {
  import spark.implicits._

  test("hierarchy rollup: no join, no window — explode + one aggregate") {
    val vals = Seq((10L, 5L), (73L, 2L)).toDF("node", "v")
    val plan = graft.operators.Hierarchy
      .rollup(vals, "node", 7, 8, Seq("v"))
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("Join"), plan.take(300))
    assert(!plan.toLowerCase.contains("window"), plan.take(300))
  }

  test("netChanges: keyed aggregate, never a window sort") {
    val c = Seq((1L, 1L, "I", "a")).toDF("k", "version", "op", "v")
    val plan = graft.operators.Upsert
      .netChanges(c, Seq("k"), "version", "op", Seq("v"))
      .queryExecution.optimizedPlan.toString
    assert(!plan.toLowerCase.contains("window"), plan.take(300))
    assert(plan.contains("Aggregate"), plan.take(300))
  }

  test("position-delete MoR read is a left-anti join on (file, pos)") {
    val base = java.nio.file.Files.createTempDirectory("r11b_dv").toString
    val df = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
      .withColumn("file_id", pmod($"k", lit(2L)))
    graft.sources.DeleteVectors.stage(df, "file_id", Seq("k"), s"$base/d")
    graft.sources.DeleteVectors.writeDeletes(spark, s"$base/d",
      s"$base/del", col("k") === 1L, "file_id")
    val plan = graft.sources.DeleteVectors
      .readMor(spark, s"$base/d", s"$base/del", "file_id")
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("LeftAnti"), plan.take(400))
  }

  test("betweenness bc aggregation ends in the bounded TopK aggregate") {
    val e = (Seq((1L, 2L), (2L, 3L)) ++ Seq((2L, 1L), (3L, 2L)))
      .toDF("src", "dst")
    val df = graft.graph.Betweenness.topMicro(e, "src", "dst",
      Seq(1L).toDF("id"), maxLevel = 3, k = 5)
    val plan = df.queryExecution.optimizedPlan.toString
    assert(plan.contains("top_k"), plan.take(400))
    assert(!plan.toLowerCase.contains("window"), plan.take(400))
  }
}
