package graft.pipeline

import graft.SparkSpec

class TrainingPipelineSpec extends SparkSpec {
  import spark.implicits._

  // One doc per drop-reason, two survivors; every stage's effect is
  // observable in the final id set.
  private val good1 = "the quick brown fox and the lazy dog is it that good to see"
  private val good2 = "a different story of the night and the sea is it that calm to hear"
  private val spammy = "spam spam spam spam spam spam spam spam the and is of it in is the and of"
  private val contaminated = "the story of alpha beta gamma delta epsilon is it that and to in"
  private val corpus = Seq(
    (1L, "srcA", good1),
    (2L, "srcA", good1), // exact dupe of 1 → dedup drops
    (3L, "srcA", spammy), // fails repetition gate
    (4L, "srcA", "zz"), // fails quality gate
    (5L, "srcA", contaminated), // shares a 5-gram with bench
    (6L, "srcB", good2 + " extra"), // weight-0 source → mix drops
    (7L, "srcA", good2)
  ).toDF("doc_id", "source", "text")
  private val bench = Seq((100L, "alpha beta gamma delta epsilon zeta"))
    .toDF("doc_id", "text")

  test("each stage drops its doc; survivors carry a split") {
    val out = TrainingPipeline.prepare(corpus, bench, "text", "doc_id", "source",
      TrainingPipeline.Config(
        minQuality = 0.5, decontamN = 5,
        weights = Map("srcA" -> 1.0, "srcB" -> 0.0),
        splits = Seq("train" -> 1.0)))
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(out.keySet == Set(1L, 7L))
    assert(out.values.toSet == Set("train"))
  }

  test("deterministic under repartitioning") {
    def run(df: org.apache.spark.sql.DataFrame) =
      TrainingPipeline.prepare(df, bench, "text", "doc_id", "source",
        TrainingPipeline.Config(0.5, 5, Map("srcA" -> 0.5, "srcB" -> 0.5),
          Seq("train" -> 0.875, "val" -> 0.0625, "test" -> 0.0625)))
        .select("doc_id", "split").as[(Long, String)].collect().toSet
    assert(run(corpus) == run(corpus.repartition(5)))
  }
}
