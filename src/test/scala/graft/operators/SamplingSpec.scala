package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private val docs = (0L until 1000L).map(i => (i, s"src${i % 4}")).toDF("id", "source")

  test("sample is layout-invariant (same rows regardless of partitioning)") {
    val a = Sampling.sample(docs, "id", 0.5, "s1").select("id").as[Long].collect().toSet
    val b = Sampling.sample(docs.repartition(7), "id", 0.5, "s1")
      .select("id").as[Long].collect().toSet
    assert(a == b)
    // Bernoulli(0.5) over 1000 keys: expect ~500, allow ±5σ (~±79).
    assert(a.size > 420 && a.size < 580)
  }

  test("different salts draw different samples") {
    val a = Sampling.sample(docs, "id", 0.5, "s1").select("id").as[Long].collect().toSet
    val b = Sampling.sample(docs, "id", 0.5, "s2").select("id").as[Long].collect().toSet
    assert(a != b)
  }

  test("mixture keeps per-source rates; unlisted sources drop") {
    val kept = Sampling.mixture(docs, "source",
      Map("src0" -> 1.0, "src1" -> 0.5, "src2" -> 0.0), "id", "m1")
      .groupBy("source").count().as[(String, Long)].collect().toMap
    assert(kept.getOrElse("src0", 0L) == 250L) // rate 1.0 keeps everything
    assert(!kept.contains("src2") && !kept.contains("src3"))
    val k1 = kept.getOrElse("src1", 0L)
    assert(k1 > 85 && k1 < 165) // 250 × 0.5 ± 5σ
  }

  test("assignSplit partitions every row exactly once, deterministically") {
    val out = Sampling.assignSplit(docs, "id",
      Seq("train" -> 0.875, "val" -> 0.0625, "test" -> 0.0625), "sp1")
    assert(out.count() == 1000L)
    val byStn = out.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(byStn.keySet == Set("train", "val", "test"))
    assert(byStn("train") > 800L)
    // re-run agrees row-for-row
    val a = out.select("id", "split").as[(Long, String)].collect().toSet
    val b = Sampling.assignSplit(docs.repartition(5), "id",
      Seq("train" -> 0.875, "val" -> 0.0625, "test" -> 0.0625), "sp1")
      .select("id", "split").as[(Long, String)].collect().toSet
    assert(a == b)
  }

  test("assignSplit rejects fractions that do not sum to 1") {
    intercept[IllegalArgumentException] {
      Sampling.assignSplit(docs, "id", Seq("a" -> 0.5, "b" -> 0.4), "x")
    }
  }

  test("tokenBudget fills each source to its soft cap in hash order") {
    val df = (0L until 20L).map(i => (i, if (i < 10) "a" else "b", 10L))
      .toDF("id", "source", "toks")
    val kept = Sampling.tokenBudget(df, "source", "toks", "id",
      Map("a" -> 25L), "t1")
    val bySrc = kept.groupBy("source").count().as[(String, Long)].collect().toMap
    // 10-token docs, budget 25: cum 10/20/30 → 3 docs (crossing doc kept);
    // source b unlisted → dropped entirely.
    assert(bySrc == Map("a" -> 3L))
    // layout-invariant and deterministic
    val a = kept.select("id").as[Long].collect().toSet
    val b = Sampling.tokenBudget(df.repartition(7), "source", "toks", "id",
      Map("a" -> 25L), "t1").select("id").as[Long].collect().toSet
    assert(a == b)
  }

  test("weightedSample: layout-invariant, TakeOrdered plan, weight-proportional inclusion") {
    val weighted = (0L until 1000L).map(i => (i, if (i < 100) 50L else 1L))
      .toDF("id", "w")
    val s = Sampling.weightedSample(weighted, "id", "w", k = 200, salt = "ws")
    assert(s.queryExecution.executedPlan.toString.contains("TakeOrdered"),
      "expected TakeOrderedAndProject, not a global sort")
    val ids = s.select("id").as[Long].collect().toSet
    assert(ids.size == 200)
    val idsRepart = Sampling.weightedSample(weighted.repartition(7), "id", "w",
      k = 200, salt = "ws").select("id").as[Long].collect().toSet
    assert(ids == idsRepart)
    // 100 rows carry weight 50 vs 900 rows weight 1 — the heavy rows'
    // share of the weight mass is 5000/5900 ≈ 85%; essentially all of
    // them should make a 200-row sample (P[miss] is negligible), and
    // they can never be the whole sample.
    val heavy = ids.count(_ < 100)
    assert(heavy >= 95, s"only $heavy of the weight-50 rows sampled")
    // zero/negative weights are excluded outright
    val withZero = (0L until 10L).map(i => (i, if (i % 2 == 0) 0L else 3L)).toDF("id", "w")
    val z = Sampling.weightedSample(withZero, "id", "w", k = 10, salt = "ws")
      .select("id").as[Long].collect().toSet
    assert(z == Set(1L, 3L, 5L, 7L, 9L))
    // huge uniform weights (byte-size scale): the log-domain key keeps
    // full precision, so selection stays hash-random instead of
    // collapsing to ties resolved as "smallest ids win"
    val huge = (0L until 1000L).map(i => (i, 100000000L)).toDF("id", "w")
    val h = Sampling.weightedSample(huge, "id", "w", k = 100, salt = "ws")
      .select("id").as[Long].collect().toSet
    assert(h != (0L until 100L).toSet, "large weights degenerated to smallest-id selection")
  }

  test("perGroupSample: k per group, layout-invariant, WindowGroupLimit plan") {
    val s = Sampling.perGroupSample(docs, "source", "id", k = 5, salt = "pg")
    assert(s.queryExecution.executedPlan.toString.contains("WindowGroupLimit"),
      "expected WindowGroupLimit pre-trim before the shuffle")
    val got = s.select("source", "id").as[(String, Long)].collect()
    assert(got.groupBy(_._1).forall(_._2.length == 5))
    val repart = Sampling.perGroupSample(docs.repartition(7), "source", "id",
      k = 5, salt = "pg").select("source", "id").as[(String, Long)].collect()
    assert(got.toSet == repart.toSet)
    // a group smaller than k returns whole
    val tiny = Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("id", "source")
    assert(Sampling.perGroupSample(tiny, "source", "id", 5, "pg").count() == 3)
  }

  test("replicate repeats rows with tagged copy indices") {
    val r = Sampling.replicate(docs, "source", Map("src1" -> 3))
    assert(r.filter(col("source") === "src1").count() == 750L)
    assert(r.filter(col("source") === "src0").count() == 250L)
    val copies = r.filter(col("source") === "src1").select("copy")
      .distinct().as[Int].collect().toSet
    assert(copies == Set(0, 1, 2))
  }

  test("assignFolds: layout-invariant, complete, and roughly balanced per stratum") {
    val a = Sampling.assignFolds(docs, "id", 5, "cv")
      .select("id", "fold").as[(Long, Int)].collect().toMap
    val b = Sampling.assignFolds(docs.repartition(13), "id", 5, "cv")
      .select("id", "fold").as[(Long, Int)].collect().toMap
    assert(a == b)
    assert(a.values.toSet == Set(0, 1, 2, 3, 4))
    // within one stratum (source = id % 4), each fold gets 250/5 = 50 ± slack
    val strata = Sampling.assignFolds(docs, "id", 5, "cv")
      .groupBy("source", "fold").count()
      .as[(String, Int, Long)].collect()
    strata.foreach { case (src, fold, n) =>
      assert(n > 25 && n < 85, s"$src/$fold unbalanced: $n")
    }
  }

  test("assignFolds: different salts give different assignments") {
    val a = Sampling.assignFolds(docs, "id", 5, "cv-a")
      .select("id", "fold").as[(Long, Int)].collect().toMap
    val b = Sampling.assignFolds(docs, "id", 5, "cv-b")
      .select("id", "fold").as[(Long, Int)].collect().toMap
    assert(a != b)
  }
}
