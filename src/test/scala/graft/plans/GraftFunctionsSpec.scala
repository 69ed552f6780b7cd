package graft.plans

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.sql.GraftFunctions
import graft.text.TextFunctions

class GraftFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val registered = { GraftFunctions.register(spark); true }

  test("SQL scalar functions match their Column forms on real text") {
    assert(registered)
    val docs = Seq(
      (1L, "The quick brown fox and the lazy dog"),
      (2L, "pack my box with five dozen liquor jugs!!"),
      (3L, "")
    ).toDF("id", "text")
    docs.createOrReplaceTempView("gf_docs")
    val viaSql = spark.sql(
      """SELECT id, graft_fingerprint(text) AS fp, graft_token_count(text) AS n,
        |  round(graft_quality(text), 6) AS q, graft_lang_id(text) AS lang
        |FROM gf_docs ORDER BY id""".stripMargin).collect()
    val viaCols = docs.select(
      col("id"),
      TextFunctions.fingerprint(col("text")).as("fp"),
      TextFunctions.tokenCount(col("text")).as("n"),
      round(TextFunctions.qualityScore(col("text")), 6).as("q"),
      TextFunctions.langId(col("text")).as("lang"))
      .orderBy("id").collect()
    assert(viaSql.toSeq == viaCols.toSeq)
  }

  test("graft_doc_profile ≡ the four singles (one-pass kernel contract)") {
    assert(registered)
    val docs = Seq(
      (1L, "The quick brown fox and the lazy dog"),
      (2L, "pack my box with five dozen liquor jugs!!"),
      (3L, ""),
      (4L, "   \t  "),
      (5L, "der die das und the the"),
      (6L, "the der"), // exact marker tie → first language in order
      (7L, "le la les et que es el y de5 shi4"),
      (8L, "naïve café — über señor ¡hola! 你好 жизнь"),
      (9L, null.asInstanceOf[String])
    ).toDF("id", "text")
    docs.createOrReplaceTempView("gf_docs_prof")
    val fused = spark.sql(
      """SELECT id, p.fp AS fp, p.n_tokens AS n_tokens,
        |  p.quality AS quality, p.lang_pred AS lang_pred
        |FROM (SELECT id, graft_doc_profile(text) AS p FROM gf_docs_prof)
        |ORDER BY id""".stripMargin).collect()
    val singles = spark.sql(
      """SELECT id, graft_fingerprint(text) AS fp,
        |  graft_token_count(text) AS n_tokens,
        |  graft_quality(text) AS quality,
        |  graft_lang_id(text) AS lang_pred
        |FROM gf_docs_prof ORDER BY id""".stripMargin).collect()
    assert(fused.toSeq == singles.toSeq)
  }

  test("graft_dominates works as a SQL predicate") {
    assert(registered)
    val r = spark.sql(
      """SELECT graft_dominates(array(1.0D, 2.0D), array(2.0D, 3.0D)) AS a,
        |       graft_dominates(array(1.0D, 4.0D), array(2.0D, 3.0D)) AS b""".stripMargin)
      .head()
    assert(r.getBoolean(0) && !r.getBoolean(1))
  }

  test("wrong arity is rejected at analysis") {
    assert(registered)
    intercept[Exception] { spark.sql("SELECT graft_quality('a', 'b')").collect() }
  }

  test("injectFunction wiring: functions resolve in an extensions-built session") {
    // Mirrors SkylineSqlSpec's extensions e2e: getOrCreate may hand back
    // the shared extension-less session, so only assert when the
    // function actually resolved (the runtime-register path above is
    // the always-on coverage).
    val s2 = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]")
      .appName("graft-fn-ext-test")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    val viaExt = try {
      Some(s2.sql("SELECT graft_token_count('a b c') AS n").head().getInt(0))
    } catch { case _: Throwable => None }
    viaExt.foreach(n => assert(n == 3))
  }

  test("functions are expression-expanded, not UDFs (optimizer sees through them)") {
    assert(registered)
    val q = spark.sql("SELECT graft_token_count('a b c') AS n")
    val optimized = q.queryExecution.optimizedPlan.toString
    // the registered name is GONE from the optimized plan — it expanded
    // into ordinary catalyst expressions (size/filter/split), no opaque
    // UDF black box survives
    assert(!optimized.contains("graft_token_count") && !optimized.contains("UDF"), optimized)
    assert(optimized.contains("size(") && optimized.contains("filter("), optimized)
    assert(q.head().getInt(0) == 3)
  }
}
