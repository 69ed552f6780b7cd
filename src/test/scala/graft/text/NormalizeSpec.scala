package graft.text

import org.apache.spark.sql.functions._
import graft.SparkSpec

class NormalizeSpec extends SparkSpec {
  import spark.implicits._

  private def fold(s: String*): Seq[String] =
    s.toDF("t").select(AccentFoldExpr($"t")).as[String].collect().toSeq

  test("folds Latin diacritics to the base letter") {
    assert(fold("école crème naïve señor über jalapeño fiancée tête") ==
      Seq("ecole creme naive senor uber jalapeno fiancee tete"))
  }

  test("composed (NFC) and decomposed (NFD) inputs fold identically") {
    val nfc = "café" // é as one code point
    val nfd = "café" // e + combining acute
    assert(nfc != nfd)
    assert(fold(nfc, nfd).distinct == Seq("cafe"))
  }

  test("characters without canonical decomposition pass through") {
    assert(fold("straße æon 你好") == Seq("straße æon 你好"))
  }

  test("pure-ASCII fast path is the identity; null stays null") {
    assert(fold("plain ascii text!") == Seq("plain ascii text!"))
    val r = Seq((1, null.asInstanceOf[String])).toDF("i", "t")
      .select(AccentFoldExpr($"t")).collect()
    assert(r(0).isNullAt(0))
  }

  test("registered as graft_fold_accents on the SQL surface") {
    graft.sql.GraftFunctions.register(spark)
    val got = spark.sql("SELECT graft_fold_accents('tête-à-tête') AS t")
      .as[String].head()
    assert(got == "tete-a-tete")
  }
}
