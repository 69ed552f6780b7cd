package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Pins [[TextFunctions.withTextStats]] (one-pass kernel) exactly ≡ the
  * Column forms it replaces — the same discipline as
  * QualityFiltersSpec's kernel≡Column pin.
  */
class TextStatsKernelSpec extends SparkSpec {
  import spark.implicits._

  private def columnForms(df: DataFrame): DataFrame =
    df.select(
      col("id"),
      TextFunctions.tokenCount(col("text")).as("n_tokens"),
      size(TextFunctions.bpeTokens(col("text"))).as("n_bpe"),
      TextFunctions.meanTokenLen(col("text")).as("mean_tok_len"),
      TextFunctions.stopwordRatio(col("text")).as("stopword_ratio"),
      TextFunctions.punctRatio(col("text")).as("punct_ratio"),
      TextFunctions.qualityScore(col("text")).as("quality"))

  private def kernel(df: DataFrame): DataFrame =
    TextFunctions.withTextStats(df.select("id", "text"), "text")
      .select("id", "n_tokens", "n_bpe", "mean_tok_len", "stopword_ratio",
        "punct_ratio", "quality")

  private def assertSame(df: DataFrame): Unit = {
    // quality is rounded on both sides already; ratios compared raw —
    // the kernel must reproduce the exact doubles, not approximations
    val a = columnForms(df).collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long])
    val b = kernel(df).collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long])
    assert(a.length == b.length)
    a.zip(b).foreach { case (x, y) => assert(x == y, s"column=$x kernel=$y") }
  }

  test("kernel == Column forms on hand-picked edge cases") {
    assertSame(Seq(
      (1L, "The quick brown fox and a lazy dog!!"),
      (2L, ""),
      (3L, "   "),
      (4L, "...!!!???"),
      (5L, "the the the the the"),
      (6L, "word"),
      (7L, "tabs\tand\nnewlines\r\nmixed  spacing"),
      (8L, "MiXeD CaSe AnD 123 numb3rs"),
      (9L, "café naïve résumé 中文 😀 emoji"),
      (10L, "a.b,c;d:e(f)g[h]i{j}")
    ).toDF("id", "text"))
  }

  test("kernel == Column forms with NULL text") {
    val df = Seq((1L, Option("real text here")), (2L, None: Option[String]))
      .toDF("id", "text")
    assertSame(df)
  }

  private def langColumnForms(df: DataFrame): DataFrame = {
    val scoreCols = TextFunctions.langMarkers.map(_._1)
      .zip(TextFunctions.langScores(col("text")))
      .map { case (code, sc) => sc.as(s"s_$code") }
    df.select(col("id") +: scoreCols :+ TextFunctions.langId(col("text")).as("lang_pred"): _*)
  }

  private def langKernel(df: DataFrame): DataFrame =
    TextFunctions.withLangId(df.select("id", "text"), "text").drop("text")

  test("langId kernel == Column forms: markers, ties, all-zero, nulls") {
    val df = Seq(
      (1L, Option("the quick fox and the dog is la la")),
      (2L, Option("el que la y es de la")),
      (3L, Option("xyzzy plugh")),              // all-zero -> und
      (4L, Option("the le la est y und de")),   // cross-language tie
      (5L, Option("")),
      (6L, None: Option[String])
    ).toDF("id", "text")
    val a = langColumnForms(df).collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long])
    val b = langKernel(df).collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long])
    a.zip(b).foreach { case (x, y) => assert(x == y, s"column=$x kernel=$y") }
  }

  test("langId kernel == Column forms on random marker soup") {
    val rnd = new scala.util.Random(31)
    val vocab = TextFunctions.langMarkers.flatMap(_._2) ++ Seq("zz", "qq", "xx")
    val docs = (0L until 200L).map { i =>
      (i, Seq.fill(rnd.nextInt(25))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }.toDF("id", "text")
    val a = langColumnForms(docs).collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long])
    val b = langKernel(docs).collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long])
    a.zip(b).foreach { case (x, y) => assert(x == y, s"column=$x kernel=$y") }
  }

  test("langIdNgram kernel == Column forms on edge cases and trigram soup") {
    def columnForms(df: DataFrame): DataFrame = {
      val scoreCols = TextFunctions.langTrigrams.map(_._1)
        .zip(TextFunctions.langNgramScores(col("text")))
        .map { case (code, sc) => sc.as(s"g_$code") }
      df.select(col("id") +: scoreCols :+
        TextFunctions.langIdNgram(col("text")).as("lang_pred"): _*)
    }
    val rnd = new scala.util.Random(37)
    val frags = TextFunctions.langTrigrams.flatMap(_._2) ++ Seq("xx", " ", "THE", "derder")
    val docs = (Seq(
      (9000L, Option("the theater gathered der kinder")),
      (9001L, Option("")),
      (9002L, None: Option[String]),
      (9003L, Option("dededede")) // overlapping candidate: replace is non-overlapping
    ) ++ (0L until 150L).map { i =>
      (i, Option(Seq.fill(rnd.nextInt(20))(frags(rnd.nextInt(frags.size))).mkString("")))
    }).toDF("id", "text")
    val a = columnForms(docs).collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long])
    val b = TextFunctions.withLangIdNgram(docs.select("id", "text"), "text").drop("text")
      .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long])
    a.zip(b).foreach { case (x, y) => assert(x == y, s"column=$x kernel=$y") }
  }

  test("kernel == Column forms on random corpora across partitionings") {
    val rnd = new scala.util.Random(29)
    val pieces = Seq("the", "of", "and", "word", "X9", "!", "...", "über",
      "a", "to", "zz", "", " ", "\t")
    val docs = (0L until 300L).map { i =>
      (i, Seq.fill(1 + rnd.nextInt(40))(pieces(rnd.nextInt(pieces.size)))
        .mkString(" "))
    }
    for (parts <- Seq(1, 7)) assertSame(docs.toDF("id", "text").repartition(parts))
  }
}
