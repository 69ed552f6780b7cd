package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Within-domain boilerplate detection — the CCNet/RefinedWeb cleanup
  * that strips headers, footers, cookie banners and nav chrome BEFORE
  * dedup and quality scoring: a text unit that recurs across a large
  * fraction of one domain's documents is template, not content.
  *
  * The unit here is a non-overlapping n-token chunk (the corpus is
  * flat token prose; on line-structured text the same operator runs
  * on lines). Detection is one explode → (domain, chunk) count with
  * countDistinct(doc) — map-side-combined, keyspace bounded by the
  * corpus's distinct chunks, exactly a corpus-count job — and the
  * boilerplate rule is the integer-exact df·den ≥ num·n_docs (no
  * float fraction anywhere).
  */
object Boilerplate {

  /** Non-overlapping `n`-token chunk strings of `textCol` (tokens =
    * [[TextFunctions.tokens]]); empty array when under `n` tokens. */
  def chunks(textCol: Column, n: Int): Column = {
    val toks = TextFunctions.tokens(textCol)
    val k = floor(size(toks) / n).cast("int")
    when(k > 0, transform(sequence(lit(0), k - 1),
      i => array_join(slice(toks, i * n + lit(1), lit(n)), " ")))
      .otherwise(array().cast("array<string>"))
  }

  /** Per (group, chunk): document frequency, the group's doc count,
    * and the boilerplate flag df/n_docs ≥ num/den (integer algebra).
    */
  def detect(df: DataFrame, textCol: String, idCol: String,
      groupCol: String, n: Int, num: Int, den: Int): DataFrame = {
    val ch = df.select(col(idCol), col(groupCol),
        explode(chunks(col(textCol), n)).as("chunk"))
      .groupBy(groupCol, "chunk")
      .agg(countDistinct(col(idCol)).as("df"))
    val gd = df.groupBy(groupCol)
      .agg(countDistinct(col(idCol)).as("n_docs"))
    ch.join(gd, groupCol)
      .withColumn("is_boiler",
        col("df") * den >= col("n_docs") * num)
  }
}
