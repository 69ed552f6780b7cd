package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Positional phrase search over token streams — the consecutive-token
  * retrieval primitive ("exact phrase query") beside [[Bm25]]'s
  * bag-of-words ranking.
  *
  * Plan shape, not a LIKE scan: positional postings (id, term, pos)
  * are built ONCE per query from the tokenization and immediately
  * filtered to the phrase's terms — the [[Bm25]] discipline that keeps
  * the shuffle keyspace bounded by the query, not the corpus. The
  * phrase match is then k−1 keyed equi-joins: an anchor posting of
  * term 0 at position p survives iff term i has a posting at p + i for
  * every i. At rest the postings table would be written once
  * (bucketed by term) and each phrase query reads only its terms'
  * postings — the inverted-index serving shape; a `LIKE '%...%'` scan
  * reads every byte of every document instead.
  *
  * Token positions are 1-based over the [[TextFunctions.tokens]]
  * contract (lowercase, whitespace-split), so "quick brown" matches
  * "The QUICK  brown" — phrase semantics over normalized tokens, not
  * raw bytes.
  */
object Phrase {

  /** Documents containing `phrase` as consecutive tokens:
    * (idCol, n_matches, first_pos) — one row per matching doc.
    */
  def phraseMatches(
      df: DataFrame,
      textCol: String,
      idCol: String,
      phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "phrase must have at least one term")
    val terms = phrase.map(_.toLowerCase(java.util.Locale.ROOT))
    val posts = df.filter(col(textCol).isNotNull)
      .select(col(idCol).as("__id"),
        posexplode(TextFunctions.tokens(col(textCol))).as(Seq("__p0", "__t")))
      .filter(col("__t").isin(terms.map(x => x: Any): _*))
      .select(col("__id"), (col("__p0") + 1).as("pos"), col("__t"))
    val anchor = posts.filter(col("__t") === terms.head)
      .select(col("__id"), col("pos"))
    val matches = terms.zipWithIndex.drop(1).foldLeft(anchor) {
      case (acc, (term, i)) =>
        val next = posts.filter(col("__t") === term)
          .select(col("__id").as("__idn"), (col("pos") - i).as("__anchor"))
        acc.join(next,
          acc("__id") === col("__idn") && acc("pos") === col("__anchor"))
          .select(acc("__id"), acc("pos"))
    }
    matches
      .groupBy(col("__id"))
      .agg(count(lit(1)).as("n_matches"), min(col("pos")).as("first_pos"))
      .select(col("__id").as(idCol), col("n_matches"),
        col("first_pos").cast("long").as("first_pos"))
  }
}
