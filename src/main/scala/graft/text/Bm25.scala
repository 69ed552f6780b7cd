package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Okapi BM25 relevance scoring over the corpus (Robertson et al.,
  * TREC-3) — the ranking primitive a training-data pipeline uses for
  * query-targeted corpus slicing ("give me the docs most about X") and
  * quality-biased sampling, and the standard lexical-retrieval
  * complement to the embedding paths in [[graft.sim]].
  *
  * score(d, q) = Σ_{t ∈ q} idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·|d|/avg|d|))
  * with the Lucene-style non-negative idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5)).
  *
  * Scale shape: tokenize → explode → FILTER to the query terms before
  * any aggregation (the explode's only shuffled output is rows whose
  * term is one of |q| literals — corpus-size-independent keyspace) →
  * one groupBy (doc, term) with map-side combine → per-doc sum. Corpus
  * constants (N, avg length) come from one scalar aggregate; document
  * frequencies of the |q| query terms collect to the driver (≤ |q|
  * rows) and ride into the plan as a literal map. Two passes over the
  * text, no join larger than the matched postings.
  *
  * Exact-integer determinism: tf, df, N, and Σ|d| are longs (exact in
  * double), so both engines derive identical doubles; the final
  * per-doc sum over ≤ |q| terms is rounded to 6.
  */
object Bm25 {

  /** (idCol, score, n_terms) for every document matching ≥ 1 query
    * term, score rounded to 6; docs matching nothing are absent.
    */
  def score(
      df: DataFrame,
      textCol: String,
      idCol: String,
      terms: Seq[String],
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "at least one query term")
    val base = df.filter(col(textCol).isNotNull)
      .select(col(idCol), TextFunctions.tokens(col(textCol)).as("__toks"))
      .withColumn("__len", size(col("__toks")))

    val consts = base.agg(
      count(lit(1)).as("n"), sum(col("__len")).as("lsum")).head()
    val n = consts.getLong(0)
    val avgLen = if (n == 0) 1.0 else consts.getLong(1).toDouble / n

    val postings = base
      .select(col(idCol), col("__len"), explode(col("__toks")).as("__t"))
      .filter(col("__t").isin(terms.map(x => x: Any): _*))
      .groupBy(col(idCol), col("__len"), col("__t"))
      .agg(count(lit(1)).as("__tf"))

    val dfreq: Map[String, Long] = postings
      .groupBy(col("__t")).agg(count_distinct(col(idCol)).as("__df"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    def idf(t: String): Double = {
      val d = dfreq.getOrElse(t, 0L).toDouble
      math.log(1.0 + (n - d + 0.5) / (d + 0.5))
    }
    val idfExpr = terms.distinct.foldLeft(lit(0.0)) { (acc, t) =>
      when(col("__t") === t, lit(idf(t))).otherwise(acc)
    }

    val tf = col("__tf").cast("double")
    val norm = lit(k1) * (lit(1.0 - b) + lit(b) * col("__len") / lit(avgLen))
    postings
      .withColumn("__w", idfExpr * tf * lit(k1 + 1.0) / (tf + norm))
      .groupBy(col(idCol))
      .agg(round(sum(col("__w")), 6).as("score"),
        count(lit(1)).as("n_terms"))
  }
}
