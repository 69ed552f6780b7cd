package graft.text

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** At-rest inverted text index — the lexical-retrieval twin of the
  * IVF layouts in [[graft.sim]]: pay one indexing pass, then serve
  * term lookups by reading a term-bucketed fraction of the postings
  * instead of rescanning the corpus.
  *
  * Layout: postings rows (term, doc_id, tf) written
  * `partitionBy(bucket)` with `bucket = md5₆₀(term) mod nBuckets`
  * (the repo-wide md5-prefix hash, computed identically driver- and
  * executor-side, so a query's bucket set is known before any read).
  * A term lookup therefore reads |query-term buckets| / nBuckets of
  * the index bytes — the `isin(bucket)` filter lands in the parquet
  * scan's PartitionFilters (asserted in InvertedIndexSpec), the same
  * pruning contract as IvfFlat's `list=` directories.
  *
  * Scale shape at 100 TB: indexing is tokenize → explode → one keyed
  * groupBy (map-side combinable exact tf counts) → partitioned write;
  * serving never joins anything larger than the matched postings, and
  * ranking state per doc is one summed long. Conjunctive match uses
  * the count-distinct-terms trick, not per-term joins.
  */
object InvertedIndex {

  /** Exact postings list: one row per (term, doc) with its term
    * frequency; NULL texts contribute nothing. Tokenization is the
    * corpus-wide [[TextFunctions.tokens]] contract (lowercase, \s+
    * split, drop empties) shared with BM25/phrase search.
    */
  def postings(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs.filter(col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"),
        explode(TextFunctions.tokens(col(textCol))).as("term"))
      .groupBy("term", "doc_id")
      .agg(count(lit(1)).as("tf"))

  /** Build the index at `path`: postings partitioned into `nBuckets`
    * Hive-style `bucket=<b>` directories by term hash.
    */
  def writeIndex(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      nBuckets: Int,
      path: String): Unit = {
    require(nBuckets > 0, "nBuckets must be positive")
    postings(docs, textCol, idCol)
      .withColumn("bucket",
        pmod(conv(substring(md5(col("term")), 1, 15), 16, 10).cast("long"),
          lit(nBuckets.toLong)).cast("int"))
      .write.mode("overwrite").partitionBy("bucket").parquet(path)
  }

  /** Driver-side mirror of the bucket hash: first 15 hex digits of
    * md5(term) as a 60-bit long, mod nBuckets — bit-identical to the
    * executor-side Column form in [[writeIndex]].
    */
  def bucketOf(term: String, nBuckets: Int): Int = {
    val hex = MessageDigest.getInstance("MD5")
      .digest(term.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString.substring(0, 15)
    (java.lang.Long.parseLong(hex, 16) % nBuckets).toInt
  }

  /** Conjunctive (all-terms) search against a [[writeIndex]] index:
    * scan ONLY the buckets the query terms hash to, keep matching
    * postings, and rank docs containing every term by summed tf
    * (desc, doc_id tiebreak). Cost: |buckets(q)|/nBuckets of the index
    * read, one keyed aggregation over matched postings.
    */
  def searchAll(
      spark: SparkSession,
      path: String,
      nBuckets: Int,
      terms: Seq[String],
      topK: Int): DataFrame = {
    require(terms.nonEmpty, "at least one query term")
    val uniq = terms.distinct
    val buckets = uniq.map(bucketOf(_, nBuckets)).distinct
    spark.read.parquet(path)
      .filter(col("bucket").isin(buckets.map(Integer.valueOf): _*) &&
        col("term").isin(uniq.map(x => x: Any): _*))
      .groupBy(col("doc_id"))
      .agg(count_distinct(col("term")).as("__nt"), sum(col("tf")).as("score"))
      .filter(col("__nt") === uniq.size)
      .select(col("doc_id"), col("score"))
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(topK)
  }
}
