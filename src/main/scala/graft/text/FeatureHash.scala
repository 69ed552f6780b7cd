package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hashing-trick text vectorizer (Weinberger et al. '09 — the fastText
  * input layer): every token maps to bucket = md5-prefix-60(token)
  * mod D, so a D-dimensional bag-of-tokens needs NO vocabulary state
  * — no fitted dictionary to broadcast, no OOV path, identical on any
  * engine and any day. The long-form output (id, bucket, tf) is the
  * sparse feature matrix a downstream [[graft.ml.LogisticGd]]-style
  * model consumes.
  *
  * Scale shape: one token explode + one keyed groupBy with map-side
  * combine; D caps the post-shuffle key space regardless of corpus
  * vocabulary (the whole point of the trick — 100 TB of text cannot
  * grow the feature space). Collisions are the accepted, analyzed
  * trade-off of the technique; counts (not signed sums) keep every
  * output an exact integer for the oracle.
  *
  * The hash is the md5-prefix arithmetic of Sampling.hashUnit — 15 hex
  * digits = 60 bits, always positive in a signed long, replayed
  * literally in SQL.
  */
object FeatureHash {

  /** bucket ∈ [0, dims) of one token Column. */
  def bucket(token: Column, dims: Int): Column =
    pmod(conv(substring(md5(token), 1, 15), 16, 10).cast("long"), lit(dims.toLong))

  /** Long-form hashed term counts: (idCol, bucket, tf), tf = exact
    * token occurrences in the doc landing in that bucket.
    */
  def hashedCounts(
      df: DataFrame,
      textCol: String,
      idCol: String,
      dims: Int): DataFrame = {
    require(dims > 0, "dims must be positive")
    df.filter(col(textCol).isNotNull)
      .select(col(idCol), explode(TextFunctions.tokens(col(textCol))).as("__t"))
      .select(col(idCol), bucket(col("__t"), dims).as("bucket"))
      .groupBy(col(idCol), col("bucket"))
      .agg(count(lit(1)).as("tf"))
  }
}
