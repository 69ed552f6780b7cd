package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loader for the driver-generated parquet tables (TESTDATA.md). */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** `events.ts` normalized to a session-tz TIMESTAMP regardless of the
    * fixture vintage — the driver has shipped it three ways:
    *  - TIMESTAMP(NANOS), which Spark's vectorized reader rejects
    *    outright → read nanos as long, truncate to micros (lossless:
    *    the fixture has no sub-µs component, and DuckDB reading the
    *    nanos natively agrees on every derived value);
    *  - timestamp[us] WITHOUT tz metadata → Spark 4 infers
    *    TIMESTAMP_NTZ → cast to TIMESTAMP (under the UTC session tz
    *    every main/spec sets, the wall-clock µs values are preserved
    *    bit-for-bit, matching DuckDB's naive read);
    *  - timestamp[us, tz=UTC] → already TIMESTAMP, pass through.
    * Downstream operators all assume TIMESTAMP semantics (unix_micros,
    * window(), watermarks), so normalizing here keeps 20+ event
    * queries vintage-independent.
    */
  def loadEvents(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeEventTs(load(spark, sfDir, "events"))
  }

  /** The vintage-dependent `ts` conversion of [[loadEvents]] as a
    * standalone transform, so `readStream` sites (which take a schema
    * from a batch read and must apply the SAME conversion to the
    * stream) share one definition.
    */
  def normalizeEventTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        df.withColumn("ts", col("ts").cast("timestamp"))
      case _ => df
    }
  }
}
