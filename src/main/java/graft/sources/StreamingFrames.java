package graft.sources;

import org.apache.spark.sql.Dataset;
import org.apache.spark.sql.Row;
import org.apache.spark.sql.SparkSession;
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan;

/**
 * Java bridge to {@code Dataset.ofRows}, which is {@code private[sql]}
 * in Scala source but public in bytecode — the one constructor for a
 * DataFrame over a hand-built logical plan. The streaming table source
 * ({@link TableFeedSource}) needs it to re-flag batch parquet relations
 * {@code isStreaming=true}, the same plan shape Delta's streaming
 * source produces for {@code getBatch}. Java is used precisely because
 * Scala access modifiers are a compile-time notion.
 */
public final class StreamingFrames {
  private StreamingFrames() {}

  public static Dataset<Row> ofRows(SparkSession spark, LogicalPlan plan) {
    return org.apache.spark.sql.classic.Dataset$.MODULE$.ofRows(
        (org.apache.spark.sql.classic.SparkSession) spark, plan);
  }
}
