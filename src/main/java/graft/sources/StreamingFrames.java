package graft.sources;

import org.apache.spark.rdd.RDD;
import org.apache.spark.sql.Dataset;
import org.apache.spark.sql.Row;
import org.apache.spark.sql.SparkSession;
import org.apache.spark.sql.catalyst.InternalRow;
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan;
import org.apache.spark.sql.types.StructType;

/**
 * Java bridge to {@code Dataset.ofRows} / {@code internalCreateDataFrame},
 * which are {@code private[sql]} in Scala source but public in bytecode —
 * the two constructors for a DataFrame flagged {@code isStreaming=true}.
 * The streaming table source ({@link TableFeedSource}) needs them for the
 * v1 {@code Source.getBatch} contract: re-flagged batch parquet relations
 * for the data path (the plan shape Delta's streaming source produces,
 * keeping pushdown and codegen visible), and an opaque lazily-computed
 * InternalRow RDD for the change-feed path (whose anti-join plan must NOT
 * be re-planned as a stream-stream join by the incremental planner).
 * Java is used precisely because Scala access modifiers are a
 * compile-time notion.
 */
public final class StreamingFrames {
  private StreamingFrames() {}

  public static Dataset<Row> ofRows(SparkSession spark, LogicalPlan plan) {
    return org.apache.spark.sql.classic.Dataset$.MODULE$.ofRows(
        (org.apache.spark.sql.classic.SparkSession) spark, plan);
  }

  public static Dataset<Row> ofRdd(
      SparkSession spark, RDD<InternalRow> rdd, StructType schema) {
    return ((org.apache.spark.sql.classic.SparkSession) spark)
        .internalCreateDataFrame(rdd, schema, true);
  }
}
