package graft.stats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic Poisson bootstrap — distribution-free confidence
  * intervals for a mean at data-parallel scale (Efron resampling in
  * the "Poissonized" form every large-data system uses: instead of
  * drawing n rows with replacement — impossible to coordinate across
  * executors — each row enters replicate b with an independent
  * Poisson(1) weight, Chamandy et al., "Estimating Uncertainty for
  * Massive Data Streams", Google 2012).
  *
  * Determinism discipline: the Poisson draw is a pure function of
  * (salt, replicate, row key) — md5 → unit uniform → inverse-CDF
  * through FIXED literal thresholds — so every engine assigns the
  * same weights; replicate aggregates are exact integer (Σw·v, Σw)
  * pairs, and only the final mean is a double (exact-int ÷ exact-int,
  * bit-identical anywhere). No RNG state, no layout sensitivity.
  *
  * Scale shape: explode ×B then ONE keyed aggregate with map-side
  * partial combine — the shuffle carries B rows per upstream
  * partition, never the data; the replicate frame itself is B rows.
  */
object Bootstrap {

  private val TwoPow60 = 1152921504606846976.0

  /** Poisson(1) CDF thresholds: P(X ≤ k) for k = 0..5; weights cap at
    * 6 (P ≈ 1 − 6e-5 covered; the cap keeps the when-chain finite and
    * is standard in Poissonized bootstraps).
    */
  private val PoissonCdf = Seq(
    0.36787944117144233, // P(0)
    0.7357588823428847, // P(<=1)
    0.9196986029286058, // P(<=2)
    0.9810118431238462, // P(<=3)
    0.9963401531726563, // P(<=4)
    0.9994058151824183) // P(<=5)

  /** Poisson(1) weight for unit-uniform `u` via inverse CDF. */
  def poissonWeight(u: Column): Column =
    PoissonCdf.zipWithIndex.foldRight(lit(6L): Column) {
      case ((t, k), acc) => when(u < t, lit(k.toLong)).otherwise(acc)
    }

  /** DuckDB mirror of [[poissonWeight]] over a SQL expression for u —
    * kept beside the thresholds so the two can never drift.
    */
  def poissonWeightSql(u: String): String =
    PoissonCdf.zipWithIndex.reverse.foldLeft("6") {
      case (acc, (t, k)) => s"CASE WHEN $u < $t THEN $k ELSE $acc END"
    }

  /** B replicate rows: (rep, n = Σw, sum = Σw·value) with value read
    * from `valueCol` (LongType — scale to integer units first) and the
    * weight keyed on (salt, rep, `idCol`).
    */
  def replicateSums(df: DataFrame, valueCol: String, idCol: String,
      b: Int, salt: String): DataFrame = {
    require(b > 0, "need at least one replicate")
    require(df.schema(valueCol).dataType ==
      org.apache.spark.sql.types.LongType,
      s"$valueCol must be LongType (scale to integer units first)")
    val u = conv(substring(md5(concat(
      lit(salt), lit("|"), col("rep").cast("string"), lit("|"),
      col(idCol).cast("string"))), 1, 15), 16, 10)
      .cast("long").cast("double") / TwoPow60
    val parts = df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    df.select(col(idCol), col(valueCol))
      // Spread rows BEFORE the ×B fan-out: a small table often arrives
      // as one input split, and 4.8M hash evaluations on one thread
      // was 8.9 s of the bench — the repartition is a tiny shuffle of
      // the un-exploded rows that buys full-width parallel hashing.
      .repartition(parts)
      .select(col(idCol), col(valueCol),
        // explode keeps the ×B fan-out inside whole-stage codegen — a
        // crossJoin with a B-row frame plans as a nested-loop join and
        // was the slowest bench row before this.
        explode(sequence(lit(0L), lit((b - 1).toLong))).as("rep"))
      .withColumn("w", poissonWeight(u))
      .groupBy("rep")
      .agg(sum(col("w")).as("n"),
        sum(col("w") * col(valueCol)).as("sum_v"))
  }

  /** The ranked replicate table: each replicate's exact (n, Σ) pair,
    * its double mean, and its rank by mean — the percentile-method CI
    * reads the means at ranks ⌈α·B⌉ and ⌈(1−α)·B⌉. The rank window
    * runs over B rows total (bounded, never data-sized).
    */
  def rankedMeans(df: DataFrame, valueCol: String, idCol: String,
      b: Int, salt: String): DataFrame =
    replicateSums(df, valueCol, idCol, b, salt)
      .withColumn("mean", col("sum_v").cast("double") / col("n"))
      .withColumn("rank",
        row_number().over(Window.orderBy(col("mean"), col("rep"))))

  /** Median bootstrap: the same deterministic Poisson fan-out, but
    * each replicate takes the exact interpolated WEIGHTED median — the
    * Poisson weight rides `percentile(v, 0.5, w)` as a frequency, so
    * the resampled rows are never physically repeated (the oracle
    * unnests `range(w)` instead; identical repeated-value semantics).
    * Rank window over B rows; the CI for a median is where the
    * bootstrap actually earns its keep — no CLT closed form to lean
    * on. Medians over integer units interpolate exactly on both
    * engines (the q_quantiles parity).
    */
  def rankedMedians(df: DataFrame, valueCol: String, idCol: String,
      b: Int, salt: String): DataFrame = {
    require(b > 0, "need at least one replicate")
    require(df.schema(valueCol).dataType ==
      org.apache.spark.sql.types.LongType,
      s"$valueCol must be LongType (scale to integer units first)")
    val u = conv(substring(md5(concat(
      lit(salt), lit("|"), col("rep").cast("string"), lit("|"),
      col(idCol).cast("string"))), 1, 15), 16, 10)
      .cast("long").cast("double") / TwoPow60
    val parts = df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    df.select(col(idCol), col(valueCol))
      .repartition(parts)
      .select(col(idCol), col(valueCol),
        explode(sequence(lit(0L), lit((b - 1).toLong))).as("rep"))
      .withColumn("w", poissonWeight(u))
      .filter(col("w") > 0)
      .groupBy("rep")
      .agg(expr(s"percentile($valueCol, 0.5, w)").as("med"),
        sum(col("w")).as("n"))
      .withColumn("rank",
        row_number().over(Window.orderBy(col("med"), col("rep"))))
  }
}
