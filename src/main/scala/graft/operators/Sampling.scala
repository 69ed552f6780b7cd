package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling, split assignment, and source mixing for
  * training-data pipelines.
  *
  * Spark's `df.sample` is seed-stable only for a fixed partitioning —
  * repartition the input and the sample changes. These operators hash
  * the ROW KEY instead: a document keeps or loses its place in the mix
  * regardless of layout, cluster size, or retry, which is what makes a
  * 100 TB training mix reproducible (and auditable: membership is a
  * pure function of (salt, key)).
  *
  * The hash is the first 15 hex digits of md5 — a 60-bit value that
  * fits a signed long in every engine (the repo-wide md5-prefix
  * discipline, [[graft.util.Md5Hash]]), scaled to a unit double. All
  * per-row expressions, no UDFs, no shuffle; filters sit directly on
  * the scan.
  */
object Sampling {

  private val TwoPow60 = 1152921504606846976.0

  /** Deterministic unit-interval hash of (salt, key): u ∈ [0, 1).
    * Division by 2⁶⁰ only rounds the mantissa (exact power-of-two
    * exponent), so Spark and any IEEE-754 SQL engine produce the
    * identical double.
    */
  def hashUnit(key: Column, salt: String): Column =
    conv(substring(md5(concat(lit(salt), lit("|"), key.cast("string"))), 1, 15), 16, 10)
      .cast("long").cast("double") / TwoPow60

  /** Deterministic Bernoulli(rate) sample keyed on `keyCol`. */
  def sample(df: DataFrame, keyCol: String, rate: Double, salt: String): DataFrame =
    df.filter(hashUnit(col(keyCol), salt) < rate)

  /** Per-source mixing: keep each row with probability
    * `weights(source)` (0 for unlisted sources). This is how a corpus
    * is down/up-weighted into a training mix — e.g. keep 100% of books,
    * 30% of common-crawl. Weights > 1 are capped at keep-always (true
    * up-sampling needs row replication — see [[replicate]]).
    */
  def mixture(
      df: DataFrame,
      sourceCol: String,
      weights: Map[String, Double],
      keyCol: String,
      salt: String): DataFrame = {
    val rate = weights.toSeq.sortBy(_._1).foldLeft(lit(0.0)) {
      case (acc, (src, w)) => when(col(sourceCol) === src, lit(w)).otherwise(acc)
    }
    df.filter(hashUnit(col(keyCol), salt) < rate)
  }

  /** Integer up-sampling: repeat each row `copies(source)` times (default
    * 1), tagging the copy index — the replication half of a >1× mix
    * weight. explode of a literal-bounded sequence: no shuffle, output
    * scales linearly and locally.
    */
  def replicate(
      df: DataFrame,
      sourceCol: String,
      copies: Map[String, Int]): DataFrame = {
    val nCol = copies.toSeq.sortBy(_._1).foldLeft(lit(1)) {
      case (acc, (src, k)) => when(col(sourceCol) === src, lit(k)).otherwise(acc)
    }
    df.withColumn("copy", explode(sequence(lit(0), nCol - 1)))
  }

  /** Fill a per-source TOKEN budget (training mixes are specified in
    * tokens, not document counts): order each source's docs by the
    * deterministic key hash and keep the prefix whose cumulative token
    * count still fits `budgets(source)` — the first doc to cross the
    * line is kept (budgets are soft caps, standard for corpus specs);
    * unlisted sources are dropped. Selection is a pure function of
    * (salt, key, token counts), layout-invariant like [[sample]].
    *
    * One window (= one keyed sort-shuffle on source) — the exact
    * analogue of SQL `sum() OVER (PARTITION BY source ORDER BY hash)`,
    * which is also the oracle. At 100 TB a per-source window sorts each
    * source's rows once; sources are independent, so skew is bounded by
    * the largest source (salting the window key does not work here —
    * the cumulative order must be global per source — so very large
    * sources should instead be pre-thinned with [[sample]] at an
    * estimated rate before the exact budget pass).
    */
  def tokenBudget(
      df: DataFrame,
      sourceCol: String,
      tokenCol: String,
      keyCol: String,
      budgets: Map[String, Long],
      salt: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val budget = budgets.toSeq.sortBy(_._1).foldLeft(lit(-1L)) {
      case (acc, (src, b)) => when(col(sourceCol) === src, lit(b)).otherwise(acc)
    }
    val w = Window.partitionBy(col(sourceCol))
      .orderBy(hashUnit(col(keyCol), salt), col(keyCol))
    df.withColumn("__cum", sum(col(tokenCol)).over(w))
      .filter(budget >= 0 && (col("__cum") - col(tokenCol)) < budget)
      .drop("__cum")
  }

  /** Deterministic weighted sample WITHOUT replacement of size `k`
    * (Efraimidis & Spirakis 2006): each row scores `u^(1/w)` with
    * `u = ` [[hashUnit]]`(key)`, and the k LARGEST keys are the sample
    * — inclusion odds proportional to the row's weight, selection a
    * pure function of (salt, key, weight) like every sampler here. The
    * standard "pick the best k documents, weighted by quality/length"
    * primitive for corpus curation.
    *
    * The key is computed and ordered in the LOG domain:
    * `wkey = ln(u)/w`, monotone-equivalent to `u^(1/w)` (ln u < 0).
    * The power form saturates — for w ~ 10⁶⁺ (byte sizes, token counts
    * of long documents) u^(1/w) rounds to 1.0 across huge row ranges
    * and any tie-break then biases the "sample" toward small keys —
    * while ln(u)/w keeps full double precision at every weight scale
    * (values merely approach 0⁻). Selection uses the UNROUNDED key:
    * ln is within 1 ulp on every serious engine, so a cross-engine
    * selection flip needs two rows within ~1 ulp of each other AND
    * straddling rank k — vanishingly unlikely, unlike the guaranteed
    * mass ties that fixed-decimal rounding creates. The OUTPUT column
    * is rounded to 9 decimals for value comparison. Rows with
    * weight ≤ 0 or NULL are excluded.
    *
    * Scale shape: `orderBy(...).limit(k)` plans as
    * TakeOrderedAndProject — each task keeps a k-row heap, the driver
    * merges per-partition heaps; no global sort, no full shuffle.
    */
  def weightedSample(
      df: DataFrame,
      keyCol: String,
      weightCol: String,
      k: Int,
      salt: String): DataFrame = {
    // Clamp u away from 0 (probability 2⁻⁶⁰ per row): Spark's log(0)
    // is NULL (row silently sorts last) but DuckDB's ln(0) raises —
    // a cross-engine divergence. greatest(u, 2⁻⁶⁰) keeps both engines
    // on the identical double (2⁻⁶⁰ is the hash's own smallest
    // nonzero value, so the clamp never reorders real keys).
    val u = greatest(hashUnit(col(keyCol), salt), lit(1.0 / TwoPow60))
    df.filter(col(weightCol) > 0)
      .withColumn("__wk", log(u) / col(weightCol))
      .orderBy(col("__wk").desc, col(keyCol).asc)
      .limit(k)
      .withColumn("wkey", round(col("__wk"), 9))
      .drop("__wk")
  }

  /** Deterministic fixed-size sample PER GROUP: the k rows of each
    * group with the smallest (hash, key) — "k examples per source" for
    * inspection sets, few-shot pools, per-domain eval slices.
    * Layout-invariant like every sampler here. The `row_number ≤ k`
    * filter plans as WindowGroupLimit (spec-asserted): each task
    * pre-trims to its local top-k per group BEFORE the shuffle, so the
    * exchange moves ≤ k rows per (group, partition), never whole
    * groups.
    */
  def perGroupSample(
      df: DataFrame,
      groupCol: String,
      keyCol: String,
      k: Int,
      salt: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(groupCol))
      .orderBy(hashUnit(col(keyCol), salt).asc, col(keyCol).asc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }

  /** Assign a named split by cumulative hash threshold: fractions
    * ("train" 0.9, "val" 0.05, "test" 0.05) partition [0,1); every row
    * lands in exactly one split, deterministically. Rows, not
    * approximate quantiles — a key's split never changes as data grows.
    */
  def assignSplit(
      df: DataFrame,
      keyCol: String,
      splits: Seq[(String, Double)],
      salt: String): DataFrame = {
    require(splits.nonEmpty && math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      "split fractions must sum to 1")
    val u = hashUnit(col(keyCol), salt)
    val cuts = splits.scanLeft(0.0)(_ + _._2).tail
    val expr = splits.zip(cuts).init.foldRight(lit(splits.last._1)) {
      case (((name, _), cut), acc) => when(u < cut, lit(name)).otherwise(acc)
    }
    df.withColumn("split", expr)
  }

  /** Deterministic k-fold assignment keyed on `keyCol`:
    * fold = md5₆₀(salt|key) mod k — the cross-validation sibling of
    * [[assignSplit]]. Because membership is a pure function of
    * (salt, key), folds are layout/retry/cluster-size invariant, and
    * within any stratum (language, source, label) the folds are
    * hash-balanced automatically — stratified CV without a stratified
    * shuffle. Per-row expression straight on the scan; no shuffle.
    */
  def assignFolds(df: DataFrame, keyCol: String, k: Int, salt: String): DataFrame = {
    require(k > 0, "k must be positive")
    val h = conv(
      substring(md5(concat(lit(salt), lit("|"), col(keyCol).cast("string"))), 1, 15),
      16, 10).cast("long")
    df.withColumn("fold", pmod(h, lit(k.toLong)).cast("int"))
  }
}
