package graft.ml

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StructField}

/** Multinomial Naive Bayes over token columns — the classic
  * cheap-and-strong text classifier a curation pipeline uses for
  * source/domain/language routing when a GPU model is overkill.
  *
  * Laplace-smoothed: score(d, c) = (n_c / N) · Π_k (cnt(t_k, c) + 1)
  * / (tot_c + V) over the doc's first `maxTokens` token positions.
  * The product is carried LEFT-TO-RIGHT as a chained double recurrence
  * (the Survival.scala / q_rand_proj discipline): every factor's
  * operands are exact long→double conversions and ·,/ are
  * correctly-rounded IEEE ops, so a recursive-CTE replay reproduces
  * the score bit-for-bit — no ln/exp whose last bit is libm's.
  * `maxTokens` also bounds underflow: factors sit around 1/vocab, so
  * 40 positions keep scores far above the denormal floor where
  * relative comparisons degrade.
  *
  * Scale shape: model state is (vocab × classes) count rows plus one
  * total per class — corpus-bounded aggregates, never corpus rows; the
  * scoring join against the counts is an ordinary keyed equi-join
  * (broadcast when the vocab is small, shuffle when it is not — left
  * to Catalyst/AQE), and the per-(doc, class) recurrence is the
  * secondary-sort pass carrying one double of state per open key.
  */
object NaiveBayes {

  /** Per-(test id, class) smoothed scores.
    *
    * @param train     labeled docs: `labelCol` + `tokensCol` (array<string>)
    * @param test      docs to score: `idCol` + `tokensCol`
    * @param maxTokens score positions per doc (underflow bound)
    * @return (id, label, score) — one row per test doc × class
    */
  def score(
      train: DataFrame,
      test: DataFrame,
      labelCol: String,
      tokensCol: String,
      idCol: String,
      maxTokens: Int): DataFrame = {
    require(maxTokens > 0, "maxTokens must be positive")
    val spark = train.sparkSession
    val ttok = train.select(col(labelCol).as("label"),
      explode(col(tokensCol)).as("t"))
    val cnts = ttok.groupBy("label", "t").agg(count(lit(1)).as("c"))
    val tots = ttok.groupBy("label").agg(count(lit(1)).as("tot"))
    val vocab = ttok.agg(countDistinct(col("t")).as("v"))
    // Left-join + coalesce: a class whose training docs contain zero
    // tokens has no `tots` row but must still be scored — smoothed
    // multinomial NB assigns it prior · (1/(0+V))^k, not silence.
    val priors = train.groupBy(col(labelCol).as("label"))
      .agg(count(lit(1)).as("nc"))
      .crossJoin(broadcast(train.agg(count(lit(1)).as("nn"))))
      .join(tots, Seq("label"), "left")
      .withColumn("tot", coalesce(col("tot"), lit(0L)))
      .crossJoin(broadcast(vocab))
    val pos = test.select(col(idCol).as("id"),
        posexplode(slice(col(tokensCol), 1, maxTokens)).as(Seq("k", "t")))
    val factors = pos
      .crossJoin(broadcast(priors))
      .join(cnts, Seq("label", "t"), "left")
      .select(col("id"), col("label"), col("k"),
        (coalesce(col("c"), lit(0L)) + 1L).as("num"),
        (col("tot") + col("v")).as("den"),
        col("nc"), col("nn"))
    val parts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val sorted = factors
      .repartition(parts, col("id"), col("label"))
      .sortWithinPartitions(col("id"), col("label"), col("k"))
    val iId = sorted.schema.fieldIndex("id")
    val iL = sorted.schema.fieldIndex("label")
    val iNum = sorted.schema.fieldIndex("num")
    val iDen = sorted.schema.fieldIndex("den")
    val iNc = sorted.schema.fieldIndex("nc")
    val iNn = sorted.schema.fieldIndex("nn")
    val rdd = sorted.rdd.mapPartitions { it =>
      var curKey: (Any, Any) = null
      var s = 0.0
      it.map { r =>
        val k = (r.get(iId), r.get(iL))
        if (k != curKey) s = r.getLong(iNc).toDouble / r.getLong(iNn)
        s = s * r.getLong(iNum) / r.getLong(iDen) // ((s·num)/den), left-assoc
        curKey = k
        Row.fromSeq(r.toSeq :+ s)
      }
    }
    val schema = sorted.schema.add(StructField("s", DoubleType, nullable = false))
    spark.createDataFrame(rdd, schema)
      .groupBy("id", "label")
      .agg(expr("max_by(s, k)").as("score"))
  }
}
