package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Association-rule mining over (basket, item) rows — the classic
  * support / confidence / lift readout (Agrawal & Srikant, "Fast
  * Algorithms for Mining Association Rules", VLDB'94, at the pair
  * level that covers the overwhelming share of practical rules).
  * Complements [[graft]]'s co-purchase cosine (q_item_sim) with the
  * directional rule form a merchandiser or curriculum-mixer actually
  * reads: "baskets with A contain B conf% of the time, lift× over
  * chance".
  *
  * Scale shape: the candidate join is WITHIN a basket key (bounded by
  * basket size, never corpus²), pair counts are one keyed agg with
  * map-side combine, and the two item-count joins are keyed joins
  * against a vocabulary-sized frame. The basket total rides in as a
  * broadcast scalar. Every count is an exact BIGINT; the three ratios
  * are single divisions of exact integers (pair_n·N and n_ant·n_cons
  * stay under 2⁶³ for any realistic catalog), so both engines derive
  * identical doubles.
  */
object AssocRules {

  /** Directed pair rules with pair count ≥ `minPairCount`. Output:
    * (antecedent, consequent, pair_n, n_ant, n_cons, support,
    * confidence, lift) — each unordered co-occurrence emits both
    * directions (confidence is asymmetric; support and lift repeat).
    */
  def rules(
      baskets: DataFrame,
      basketCol: String,
      itemCol: String,
      minPairCount: Long): DataFrame = {
    val items = baskets
      .select(col(basketCol).as("bk"), col(itemCol).as("it"))
      .filter(col("bk").isNotNull && col("it").isNotNull)
      .distinct()
    val nBaskets = items.agg(countDistinct(col("bk")).as("n_baskets"))
    val cnt = items.groupBy("it").agg(count(lit(1)).as("n_item"))
    val co = items.as("x")
      .join(items.as("y"),
        col("x.bk") === col("y.bk") && col("x.it") < col("y.it"))
      .groupBy(col("x.it").as("a"), col("y.it").as("b"))
      .agg(count(lit(1)).as("pair_n"))
      .filter(col("pair_n") >= minPairCount)
    val directed = co
      .select(col("a").as("antecedent"), col("b").as("consequent"), col("pair_n"))
      .unionByName(co.select(col("b").as("antecedent"),
        col("a").as("consequent"), col("pair_n")))
    directed
      .join(cnt.select(col("it").as("antecedent"), col("n_item").as("n_ant")),
        "antecedent")
      .join(cnt.select(col("it").as("consequent"), col("n_item").as("n_cons")),
        "consequent")
      .crossJoin(broadcast(nBaskets))
      .select(
        col("antecedent"), col("consequent"),
        col("pair_n"), col("n_ant"), col("n_cons"),
        round(col("pair_n").cast("double") / col("n_baskets"), 6).as("support"),
        round(col("pair_n").cast("double") / col("n_ant"), 6).as("confidence"),
        round((col("pair_n") * col("n_baskets")).cast("double") /
          (col("n_ant") * col("n_cons")).cast("double"), 6).as("lift"))
  }
}
