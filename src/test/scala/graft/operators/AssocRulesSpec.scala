package graft.operators

import graft.SparkSpec

class AssocRulesSpec extends SparkSpec {

  test("rules match hand-computed support/confidence/lift") {
    import spark.implicits._
    // 4 baskets; {1,2} co-occur in 2 of them; item 1 in 3, item 2 in 2
    val rows = Seq((10L, 1L), (10L, 2L), (20L, 1L), (20L, 2L),
      (30L, 1L), (30L, 3L), (40L, 3L))
    val df = rows.toDF("bk", "it").repartition(3)
    val got = AssocRules.rules(df, "bk", "it", minPairCount = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getAs[Double]("support"),
        r.getAs[Double]("confidence"), r.getAs[Double]("lift"))).toSet
    // support = 2/4, conf(1→2) = 2/3, conf(2→1) = 2/2, lift = 2·4/(3·2)
    assert(got == Set(
      (1L, 2L, 2L, 3L, 2L, 0.5, 0.666667, 1.333333),
      (2L, 1L, 2L, 2L, 3L, 0.5, 1.0, 1.333333)))
  }

  test("duplicate (basket, item) rows do not inflate counts") {
    import spark.implicits._
    val df = Seq((1L, 7L), (1L, 7L), (1L, 8L), (2L, 7L), (2L, 8L))
      .toDF("bk", "it")
    val r = AssocRules.rules(df, "bk", "it", minPairCount = 2)
      .where("antecedent = 7").collect().head
    assert(r.getLong(r.fieldIndex("pair_n")) == 2L)
    assert(r.getLong(r.fieldIndex("n_ant")) == 2L)
  }

  test("pairs below the count floor are pruned") {
    import spark.implicits._
    val df = Seq((1L, 1L), (1L, 2L), (2L, 1L), (2L, 3L)).toDF("bk", "it")
    assert(AssocRules.rules(df, "bk", "it", minPairCount = 2).count() == 0)
  }
}
