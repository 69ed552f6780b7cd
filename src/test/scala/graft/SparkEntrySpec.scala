package graft

import graft.skyline.{Dominance, SkylineOp}

/** Smoke coverage for the driver contract surface itself. */
class SparkEntrySpec extends SparkSpec {

  test("entry: flagship skyline returns rows and they are mutually non-dominated") {
    val df = SparkEntry.entry(spark)
    assert(df.columns.toSeq ==
      Seq("l_orderkey", "l_linenumber", "l_extendedprice", "l_discount", "l_shipdate"))
    val prep = SkylineOp.prepare(df, SparkEntry.lineitemSpec)
    val skyIdx = prep.schema.fieldIndex(SkylineOp.SKY)
    val vecs = prep.collect().map(r => graft.skyline.Gsky.vecOf(r, skyIdx))
    assert(vecs.nonEmpty)
    assert(!vecs.exists(a => vecs.exists(b => Dominance.dominates(a, b))))
  }

  test("every registered query has an oracle entry with matching name") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q), s"oracles without queries: ${o -- q}")
    assert(q == o, s"queries without oracles: ${q -- o}")
  }
}
