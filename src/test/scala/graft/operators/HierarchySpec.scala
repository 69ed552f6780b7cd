package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class HierarchySpec extends SparkSpec {
  import spark.implicits._

  test("ancestors: division chain, deduped, root always present") {
    val d = Seq(50L).toDF("k")
    // 50 -> 7 -> 1 -> 0 under fanout 7
    val a = d.select(Hierarchy.ancestors($"k", 7, 6)).head.getSeq[Long](0)
    assert(a.toSet == Set(50L, 7L, 1L, 0L))
    val r = Seq(0L).toDF("k")
      .select(Hierarchy.ancestors($"k", 7, 6)).head.getSeq[Long](0)
    assert(r == Seq(0L))
  }

  test("rollup equals a scalar subtree sum on a random id set") {
    val rnd = new scala.util.Random(5)
    val vals = (1 to 300).map(_ => (rnd.nextInt(2000).toLong, rnd.nextInt(100).toLong))
      .groupBy(_._1).map { case (k, v) => (k, v.map(_._2).sum, v.size.toLong) }
      .toSeq
    def ancs(k: Long): Set[Long] =
      Iterator.iterate(k)(_ / 7).takeWhile(_ > 0).toSet + 0L
    val expected = vals.flatMap { case (k, s, _) => ancs(k).map(a => (a, s)) }
      .groupBy(_._1).map { case (a, xs) => a -> xs.map(_._2).sum }
    val got = Hierarchy.rollup(
      vals.toDF("node", "v", "cnt"), "node", fanout = 7, levels = 8,
      measures = Seq("v"))
      .select("anc", "subtree_v").as[(Long, Long)].collect().toMap
    assert(got == expected)
  }
}
