package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MinMaxIndexSpec extends SparkSpec {
  import spark.implicits._

  private val rows = {
    val rnd = new scala.util.Random(19)
    (1L to 5000L).map(id => (id, rnd.nextInt(365).toLong))
  }

  private def index(parts: Int) =
    MinMaxIndex.buildIndex(
      rows.toDF("id", "v").repartition(parts), "v",
      Seq(col("v"), col("id")), rowsPerFile = 512L)

  test("file cuts are layout-invariant and sized rowsPerFile") {
    val a = index(1).orderBy("file_id").collect().toSeq
    val b = index(11).orderBy("file_id").collect().toSeq
    assert(a === b)
    assert(a.map(_.getLong(1)).init.forall(_ == 512L)) // all but last full
    assert(a.map(_.getLong(1)).sum === 5000L)
  }

  test("zone maps are monotone under the clustering order") {
    val zm = index(4).orderBy("file_id")
      .collect().map(r => (r.getLong(2), r.getLong(3)))
    zm.sliding(2).foreach { case Array((_, hi), (lo2, _)) =>
      assert(hi <= lo2, s"overlapping zones: $hi > $lo2")
    case _ => }
  }

  test("probe classification matches a brute scan") {
    val (lo, hi) = (100L, 150L)
    val ann = MinMaxIndex.annotateProbe(index(4), lit(lo), lit(hi))
      .orderBy("file_id").collect()
    // Files marked skipped must contain NO rows in range; the marked
    // set must cover ALL rows in range.
    val inRange = rows.count { case (_, v) => v >= lo && v <= hi }
    val readRows = ann.filter(_.getBoolean(4)).map(_.getLong(1)).sum
    assert(readRows >= inRange)
    ann.filter(!_.getBoolean(4)).foreach { r =>
      assert(r.getLong(3) < lo || r.getLong(2) > hi)
    }
    // And the probe actually skips something on this fixture.
    assert(ann.exists(!_.getBoolean(4)))
  }
}
