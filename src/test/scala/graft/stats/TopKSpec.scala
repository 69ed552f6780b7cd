package graft.stats

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class TopKSpec extends SparkSpec {
  import spark.implicits._

  test("matches the row_number-window idiom on random groups") {
    val rnd = new scala.util.Random(41)
    val df = (1L to 3000L).map { id =>
      (s"g${id % 7}", rnd.nextInt(500).toLong, id)
    }.toDF("g", "v", "id").repartition(9)
    val viaAgg = df.groupBy("g")
      .agg(TopK.topK(struct(col("v"), col("id")), 5).as("top"))
      .select(col("g"), explode(col("top")).as("t"))
      .select(col("g"), col("t.v"), col("t.id"))
      .collect().map(_.toString).sorted
    val w = Window.partitionBy("g").orderBy(col("v").desc, col("id").desc)
    val viaWindow = df.withColumn("rn", row_number().over(w))
      .where(col("rn") <= 5).select("g", "v", "id")
      .collect().map(_.toString).sorted
    assert(viaAgg === viaWindow)
  }

  test("descending order, k cap, and fewer-than-k groups") {
    val df = Seq(("a", 3L), ("a", 9L), ("a", 1L), ("b", 5L)).toDF("g", "v")
    val got = df.groupBy("g").agg(TopK.topK(col("v"), 2).as("top"))
      .orderBy("g").select("top").as[Seq[Long]].collect()
    assert(got(0) === Seq(9L, 3L))
    assert(got(1) === Seq(5L))
  }

  test("string payloads survive buffer reuse and serialization") {
    val df = (1 to 2000).map(i => ("g", i.toLong, s"payload_$i"))
      .toDF("g", "v", "p").repartition(13)
    val top = df.groupBy("g")
      .agg(TopK.topK(struct(col("v"), col("p")), 3).as("top"))
      .select(explode(col("top")).as("t"))
      .select(col("t.v"), col("t.p"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(top === Seq((2000L, "payload_2000"), (1999L, "payload_1999"),
      (1998L, "payload_1998")))
  }

  test("nulls are skipped, duplicates collapse to one (set semantics documented)") {
    val df = Seq(("g", Some(5L)), ("g", None), ("g", Some(5L)), ("g", Some(2L)))
      .toDF("g", "v")
    val got = df.groupBy("g").agg(TopK.topK(col("v"), 3).as("top"))
      .select("top").as[Seq[Long]].head()
    assert(got === Seq(5L, 2L))
  }
}
