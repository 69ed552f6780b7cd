package graft.stats

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AnonymitySpec extends SparkSpec {
  import spark.implicits._

  test("group sizes, sensitive diversity, and the k flag") {
    val df = Seq(
      ("US", "A", 1L), ("US", "A", 2L), ("US", "A", 2L), // n=3 l=2
      ("DE", "B", 7L)) // n=1 l=1 → risky at k=2
      .toDF("country", "seg", "sens")
    val got = Anonymity.audit(df, Seq("country", "seg"), col("sens"), k = 2)
      .orderBy("country").collect()
    assert(got(0).getLong(2) === 1L && got(0).getBoolean(4))
    assert(got(1).getLong(2) === 3L && got(1).getLong(3) === 2L &&
      !got(1).getBoolean(4))
  }
}
