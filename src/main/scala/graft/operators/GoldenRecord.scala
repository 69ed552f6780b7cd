package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Golden-record merge (MDM survivorship): collapse every entity's
  * record VERSIONS into one row whose each field is the latest
  * NON-NULL value — field-level recency survivorship, the step after
  * entity resolution that row-level "keep the newest record" gets
  * wrong (the newest record usually carries nulls for fields only
  * older versions knew).
  *
  * One keyed aggregate: per field, `max_by(field, version-if-non-null)`
  * — partial-aggregable, so a billion versions collapse map-side;
  * no window, no self-join. `versionCol` must be a per-key total
  * order (the [[Upsert]] determinism contract); a field null in every
  * version stays null.
  */
object GoldenRecord {

  def merge(records: DataFrame, keyCols: Seq[String], versionCol: String,
      fields: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "at least one key column")
    require(fields.nonEmpty, "at least one survivorship field")
    val survs = fields.map { f =>
      max_by(col(f), when(col(f).isNotNull, col(versionCol))).as(f)
    }
    val meta = Seq(max(col(versionCol)).as("latest_version"),
      count(lit(1)).as("n_versions"))
    records.groupBy(keyCols.map(col): _*)
      .agg(survs.head, (survs.tail ++ meta): _*)
  }
}
