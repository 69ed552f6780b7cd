package graft.sql

import java.nio.file.Files

import graft.SparkSpec
import graft.sources.Catalog

/** Schema namespaces + three-part identifiers (r16 — the last entry
  * on the r15 "missing" list): catalog keys may be `schema.table`
  * (data under `<wh>/<schema>/<table>`), two-part names resolve
  * alias-first then schema-in-session-warehouse, and
  * `<alias>.<schema>.<table>` resolves through the bound alias — for
  * every verb: SELECT, DML, DDL, maintenance, constraint DDL,
  * SHOW TABLES/SCHEMAS, time travel. */
class GraftSqlSchemaSpec extends SparkSpec {
  import spark.implicits._

  private def srcParquet(): String = {
    val p = Files.createTempDirectory("schsrc").toString + "/src"
    (1 to 60).map(i => (i.toLong, f"2024-${i % 3 + 1}%02d", i * 10L))
      .toDF("k", "ym", "cents").write.parquet(p)
    p
  }

  test("schema-qualified lifecycle in the session warehouse: " +
      "CREATE web.docs, read, DML, SHOW, constraint, DROP") {
    val wh = Files.createTempDirectory("schwh").toString
    val src = srcParquet()
    val s = spark.newSession()
    GraftSql.sql(s, s"SET spark.graft.warehouse = $wh")
    val c = GraftSql.sql(s,
      s"CREATE TABLE web.docs AS SELECT k, ym, cents FROM " +
        s"parquet.`$src` ORDER BY ym, k")
    assert(c.head().getString(0) == "create")
    // catalog key keeps the dot; data nests under <wh>/web/docs
    assert(Catalog.entries(s, wh).keySet == Set("web.docs"))
    assert(Catalog.entries(s, wh)("web.docs") == s"$wh/web/docs")
    // two-part read resolves through the warehouse catalog (no temp
    // view exists — dotted names are not view-able)
    assert(GraftSql.sql(s,
      "SELECT count(*) AS n FROM web.docs").head().getLong(0) == 60L)
    // DML routes: INSERT, UPDATE, DELETE on the schema-qualified name
    GraftSql.sql(s, "INSERT INTO web.docs VALUES " +
      "(CAST(999 AS BIGINT), '2099-01', CAST(5 AS BIGINT))")
    GraftSql.sql(s,
      "UPDATE web.docs SET cents = CAST(7 AS BIGINT) WHERE k = 999")
    assert(GraftSql.sql(s,
      "SELECT cents FROM web.docs WHERE k = 999").head().getLong(0) == 7L)
    GraftSql.sql(s, "DELETE FROM web.docs WHERE k = 999")
    assert(GraftSql.sql(s,
      "SELECT count(*) AS n FROM web.docs").head().getLong(0) == 60L)
    // a second schema + SHOW SCHEMAS / SHOW TABLES IN <schema>
    GraftSql.sql(s,
      "CREATE TABLE feeds.raw (id BIGINT, body STRING)")
    assert(GraftSql.sql(s, "SHOW SCHEMAS").as[String].collect().toSeq ==
      Seq("feeds", "web"))
    assert(GraftSql.sql(s, "SHOW TABLES IN web")
      .select("name").as[String].collect().toSeq == Seq("web.docs"))
    // maintenance + constraint DDL on the dotted name
    assert(GraftSql.sql(s, "DESCRIBE DETAIL web.docs").count() == 1L)
    GraftSql.sql(s,
      "ALTER TABLE web.docs ADD CONSTRAINT k_pos CHECK (k > 0)")
    intercept[Exception] {
      GraftSql.sql(s, "INSERT INTO web.docs VALUES " +
        "(CAST(-1 AS BIGINT), '2024-01', CAST(1 AS BIGINT))")
    }
    GraftSql.sql(s, "ALTER TABLE web.docs DROP CONSTRAINT k_pos")
    // time travel on the dotted name: version 1 predates the DML pair
    assert(GraftSql.sql(s,
      "SELECT count(*) AS n FROM web.docs VERSION AS OF 1")
      .head().getLong(0) == 60L)
    // DROP removes the entry; the sibling schema survives
    GraftSql.sql(s, "DROP TABLE web.docs")
    assert(Catalog.entries(s, wh).keySet == Set("feeds.raw"))
    GraftSql.sql(s, "DROP TABLE feeds.raw")
  }

  test("three-part <alias>.<schema>.<table>: every verb from a " +
      "session holding ONLY the alias conf") {
    val wh = Files.createTempDirectory("schwh3").toString
    val src = srcParquet()
    val s1 = spark.newSession()
    GraftSql.sql(s1, s"SET spark.graft.warehouse = $wh")
    GraftSql.sql(s1,
      s"CREATE TABLE web.docs AS SELECT k, ym, cents FROM " +
        s"parquet.`$src` ORDER BY ym, k")

    val s2 = spark.newSession()
    GraftSql.sql(s2, s"SET spark.graft.catalog.whs = $wh")
    // read, DML, maintenance, constraint DDL — all three-part
    assert(GraftSql.sql(s2,
      "SELECT count(*) AS n FROM whs.web.docs").head().getLong(0) == 60L)
    GraftSql.sql(s2, "INSERT INTO whs.web.docs VALUES " +
      "(CAST(777 AS BIGINT), '2099-02', CAST(3 AS BIGINT))")
    GraftSql.sql(s2,
      "UPDATE whs.web.docs SET cents = CAST(4 AS BIGINT) WHERE k = 777")
    assert(GraftSql.sql(s2,
      "SELECT cents FROM whs.web.docs WHERE k = 777")
      .head().getLong(0) == 4L)
    assert(GraftSql.sql(s2, "DESCRIBE HISTORY whs.web.docs")
      .count() >= 3L)
    GraftSql.sql(s2,
      "ALTER TABLE whs.web.docs ADD CONSTRAINT c_pos CHECK (cents >= 0)")
    intercept[Exception] {
      GraftSql.sql(s2, "INSERT INTO whs.web.docs VALUES " +
        "(CAST(778 AS BIGINT), '2099-03', CAST(-9 AS BIGINT))")
    }
    val opt = GraftSql.sql(s2, "OPTIMIZE whs.web.docs")
    assert(opt.head().getString(0) == "optimize")
    // CREATE + DROP through the alias alone (no warehouse conf here)
    GraftSql.sql(s2, "CREATE TABLE whs.web.t2 (id BIGINT, v STRING)")
    assert(Catalog.entries(s2, wh).keySet == Set("web.docs", "web.t2"))
    assert(GraftSql.sql(s2, "SHOW TABLES IN whs.web")
      .select("name").as[String](org.apache.spark.sql.Encoders.STRING)
      .collect().toSeq == Seq("web.docs", "web.t2"))
    assert(GraftSql.sql(s2, "SHOW SCHEMAS IN whs")
      .as[String](org.apache.spark.sql.Encoders.STRING)
      .collect().toSeq == Seq("web"))
    GraftSql.sql(s2, "DROP TABLE whs.web.t2")
    assert(Catalog.entries(s2, wh).keySet == Set("web.docs"))
  }

  test("a bound alias WINS over a schema reading of the same " +
      "two-part name, and RESTORE CATALOG restores dotted entries") {
    val whA = Files.createTempDirectory("schwhA").toString
    val whB = Files.createTempDirectory("schwhB").toString
    val src = srcParquet()
    // warehouse A carries a SCHEMA-qualified table x.y (61 rows);
    // warehouse B carries a table y (60 rows) and alias x binds to it
    val s1 = spark.newSession()
    GraftSql.sql(s1, s"SET spark.graft.warehouse = $whA")
    GraftSql.sql(s1,
      s"CREATE TABLE x.y AS SELECT k, ym FROM parquet.`$src`")
    GraftSql.sql(s1,
      "INSERT INTO x.y VALUES (CAST(61 AS BIGINT), '2024-09')")
    val s2 = spark.newSession()
    GraftSql.sql(s2, s"SET spark.graft.warehouse = $whB")
    GraftSql.sql(s2,
      s"CREATE TABLE y AS SELECT k, ym FROM parquet.`$src`")

    val s3 = spark.newSession()
    GraftSql.sql(s3, s"SET spark.graft.warehouse = $whA")
    // schema reading: x.y → warehouse A's 61 rows
    assert(GraftSql.sql(s3, "SELECT count(*) AS n FROM x.y")
      .head().getLong(0) == 61L)
    // now bind alias x → warehouse B: the SAME statement flips to
    // B's table y (alias-first, the read-path precedence)
    GraftSql.sql(s3, s"SET spark.graft.catalog.x = $whB")
    assert(GraftSql.sql(s3, "SELECT count(*) AS n FROM x.y")
      .head().getLong(0) == 60L)

    // RESTORE CATALOG in a fresh session re-serves the dotted entry
    // (no temp view is created for it — the multi-part path serves)
    val s4 = spark.newSession()
    GraftSql.sql(s4, s"SET spark.graft.warehouse = $whA")
    val r = GraftSql.sql(s4, "RESTORE CATALOG")
    assert(r.head().getLong(1) == 1L)
    assert(GraftSql.sql(s4, "SELECT count(*) AS n FROM x.y")
      .head().getLong(0) == 61L)
    assert(s4.catalog.tableExists("`x.y`") == false)
  }

  test("unbound qualified names keep Spark's own surface") {
    val s = spark.newSession()
    // no warehouse, no alias: SELECT/DDL on dotted names fall through
    intercept[Exception] {
      GraftSql.sql(s, "SELECT * FROM nosuch.schema1.tbl").collect()
    }
    intercept[Exception] {
      GraftSql.sql(s, "DROP TABLE nosuch.schema1.tbl").collect()
    }
    // with a warehouse but an uncataloged schema.table: still foreign
    val wh = Files.createTempDirectory("schwh4").toString
    GraftSql.sql(s, s"SET spark.graft.warehouse = $wh")
    intercept[Exception] {
      GraftSql.sql(s, "SELECT * FROM ghost.tbl").collect()
    }
  }
}
