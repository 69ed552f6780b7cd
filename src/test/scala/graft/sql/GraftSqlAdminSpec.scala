package graft.sql

import java.nio.file.Files

import graft.SparkSpec

/** `SHOW CREATE TABLE` + `TRUNCATE TABLE` (r16): the DDL render
  * round-trips (executing its statements in a fresh warehouse yields
  * a table with the SAME render), and truncate swaps to a zero-row
  * schema-bearing state that keeps the CHECK set, the stats
  * declaration, and the time-travelable history. */
class GraftSqlAdminSpec extends SparkSpec {
  import spark.implicits._

  test("SHOW CREATE TABLE round-trips through its own statements") {
    val wh1 = Files.createTempDirectory("admwh1").toString
    val s = spark.newSession()
    GraftSql.sql(s, s"SET spark.graft.warehouse = $wh1")
    GraftSql.sql(s,
      "CREATE TABLE adm (k BIGINT, ym STRING, cents BIGINT)")
    GraftSql.sql(s,
      "ALTER TABLE adm ADD CONSTRAINT k_pos CHECK (k > 0)")
    GraftSql.sql(s,
      "ALTER TABLE adm ADD CONSTRAINT cents_pos CHECK (cents >= 0)")
    val ddl = GraftSql.sql(s, "SHOW CREATE TABLE adm")
      .select("ddl").head().getString(0)
    assert(ddl.startsWith(
      "CREATE TABLE adm (k BIGINT, ym STRING, cents BIGINT)"))
    assert(ddl.contains("ADD CONSTRAINT cents_pos CHECK (cents >= 0)"))
    // replay the render in a SECOND warehouse: same declared surface
    val wh2 = Files.createTempDirectory("admwh2").toString
    val s2 = spark.newSession()
    GraftSql.sql(s2, s"SET spark.graft.warehouse = $wh2")
    ddl.split(";\n").foreach(stmt => GraftSql.sql(s2, stmt))
    val ddl2 = GraftSql.sql(s2, "SHOW CREATE TABLE adm")
      .select("ddl").head().getString(0)
    assert(ddl2 == ddl, "the render must round-trip")
  }

  test("TRUNCATE keeps schema, checks, stats and history") {
    val wh = Files.createTempDirectory("admwh3").toString
    val s = spark.newSession()
    GraftSql.sql(s, s"SET spark.graft.warehouse = $wh")
    GraftSql.sql(s, "CREATE TABLE tt (k BIGINT, ym STRING)")
    GraftSql.sql(s, "ALTER TABLE tt ADD CONSTRAINT k_pos CHECK (k > 0)")
    GraftSql.sql(s, "INSERT INTO tt VALUES " +
      "(CAST(1 AS BIGINT), '2024-01'), (CAST(2 AS BIGINT), '2024-02')")
    val r = GraftSql.sql(s, "TRUNCATE TABLE tt")
    assert(r.head().getString(0) == "truncate")
    val empty = GraftSql.sql(s, "SELECT * FROM tt")
    assert(empty.count() == 0L)
    assert(empty.schema.map(_.name) == Seq("k", "ym"),
      "schema must survive the truncate")
    // history: the pre-truncate version still reads
    assert(GraftSql.sql(s,
      "SELECT count(*) AS n FROM tt VERSION AS OF 3").head()
      .getLong(0) == 2L)
    // the CHECK set survives: a bad insert still refuses
    intercept[Exception] {
      GraftSql.sql(s, "INSERT INTO tt VALUES " +
        "(CAST(-1 AS BIGINT), '2024-03')")
    }
    // and a clean one lands with zone maps (schema-derived fallback)
    GraftSql.sql(s, "INSERT INTO tt VALUES (CAST(9 AS BIGINT), '2024-03')")
    assert(GraftSql.sql(s, "SELECT count(*) AS n FROM tt").head()
      .getLong(0) == 1L)
  }

  test("DESCRIBE DIFF: keys added/removed/changed between two " +
      "versions, across routed DML verbs") {
    val wh = Files.createTempDirectory("admwh5").toString
    val s = spark.newSession()
    GraftSql.sql(s, s"SET spark.graft.warehouse = $wh")
    GraftSql.sql(s, "CREATE TABLE dd (k BIGINT, v STRING)")
    GraftSql.sql(s, "INSERT INTO dd VALUES " +
      "(CAST(1 AS BIGINT), 'a'), (CAST(2 AS BIGINT), 'b'), " +
      "(CAST(3 AS BIGINT), 'c')")                         // version 2
    GraftSql.sql(s, "UPDATE dd SET v = 'B' WHERE k = 2")   // version 3
    GraftSql.sql(s, "DELETE FROM dd WHERE k = 3")          // version 4
    GraftSql.sql(s, "INSERT INTO dd VALUES (CAST(4 AS BIGINT), 'd')") // v5
    val d = GraftSql.sql(s, "DESCRIBE DIFF dd FROM 2 TO 5 KEY (k)")
      .select("k", "change").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(d == Map(2L -> "changed", 3L -> "removed", 4L -> "added"),
      s"got $d")
    // identical snapshots diff empty
    assert(GraftSql.sql(s, "DESCRIBE DIFF dd FROM 5 TO 5 KEY (k)")
      .count() == 0L)
  }

  test("both verbs resolve two-part catalog names") {
    val wh = Files.createTempDirectory("admwh4").toString
    val s1 = spark.newSession()
    GraftSql.sql(s1, s"SET spark.graft.warehouse = $wh")
    GraftSql.sql(s1, "CREATE TABLE t4 (k BIGINT)")
    GraftSql.sql(s1, "INSERT INTO t4 VALUES (CAST(5 AS BIGINT))")
    val s2 = spark.newSession()
    GraftSql.sql(s2, s"SET spark.graft.catalog.wadm = $wh")
    assert(GraftSql.sql(s2, "SHOW CREATE TABLE wadm.t4")
      .select("ddl").head().getString(0)
      .startsWith("CREATE TABLE wadm.t4 (k BIGINT)"))
    GraftSql.sql(s2, "TRUNCATE TABLE wadm.t4")
    assert(GraftSql.sql(s2, "SELECT count(*) AS n FROM wadm.t4")
      .head().getLong(0) == 0L)
  }
}
