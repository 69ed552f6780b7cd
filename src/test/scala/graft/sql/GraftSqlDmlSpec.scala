package graft.sql

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.{CommitLog, Constraints}

class GraftSqlDmlSpec extends SparkSpec {
  import spark.implicits._

  private var n = 0
  private def freshView(): String = { n += 1; s"sqldml_v$n" }

  private def buildTable(view: String): String = {
    val t = Files.createTempDirectory("sqldml").toString + "/t"
    for ((ym, lo) <- Seq(("2024-01", 1), ("2024-02", 11), ("2024-03", 21)))
      CommitLog.appendWithStats(spark,
        (lo until lo + 10).map(k => (k.toLong, ym, k * 100L))
          .toDF("k", "ym", "cents").coalesce(1),
        t, Seq("k", "ym"))
    GraftTables.register(spark, t, view)
    t
  }

  test("DELETE FROM routes into CommitDml and re-pins the view") {
    val v = freshView(); buildTable(v)
    val r = GraftSql.sql(spark,
      s"DELETE FROM $v WHERE ym = '2024-01' OR (ym = '2024-02' AND k >= 16)")
    assert(r.columns.toSeq == Seq("verb", "version"))
    assert(r.head().getString(0) == "delete")
    // the SAME SQL session reads its own write through the view
    val got = GraftSql.sql(spark, s"SELECT k FROM $v").as[Long]
      .collect().toSet
    assert(got == ((11L to 15L) ++ (21L to 30L)).toSet)
  }

  test("UPDATE routes into CommitDml") {
    val v = freshView(); buildTable(v)
    GraftSql.sql(spark,
      s"UPDATE $v SET cents = cents + 7 WHERE ym = '2024-02'")
    val got = spark.sql(s"SELECT sum(cents) FROM $v").head().getLong(0)
    assert(got == (1 to 30).map(_ * 100L).sum + 10 * 7L)
  }

  test("MERGE INTO routes into CommitMerge: update + insert clauses") {
    val v = freshView(); val t = buildTable(v)
    Seq((11L, "2024-02", 1L), (99L, "2099-01", 2L))
      .toDF("k", "ym", "cents").createOrReplaceTempView(s"${v}_src")
    val r = GraftSql.sql(spark,
      s"""MERGE INTO $v AS tgt USING ${v}_src AS src ON tgt.k = src.k
         |WHEN MATCHED THEN UPDATE SET cents = src.cents + 1000
         |WHEN NOT MATCHED THEN INSERT (k, ym, cents)
         |  VALUES (src.k, src.ym, src.cents)""".stripMargin)
    assert(r.head().getString(0) == "merge")
    val m = CommitLog.read(spark, t).filter(col("k") === 11L)
      .select("cents").as[Long].head()
    assert(m == 1001L, s"matched row must be updated, got $m")
    val ins = CommitLog.read(spark, t).filter(col("k") === 99L)
      .select("ym", "cents").as[(String, Long)].head()
    assert(ins == ("2099-01", 2L))
    assert(CommitLog.read(spark, t).count() == 31L)
  }

  test("MERGE WHEN MATCHED DELETE and update-star forms") {
    val v = freshView(); val t = buildTable(v)
    Seq((12L, "2024-02", 5L), (13L, "2024-09", 6L))
      .toDF("k", "ym", "cents").createOrReplaceTempView(s"${v}_src")
    GraftSql.sql(spark,
      s"""MERGE INTO $v USING ${v}_src AS src ON $v.k = src.k
         |WHEN MATCHED AND src.cents = 5 THEN DELETE
         |WHEN MATCHED THEN UPDATE SET *""".stripMargin)
    val t12 = CommitLog.read(spark, t).filter(col("k") === 12L).count()
    assert(t12 == 0L, "DELETE clause must remove the row")
    val r13 = CommitLog.read(spark, t).filter(col("k") === 13L)
      .select("ym").as[String].head()
    assert(r13 == "2024-09", "UPDATE SET * must take all source columns")
  }

  test("INSERT INTO goes through checkedAppend; violations never publish") {
    val v = freshView(); val t = buildTable(v)
    Constraints.setChecks(spark, t,
      Seq(Constraints.Check("cents_nonneg", "cents >= 0")))
    GraftTables.register(spark, t, v) // re-pin after metadata commit
    val r = GraftSql.sql(spark,
      s"INSERT INTO $v VALUES (100, '2024-04', 1), (101, '2024-04', 2)")
    assert(r.head().getString(0) == "insert")
    assert(spark.sql(s"SELECT count(*) FROM $v").head().getLong(0) == 32L)
    // the statted columns survive SQL inserts: new file is prunable
    val (total, sel) = CommitLog.prunedFilesByString(
      spark, t, "ym", "2024-04", "2024-04")
    assert(sel.nonEmpty && sel.size == total - 3,
      s"probe must select exactly the inserted files, got $sel")
    val before = CommitLog.currentVersion(spark, t).get
    intercept[Constraints.ConstraintViolationException] {
      GraftSql.sql(spark, s"INSERT INTO $v VALUES (102, '2024-05', -1)")
    }
    assert(CommitLog.currentVersion(spark, t).contains(before),
      "a violating INSERT must not publish a version")
  }

  test("unregistered tables pass through untouched") {
    spark.range(3).createOrReplaceTempView("plain_view")
    // DELETE on a non-registered view falls through to Spark, which
    // refuses it for v1 relations — proving we did NOT hijack it
    intercept[Exception] {
      GraftSql.sql(spark, "DELETE FROM plain_view WHERE id = 1")
    }
    // and plain SELECT statements are untouched
    assert(GraftSql.sql(spark, "SELECT count(*) AS n FROM plain_view")
      .head().getLong(0) == 3L)
  }

  test("INSERT OVERWRITE replaces the whole live set in one commit; " +
      "mismatched arity refused loudly") {
    val v = freshView(); val t = buildTable(v)
    val v0 = CommitLog.currentVersion(spark, t).get
    val r = GraftSql.sql(spark,
      s"INSERT OVERWRITE TABLE $v VALUES " +
        "(CAST(1 AS BIGINT), 'x', CAST(2 AS BIGINT)), " +
        "(CAST(2 AS BIGINT), 'y', CAST(3 AS BIGINT))")
    assert(r.head().getString(0) == "insert_overwrite")
    assert(CommitLog.read(spark, t).count() == 2L)
    assert(CommitLog.currentVersion(spark, t).get == v0 + 1,
      "overwrite must be ONE atomic commit")
    // the pre-overwrite snapshot is still time-travelable
    assert(GraftSql.sql(spark,
      s"SELECT count(*) AS n FROM $v VERSION AS OF $v0")
      .head().getLong(0) == 30L)
    // and checked: a violating overwrite batch publishes nothing
    Constraints.setChecks(spark, t, Seq(
      Constraints.Check("cents_nonneg", "cents >= 0")))
    intercept[Constraints.ConstraintViolationException] {
      GraftSql.sql(spark,
        s"INSERT OVERWRITE TABLE $v VALUES " +
          "(CAST(9 AS BIGINT), 'z', CAST(-1 AS BIGINT))")
    }
    assert(CommitLog.read(spark, t).count() == 2L)
    intercept[IllegalArgumentException] {
      GraftSql.sql(spark, s"INSERT INTO $v VALUES (1, 'x')")
    }
  }

  test("SQL time travel: VERSION AS OF and TIMESTAMP AS OF") {
    val v = freshView(); val t = buildTable(v)
    val v0 = CommitLog.currentVersion(spark, t).get
    GraftSql.sql(spark, s"DELETE FROM $v WHERE ym = '2024-01'")
    // head sees the delete; VERSION AS OF reads the pre-delete state
    assert(GraftSql.sql(spark, s"SELECT count(*) AS n FROM $v")
      .head().getLong(0) == 20L)
    assert(GraftSql.sql(spark,
      s"SELECT count(*) AS n FROM $v VERSION AS OF $v0")
      .head().getLong(0) == 30L)
    // TIMESTAMP AS OF far future resolves to head
    assert(GraftSql.sql(spark,
      s"SELECT count(*) AS n FROM $v TIMESTAMP AS OF '2999-01-01'")
      .head().getLong(0) == 20L)
    // and a time-travel source feeds DML: re-insert the deleted month
    GraftSql.sql(spark, s"INSERT INTO $v SELECT * FROM $v " +
      s"VERSION AS OF $v0 WHERE ym = '2024-01'")
    assert(GraftSql.sql(spark, s"SELECT count(*) AS n FROM $v")
      .head().getLong(0) == 30L)
    // unregistered tables keep Spark's own time-travel error surface
    spark.range(3).createOrReplaceTempView("plain_tt")
    intercept[Exception] {
      GraftSql.sql(spark, "SELECT * FROM plain_tt VERSION AS OF 1")
        .collect()
    }
  }

  test("unconditional DELETE empties the table and drops the view") {
    val v = freshView(); val t = buildTable(v)
    val r = GraftSql.sql(spark, s"DELETE FROM $v")
    assert(r.head().getString(0) == "delete")
    // the view is gone (nothing to pin), the data is gone at head,
    // and time travel still reads the pre-delete state
    assert(!spark.catalog.tableExists(v))
    val head = CommitLog.currentVersion(spark, t).get
    assert(CommitLog.liveFiles(spark, t, head).isEmpty)
    assert(CommitLog.readVersion(spark, t, head - 1).count() == 30L)
  }

  test("maintenance verbs: OPTIMIZE, VACUUM, DESCRIBE HISTORY/DETAIL") {
    val v = freshView(); val t = buildTable(v)
    val hist = GraftSql.sql(spark, s"DESCRIBE HISTORY $v")
    assert(hist.count() == 3L)
    assert(hist.select("operation").as[String].collect()
      .forall(_ == "append"))
    val opt = GraftSql.sql(spark, s"OPTIMIZE $v")
    assert(opt.head().getString(0) == "optimize")
    val detail = GraftSql.sql(spark, s"DESCRIBE DETAIL $v")
    assert(detail.select("n_data_files").head().getLong(0) == 1L,
      "OPTIMIZE must compact to one file at this size")
    // data unchanged through the rewrite
    assert(spark.sql(s"SELECT count(*) FROM $v").head().getLong(0) == 30L)
    val vac = GraftSql.sql(spark, s"VACUUM $v RETAIN 1 VERSIONS")
    assert(vac.head().getString(0) == "vacuum")
    assert(vac.head().getLong(1) == 3L, "the 3 pre-compaction files retire")
    assert(GraftSql.sql(spark, s"DESCRIBE HISTORY $v").count() == 1L)
    // a non-registered name falls through to Spark's own grammar
    spark.range(2).createOrReplaceTempView("history")
    assert(GraftSql.sql(spark, "DESCRIBE history").count() > 0)
  }

  test("pure spark.sql on an extensions-built session (best effort)") {
    val s2 = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    // getOrCreate may hand back the shared extension-less session;
    // only assert when the injected parser actually engaged.
    val v = freshView(); val t = buildTable(v)
    GraftTables.register(s2, t, v) // routing is session-scoped now
    val engaged = try {
      s2.sql(s"DELETE FROM $v WHERE ym = '2024-01'")
      true
    } catch { case _: Throwable => false }
    if (engaged)
      assert(CommitLog.read(s2, t).count() == 20L)
  }

  test("INSERT with a column list: named columns bind, the rest " +
      "NULL-fill, CHECKed NULLs refuse (r14 #5)") {
    val v = freshView(); val t = buildTable(v)
    GraftSql.sql(spark,
      s"INSERT INTO $v (ym, k) VALUES ('2031-01', CAST(500 AS BIGINT))")
    val row = CommitLog.read(spark, t).filter(col("k") === 500L)
      .select("ym", "cents").head()
    assert(row.getString(0) == "2031-01" && row.isNullAt(1),
      "unnamed column must NULL-fill")
    // refusals: unknown column, duplicate, arity mismatch
    assert(intercept[Exception] { GraftSql.sql(spark,
      s"INSERT INTO $v (nope) VALUES (1)") }
      .getMessage.contains("does not exist"))
    assert(intercept[Exception] { GraftSql.sql(spark,
      s"INSERT INTO $v (k, k) VALUES (1, 2)") }
      .getMessage.contains("repeats"))
    assert(intercept[Exception] { GraftSql.sql(spark,
      s"INSERT INTO $v (k, ym) VALUES (CAST(1 AS BIGINT))") }
      .getMessage.toLowerCase.contains("column"))
    // a NOT-NULL-style CHECK refuses the NULL-fill before publish
    // (ym: every existing row carries one, so the set validates)
    Constraints.setChecks(spark, t, Seq(
      Constraints.Check("ym_not_null", "ym IS NOT NULL")))
    val before = CommitLog.read(spark, t).count()
    intercept[Constraints.ConstraintViolationException] {
      GraftSql.sql(spark,
        s"INSERT INTO $v (k, cents) VALUES (CAST(600 AS BIGINT), " +
          "CAST(1 AS BIGINT))")
    }
    assert(CommitLog.read(spark, t).count() == before,
      "a refused insert must publish nothing")
  }

  test("two-part identifiers resolve through the persisted catalog " +
      "(r14 #6): DML + time travel on <alias>.<name>") {
    val v = freshView(); val t = buildTable(v)
    val w = Files.createTempDirectory("dmlwh").toString
    graft.sources.Catalog.register(spark, w, "torders", t)
    GraftSql.sql(spark, s"SET spark.graft.catalog.wh1 = $w")
    // DELETE via the two-part name (no session view needed)
    val d = GraftSql.sql(spark,
      "DELETE FROM wh1.torders WHERE ym = '2024-01'")
    assert(d.head().getString(0) == "delete")
    assert(CommitLog.read(spark, t).count() == 20L)
    // UPDATE
    GraftSql.sql(spark,
      "UPDATE wh1.torders SET cents = cents + 1 WHERE k = 11")
    assert(CommitLog.read(spark, t).filter(col("k") === 11L)
      .select("cents").as[Long].head() == 1101L)
    // INSERT (with a column list, composing #5 and #6)
    GraftSql.sql(spark,
      "INSERT INTO wh1.torders (k, ym) VALUES (CAST(777 AS BIGINT), '2031-03')")
    assert(CommitLog.read(spark, t).filter(col("k") === 777L).count() == 1L)
    // MERGE with the bare name as target qualifier
    Seq((12L, "2024-02", 9L)).toDF("k", "ym", "cents")
      .createOrReplaceTempView("twopart_src")
    GraftSql.sql(spark,
      """MERGE INTO wh1.torders USING twopart_src AS src
        |ON torders.k = src.k
        |WHEN MATCHED THEN UPDATE SET cents = src.cents""".stripMargin)
    assert(CommitLog.read(spark, t).filter(col("k") === 12L)
      .select("cents").as[Long].head() == 9L)
    // time travel on the two-part name reads the pre-DML snapshot
    val v0 = GraftSql.sql(spark,
      "SELECT count(*) AS n FROM wh1.torders VERSION AS OF 3")
    assert(v0.head().getLong(0) == 30L)
    // plain SELECT on the two-part name reads the current head — no
    // view registration anywhere — and still prunes at the manifest
    val sel = GraftSql.sql(spark,
      "SELECT sum(cents) AS c FROM wh1.torders WHERE ym = '2024-03'")
    assert(sel.head().getLong(0) ==
      (21 to 30).map(_ * 100L).sum)
    val scanned = sel.queryExecution.optimizedPlan.collect {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        lr.relation match {
          case fs: org.apache.spark.sql.execution.datasources
              .HadoopFsRelation => fs.location.rootPaths.size
          case _ => 0
        }
    }.sum
    val totalFiles = CommitLog.liveFiles(spark, t,
      CommitLog.currentVersion(spark, t).get).size
    assert(scanned < totalFiles,
      s"two-part read must skip: scanned $scanned of $totalFiles")
    // maintenance verbs on the two-part name
    assert(GraftSql.sql(spark, "DESCRIBE HISTORY wh1.torders")
      .count() >= 5L)
    val opt = GraftSql.sql(spark, "OPTIMIZE wh1.torders")
    assert(opt.head().getString(0) == "optimize")
    assert(GraftSql.sql(spark,
      "SELECT count(*) AS n FROM wh1.torders").head().getLong(0) ==
      CommitLog.read(spark, t).count())
    // catalog discovery
    val st = GraftSql.sql(spark, "SHOW TABLES IN wh1")
    assert(st.columns.toSeq == Seq("name", "root"))
    assert(st.collect().map(_.getString(0)).toSeq == Seq("torders"))
    // an unbound alias falls through to Spark's own surface
    val routed = try {
      GraftSql.sql(spark, "DELETE FROM nope.torders WHERE k = 1")
        .columns.toSeq == Seq("verb", "version")
    } catch { case _: Exception => false }
    assert(!routed)
    intercept[Exception] {
      GraftSql.sql(spark, "SHOW TABLES IN nope_alias").collect()
    }
  }

  test("ALTER TABLE ADD/DROP CONSTRAINT routes into the persisted " +
      "CHECK set") {
    val v = freshView(); val t = buildTable(v)
    val r = GraftSql.sql(spark,
      s"ALTER TABLE $v ADD CONSTRAINT cents_nonneg CHECK (cents >= 0)")
    assert(r.head().getString(0) == "add_constraint")
    assert(Constraints.checks(spark, t).map(_.name) == Seq("cents_nonneg"))
    // enforcement engages on the next statement
    intercept[Constraints.ConstraintViolationException] {
      GraftSql.sql(spark, s"INSERT INTO $v VALUES " +
        "(CAST(900 AS BIGINT), '2031-01', CAST(-1 AS BIGINT))")
    }
    // a set the live rows violate refuses (k <= 5 is false for k=30)
    intercept[Constraints.ConstraintViolationException] {
      GraftSql.sql(spark,
        s"ALTER TABLE $v ADD CONSTRAINT k_tiny CHECK (k <= 5)")
    }
    // duplicates and unknown names refuse loudly
    assert(intercept[Exception] { GraftSql.sql(spark,
      s"ALTER TABLE $v ADD CONSTRAINT cents_nonneg CHECK (cents >= 1)") }
      .getMessage.contains("already exists"))
    assert(intercept[Exception] { GraftSql.sql(spark,
      s"ALTER TABLE $v DROP CONSTRAINT nope") }
      .getMessage.contains("no constraint"))
    // dropping the LAST constraint clears the set; inserts flow again
    GraftSql.sql(spark, s"ALTER TABLE $v DROP CONSTRAINT cents_nonneg")
    assert(Constraints.checks(spark, t).isEmpty)
    GraftSql.sql(spark, s"INSERT INTO $v VALUES " +
      "(CAST(901 AS BIGINT), '2031-01', CAST(-1 AS BIGINT))")
    assert(CommitLog.read(spark, t).filter(col("k") === 901L).count() == 1L)
    // unregistered names keep Spark's own ALTER surface
    intercept[Exception] {
      GraftSql.sql(spark,
        "ALTER TABLE never_registered ADD CONSTRAINT c CHECK (1 = 1)")
        .collect()
    }
  }

  test("MERGE ON with cross-named keys: the source side renames onto " +
      "the target's key columns (r14 missing #6)") {
    val v = freshView(); val t = buildTable(v)
    Seq((13L, "2024-09", 77L), (40000L, "2099-05", 88L))
      .toDF("src_id", "src_ym", "src_cents")
      .createOrReplaceTempView(s"${v}_xsrc")
    GraftSql.sql(spark,
      s"""MERGE INTO $v AS tgt USING ${v}_xsrc AS src
         |ON tgt.k = src.src_id
         |WHEN MATCHED THEN UPDATE SET cents = src.src_cents
         |WHEN NOT MATCHED THEN INSERT (k, ym, cents)
         |  VALUES (src.src_id, src.src_ym, src.src_cents)""".stripMargin)
    assert(CommitLog.read(spark, t).filter(col("k") === 13L)
      .select("cents").as[Long].head() == 77L)
    val ins = CommitLog.read(spark, t).filter(col("k") === 40000L)
      .select("ym", "cents").as[(String, Long)].head()
    assert(ins == ("2099-05", 88L))
    assert(CommitLog.read(spark, t).count() == 31L)
    // refusals stay loud: both sides from one relation; a rename that
    // would shadow an existing source column
    assert(intercept[Exception] { GraftSql.sql(spark,
      s"""MERGE INTO $v AS tgt USING ${v}_xsrc AS src
         |ON tgt.k = tgt.cents
         |WHEN MATCHED THEN DELETE""".stripMargin) }
      .getMessage.contains("target"))
    Seq((13L, 1L)).toDF("src_id", "k").createOrReplaceTempView(s"${v}_bad")
    assert(intercept[Exception] { GraftSql.sql(spark,
      s"""MERGE INTO $v AS tgt USING ${v}_bad AS src
         |ON tgt.k = src.src_id
         |WHEN MATCHED THEN DELETE""".stripMargin) }
      .getMessage.contains("shadow"))
  }

  test("DML routing is session-scoped: a foreign session's same-named " +
      "view never routes into this session's table (ADVICE r14)") {
    val v = freshView(); val t = buildTable(v)
    val other = spark.newSession()
    // the other session has its OWN unrelated temp view under the name
    other.range(3).toDF("k").createOrReplaceTempView(v)
    // parsing in the other session must NOT route into CommitDml —
    // the statement falls through to Spark's own (refusing) surface
    val routed = try {
      GraftSql.sql(other, s"DELETE FROM $v WHERE k = 1")
        .columns.toSeq == Seq("verb", "version")
    } catch { case _: Exception => false }
    assert(!routed, "foreign session must not route the verb")
    assert(CommitLog.read(spark, t).count() == 30L,
      "the registering session's table must be untouched")
    // and unregistering in the other session must not kill routing here
    GraftTables.unregister(other, t, v)
    GraftSql.sql(spark, s"DELETE FROM $v WHERE k = 11")
    assert(CommitLog.read(spark, t).count() == 29L)
  }

  test("execution-time re-verification: a plan parsed in one session " +
      "refuses to run its verb in a session without the registration") {
    val v = freshView(); val t = buildTable(v)
    val other = spark.newSession()
    val prev = org.apache.spark.sql.SparkSession.getActiveSession
    org.apache.spark.sql.SparkSession.setActiveSession(spark)
    val plan = try {
      new GraftSqlParser(spark.sessionState.sqlParser)
        .parsePlan(s"DELETE FROM $v WHERE k = 11")
    } finally prev.foreach(
      org.apache.spark.sql.SparkSession.setActiveSession)
    val ex = intercept[IllegalArgumentException] {
      org.apache.spark.sql.graftbridge.DatasetBridge.ofRows(other, plan)
        .collect()
    }
    assert(ex.getMessage.contains("not registered"))
    assert(CommitLog.read(spark, t).count() == 30L)
  }
}
