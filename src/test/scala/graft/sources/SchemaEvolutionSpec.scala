package graft.sources

import java.nio.file.Files
import graft.SparkSpec
import org.apache.spark.sql.functions._

class SchemaEvolutionSpec extends SparkSpec {
  import spark.implicits._

  private def freshTable(): String =
    Files.createTempDirectory("graft_schema_spec").toString + "/t"

  test("rename resolves old files by field id; add reads as typed NULL") {
    val t = freshTable()
    val v1 = SchemaEvolution.append(spark,
      Seq((1L, 10.0), (2L, 20.0)).toDF("k", "a"), t)
    SchemaEvolution.renameColumn(spark, t, "a", "amount")
    SchemaEvolution.addColumn(spark, t, "flag", "string")
    val v4 = SchemaEvolution.append(spark,
      Seq((3L, 30.0, "x")).toDF("k", "amount", "flag"), t)
    val cur = SchemaEvolution.read(spark, t)
      .orderBy("k").collect().toSeq
    assert(cur.map(_.getLong(0)) == Seq(1L, 2L, 3L))
    // renamed column: old files' "a" bytes surface as "amount"
    assert(cur.map(_.getDouble(1)) == Seq(10.0, 20.0, 30.0))
    // added column: typed NULL in pre-add files, real in new ones
    assert(cur.map(r => Option(r.getString(2))) ==
      Seq(None, None, Some("x")))
    assert(SchemaEvolution.read(spark, t).columns.toSeq ==
      Seq("k", "amount", "flag"))
    // time travel: v1 reads under v1's schema (original names, no flag)
    val old = SchemaEvolution.read(spark, t, Some(v1))
    assert(old.columns.toSeq == Seq("k", "a"))
    assert(old.orderBy("k").as[(Long, Double)].collect().toSeq ==
      Seq((1L, 10.0), (2L, 20.0)))
    // ...and the current version is still v4's view
    assert(SchemaEvolution.read(spark, t, Some(v4)).count() == 3)
  }

  test("drop retires the field id; a re-added name gets a FRESH id") {
    val t = freshTable()
    SchemaEvolution.append(spark, Seq((1L, "secret")).toDF("k", "s"), t)
    SchemaEvolution.dropColumn(spark, t, "s")
    assert(SchemaEvolution.read(spark, t).columns.toSeq == Seq("k"))
    // Re-add a column with the SAME NAME: new field id, so the old
    // file's "s" bytes must NOT leak back through the name.
    SchemaEvolution.addColumn(spark, t, "s", "string")
    val rows = SchemaEvolution.read(spark, t).collect().toSeq
    assert(rows.map(r => Option(r.getString(1))) == Seq(None))
    // append under the re-added column works
    SchemaEvolution.append(spark, Seq((2L, "new")).toDF("k", "s"), t)
    assert(SchemaEvolution.read(spark, t).orderBy("k")
      .as[(Long, Option[String])].collect().toSeq ==
      Seq((1L, None), (2L, Some("new"))))
  }

  test("evolution commits are metadata-only and schema ids are content-addressed") {
    val t = freshTable()
    SchemaEvolution.append(spark, Seq((1L, 1.0)).toDF("k", "a"), t)
    val v1 = CommitLog.currentVersion(spark, t).get
    val files1 = CommitLog.liveFiles(spark, t, v1)
    SchemaEvolution.renameColumn(spark, t, "a", "b")
    val v2 = CommitLog.currentVersion(spark, t).get
    assert(v2 == v1 + 1)
    assert(CommitLog.liveFiles(spark, t, v2) == files1) // no data rewrite
    // rename back: the schema id round-trips to the original (content
    // addressing), and reads still work
    SchemaEvolution.renameColumn(spark, t, "b", "a")
    val m1 = CommitLog.readManifest(spark, t, v1)
    val m3 = CommitLog.readManifest(spark, t,
      CommitLog.currentVersion(spark, t).get)
    assert(m1.schemaId == m3.schemaId)
    assert(SchemaEvolution.read(spark, t).columns.toSeq == Seq("k", "a"))
  }

  test("widening is metadata-only; old narrow bytes up-cast at read") {
    val t = freshTable()
    val df1 = Seq((1, 10), (2, 20)).toDF("k", "n")
    SchemaEvolution.append(spark, df1, t)
    assert(SchemaEvolution.currentSchema(spark, t).get
      .fields.map(_.dataType) == Seq("int", "int"))
    val files1 = CommitLog.liveFiles(spark, t,
      CommitLog.currentVersion(spark, t).get)
    SchemaEvolution.widenColumnType(spark, t, "n", "bigint")
    // no data rewrite
    assert(CommitLog.liveFiles(spark, t,
      CommitLog.currentVersion(spark, t).get) == files1)
    // append values that only fit the widened type
    SchemaEvolution.append(spark,
      Seq((3, 5000000000L)).toDF("k", "n"), t)
    val out = SchemaEvolution.read(spark, t).orderBy("k")
    assert(out.schema("n").dataType ==
      org.apache.spark.sql.types.LongType)
    assert(out.as[(Int, Long)].collect().toSeq ==
      Seq((1, 10L), (2, 20L), (3, 5000000000L)))
    // narrowing and lossy changes are refused
    intercept[IllegalArgumentException] {
      SchemaEvolution.widenColumnType(spark, t, "n", "int")
    }
    intercept[IllegalArgumentException] {
      SchemaEvolution.widenColumnType(spark, t, "k", "string")
    }
  }

  test("position deletes compose with renames across file generations") {
    val t = freshTable()
    val v1 = SchemaEvolution.append(spark,
      Seq((1L, 10.0), (2L, 20.0)).toDF("k", "a"), t)
    SchemaEvolution.renameColumn(spark, t, "a", "amount")
    SchemaEvolution.append(spark,
      Seq((3L, 30.0), (4L, 40.0)).toDF("k", "amount"), t)
    // predicate on the RENAMED column must hit rows in BOTH the
    // pre-rename file (written as "a") and the post-rename file
    SchemaEvolution.commitPositionDeletes(spark, t,
      $"amount" === 20.0 || $"amount" === 30.0)
    val got = SchemaEvolution.readWithPositionDeletes(spark, t)
      .orderBy("k").as[(Long, Double)].collect().toSeq
    assert(got == Seq((1L, 10.0), (4L, 40.0)))
    // plain read still sees everything (deletes are MoR, not rewrite)
    assert(SchemaEvolution.read(spark, t).count() == 4)
    // time travel before the delete: all rows, original name
    assert(SchemaEvolution.readWithPositionDeletes(spark, t, Some(v1))
      .columns.toSeq == Seq("k", "a"))
    // equality deletes refuse loudly on evolved readers
    MorTable.commitDeletes(spark, Seq(1L).toDF("k"), 9L, t)
    intercept[IllegalArgumentException] {
      SchemaEvolution.readWithPositionDeletes(spark, t)
    }
  }

  test("equality deletes survive a rename: keys re-resolve by field id") {
    val t = freshTable()
    // data_seq is part of the schema for the sequencing rule
    SchemaEvolution.append(spark,
      Seq((1L, "a", 1L), (2L, "b", 1L), (3L, "c", 1L))
        .toDF("id", "v", "data_seq"), t)
    // delete id=2 under the ORIGINAL column name...
    SchemaEvolution.commitEqualityDeletes(spark, t,
      Seq(2L).toDF("id"), 2L)
    // ...then rename the key column itself
    SchemaEvolution.renameColumn(spark, t, "id", "doc_id")
    SchemaEvolution.append(spark,
      Seq((2L, "b2", 3L), (4L, "d", 3L)).toDF("doc_id", "v", "data_seq"), t)
    // the pre-rename delete still applies (field id match), the
    // post-delete re-insert of 2 survives (data_seq 3 > delete_seq 2)
    val got = SchemaEvolution.readMorEvolved(spark, t, Seq("doc_id"))
      .select("doc_id", "v").as[(Long, String)].collect().sorted.toSeq
    assert(got == Seq((1L, "a"), (2L, "b2"), (3L, "c"), (4L, "d")))
    // delete under the NEW name composes with everything above
    SchemaEvolution.commitEqualityDeletes(spark, t,
      Seq(1L).toDF("doc_id"), 4L)
    assert(SchemaEvolution.readMorEvolved(spark, t, Seq("doc_id"))
      .select("doc_id").as[Long].collect().sorted.toSeq ==
      Seq(2L, 3L, 4L))
    // deleting by a key that was since dropped refuses loudly
    SchemaEvolution.addColumn(spark, t, "tag", "string")
    SchemaEvolution.dropColumn(spark, t, "tag")
    // (drop of a non-key column is fine; the reader still works)
    assert(SchemaEvolution.readMorEvolved(spark, t, Seq("doc_id"))
      .count() == 3)
  }

  test("compactEvolved retires delete debt on a renamed table losslessly") {
    val t = freshTable()
    SchemaEvolution.append(spark,
      Seq((1L, "a", 1L), (2L, "b", 1L), (3L, "c", 1L))
        .toDF("id", "v", "data_seq"), t)
    SchemaEvolution.commitEqualityDeletes(spark, t, Seq(2L).toDF("id"), 2L)
    SchemaEvolution.renameColumn(spark, t, "id", "doc_id")
    SchemaEvolution.commitPositionDeletes(spark, t, $"doc_id" === 3L)
    val before = SchemaEvolution.readMorEvolved(spark, t, Seq("doc_id"))
      .select("doc_id", "v").as[(Long, String)].collect().sorted.toSeq
    assert(before == Seq((1L, "a")))
    val vC = SchemaEvolution.compactEvolved(spark, t, Seq("doc_id"))
    val files = CommitLog.liveFiles(spark, t, vC)
    assert(!files.exists(f => f.startsWith("deletes-") ||
      f.startsWith("posdel-")))
    // the compacted files are CURRENT-schema (no null-forked rename)
    assert(SchemaEvolution.read(spark, t)
      .select("doc_id", "v").as[(Long, String)].collect().toSeq ==
      Seq((1L, "a")))
    assert(SchemaEvolution.readMorEvolved(spark, t, Seq("doc_id"))
      .select("doc_id", "v").as[(Long, String)].collect().toSeq ==
      Seq((1L, "a")))
  }

  test("append refuses a silent lossy cast (long frame into int column)") {
    val t = freshTable()
    SchemaEvolution.append(spark, Seq((1, 10)).toDF("k", "n"), t)
    intercept[IllegalArgumentException] {
      SchemaEvolution.append(spark,
        Seq((2, 5000000000L)).toDF("k", "n"), t)
    }
    // widen first, then the same append succeeds
    SchemaEvolution.widenColumnType(spark, t, "n", "bigint")
    SchemaEvolution.append(spark, Seq((2, 5000000000L)).toDF("k", "n"), t)
    assert(SchemaEvolution.read(spark, t).count() == 2)
  }

  test("append rejects columns that do not match the current schema") {
    val t = freshTable()
    SchemaEvolution.append(spark, Seq((1L, 1.0)).toDF("k", "a"), t)
    SchemaEvolution.renameColumn(spark, t, "a", "b")
    intercept[IllegalArgumentException] {
      SchemaEvolution.append(spark, Seq((2L, 2.0)).toDF("k", "a"), t)
    }
  }
}
