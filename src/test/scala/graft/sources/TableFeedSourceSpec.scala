package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.SparkSpec

/** The native Structured Streaming source over the commit log:
  * readStream drain ≡ batch read of the same version range, restart
  * resumes from the checkpoint, rewrite commits never re-feed, and
  * maxVersionsPerTrigger paces versions per micro-batch. */
class TableFeedSourceSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(): String =
    Files.createTempDirectory("graft_tfsrc_spec").toString

  private def drain(src: String, ckpt: String, sink: DataFrame => Unit,
      maxVersions: Long = 0L): Int = {
    var batches = 0
    val reader = spark.readStream
      .format("graft.sources.TableFeedSourceProvider")
      .option("path", src)
    val q = (if (maxVersions > 0)
        reader.option("maxVersionsPerTrigger", maxVersions.toString)
      else reader).load()
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) { batches += 1; sink(batch) }
        ()
      }
      .start()
    q.awaitTermination()
    batches
  }

  test("drain ≡ batch read; restart resumes; compaction never re-feeds") {
    val base = freshDir()
    val src = s"$base/src"
    val ckpt = s"$base/ckpt"
    val got = scala.collection.mutable.Set.empty[(Long, String)]
    def rows(lo: Long, hi: Long) = (lo until hi).map(i => (i, s"r$i"))
    CommitLog.append(spark, rows(0, 30).toDF("id", "s").repartition(3), src)
    CommitLog.append(spark, rows(30, 60).toDF("id", "s").repartition(3), src)
    drain(src, ckpt, b => got.synchronized {
      got ++= b.as[(Long, String)].collect()
    })
    assert(got.toSet == rows(0, 60).toSet)
    // Layout rewrite + a new append; the restarted stream must feed
    // ONLY the append (checkpointed offset skips fed versions, the
    // version walk skips the rewrite).
    CommitLog.compactTable(spark, src, targetRecordsPerFile = 1000)
    CommitLog.append(spark, rows(60, 70).toDF("id", "s"), src)
    val n = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    drain(src, ckpt, b => n.synchronized {
      n ++= b.as[(Long, String)].collect()
    })
    assert(n.toSet == rows(60, 70).toSet, s"re-fed or lost: ${n.toSet}")
    // Caught up: another run feeds nothing.
    var extra = 0L
    drain(src, ckpt, b => extra += b.count())
    assert(extra == 0L)
  }

  test("maxVersionsPerTrigger paces one version per micro-batch") {
    val base = freshDir()
    val src = s"$base/src"
    for (k <- 0 until 4)
      CommitLog.append(spark,
        Seq((k.toLong, s"v$k")).toDF("id", "s"), src)
    val got = scala.collection.mutable.Set.empty[Long]
    val batches = drain(src, s"$base/ckpt", b => got.synchronized {
      got ++= b.select("id").as[Long].collect()
    }, maxVersions = 1L)
    // First batch is the capped range ending at version 1, then one
    // version per trigger: 4 non-empty batches for 4 versions.
    assert(batches == 4, s"expected 4 paced batches, got $batches")
    assert(got.toSet == (0L until 4L).toSet)
  }

  test("startingVersion skips the initial snapshot on a fresh stream") {
    val base = freshDir()
    val src = s"$base/src"
    CommitLog.append(spark, Seq((1L, "v1")).toDF("id", "s"), src)
    CommitLog.append(spark, Seq((2L, "v2")).toDF("id", "s"), src)
    CommitLog.append(spark, Seq((3L, "v3")).toDF("id", "s"), src)
    val got = scala.collection.mutable.Set.empty[Long]
    val q = spark.readStream
      .format("graft.sources.TableFeedSourceProvider")
      .option("path", src)
      .option("startingVersion", "2")
      .load()
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$base/ckpt")
      .foreachBatch { (b: DataFrame, _: Long) =>
        got.synchronized { got ++= b.select("id").as[Long].collect() }
        ()
      }
      .start()
    q.awaitTermination()
    assert(got.toSet == Set(2L, 3L), s"snapshot leaked into the tail: $got")
  }

  test("changeFeed mode streams delete-aware CDC rows exactly once") {
    val base = freshDir()
    val src = s"$base/src"
    val ckpt = s"$base/ckpt"
    def rows(lo: Long, hi: Long) = (lo until hi).map(i => (i, i * 10L))
    MorTable.appendData(spark, rows(0, 10).toDF("k", "v"), 1L, src)
    MorTable.commitDeletes(spark, Seq(Tuple1(4L)).toDF("k"), 2L, src)
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, String, Long)]
    def drainCdf(): Unit = {
      val q = spark.readStream
        .format("graft.sources.TableFeedSourceProvider")
        .option("path", src)
        .option("changeFeed", "true")
        .option("keyCols", "k")
        .load()
        .writeStream
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: DataFrame, _: Long) =>
          got.synchronized {
            got ++= b.select("k", "_change_type", "_commit_version")
              .as[(Long, String, Long)].collect()
          }
          ()
        }
        .start()
      q.awaitTermination()
    }
    drainCdf()
    assert(got.count(_._2 == "insert") == 10)
    assert(got.filter(_._2 == "delete").map(_._1).toSet == Set(4L))
    // Second window: one more append + posdel; restart feeds ONLY it.
    got.clear()
    MorTable.appendData(spark, rows(10, 15).toDF("k", "v"), 3L, src)
    MorTable.commitPositionDeletes(spark, src, col("k") === 11L)
    drainCdf()
    assert(got.filter(_._2 == "insert").map(_._1).toSet == (10L until 15L).toSet)
    assert(got.filter(_._2 == "delete").map(_._1).toSet == Set(11L))
    assert(got.forall(r => r._3 == 3L || r._3 == 4L), s"stale versions re-fed: $got")
  }

  test("schema-evolved source projects old generations under the head schema") {
    val base = freshDir()
    val src = s"$base/src"
    SchemaEvolution.append(spark,
      Seq((1L, 10L)).toDF("k", "amt"), src)
    SchemaEvolution.renameColumn(spark, src, "amt", "cents")
    SchemaEvolution.append(spark,
      Seq((2L, 20L)).toDF("k", "cents"), src)
    val got = scala.collection.mutable.Set.empty[(Long, Long)]
    drain(src, s"$base/ckpt", b => got.synchronized {
      assert(b.columns.toSeq == Seq("k", "cents"))
      got ++= b.as[(Long, Long)].collect()
    })
    assert(got.toSet == Set((1L, 10L), (2L, 20L)))
  }
}
