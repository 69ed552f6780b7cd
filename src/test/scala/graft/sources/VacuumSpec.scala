package graft.sources

import org.apache.hadoop.fs.Path

import graft.SparkSpec

class VacuumSpec extends SparkSpec {

  private def plant(path: String, names: Seq[String]): Unit = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    names.foreach { n =>
      val out = fs.create(new Path(path, n), true)
      out.write(Array[Byte](9, 9)); out.close()
    }
  }

  private def names(path: String): Set[String] = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(new Path(path)).filter(_.isFile).map(_.getPath.getName).toSet
  }

  test("orphans are deleted, committed data and markers survive, rows unchanged") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_vac").toString
    (1 to 100).map(i => (i.toLong, s"v$i")).toDF("id", "v")
      .repartition(4).write.mode("overwrite").parquet(dir)
    val before = spark.read.parquet(dir).as[(Long, String)].collect().toSet
    plant(dir, Seq("part-x.parquet.inprogress", ".nfs-dead", "up.tmp"))
    val (deleted, kept) = Vacuum.vacuum(spark, dir)
    assert(deleted == 3)
    val after = names(dir)
    assert(!after.exists(n => n.endsWith(".inprogress") || n.endsWith(".tmp")
      || n.startsWith(".nfs")))
    assert(after.contains("_SUCCESS"))
    assert(kept == after.size)
    assert(spark.read.parquet(dir).as[(Long, String)].collect().toSet == before)
  }

  test("vacuum of a clean directory is a no-op") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_vac2").toString
    Seq((1L, "a")).toDF("id", "v").write.mode("overwrite").parquet(dir)
    val beforeNames = names(dir)
    val (deleted, kept) = Vacuum.vacuum(spark, dir)
    assert(deleted == 0)
    assert(names(dir) == beforeNames && kept == beforeNames.size)
  }

  test("missing directory returns zero counts instead of failing") {
    assert(Vacuum.vacuum(spark, "/no/such/graft/dir") == (0, 0))
  }
}
