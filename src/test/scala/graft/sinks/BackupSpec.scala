package graft.sinks

import java.nio.file.Files

import graft.SparkSpec

class BackupSpec extends SparkSpec {
  import spark.implicits._

  test("archive copies a finished directory and is idempotent") {
    val root = Files.createTempDirectory("graft-backup").toString
    val src = s"$root/binlog_000001"
    Seq((1L, "a"), (2L, "b")).toDF("tso", "v").write.parquet(src)
    val n1 = Backup.archive(spark, src, s"$root/archive")
    assert(n1 > 0)
    val back = spark.read.parquet(s"$root/archive/binlog_000001")
    assert(back.count() == 2)
    // re-archive (retry after failure) replaces, not duplicates
    val n2 = Backup.archive(spark, src, s"$root/archive")
    assert(n2 == n1)
    assert(spark.read.parquet(s"$root/archive/binlog_000001").count() == 2)
  }

  test("multi-file archive copies distributed: executor tasks, not the driver") {
    val root = Files.createTempDirectory("graft-backdist").toString
    val src = s"$root/segments"
    // a nested multi-file dir (files + a subdirectory level)
    (0 until 8).foreach { i =>
      Seq((i.toLong, s"v$i")).toDF("tso", "v").coalesce(1)
        .write.parquet(s"$src/part=$i")
    }
    val taskCounts = new java.util.concurrent.ConcurrentHashMap[Int, Int]()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        taskCounts.merge(e.stageId, 1, Integer.sum)
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val n = try {
      val n = Backup.archive(spark, src, s"$root/archive")
      Thread.sleep(500) // let the listener bus drain task-end events
      n
    } finally spark.sparkContext.removeSparkListener(listener)
    // every file arrived, readable as the same dataset
    assert(spark.read.parquet(s"$root/archive/segments").count() == 8)
    assert(n >= 8)
    // the copy fanned out across executor tasks (local[4] → 4 copy slots;
    // some stage in the archive job ran with >1 task)
    import scala.jdk.CollectionConverters._
    assert(taskCounts.values.asScala.max > 1,
      s"archive ran single-task stages only: $taskCounts")
  }

  test("archived ordered log serves scans, recovery and the SHOW surface") {
    val root = Files.createTempDirectory("graft-backscan").toString
    val log = s"$root/log"
    OrderedSink.appendSince(Seq((1L, "a"), (5L, "b"), (9L, "c"))
      .toDF("tso", "op"), "tso", log, 2)
    Backup.archive(spark, log, s"$root/archive")
    val archived = s"$root/archive/log"
    // the archive is a fully serving copy: scan, O(1) cursor recovery
    // (the sidecar traveled with the files), footer-stats listing
    assert(spark.read.parquet(archived).count() == 3)
    assert(OrderedSink.recoverPosition(spark, archived, "tso").contains(9L))
    val listing = OrderedSink.showBinlogEvents(spark, archived, "tso")
      .select($"start_tso", $"end_tso", $"n_events")
      .as[(Long, Long, Long)].collect()
    assert(listing.map(_._3).sum == 3)
    assert(listing.map(_._1).min == 1L && listing.map(_._2).max == 9L)
    // and appends continue against the archived copy from its cursor
    OrderedSink.appendSince(Seq((9L, "stale"), (12L, "d")).toDF("tso", "op"),
      "tso", archived, 2)
    assert(spark.read.parquet(archived).count() == 4)
  }
}
