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
}
