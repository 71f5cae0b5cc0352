package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.operators.MergeSort

class GlobalBinlogStreamSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("tso", LongType), StructField("op", StringType)))

  test("end-to-end: drain source, ordered output, incremental restart, replay-safe") {
    val root = Files.createTempDirectory("graft-gbs").toString
    val srcDir = s"$root/src"; val outDir = s"$root/out"
    val ckpt = s"$root/ckpt"
    new java.io.File(srcDir).mkdirs()

    // wave 1: two source files (two "DNs")
    Seq((3L, "I"), (1L, "I")).toDF("tso", "op")
      .write.parquet(s"$srcDir/f1.parquet")
    Seq((2L, "U"), (4L, "D")).toDF("tso", "op")
      .write.parquet(s"$srcDir/f2.parquet")
    // readStream needs the basePath trick for nested parquet dirs: use glob
    val q1 = GlobalBinlogStream.start(spark, s"$srcDir/*", schema, "tso",
      outDir, ckpt, numPartitions = 2)
    q1.awaitTermination(120000)
    val out1 = spark.read.parquet(outDir)
    assert(out1.count() == 4)
    assert(MergeSort.disorderCount(
      out1.orderBy($"tso"), "tso") == 0)

    // wave 2: new file appears; restart drains only the delta
    Seq((6L, "I"), (5L, "U")).toDF("tso", "op")
      .write.parquet(s"$srcDir/f3.parquet")
    val q2 = GlobalBinlogStream.start(spark, s"$srcDir/*", schema, "tso",
      outDir, ckpt, numPartitions = 2)
    q2.awaitTermination(120000)
    val out2 = spark.read.parquet(outDir)
    assert(out2.count() == 6)
    assert(out2.select(sum($"tso")).head().getLong(0) == 21L)

    // replay safety: wiping the checkpoint (worst-case reprocess of ALL
    // source files) must not duplicate output rows
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(ckpt))
    val q3 = GlobalBinlogStream.start(spark, s"$srcDir/*", schema, "tso",
      outDir, ckpt, numPartitions = 2)
    q3.awaitTermination(120000)
    assert(spark.read.parquet(outDir).count() == 6)
  }
  test("wire sink: rotated binlog files per micro-batch, replay-idempotent") {
    val root = Files.createTempDirectory("graft-gbw").toString
    val srcDir = s"$root/src"; val outDir = s"$root/out"
    new java.io.File(srcDir).mkdirs()
    val cdcSchema = StructType(Seq(
      StructField("tso", LongType), StructField("txnId", LongType),
      StructField("op", StringType), StructField("schemaName", StringType),
      StructField("tableName", StringType),
      StructField("before", MapType(StringType, StringType)),
      StructField("after", MapType(StringType, StringType)),
      StructField("tsoTime", LongType)))
    def rows(base: Long) = Seq(
      (base, base / 10, "INSERT", "app", "t",
        Map.empty[String, String], Map("id" -> base.toString), 1700000000L),
      (base + 1, base / 10, "UPDATE", "app", "t",
        Map("id" -> base.toString), Map("id" -> (base + 1).toString),
        1700000000L))
      .toDF("tso", "txnId", "op", "schemaName", "tableName", "before",
        "after", "tsoTime")
    rows(10L).write.parquet(s"$srcDir/f1.parquet")
    rows(20L).write.parquet(s"$srcDir/f2.parquet")
    val tables = Map(("app", "t") -> Seq("id"))
    GlobalBinlogStream.startWire(spark, s"$srcDir/*", cdcSchema, tables,
      outDir, s"$root/ckpt", numPartitions = 2).awaitTermination(120000)
    val decoded = graft.sinks.BinlogWire.readBinlogFiles(spark, outDir, tables)
    assert(decoded.count() == 4)
    // every transaction decodes whole: both its rows share the xid
    val byTxn = decoded.select($"xid", $"op")
      .as[(Option[Long], String)].collect().groupBy(_._1)
    byTxn.foreach { case (_, ops) =>
      assert(ops.map(_._2).sorted.toSeq == Seq("INSERT", "UPDATE"))
    }
    // replay from scratch (checkpoint wiped): same file names rewritten,
    // no duplicate log segments — INCLUDING an orphan from a prior
    // attempt whose partitioning differed (replay must supersede the
    // whole batch prefix, not just the file names it happens to rewrite)
    val filesBefore = new java.io.File(outDir).listFiles()
      .map(_.getName).toSet
    val orphan = new java.io.File(outDir, "binlog.000000.000099")
    java.nio.file.Files.write(orphan.toPath,
      graft.sinks.BinlogWire.Magic)
    org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(s"$root/ckpt"))
    GlobalBinlogStream.startWire(spark, s"$srcDir/*", cdcSchema, tables,
      outDir, s"$root/ckpt", numPartitions = 2).awaitTermination(120000)
    assert(new java.io.File(outDir).listFiles().map(_.getName).toSet ==
      filesBefore)
    assert(graft.sinks.BinlogWire.readBinlogFiles(spark, outDir, tables)
      .count() == 4)
  }

}
