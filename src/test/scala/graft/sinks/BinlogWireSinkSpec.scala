package graft.sinks

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sinks.BinlogWire._

/** The DataFrame→binlog-file sink: partition-indexed rotated files whose
  * frames parse back in order. */
class BinlogWireSinkSpec extends SparkSpec {
  import spark.implicits._

  test("ordered frame encodes to rotated files that parse back in order") {
    val dir = java.nio.file.Files.createTempDirectory("graft-wire").toString
    val specs = Seq(ColSpec("id", LongLong), ColSpec("v", VarChar(64)),
      ColSpec("amt", NewDecimal(12, 2)))
    val df = (1L to 100L).map(i =>
        (i, s"payload-$i", BigDecimal(i * 100 + i).setScale(2) / 100,
          if (i % 10 == 0) "DELETE" else "INSERT", 1700000000L + i))
      .toDF("id", "v", "amt", "op", "ts")
    val ordered = graft.operators.MergeSort.sortedRuns(df, 4, Seq("id"))
    val n = writeBinlogFiles(ordered, specs, "app", "t", "op", "ts", dir)
    assert(n == 4) // one file per sorted-run partition

    // every file: magic + FDE + TABLE_MAP + rows events; ids inside are
    // ordered and the union is exactly the input
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("binlog.")).sortBy(_.getName)
    assert(files.length == 4)
    val allIds = scala.collection.mutable.ArrayBuffer.empty[Long]
    var deletes = 0
    files.foreach { f =>
      val frames = parseFile(java.nio.file.Files.readAllBytes(f.toPath))
      assert(frames.head._1 == FormatDescriptionEvent)
      assert(frames(1)._1 == TableMapEvent)
      val fileIds = scala.collection.mutable.ArrayBuffer.empty[Long]
      frames.drop(2).foreach { case (tc, _, body) =>
        assert(tc == WriteRowsEventV2 || tc == DeleteRowsEventV2)
        if (tc == DeleteRowsEventV2) deletes += 1
        // decode each row image's id cell (first col, after the
        // 1-byte null bitmap for 3 columns)
        var i = 6 + 2 + 2 + 1 + 1 // table_id, flags, extra, colcount lenenc, present bitmap
        while (i < body.length) {
          i += 1 // null bitmap (3 cols → 1 byte; no nulls in this data)
          var id = 0L
          (0 until 8).foreach(k => id |= (body(i + k) & 0xFFL) << (8 * k))
          fileIds += id
          i += 8 // id cell
          i += 1 + (body(i) & 0xFF) // varchar: 1-byte len + bytes
          i += 6 // DECIMAL(12,2): 4+1 int bytes? (10 int digits → 1+4) + 1 frac byte
        }
      }
      assert(fileIds == fileIds.sorted, s"${f.getName} ids out of order")
      allIds ++= fileIds
    }
    assert(allIds.sorted == (1L to 100L))
    assert(deletes >= 1) // delete runs framed as DELETE_ROWS events
  }
}
