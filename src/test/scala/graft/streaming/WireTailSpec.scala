package graft.streaming

import org.apache.spark.sql.streaming.Trigger
import graft.SparkSpec
import graft.sinks.BinlogWire

/** `BinlogWire.tailBinlogFiles` — the streaming consumer over the wire
  * log (dump service → downstream replica). Discovery/exactly-once come
  * from the checkpointed file source; decode is the same bounded-memory
  * parseStream path as the batch reader. */
class WireTailSpec extends SparkSpec {
  import spark.implicits._

  private val tableCols = Map(("app", "t1") -> Seq("id", "v"))

  private def writeSegment(dir: String, prefix: String, tsoBase: Long,
      txnId: Long): Unit = {
    val ev = Seq(
      (tsoBase, txnId, "INSERT", "app", "t1",
        Map.empty[String, String], Map("id" -> s"$txnId", "v" -> "x"),
        1700000000L),
      (tsoBase + 1, txnId, "UPDATE", "app", "t1",
        Map("id" -> s"$txnId", "v" -> "x"),
        Map("id" -> s"$txnId", "v" -> "y"), 1700000000L))
      .toDF("tso", "txnId", "op", "schemaName", "tableName", "before",
        "after", "tsoTime")
      .coalesce(1).sortWithinPartitions("tso")
    BinlogWire.writeChangeStreamBinlogFiles(ev, tableCols, dir,
      filePrefix = prefix)
  }

  private def drainTail(dir: String, checkpoint: String): Seq[(String, String,
      Long)] = {
    val got = scala.collection.mutable.ArrayBuffer
      .empty[(String, String, Long)]
    val q = BinlogWire.tailBinlogFiles(spark, dir, tableCols)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        got ++= batch.select($"log_file", $"op", $"tso")
          .as[(String, String, Option[Long])].collect()
          .map(r => (r._1, r._2, r._3.getOrElse(-1L)))
        ()
      }
      .start()
    q.awaitTermination()
    got.toSeq.sortBy(t => (t._1, t._3))
  }

  test("tail decodes the wire stream and resumes at the first unseen file") {
    val dir = java.nio.file.Files.createTempDirectory("graft-wiretail").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-wiretail-ck").toString
    writeSegment(dir, "binlog.000000.", tsoBase = 100L, txnId = 7L)

    val first = drainTail(dir, ckpt)
    // matches the batch reader row-for-row
    val batchRows = BinlogWire.readBinlogFiles(spark, dir, tableCols)
      .select($"log_file", $"op", $"tso")
      .as[(String, String, Option[Long])].collect().toSeq
      .map(r => (r._1, r._2, r._3.getOrElse(-1L))).sortBy(t => (t._1, t._3))
    assert(first == batchRows)
    assert(first.map(_._2) == Seq("INSERT", "UPDATE"))

    // a new segment lands; the SAME checkpoint sees only the new file
    writeSegment(dir, "binlog.000001.", tsoBase = 200L, txnId = 8L)
    val second = drainTail(dir, ckpt)
    assert(second.map(_._1).forall(_.startsWith("binlog.000001.")))
    // one CTS mark per txn: both rows carry txn 8's commit tso
    assert(second.map(_._3) == Seq(200L, 200L))
    assert(second.map(_._2).sorted == Seq("INSERT", "UPDATE"))

    // nothing new → the tail drains empty (no reprocessing)
    assert(drainTail(dir, ckpt).isEmpty)
  }
}
