package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sinks.BinlogWire

/** Wire → wire relay: the dumper master → slave hop (the reference's
  * dumper sync path: a slave tails the master's binlog stream and
  * re-serves an equivalent file set) composed from existing pieces —
  * `tailBinlogFiles` (checkpointed consume) → foreachBatch →
  * `writeChangeStreamBinlogFiles` (framed re-emit). The relayed set
  * must decode to the same change rows with the same transaction
  * grouping, and a late-arriving upstream segment must flow through on
  * restart without duplicating earlier relayed output. */
class WireRelaySpec extends SparkSpec {
  import spark.implicits._

  private val tableCols = Map(("app", "t") -> Seq("id", "v"))

  private def writeUpstream(dir: String, prefix: String, tsos: Seq[Long]): Unit = {
    val ev = tsos.flatMap { t =>
      Seq((t, t, "INSERT", "app", "t", Map.empty[String, String],
        Map("id" -> s"$t", "v" -> s"v$t"), 1700000000L),
        (t, t, "UPDATE", "app", "t", Map("id" -> s"$t", "v" -> s"v$t"),
          Map("id" -> s"$t", "v" -> s"w$t"), 1700000000L))
    }.toDF("tso", "txnId", "op", "schemaName", "tableName", "before",
      "after", "tsoTime")
    BinlogWire.writeChangeStreamBinlogFiles(
      ev.coalesce(1).sortWithinPartitions("tso"), tableCols, dir,
      filePrefix = prefix, checksummed = true)
  }

  private def relayOnce(upstream: String, downstream: String,
      ckpt: String): Unit = {
    val q = BinlogWire.tailBinlogFiles(spark, upstream, tableCols)
      .writeStream
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, bid: Long) =>
        val ev = batch.select(col("tso"), col("xid").as("txnId"), col("op"),
          col("schemaName"), col("tableName"), col("before"), col("after"),
          lit(1700000000L).as("tsoTime"))
        BinlogWire.writeChangeStreamBinlogFiles(
          ev.coalesce(1).sortWithinPartitions("tso"), tableCols, downstream,
          filePrefix = f"binlog.$bid%06d.", checksummed = true)
        ()
      }
      .start()
    q.awaitTermination()
  }

  private def decoded(dir: String): Set[(Long, Long, String, String, String)] =
    BinlogWire.readBinlogFiles(spark, dir, tableCols)
      .select($"tso", $"xid", $"op",
        element_at($"after", "id").as("id"), element_at($"after", "v").as("v"))
      .as[(Long, Long, String, String, String)].collect().toSet

  test("relayed wire decodes to the upstream rows; restart is incremental") {
    val root = java.nio.file.Files.createTempDirectory("graft-relay")
    val up = s"$root/up"; val down = s"$root/down"; val ckpt = s"$root/ckpt"

    writeUpstream(up, "binlog.a.", Seq(1L, 2L, 3L))
    relayOnce(up, down, ckpt)
    assert(decoded(down) == decoded(up))

    // a late upstream segment relays on restart; earlier output intact
    writeUpstream(up, "binlog.b.", Seq(4L, 5L))
    relayOnce(up, down, ckpt)
    assert(decoded(down) == decoded(up))
    // txn boundaries preserved: one XID per upstream transaction
    val xids = BinlogWire.readBinlogFiles(spark, down, tableCols)
      .groupBy($"xid").count().as[(Long, Long)].collect().toMap
    assert(xids.keySet == Set(1L, 2L, 3L, 4L, 5L) &&
      xids.values.forall(_ == 2L))
  }
}
