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
  * grouping, a late-arriving upstream segment must flow through on
  * restart without duplicating earlier relayed output, and the relayed
  * event headers must carry the SOURCE timestamps and server id —
  * byte-faithful relay, never re-stamped (the reference's relay stores
  * and re-serves the original bytes). */
class WireRelaySpec extends SparkSpec {
  import spark.implicits._

  private val tableCols = Map(("app", "t") -> Seq("id", "v"))
  private val srcServerId = 42L

  private def writeUpstream(dir: String, prefix: String, tsos: Seq[Long]): Unit = {
    val ev = tsos.flatMap { t =>
      // distinct per-txn timestamps: a re-stamping relay would be caught
      Seq((t, t, "INSERT", "app", "t", Map.empty[String, String],
        Map("id" -> s"$t", "v" -> s"v$t"), 1700000000L + t),
        (t, t, "UPDATE", "app", "t", Map("id" -> s"$t", "v" -> s"v$t"),
          Map("id" -> s"$t", "v" -> s"w$t"), 1700000000L + t))
    }.toDF("tso", "txnId", "op", "schemaName", "tableName", "before",
      "after", "tsoTime")
    BinlogWire.writeChangeStreamBinlogFiles(
      ev.coalesce(1).sortWithinPartitions("tso"), tableCols, dir,
      filePrefix = prefix, checksummed = true, serverId = srcServerId)
  }

  private def relayOnce(upstream: String, downstream: String,
      ckpt: String): Unit = {
    val q = BinlogWire.tailBinlogFiles(spark, upstream, tableCols)
      .writeStream
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, bid: Long) =>
        // source header stamps travel through: ts → tsoTime,
        // server_id → per-event serverIdCol — nothing is regenerated
        val ev = batch.select(col("tso"), col("xid").as("txnId"), col("op"),
          col("schemaName"), col("tableName"), col("before"), col("after"),
          col("ts").as("tsoTime"), col("server_id"))
        BinlogWire.writeChangeStreamBinlogFiles(
          ev.coalesce(1).sortWithinPartitions("tso"), tableCols, downstream,
          filePrefix = f"binlog.$bid%06d.", checksummed = true,
          serverIdCol = Some("server_id"))
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

  /** All row-bearing frame headers in a wire dir, as (typeCode,
    * timestamp, serverId) multiset — the relay-fidelity witness. */
  private def rowEventHeaders(dir: String): Seq[(Int, Long, Long)] = {
    import BinlogWire._
    val root = new java.io.File(dir)
    root.listFiles.filter(_.getName.startsWith("binlog.")).sortBy(_.getName)
      .flatMap(f => parseFile(java.nio.file.Files.readAllBytes(f.toPath)))
      .filter(fr => fr.typeCode == WriteRowsEventV2 ||
        fr.typeCode == UpdateRowsEventV2 || fr.typeCode == RowsQueryEvent)
      .map(fr => (fr.typeCode, fr.timestamp, fr.serverId)).toSeq.sorted
  }

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

    // byte-faithful headers: relayed row/mark events carry the SOURCE
    // timestamps (distinct per txn) and the source server id — proof the
    // relay re-emits the original stamps instead of regenerating them
    val upHeaders = rowEventHeaders(up)
    assert(upHeaders == rowEventHeaders(down))
    assert(upHeaders.map(_._2).distinct.size >= 5) // per-txn distinct ts
    assert(upHeaders.forall(_._3 == srcServerId))
  }
}
