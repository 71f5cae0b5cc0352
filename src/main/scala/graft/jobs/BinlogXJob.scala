package graft.jobs

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

import graft.operators.StreamHash

/** Binlog-X: fan the ordered change stream out into M parallel logical
  * streams, each independently ordered, with DDL/heartbeat markers
  * replicated to every stream.
  *
  * Reference pipeline (SURVEY §3.2): RelayLogEventTransmitter hashes each
  * event to a stream (HashConfig.getStreamSeq, polardbx-cdc-task/.../
  * transmit/relay/HashConfig.java:208-265), relay storage per stream, M
  * final tasks + dumpers; DDL broadcast via the TxnTag path.
  *
  * Spark restatement: ONE repartition by the stream expression IS the
  * relay hop; per-stream order restored by a local sort; output is
  * partitioned by stream directory so each logical stream is an
  * independently consumable ordered log.
  */
object BinlogXJob {

  /** Split the stream: data rows hashed to streams, marker rows (DDL /
    * heartbeat) broadcast to all M streams; each stream locally ordered
    * by tso. Output columns: stream + input columns. */
  def fanOut(events: DataFrame, m: Int, level: StreamHash.HashLevel,
      dbCol: String, tableCol: String, pkCols: Seq[String], tsoCol: String,
      isMarker: org.apache.spark.sql.Column,
      overrides: Map[String, Int] = Map.empty): DataFrame = {
    val data = events.filter(!isMarker)
      .withColumn("stream", StreamHash.streamSeqWithOverrides(
        level, m, col(dbCol), col(tableCol), pkCols.map(col), overrides))
    val markers = StreamHash.broadcastToAllStreams(events.filter(isMarker), m)
    data.unionByName(markers)
      .repartition(m, col("stream"))
      .sortWithinPartitions(col("stream"), col(tsoCol))
  }

  /** Write each logical stream as its own ordered directory
    * (`out/stream=<i>/`), the per-stream dumper sink. NO repartition
    * here: `fanOut` already clusters one stream per task AND sorts by
    * (stream, tso) — re-shuffling would both multiply writers and
    * destroy the per-stream tso order the directory contract promises
    * (the dynamic write only re-sorts by the partition column). */
  def writeStreams(fannedOut: DataFrame, outDir: String): Unit =
    fannedOut.write.mode(SaveMode.Overwrite)
      .partitionBy("stream").parquet(outDir)

  /** The WIRE form of the per-stream dumper: each logical stream becomes
    * its own rotated MySQL binlog file set under `out/stream=<i>/` — the
    * reference's Binlog-X mode runs one dumper (one binlog file
    * sequence) per stream, and replicated markers (DDL) appear in every
    * stream's log (SURVEY §3.2 / the TxnTag broadcast). Each stream's
    * files are transaction-framed in commit order, rotate-chained, and
    * independently consumable by `BinlogWire.readBinlogFiles`. */
  def writeStreamWire(fannedOut: DataFrame, m: Int,
      tableCols: Map[(String, String), Seq[String]], outDir: String,
      filesPerStream: Int = 1,
      gtidSid: Option[java.util.UUID] = None): Unit = {
    val wtxn = org.apache.spark.sql.expressions.Window
      .partitionBy(col("txnId"))
    (0 until m).foreach { stream =>
      // wire order is COMMIT order per stream: txns keyed by commit TSO,
      // kept whole per file, rows tso-ordered within
      val keyed = fannedOut.filter(col("stream") === stream).drop("stream")
        .withColumn("__commit_tso", max(col("tso")).over(wtxn))
      val ordered = graft.operators.MergeSort.sortedRunsGrouped(
        keyed, filesPerStream, Seq("__commit_tso", "txnId"), Seq("tso"))
        .drop("__commit_tso")
      graft.sinks.BinlogWire.writeChangeStreamBinlogFiles(ordered,
        tableCols, s"$outDir/stream=$stream", gtidSid = gtidSid,
        rotateChain = true)
    }
  }

  /** Continuous form: fan each micro-batch out and append per-stream,
    * idempotently by position per stream (the relay-store + per-stream
    * dumper loop of SURVEY §3.2 under one streaming query). */
  def startStream(spark: org.apache.spark.sql.SparkSession, sourceDir: String,
      sourceSchema: org.apache.spark.sql.types.StructType, m: Int,
      level: StreamHash.HashLevel, dbCol: String, tableCol: String,
      pkCols: Seq[String], tsoCol: String,
      isMarker: org.apache.spark.sql.Column, outDir: String,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery = {
    val src = spark.readStream.schema(sourceSchema)
      .option("maxFilesPerTrigger", 16).parquet(sourceDir)
    src.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // materialize the fan-out once; every stream slice reads the cache
        val fanned = fanOut(batch, m, level, dbCol, tableCol, pkCols,
          tsoCol, isMarker).persist()
        try {
          (0 until m).foreach { stream =>
            graft.sinks.OrderedSink.appendSince(
              fanned.filter(col("stream") === stream).drop("stream"),
              tsoCol, s"$outDir/stream=$stream", 1)
          }
        } finally fanned.unpersist()
      }
      .start()
  }
}
