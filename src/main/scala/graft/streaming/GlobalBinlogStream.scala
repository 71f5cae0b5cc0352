package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.sinks.OrderedSink

/** The standing Global-Binlog query as a Structured Streaming job
  * (SURVEY §3.1 restatement): file-based change source → filter/reshape →
  * per-batch TSO-ordered idempotent append.
  *
  * Exactly-once: the streaming checkpoint gives at-least-once batch
  * replay; OrderedSink.appendSince makes the replay idempotent by
  * position (the reference's restart-from-TSO seek, MinTSOFilter.java:31 +
  * BinlogFileRecoverBuilder). Trigger.AvailableNow drains everything
  * currently in the source and stops — the batch-backfill mode; pass a
  * processing-time trigger for continuous tailing.
  */
object GlobalBinlogStream {

  def start(spark: SparkSession, sourceDir: String, sourceSchema: StructType,
      tsoCol: String, outDir: String, checkpointDir: String,
      numPartitions: Int, transform: DataFrame => DataFrame = identity,
      continuous: Option[String] = None): StreamingQuery = {
    val src = spark.readStream
      .schema(sourceSchema)
      .option("maxFilesPerTrigger", 16) // bounded micro-batches (backpressure)
      .parquet(sourceDir)
    startFrom(src, tsoCol, outDir, checkpointDir, numPartitions,
      transform, continuous)
  }

  /** The same standing query over ANY streaming source DataFrame —
    * socket/Kafka/MemoryStream ingress normalized through
    * `ChangeEventSource` lands here; the file-dir `start` above is this
    * with a parquet file source. The live-feed counterpart of the
    * reference's DirectLogFetcher→pipeline wiring: transport is the
    * source's concern, ordering and exactly-once are the sink's. */
  def startFrom(src: DataFrame, tsoCol: String, outDir: String,
      checkpointDir: String, numPartitions: Int,
      transform: DataFrame => DataFrame = identity,
      continuous: Option[String] = None): StreamingQuery = {
    val trigger = continuous match {
      case Some(interval) => Trigger.ProcessingTime(interval)
      case None => Trigger.AvailableNow()
    }
    transform(src).writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        OrderedSink.appendSince(batch, tsoCol, outDir, numPartitions)
      }
      .start()
  }

  /** The standing query with the MYSQL WIRE sink: each micro-batch's
    * change rows (string-image CDC shape) become transaction-framed
    * binlog files named `binlog.<batch>.<partition>` — file rotation
    * over time IS the batch sequence, and name order preserves the total
    * order (the reference's LogFileGenerator rotation). Idempotent under
    * batch replay: a replayed batch rewrites the same file names with
    * the same bytes — no duplicate log segments, the file IS the commit.
    * `BinlogWire.readBinlogFiles(outDir)` reads the log back. */
  def startWire(spark: SparkSession, sourceDir: String,
      sourceSchema: StructType,
      tableCols: Map[(String, String), Seq[String]], outDir: String,
      checkpointDir: String, numPartitions: Int,
      transform: DataFrame => DataFrame = identity,
      continuous: Option[String] = None,
      gtidSid: Option[java.util.UUID] = None): StreamingQuery = {
    // same pad upgrade as CdcBinlog: a pre-upgrade outDir holds 6-digit
    // batch pads whose mixed coexistence with the wide pad breaks
    // name-order-is-TSO-order — migrate before the query starts
    CdcBinlog.migrateLegacyBatchPads(outDir)
    val src = spark.readStream
      .schema(sourceSchema)
      .option("maxFilesPerTrigger", 16)
      .parquet(sourceDir)
    val trigger = continuous match {
      case Some(interval) => Trigger.ProcessingTime(interval)
      case None => Trigger.AvailableNow()
    }
    transform(src).writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // replay idempotence is PREFIX-scoped, not file-scoped: the pad
        // policy and the dual-width supersede-delete are CdcBinlog's
        // shared helpers — one owner, so an edit to either lands in
        // both wire-file pipelines (the r16/r17 divergence tax)
        val prefix = CdcBinlog.batchFilePrefix(batchId,
          "GlobalBinlogStream")
        CdcBinlog.deleteBatchFiles(outDir, batchId)
        // wire order is COMMIT order: key each txn by its commit TSO
        // (max tso over the txn), keep txns whole (range boundaries only
        // between (commitTso, txnId) groups), order rows by tso within
        val wtxn = org.apache.spark.sql.expressions.Window
          .partitionBy(col("txnId"))
        val keyed = batch.withColumn("__commit_tso",
          max(col("tso")).over(wtxn))
        val ordered = graft.operators.MergeSort.sortedRunsGrouped(
          keyed, numPartitions, Seq("__commit_tso", "txnId"), Seq("tso"))
          .drop("__commit_tso")
        graft.sinks.BinlogWire.writeChangeStreamBinlogFiles(
          ordered, tableCols, outDir,
          filePrefix = prefix, gtidSid = gtidSid)
        ()
      }
      .start()
  }
}
