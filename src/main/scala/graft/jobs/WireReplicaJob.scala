package graft.jobs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.TxnApplier
import graft.sinks.BinlogWire

/** The standing replica fed by the WIRE, not by a parquet change stream:
  * tail a directory of MySQL binlog files (the dump service's output),
  * decode each micro-batch through the incremental parser, and replay it
  * through the transaction-preserving applier — the reference's full
  * dumper → replica hop (DumperSlave serving MysqlBinlogExtractor →
  * TransactionApplier, polardbx-cdc-rpl/.../extractor/
  * MysqlBinlogExtractor.java:55, applier/TransactionApplier.java:50-87)
  * as one Spark standing query over the engine's own wire format.
  *
  * Exactly-once across restarts composes from two independent gates:
  * file DISCOVERY is the checkpointed binaryFile source (a restart
  * resumes at the first unseen wire file), and APPLY is `TxnApplier`'s
  * committed position (a replayed or half-applied micro-batch skips
  * every transaction at or below the target's last committed TSO). A
  * crash at any point — mid-decode, mid-apply, between batch and
  * checkpoint commit — lands on a transaction boundary some source
  * commit produced.
  *
  * PRODUCER CONTRACT — one transaction per wire file: the apply gate
  * above makes a txn split across two files UNSAFE (if
  * `maxFilesPerTrigger` lands the halves in different triggers, the
  * first half commits and advances the gate, and the second half
  * replays at-or-below it and is silently dropped). Wire producers must
  * keep txns whole per file with txn-grouped range partitioning
  * (`MergeSort.sortedRunsGrouped` on the tso / (commitTso, txnId) key —
  * equal keys never split across range partitions); the writers
  * enforce it and fail the write loudly on a split or interleaved txn
  * (`BinlogWire.writeTxnFramedBinlogFiles` mark-range check,
  * `writeChangeStreamBinlogFiles` file-boundary txn check). The same
  * gate also requires files to ARRIVE in rotation order: the file
  * source delivers by modification time, so the writers stamp each
  * file's mtime monotonic with its name — a producer writing wire
  * files by other means must preserve that property.
  */
object WireReplicaJob {

  /** Start the wire replica for ONE replicated table.
    *
    * @param colTypes ordered (column, Spark SQL type) pairs for the
    *   decoded string images — the replica's row shape. Must include
    *   `keyCols` and `seqCol`.
    * @param tableCols the wire TABLE_MAP column-name registry passed to
    *   the decoder (schema/table → column names), as written by the
    *   encoding sink.
    * @param fromTso dump-from-TSO start cursor: replay only transactions
    *   with tso > fromTso. `BinlogCatalog.seekTso` locates the start
    *   FILE (files wholly below it are listed but never opened — decode
    *   cost is O(suffix)), and the apply gate's initial committed
    *   position is set to fromTso so the seek file's own prefix (txns at
    *   or below the cursor) skips — the reference's
    *   SearchTsoEventHandleV2 → dump hop. File granularity prunes I/O;
    *   the tso gate is the exact boundary (decode is file-scoped because
    *   TABLE_MAP state is declared per file).
    */
  def start(spark: SparkSession, wireDir: String,
      tableCols: Map[(String, String), Seq[String]],
      schemaName: String, tableName: String,
      colTypes: Seq[(String, String)], keyCols: Seq[String],
      seqCol: String, targetDir: String, checkpointDir: String,
      nBuckets: Int, txnsPerCommit: Int = 8,
      continuous: Option[String] = None,
      maxFilesPerTrigger: Int = 16,
      fromTso: Option[Long] = None): StreamingQuery = {
    require(colTypes.map(_._1).toSet.intersect(keyCols.toSet) == keyCols.toSet
        && colTypes.exists(_._1 == seqCol),
      "colTypes must cover keyCols and seqCol")
    val startFile = fromTso.map { t =>
      graft.sinks.BinlogCatalog.seekTso(spark, wireDir, t)._1
    }.filter(_.nonEmpty)
    val decoded = BinlogWire.tailBinlogFiles(spark, wireDir, tableCols,
      maxFilesPerTrigger, minFileName = startFile)
    val trigger = continuous match {
      case Some(interval) => Trigger.ProcessingTime(interval)
      case None => Trigger.AvailableNow()
    }
    decoded.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val typed = shape(batch, schemaName, tableName, colTypes)
        // no isEmpty pre-check: it would decode every wire file a first
        // time just to count; bootstrap is schema-only (limit 0) and
        // applyBatch's own staged probe short-circuits an empty batch
        if (TxnApplier.currentCommit(targetDir).isEmpty)
          TxnApplier.bootstrap(typed.limit(0).drop("op", "tso"),
            keyCols, targetDir, nBuckets,
            initialTso = fromTso.getOrElse(0L))
        TxnApplier.applyBatch(typed, keyCols, seqCol, "op", "tso",
          targetDir, nBuckets, txnsPerCommit)
        ()
      }
      .start()
  }

  /** Decoded wire rows → the replica's typed row shape: one table's row
    * events, each string image cast per `colTypes`. DELETE rows carry
    * their values in the BEFORE image (the after side is empty on the
    * wire), so the effective image picks by op — the applier needs the
    * key columns populated to erase the row. */
  def shape(decoded: DataFrame, schemaName: String, tableName: String,
      colTypes: Seq[(String, String)]): DataFrame = {
    val img = when(col("op") === "DELETE", col("before"))
      .otherwise(col("after"))
    decoded
      .filter(col("schemaName") === schemaName &&
        col("tableName") === tableName &&
        col("op").isin("INSERT", "UPDATE", "DELETE"))
      .select(colTypes.map { case (n, t) =>
        element_at(img, n).cast(t).as(n)
      } ++ Seq(col("op"), col("tso")): _*)
  }
}
