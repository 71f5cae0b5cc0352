package graft.jobs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.operators.{Appliers, Filters, TxnApplier}

/** Replica (RPL) apply, end-to-end: consume the change stream, filter by
  * replication config, and apply each micro-batch to the target with
  * last-image merging — SURVEY §3.3's standing query.
  *
  * Reference pipeline: MysqlBinlogExtractor → ReplicaFilter.ignoreEvent →
  * SerialPipeline → MergeApplier (PK dedup + batch REPLACE/DELETE)
  * (polardbx-cdc-rpl/.../extractor/MysqlBinlogExtractor.java:55;
  * filter/ReplicaFilter.java:107-134; applier/MergeApplier.java:46-156).
  *
  * Spark restatement: the micro-batch is the parallel unit; each batch is
  * collapsed to final images per key and upserted set-based. Replays are
  * harmless: the merge is deterministic and the upsert idempotent for a
  * repeated batch (same final images → same target state).
  */
object ReplicaJob {

  /** @param nBuckets 0 = flat target (full rewrite per batch, fine for
    *   small targets); > 0 = key-hash-bucketed target where a batch
    *   rewrites only touched buckets — the shape for targets that outgrow
    *   a per-batch rewrite (see Appliers.applyBatchToBucketedParquet).
    * @param txnPreserving Some(tsoCol) switches the applier to the
    *   transaction-preserving mode (the reference's TransactionApplier
    *   config choice): whole transactions grouped by the commit TSO
    *   column, applied in TSO order against a manifest-versioned target
    *   (operators/TxnApplier) — readers only ever observe
    *   transaction-boundary states, and batch replays are exactly-once by
    *   the committed position. Requires nBuckets > 0; an un-bootstrapped
    *   target starts empty (the full-copy handoff is jobs/HandoffJob). */
  def start(spark: SparkSession, sourceDir: String, sourceSchema: StructType,
      spec: Filters.ReplicaSpec, dbCol: String, tableCol: String,
      keyCols: Seq[String], seqCol: String, opCol: String,
      targetDir: String, checkpointDir: String,
      continuous: Option[String] = None, nBuckets: Int = 0,
      txnPreserving: Option[String] = None,
      txnsPerCommit: Int = 1): StreamingQuery = {
    require(txnPreserving.isEmpty || nBuckets > 0,
      "txn-preserving mode needs a bucketed target (nBuckets > 0)")
    val src = spark.readStream
      .schema(sourceSchema)
      .option("maxFilesPerTrigger", 16)
      .parquet(sourceDir)
    val trigger = continuous match {
      case Some(interval) => Trigger.ProcessingTime(interval)
      case None => Trigger.AvailableNow()
    }
    src.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val filtered = Filters.replicaFilter(batch, spec, dbCol, tableCol)
        if (!filtered.isEmpty) {
          txnPreserving match {
            case Some(tsoCol) =>
              if (TxnApplier.currentCommit(targetDir).isEmpty)
                // no prior full copy: version 1 is the empty state at
                // position 0 and the stream builds the replica from
                // nothing (TxnApplier derives the target's row shape
                // from the first batch)
                TxnApplier.bootstrap(filtered.limit(0), keyCols, targetDir,
                  nBuckets, initialTso = 0L)
              TxnApplier.applyBatch(filtered, keyCols, seqCol, opCol,
                tsoCol, targetDir, nBuckets, txnsPerCommit)
            case None if nBuckets > 0 =>
              Appliers.applyBatchToBucketedParquet(filtered, keyCols, seqCol,
                opCol, targetDir, nBuckets)
            case None =>
              Appliers.applyBatchToParquet(filtered, keyCols, seqCol, opCol,
                targetDir)
          }
        }
        ()
      }
      .start()
  }
}
