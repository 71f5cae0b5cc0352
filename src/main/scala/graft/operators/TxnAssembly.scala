package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Transaction assembly: group the per-event stream into per-transaction
  * envelopes, events ordered by the intra-transaction trace id.
  *
  * Reference semantics: Sorter buffers events per xid until COMMIT/ROLLBACK
  * (polardbx-cdc-task/.../extractor/sort/Sorter.java:43-220),
  * TransactionBufferEventFilter accumulates them into a TxnBuffer
  * (storage/TxnBuffer.java:56); TxnItem.traceId is the intra-txn order key
  * (TxnStream.proto:148-170). XA participants sharing a commit TSO unify in
  * MergeBarrier (task/.../merge/MergeBarrier.java:51-99).
  *
  * Spark mapping: one hash aggregation keyed by the transaction id — events
  * shuffle once on txnId; `sort_array(collect_list(struct(...)))` restores
  * intra-transaction order without a global sort. Rolled-back transactions
  * are dropped by a commit-set semi join, mirroring Sorter discarding
  * non-committed xids.
  */
object TxnAssembly {

  /** Assemble events into transaction envelopes:
    * (txnId, tso=max event tso, n, events: array<struct(seq, payload...)>). */
  def assemble(df: DataFrame, txnCol: String, traceCol: String,
      payloadCols: Seq[String]): DataFrame = {
    val item = struct((traceCol +: payloadCols).map(col): _*)
    // array_sort with an explicit trace comparator: payloads may contain
    // maps, which sort_array's struct ordering can't compare.
    val byTrace = (l: Column, r: Column) =>
      when(l.getField(traceCol) < r.getField(traceCol), -1)
        .when(l.getField(traceCol) > r.getField(traceCol), 1)
        .otherwise(0)
    df.groupBy(col(txnCol))
      .agg(
        count(lit(1)).as("n"),
        array_sort(collect_list(item), byTrace).as("events"))
  }

  /** Drop transactions whose commit marker never arrived (rollback / lost
    * commit — Sorter skip-whitelist semantics): semi join against the set
    * of committed txn ids. */
  def committedOnly(events: DataFrame, commits: DataFrame, txnCol: String): DataFrame =
    events.join(commits.select(col(txnCol)).distinct(), Seq(txnCol), "left_semi")

  /** XA fusion: partial transactions from different sources that share one
    * commit TSO become one logical transaction (MergeBarrier semantics) —
    * a group-merge on the actual TSO, no self-join needed. */
  def fuseXa(tokens: DataFrame, tsoCol: String, partitionCol: String): DataFrame =
    tokens.groupBy(col(tsoCol))
      .agg(
        collect_set(col(partitionCol)).as("parties"),
        count(lit(1)).as("n_parts"))
}
