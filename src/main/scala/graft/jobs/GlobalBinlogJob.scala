package graft.jobs

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{MergeSort, TxnAssembly}
import graft.streaming.Pipeline

/** The Global-Binlog standing query, composed end-to-end in batch form
  * (SURVEY §3.1): merge N per-DN change streams into one totally-ordered,
  * transaction-consistent logical stream.
  *
  * Stages (reference analog in parens):
  *  1. order-preserving union of the per-DN streams (MergeSource fan-in)
  *  2. event-type accept + committed-transaction gate (EventAcceptFilter,
  *     Sorter discarding uncommitted xids)
  *  3. per-transaction assembly with trace order (TxnBuffer)
  *  4. XA fusion of same-commit-TSO participants (MergeBarrier)
  *  5. heartbeat-window completeness gate — only windows every source
  *     reported are released (HeartBeatWindow / LogEventMerger alignment)
  *  6. global TSO order (MergeController k-way merge → one range sort)
  *
  * Every stage is one declarative hop: union is shuffle-free, the gate is
  * a broadcast semi join on completed windows, and total order is a
  * single range-repartition at the very end — the plan a 1000-executor
  * cluster wants.
  */
object GlobalBinlogJob {

  /** @param sources  per-DN frames in the ChangeEvent envelope
    * @param windowLen heartbeat window length (e.g. "1 minute")
    * @return one row per logical transaction, TSO-ordered, with parties
    *         and trace-ordered events; only transactions inside complete
    *         heartbeat windows are released. */
  def run(sources: Seq[DataFrame], windowLen: String = "1 minute"): DataFrame = {
    val expectedSources = sources.size
    val all = MergeSort.unionAll(sources)

    // heartbeat stream drives the completeness gate
    val heartbeats = all.filter(col("op") === "HEARTBEAT")
    val completeWindows = Pipeline.heartbeatWindows(
        heartbeats, "tsoTime", "partitionId", windowLen, expectedSources)
      .filter(col("complete"))
      .select(col("w.start").as("w_start"), col("w.end").as("w_end"))

    // data path: accepted ops, committed transactions only
    val data = all.filter(col("op").isin("INSERT", "UPDATE", "DELETE", "COMMIT"))
    val commits = data.filter(col("op") === "COMMIT")
      .select(col("txnId"), col("tso").as("commit_tso"),
        col("tsoTime").as("commit_time"), col("partitionId"))
    val events = TxnAssembly.committedOnly(
      data.filter(col("op") =!= "COMMIT"), commits, "txnId")

    // per-transaction assembly (intra-txn trace order)
    val envelopes = TxnAssembly.assemble(events, "txnId", "traceId",
        Seq("op", "tableName", "after"))
      .join(commits.groupBy(col("txnId")).agg(
        max(col("commit_tso")).as("commit_tso"),
        max(col("commit_time")).as("commit_time")), Seq("txnId"))

    // XA fusion: participants sharing one commit TSO become one logical txn
    val byTrace = (l: org.apache.spark.sql.Column, r: org.apache.spark.sql.Column) =>
      when(l.getField("traceId") < r.getField("traceId"), -1)
        .when(l.getField("traceId") > r.getField("traceId"), 1)
        .otherwise(0)
    val fused = envelopes
      .join(commits.select(col("txnId"), col("partitionId")).distinct(), Seq("txnId"))
      .groupBy(col("commit_tso"))
      .agg(
        max(col("commit_time")).as("commit_time"),
        collect_set(col("partitionId")).as("parties"),
        sum(col("n")).as("n_events"),
        array_sort(flatten(collect_list(col("events"))), byTrace).as("events"))

    // release only transactions inside complete heartbeat windows
    val gated = fused.join(broadcast(completeWindows),
        col("commit_time") >= col("w_start") && col("commit_time") < col("w_end"),
        "left_semi")

    // total order: one range sort on the commit TSO
    gated.orderBy(col("commit_tso"))
  }
}
