package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** K-way ordered merge and total-order output.
  *
  * Reference semantics: LogEventMerger merges N per-source token streams
  * into one TSO-ordered stream through a bounded-fan-in merge tree
  * (polardbx-cdc-task/.../merge/LogEventMerger.java:54,125-168;
  * MergeController.java:28-81; MergeGroupFactory.java:33-90), with
  * disorder detection (LogEventMerger.java:136-141). The dumper re-merges
  * multi-stream relays the same way (dumper/.../BinlogKWayMerger.java:63).
  *
  * Spark mapping: union is free (no shuffle — partitions concatenate);
  * global order comes from ONE range-repartition on the order key followed
  * by a per-partition sort. Spark's range partitioner samples the key
  * distribution, so at 100 TB the output is still N balanced sorted runs —
  * the total order lives in the (partitionIndex, rowOrder) pair, exactly
  * like the reference's rotated binlog file sequence. Never coalesce(1):
  * a single writer is only needed if a single physical file is required,
  * and then only as the final stage.
  */
object MergeSort {

  /** Order-preserving union of N streams; columns matched by name. */
  def unionAll(dfs: Seq[DataFrame]): DataFrame =
    dfs.reduce(_.unionByName(_))

  /** K-way merge: union + global range sort on the order key. */
  def kWayMerge(dfs: Seq[DataFrame], orderCols: Seq[String]): DataFrame =
    unionAll(dfs).orderBy(orderCols.map(col): _*)

  /** Sorted-run form for huge outputs: range-partition by the key, sort
    * within partitions. Same total order as orderBy (Spark's orderBy IS
    * rangepartition+local sort) but made explicit so callers can attach
    * a partition-indexed sink (file-per-partition with monotonic names,
    * the binlog-file-rotation analog). */
  def sortedRuns(df: DataFrame, numPartitions: Int, orderCols: Seq[String]): DataFrame =
    df.repartitionByRange(numPartitions, orderCols.map(col): _*)
      .sortWithinPartitions(orderCols.map(col): _*)

  /** Sorted runs that keep every GROUP whole: range-partition on the
    * group key(s) alone (equal keys always land together — a range
    * boundary can only fall between groups), then fully order within
    * partitions. The wire-dumper shape: a transaction must never split
    * across binlog files (MySQL rotates only at transaction boundaries),
    * while plain sortedRuns on (txn, seq) may cut between two rows of
    * one txn. Pass the COMMIT-ORDER key first (e.g. the txn's commit
    * TSO, then txnId): file/name order then preserves commit order
    * across the log, not arrival or id order. */
  def sortedRunsGrouped(df: DataFrame, numPartitions: Int,
      groupCols: Seq[String], orderCols: Seq[String]): DataFrame =
    df.repartitionByRange(numPartitions, groupCols.map(col): _*)
      .sortWithinPartitions((groupCols ++ orderCols).map(col): _*)

  /** Disorder detection over an allegedly-ordered frame (LogEventMerger's
    * "monotonia" check :136-141): count of positions where the key moves
    * backwards. 0 = totally ordered. Windows over the whole frame are a
    * test-only tool; at scale run it per sorted run. */
  def disorderCount(df: DataFrame, orderCol: String): Long = {
    import org.apache.spark.sql.expressions.Window
    // Capture the frame's CURRENT physical row order first —
    // monotonically_increasing_id is (partitionIndex << 33) + rowInPartition,
    // so lag over it observes rows as they stand, not re-sorted.
    val withIdx = df.select(col(orderCol))
      .withColumn("__idx", monotonically_increasing_id())
    val w = Window.orderBy(col("__idx"))
    withIdx
      .withColumn("__prev", lag(col(orderCol), 1).over(w))
      .filter(col("__prev").isNotNull && col("__prev") > col(orderCol))
      .count()
  }

  /** Total-order write: sorted runs written with partition-indexed
    * monotonic file naming, so readers concatenating files in name order
    * observe the global order (binlog-file analog of
    * dumper/.../LogFileGenerator.java:121 rotation). */
  def totalOrderWrite(df: DataFrame, numPartitions: Int, orderCols: Seq[String],
      outDir: String): Unit =
    sortedRuns(df, numPartitions, orderCols)
      .write.mode("overwrite").parquet(outDir)
}
