package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

import graft.operators.MergeSort

/** Ordered sinks: the binlog-file analog.
  *
  * Reference semantics: LogFileGenerator consumes the ordered token/item
  * stream and writes rotated binlog files, framing each transaction
  * between generated BEGIN/COMMIT events and stamping a TSO mark
  * (polardbx-cdc-dumper/.../logfile/LogFileGenerator.java:121-975;
  * EventGenerator.makeBegin:71/makeCommit:109). ParallelWriter encodes in
  * parallel but commits serially ordered (parallel/ParallelWriter.java:48).
  *
  * Spark restatement: global order = ONE range-repartition on the TSO key;
  * "files rotated in order" = partition-indexed output files — readers
  * that concatenate part files in index order observe the total order.
  * Parallel-encode/serial-commit is Spark's native execution model
  * (parallel tasks, driver-side ordered commit protocol). Never
  * coalesce(1): a 100 TB log writes as thousands of ordered runs.
  */
object OrderedSink {

  /** Frame a change-event stream into transaction envelopes and write them
    * in TSO order: one row per transaction with its ordered events —
    * the BEGIN...COMMIT framing as nested data. Returns the framed frame
    * (also written if outDir is given). */
  def writeTxnFramed(events: DataFrame, txnCol: String, tsoCol: String,
      traceCol: String, payloadCols: Seq[String], numPartitions: Int,
      outDir: Option[String]): DataFrame = {
    val framed = events
      .groupBy(col(txnCol))
      .agg(
        max(col(tsoCol)).as("commit_tso"),
        count(lit(1)).as("n_events"),
        sort_array(collect_list(
          struct((traceCol +: payloadCols).map(col): _*))).as("events"))
    val ordered = MergeSort.sortedRuns(framed, numPartitions, Seq("commit_tso"))
    outDir.foreach(d => ordered.write.mode(SaveMode.Overwrite).parquet(d))
    ordered
  }

  /** Sidecar cursor file: the committed max TSO, one line of text, named
    * with a leading underscore so parquet readers skip it (like _SUCCESS).
    * Written atomically (tmp + rename) after every appendSince commit. */
  private def cursorFile(outDir: String) = new java.io.File(outDir, "_graft_cursor")

  private def readCursor(outDir: String): Option[Long] = {
    val f = cursorFile(outDir)
    if (!f.isFile) None
    else scala.util.Try(
      new String(java.nio.file.Files.readAllBytes(f.toPath)).trim.toLong).toOption
  }

  private[sinks] def writeCursor(outDir: String, tso: Long): Unit = {
    val f = cursorFile(outDir)
    val tmp = new java.io.File(outDir, "._graft_cursor.tmp")
    java.nio.file.Files.write(tmp.toPath, tso.toString.getBytes)
    java.nio.file.Files.move(tmp.toPath, f.toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  /** Recovery cursor: the restart position for exactly-once resume (the
    * analog of binlog file recover + MinTSOFilter seek,
    * dumper/.../BinlogFileRecoverBuilder.java). O(1): reads the sidecar
    * cursor committed with each append — at a 100 TB ordered log, restart
    * must not scan the log. Falls back to a one-time full max() scan only
    * for directories written before the cursor existed (and repairs the
    * cursor so the scan never repeats). */
  def recoverPosition(spark: org.apache.spark.sql.SparkSession,
      outDir: String, tsoCol: String): Option[Long] = {
    if (!new java.io.File(outDir).exists()) None
    else readCursor(outDir).orElse {
      val scanned =
        spark.read.parquet(outDir).agg(max(col(tsoCol))).head().get(0) match {
          case null => None
          case v: Long => Some(v)
          case v => Some(v.toString.toLong)
        }
      scanned.foreach(writeCursor(outDir, _)) // repair: next restart is O(1)
      scanned
    }
  }

  /** Idempotent append for foreachBatch: only events past the recovered
    * position are appended — replaying a batch after failure cannot
    * duplicate rows (batch-id-free dedup by position). Commits the cursor
    * sidecar after the append so the next recoverPosition is O(1).
    *
    * CONTRACT: `tsoCol` must be strictly increasing and UNIQUE across the
    * stream (the reference's virtual TSO is exactly this — Model.scala
    * VirtualTso packs (physicalTime, logicalSeq, shard) into one ordered
    * long). With a non-unique order key, events sharing the recovered max
    * TSO but arriving in a later batch would be dropped as replays. */
  def appendSince(events: DataFrame, tsoCol: String, outDir: String,
      numPartitions: Int): Unit = {
    val start = recoverPosition(events.sparkSession, outDir, tsoCol)
    val fresh = start match {
      case Some(pos) => events.filter(col(tsoCol) > pos)
      case None => events
    }
    MergeSort.sortedRuns(fresh, numPartitions, Seq(tsoCol))
      .write.mode(SaveMode.Append).parquet(outDir)
    val batchMax = fresh.agg(max(col(tsoCol))).head().get(0)
    (Option(batchMax).map(_.toString.toLong).toSeq ++ start)
      .reduceOption(_ max _)
      .foreach(writeCursor(outDir, _))
  }

  /** SHOW BINLOG EVENTS analog (dumper/.../CdcServer.java:100-136): the
    * metadata surface over the ordered log — one row per output file (the
    * "binlog file" unit) with its TSO range and event count. File-level
    * min/max come from the sorted-run layout, so the listing doubles as a
    * seek index (which file serves a given TSO). */
  def showBinlogEvents(spark: org.apache.spark.sql.SparkSession,
      outDir: String, tsoCol: String): DataFrame =
    spark.read.parquet(outDir)
      .groupBy(input_file_name().as("log_file"))
      .agg(
        min(col(tsoCol)).as("start_tso"),
        max(col(tsoCol)).as("end_tso"),
        count(lit(1)).as("n_events"))
      .orderBy(col("start_tso"), col("log_file"))

  /** Compaction: streaming appends accumulate one small sorted run per
    * micro-batch; periodically rewrite the log as numPartitions balanced
    * sorted runs (range-partitioned on the TSO, so the total order and
    * file-level min/max pruning are restored). Atomic via staging +
    * directory swap — readers see either the old or the new layout.
    * The lake-side analog of binlog file rotation housekeeping. */
  def compact(spark: org.apache.spark.sql.SparkSession, outDir: String,
      tsoCol: String, numPartitions: Int): Unit = {
    val staging = outDir + "__compacting"
    val cursor = readCursor(outDir) // carry the recovery cursor across the swap
    MergeSort.sortedRuns(spark.read.parquet(outDir), numPartitions, Seq(tsoCol))
      .write.mode(SaveMode.Overwrite).parquet(staging)
    val dir = new java.io.File(outDir)
    val old = new java.io.File(outDir + "__precompact")
    if (old.exists()) org.apache.commons.io.FileUtils.deleteDirectory(old)
    if (!dir.renameTo(old)) sys.error(s"compact: cannot stage out $outDir")
    if (!new java.io.File(staging).renameTo(dir)) {
      old.renameTo(dir) // roll back
      sys.error(s"compact: cannot swap in $staging")
    }
    org.apache.commons.io.FileUtils.deleteDirectory(old)
    cursor.foreach(writeCursor(outDir, _))
  }
}
