package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Binlog-X multi-stream fan-out: hash-partition the event stream into M
  * parallel logical streams.
  *
  * Reference semantics: HashConfig.getStreamSeq assigns each event a stream
  * by level — DATABASE (db hash), TABLE (db.table hash, with per-table
  * overrides), RECORD (primary-key hash) — polardbx-cdc-task/.../transmit/
  * relay/HashConfig.java:64,208-265. DDL/heartbeat markers broadcast to all
  * streams (TxnTag path, §3.2).
  *
  * Spark mapping: `repartition(M, pmod(hash(keys...), M))` — the fan-out IS
  * the shuffle, and each output partition is one logical stream. Broadcast
  * markers replicate via explode(sequence(0, M-1)). At 1000 executors the
  * same expression partitions 100 TB with zero driver involvement.
  */
object StreamHash {

  sealed trait HashLevel
  case object ByDatabase extends HashLevel
  case object ByTable extends HashLevel
  case object ByRecord extends HashLevel

  /** Stream-seq column: pmod(hash(level keys), M). */
  def streamSeq(level: HashLevel, m: Int, dbCol: Column, tableCol: Column,
      pkCols: Seq[Column]): Column = {
    val h = level match {
      case ByDatabase => hash(dbCol)
      case ByTable    => hash(dbCol, tableCol)
      case ByRecord   => hash((Seq(dbCol, tableCol) ++ pkCols): _*)
    }
    pmod(h, lit(m))
  }

  /** Per-table override map ("db.table" -> fixed stream), falling back to
    * the hash — HashConfig's table-level override semantics. */
  def streamSeqWithOverrides(level: HashLevel, m: Int, dbCol: Column,
      tableCol: Column, pkCols: Seq[Column],
      overrides: Map[String, Int]): Column = {
    val hashed = streamSeq(level, m, dbCol, tableCol, pkCols)
    if (overrides.isEmpty) hashed
    else {
      val ovr = map(overrides.flatMap { case (k, v) => Seq(lit(k), lit(v)) }.toSeq: _*)
      coalesce(element_at(ovr, concat_ws(".", dbCol, tableCol)), hashed)
    }
  }

  /** Fan the frame out into M streams: adds `stream` and repartitions so
    * each stream is a disjoint set of partitions (numPartitions = M means
    * partition i == stream i). */
  def fanOut(df: DataFrame, m: Int, streamCol: Column): DataFrame =
    df.withColumn("stream", streamCol).repartition(m, col("stream"))

  /** Replicate broadcast rows (DDL / heartbeat markers) to all M streams. */
  def broadcastToAllStreams(df: DataFrame, m: Int): DataFrame =
    df.withColumn("stream", explode(sequence(lit(0), lit(m - 1))))
}
