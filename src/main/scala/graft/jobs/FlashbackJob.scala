package graft.jobs

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Reshape

/** SQL-flashback: undo a time range of committed changes by replaying
  * them inverted, in reverse order.
  *
  * Reference semantics: RecoveryApplier.reverseSQL inverts each DML
  * (INSERT→DELETE, DELETE→INSERT, UPDATE→swapped UPDATE) and the recovery
  * job applies them newest-first over a [startTs, endTs] × table filter
  * (polardbx-cdc-rpl/.../RecoveryApplier.java:371-424; RecoveryFilter
  * rpl/filter/RecoveryFilter.java:227).
  *
  * Spark restatement: filter (pushed to scan) → pure projection inversion
  * → reverse TSO order via a descending sort key. The output is itself a
  * change stream, consumable by any Applier.
  */
object FlashbackJob {

  /** Build the flashback stream for [fromTso, toTso] over selected tables:
    * inverted ops, before/after swapped, ordered newest-first. */
  def build(events: DataFrame, tsoCol: String, fromTso: Long, toTso: Long,
      opCol: String, beforeCol: String, afterCol: String,
      tableCol: String, tables: Seq[String] = Nil,
      insertLit: String = "INSERT", deleteLit: String = "DELETE"): DataFrame = {
    val ranged = events.filter(col(tsoCol) >= fromTso && col(tsoCol) <= toTso)
    val scoped = if (tables.isEmpty) ranged
      else ranged.filter(col(tableCol).isin(tables: _*))
    Reshape.flashbackInvert(scoped, opCol, beforeCol, afterCol,
        insertLit, deleteLit)
      .withColumn("replay_order", -col(tsoCol))
      .orderBy(col("replay_order"))
  }

  /** Law: flashback of a flashback over the same range is the original
    * stream (used by the property test; inversion is an involution). */
  def invertTwice(events: DataFrame, opCol: String, beforeCol: String,
      afterCol: String): DataFrame =
    Reshape.flashbackInvert(
      Reshape.flashbackInvert(events, opCol, beforeCol, afterCol),
      opCol, beforeCol, afterCol)
}
