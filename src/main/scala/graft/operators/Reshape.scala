package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event reshaping: physical→logical renaming, hidden-column dropping,
  * and flashback inversion.
  *
  * Reference semantics:
  *  - RowEventReformator rewrites physical group names to logical table
  *    names, drops implicit/hidden columns, rebuilds the column bitmap
  *    (polardbx-cdc-task/.../filter/rebuild/reformat/RowEventReformator.java:214-363);
  *  - RecoveryApplier.reverseSQL inverts operations for flashback:
  *    INSERT→DELETE, DELETE→INSERT, UPDATE→UPDATE with before/after swapped
  *    (polardbx-cdc-rpl/.../RecoveryApplier.java:371-424).
  *
  * Both are pure projections — Catalyst prunes any untouched column all the
  * way into the scan, so reshaping is free at scale.
  */
object Reshape {

  /** Rename physical table names to logical: strips a physical-suffix
    * pattern like `_0001`/`_abc12` group suffixes (RowEventReformator's
    * physical→logical mapping, expressed as a regex projection). */
  def physicalToLogical(df: DataFrame, tableCol: String,
      suffixPattern: String = "(_[0-9]+)$"): DataFrame =
    df.withColumn(tableCol, regexp_replace(col(tableCol), suffixPattern, ""))

  /** Drop hidden/implicit columns (e.g. `_drds_implicit_id_`). */
  def dropHidden(df: DataFrame, hidden: Seq[String]): DataFrame =
    df.drop(hidden: _*)

  /** Physical→logical DDL text normalization (DDLConverter analog,
    * task/.../filter/rebuild/DDLConverter.java): strip physical group
    * suffixes from identifiers in DDL text so the logical stream carries
    * logical names. Pure string projection; no SQL parse needed at
    * runtime (the schema catalog holds structure). */
  def normalizeDdl(ddl: Column, suffixPattern: String = "(_[0-9]+)(\\b)"): Column =
    regexp_replace(ddl, suffixPattern, "$2")

  /** Flashback op inversion as a Column expression. */
  def invertOp(op: Column, insertLit: String = "INSERT",
      deleteLit: String = "DELETE"): Column =
    when(op === insertLit, deleteLit)
      .when(op === deleteLit, insertLit)
      .otherwise(op)

  /** Full flashback inversion of a change-event frame: invert ops AND swap
    * before/after images, then reverse the order key so events replay
    * backwards (RecoveryApplier semantics). */
  def flashbackInvert(df: DataFrame, opCol: String,
      beforeCol: String, afterCol: String,
      insertLit: String = "INSERT", deleteLit: String = "DELETE"): DataFrame = {
    df.withColumn(opCol, invertOp(col(opCol), insertLit, deleteLit))
      .withColumn("__tmp_before", col(afterCol))
      .withColumn(afterCol, col(beforeCol))
      .withColumn(beforeCol, col("__tmp_before"))
      .drop("__tmp_before")
  }
}
