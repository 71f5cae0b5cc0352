package graft.jobs

import org.apache.spark.sql.{Column, DataFrame}
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

  /** SQL literal for one string-image cell: NULL when the image lacks
    * the column, else a single-quoted string with backslash, quote,
    * newline AND carriage return escaped — `RecoveryApplier
    * .valueWrapper` (rpl/applier/RecoveryApplier.java:264-298), plus
    * the \r the reference misses: the artifact is LINE-oriented (one
    * statement per line; the observed statement count and any
    * line-based replayer depend on it), so a raw \r inside a value
    * would split one statement across lines. MySQL compares quoted
    * numerics fine; callers with typed targets list `numericCols` to
    * emit them bare. */
  private def sqlLit(v: Column, numeric: Boolean): Column =
    if (numeric) coalesce(v, lit("NULL"))
    else when(v.isNull, lit("NULL")).otherwise(concat(lit("'"),
      regexp_replace(regexp_replace(regexp_replace(regexp_replace(v,
        lit("\\\\"), lit("\\\\\\\\")),
        lit("'"), lit("\\\\'")),
        lit("\n"), lit("\\\\n")),
        lit("\r"), lit("\\\\r")),
      lit("'")))

  /** EXPORT the flashback as executable SQL files — the user-facing
    * artifact of the reference's recovery job: `RecoveryApplier`
    * renders each event through `reverseSQL` and flushes batches into
    * sequence-numbered result files
    * (rpl/applier/RecoveryApplier.java:130-262,371-424). Statement
    * shapes, generated here from the ALREADY-INVERTED stream
    * ([[build]]'s output), matching reverseSQL's originals:
    *
    *  - inverted DELETE (was INSERT):  DELETE FROM `s`.`t` WHERE keys;
    *  - inverted INSERT (was DELETE):  REPLACE INTO `s`.`t` (...) VALUES (...);
    *  - inverted UPDATE:               UPDATE `s`.`t` SET after' WHERE keys(before');
    *
    * Spark restatement of the file packaging: rendering is pure column
    * expressions in ONE per-table-dispatched projection — one scan of
    * the inverted range regardless of how many tables it touches
    * (codegen, no UDFs, no per-table union branches); the statements
    * land as `numFiles` RANGE files — `repartitionByRange` on the
    * replay order then a local sort, so part-file k holds a contiguous
    * newest-first slice and lexicographic file order IS replay order
    * (the same partition-indexed total-order trick as the binlog
    * writers). A `_meta` sidecar records the tso range and statement
    * count — both ride the write as OBSERVED metrics (the OrderedSink
    * cursor idiom), so the export is exactly one distinct-tables probe
    * plus one render-and-write pass, never a re-read of the output.
    *
    * @param inverted [[build]]'s output (op/images already swapped,
    *   `replay_order` = -tsoCol); pass the same column names given to
    *   build when they differ from the ChangeEvent defaults
    * @param tableCols (schema, table) → ordered column names (the wire
    *   registry); tables absent from it are refused loudly — emitting
    *   half a restore script silently would not be a recovery tool
    * @param keyCols (schema, table) → WHERE-clause key columns
    * @param numericCols optional (schema, table) → columns to emit
    *   unquoted
    * @return statements written
    */
  def exportSql(inverted: DataFrame,
      tableCols: Map[(String, String), Seq[String]],
      keyCols: Map[(String, String), Seq[String]],
      outDir: String, numFiles: Int = 16,
      numericCols: Map[(String, String), Set[String]] = Map.empty,
      seqCol: Option[String] = None,
      tsoCol: String = "tso", opCol: String = "op",
      schemaCol: String = "schemaName", tableCol: String = "tableName",
      beforeCol: String = "before", afterCol: String = "after"): Long = {
    val spark = inverted.sparkSession
    import spark.implicits._
    keyCols.keys.foreach { k =>
      require(tableCols.contains(k), s"keyCols for unregistered table $k")
    }
    val present = inverted
      .select(col(schemaCol), col(tableCol)).distinct()
      .as[(String, String)].collect().toSeq.sorted
    val unroutable = present.filterNot(tableCols.contains)
    require(unroutable.isEmpty,
      s"flashback range touches unregistered tables $unroutable — " +
        "a partial restore script is refused, register them")
    val missingKeys = present.filterNot(keyCols.contains)
    require(missingKeys.isEmpty,
      // the reference skips keyless tables with a warning
      // (RecoveryApplier.java:393 hasPrimaryOrUniqueKey) — a RESTORE
      // artifact must not silently skip, so this refuses instead
      s"no key columns for $missingKeys — WHERE clauses need keys")
    if (present.isEmpty) {
      // deterministic empty artifact: no statements, empty range
      spark.createDataFrame(spark.sparkContext
          .emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("value",
            org.apache.spark.sql.types.StringType))))
        .write.mode("overwrite").text(outDir)
      graft.util.HadoopIo.writeSwap(
        new org.apache.hadoop.fs.Path(s"$outDir/._meta.tmp"),
        new org.apache.hadoop.fs.Path(s"$outDir/_meta"),
        "statements=0\nfromTso=0\ntoTso=0")
      return 0L
    }
    // one dispatched rendering expression: per (table, op) a statement
    // shape, chained `when`s over the scan — T tables cost expression
    // width, not T passes over the range
    val stmtFor: ((String, String)) => (Column, Column, Column) = {
      case (s, t) =>
        val cols = tableCols((s, t))
        val keys = keyCols((s, t))
        val nums = numericCols.getOrElse((s, t), Set.empty)
        def img(side: String, c: String) =
          sqlLit(element_at(col(side), c), nums.contains(c))
        val qual = s"`$s`.`$t`"
        def whereKeys(side: String) = concat(
          keys.map(k => concat(lit(s"`$k` = "), img(side, k)))
            .reduce((a, b) => concat(a, lit(" AND "), b)))
        (concat(
          lit(s"REPLACE INTO $qual (" +
            cols.map(c => s"`$c`").mkString(", ") + ") VALUES ("),
          cols.map(c => img(afterCol, c))
            .reduce((a, b) => concat(a, lit(", "), b)),
          lit(");")),
          concat(lit(s"DELETE FROM $qual WHERE "),
            whereKeys(beforeCol), lit(";")),
          concat(lit(s"UPDATE $qual SET "),
            cols.map(c => concat(lit(s"`$c` = "), img(afterCol, c)))
              .reduce((a, b) => concat(a, lit(", "), b)),
            lit(" WHERE "), whereKeys(beforeCol), lit(";")))
    }
    val stmt = present.foldLeft(when(lit(false), lit(null))) {
      case (w, (s, t)) =>
        val (ins, del, upd) = stmtFor((s, t))
        val here = col(schemaCol) === s && col(tableCol) === t
        w.when(here && col(opCol) === "INSERT", ins)
          .when(here && col(opCol) === "DELETE", del)
          .when(here && col(opCol) === "UPDATE", upd)
    }
    // within one transaction (equal replay_order), rows replay in
    // REVERSE of their original intra-txn order — a key changed twice
    // in a txn must undo newest-first, like the statements across txns
    val tie = seqCol.map(c => -col(c)).getOrElse(lit(0))
    val files = math.max(1, numFiles)
    val obs = org.apache.spark.sql.Observation()
    inverted
      .select(col("replay_order"), tie.as("__tie"),
        col(tsoCol).as("__tso"), stmt.as("stmt"))
      .filter(col("stmt").isNotNull) // non-DML rows render nothing
      .repartitionByRange(files, col("replay_order"))
      .sortWithinPartitions(col("replay_order"), col("__tie"))
      .observe(obs, count(lit(1)).as("n"),
        min(col("__tso")).as("lo"), max(col("__tso")).as("hi"))
      .select(col("stmt"))
      .write.mode("overwrite").text(outDir)
    val n = Option(obs.get("n")).map(_.toString.toLong).getOrElse(0L)
    val lo = Option(obs.get("lo")).map(_.toString.toLong).getOrElse(0L)
    val hi = Option(obs.get("hi")).map(_.toString.toLong).getOrElse(0L)
    graft.util.HadoopIo.writeSwap(
      new org.apache.hadoop.fs.Path(s"$outDir/._meta.tmp"),
      new org.apache.hadoop.fs.Path(s"$outDir/_meta"),
      s"statements=$n\nfromTso=$lo\ntoTso=$hi")
    n
  }
}
