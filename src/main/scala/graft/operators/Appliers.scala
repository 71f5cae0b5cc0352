package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** RPL appliers: apply a change batch to a target table, preserving
  * per-key order, with the reference's applier strategies re-expressed as
  * set-based batch transforms.
  *
  * Reference semantics (polardbx-cdc-rpl/.../applier/):
  *  - MysqlApplier: serial row-at-a-time SQL (ApplyHelper.java:56-61);
  *  - SplitApplier: per-PK parallel queues with serial fallback when a
  *    primary key value changes (SplitApplier.java:43-146);
  *  - MergeApplier: collapse the batch to final images per PK, then batch
  *    REPLACE INTO / DELETE (MergeApplier.java:46-156);
  *  - TransactionApplier / SplitTransactionApplier: transaction-preserving
  *    variants.
  *
  * In Spark the batch IS the parallel unit: `repartition(pk)` gives
  * per-key ordering lanes (SplitApplier), last-image dedup gives
  * MergeApplier, and the final upsert is one set-based merge — the shape
  * that scales to 100 TB targets (Delta/Iceberg MERGE INTO or storage-side
  * upsert), with no row-at-a-time path anywhere.
  */
object Appliers {

  /** SplitApplier semantics: lay the batch out so each key's changes are
    * contiguous and ordered — one shuffle on the key, local sort on seq.
    * A downstream per-partition writer sees strictly per-key-ordered rows
    * (the reference's per-PK queue, without the serial fallback: keys
    * can't migrate between partitions mid-batch in a shuffled layout). */
  def splitByKey(batch: DataFrame, keyCols: Seq[String], seqCol: String,
      lanes: Int): DataFrame =
    batch.repartition(lanes, keyCols.map(col): _*)
      .sortWithinPartitions((keyCols :+ seqCol).map(col): _*)

  /** Detect PK-change rows (before-image key != after-image key), the
    * case where SplitApplier falls back to serial apply: such a change
    * touches two lanes. Returns the batch with a `pk_changed` flag the
    * caller can branch on (reference: SplitApplier.java:95-146). */
  def flagKeyChanges(batch: DataFrame, beforeKey: Column, afterKey: Column): DataFrame =
    batch.withColumn("pk_changed",
      beforeKey.isNotNull && afterKey.isNotNull && !(beforeKey <=> afterKey))

  /** MergeApplier semantics: collapse a change batch to one final action
    * per key. Input rows: (key, seq, op, payload...). Output: last image
    * per key with its effective op — UPDATE seen first after an INSERT in
    * the same batch still yields the insert-mode REPLACE (reference picks
    * insert mode at MergeApplier.java:94). */
  def mergeToFinalImages(batch: DataFrame, keyCols: Seq[String], seqCol: String,
      opCol: String): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(seqCol).desc)
    val anyInsert = max(when(col(opCol) === "INSERT", 1).otherwise(0))
      .over(Window.partitionBy(keyCols.map(col): _*))
    batch
      .withColumn("__rn", row_number().over(w))
      .withColumn("__has_insert", anyInsert)
      .filter(col("__rn") === 1)
      .withColumn("effective_op",
        when(col(opCol) === "DELETE", lit("DELETE"))
          .when(col("__has_insert") === 1, lit("REPLACE"))
          .otherwise(lit("UPDATE")))
      .drop("__rn", "__has_insert")
  }

  /** Set-based upsert: apply final images to a target snapshot.
    * target ∪ batch resolved per key: DELETE removes, REPLACE/UPDATE
    * supersedes, untouched target rows carry over. One full-outer-free
    * formulation: anti-join target to touched keys, union survivors. */
  def upsert(target: DataFrame, finalImages: DataFrame, keyCols: Seq[String],
      opCol: String = "effective_op"): DataFrame = {
    val dataCols = target.columns.toSeq
    val untouched = target.join(
      finalImages.select(keyCols.map(col): _*), keyCols, "left_anti")
    val upserts = finalImages.filter(col(opCol) =!= "DELETE")
      .select(dataCols.map(col): _*)
    untouched.unionByName(upserts)
  }

  /** Full MergeApplier batch cycle against a parquet target directory —
    * the foreachBatch body of the streaming RPL pipeline. Reads the
    * current snapshot, merges, writes back (idempotent per batch since
    * the merge is deterministic). */
  def applyBatchToParquet(batch: DataFrame, keyCols: Seq[String],
      seqCol: String, opCol: String, targetDir: String): Unit = {
    val spark = batch.sparkSession
    val finalImages = mergeToFinalImages(batch, keyCols, seqCol, opCol)
    val merged =
      if (new java.io.File(targetDir).exists()) {
        val target = spark.read.parquet(targetDir)
        upsert(target, finalImages, keyCols)
      } else {
        finalImages.filter(col("effective_op") =!= "DELETE")
          .drop("effective_op")
      }
    // write-to-temp + atomic swap keeps readers consistent
    val tmp = targetDir + "__staging"
    merged.write.mode(SaveMode.Overwrite).parquet(tmp)
    val t = new java.io.File(tmp)
    val d = new java.io.File(targetDir)
    if (d.exists()) {
      val old = new java.io.File(targetDir + "__old")
      d.renameTo(old)
      t.renameTo(d)
      org.apache.commons.io.FileUtils.deleteQuietly(old)
    } else t.renameTo(d)
  }
}
