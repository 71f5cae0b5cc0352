package graft.jobs

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.{Checksum, Validation}

/** Source-vs-target validation + reconciliation, composed end-to-end.
  *
  * Reference pipeline: ValidationCoordinator → TableValidator chunk
  * checksums → row-level recheck of mismatched chunks → persist diffs →
  * ReconCoordinator re-sync (polardbx-cdc-rpl/.../validation/
  * TableValidator.java:49,100-161; ValSQLGenerator.java:75-222;
  * validation/reconciliation/).
  *
  * Scale shape: the checksum pre-pass reads both tables once and shuffles
  * only (chunk, checksum) pairs; the expensive row-level join runs ONLY
  * over chunks whose checksums disagree — at 100 TB with few diffs this
  * is the difference between a full-table join and touching a handful of
  * key ranges.
  */
object ValidationJob {

  final case class Report(
      chunksTotal: Long, chunksMismatched: Long,
      missing: Long, orphans: Long, mismatched: Long)

  /** Chunks whose checksums differ between src and dst. */
  def mismatchedChunks(src: DataFrame, dst: DataFrame, chunkExpr: Column,
      cols: Seq[String]): DataFrame = {
    val cs = Checksum.chunkChecksums(src, chunkExpr, cols)
      .withColumnRenamed("checksum", "src_checksum")
      .withColumnRenamed("n", "src_n")
    val cd = Checksum.chunkChecksums(dst, chunkExpr, cols)
      .withColumnRenamed("checksum", "dst_checksum")
      .withColumnRenamed("n", "dst_n")
    cs.join(cd, Seq("chunk"), "full_outer")
      .filter(!(col("src_checksum") <=> col("dst_checksum")) ||
        !(col("src_n") <=> col("dst_n")))
  }

  /** Lazy diff frame: checksum pre-pass narrows to suspect chunks, then
    * the row-level diff runs only there. `diff_kind` ∈ missing | orphan |
    * mismatched — the reconciliation input. Fully declarative (no driver
    * actions); the chunk list is broadcast. */
  def diffRows(src: DataFrame, dst: DataFrame, keys: Seq[String],
      valueCols: Seq[String], chunkOf: Column): DataFrame = {
    val cols = keys ++ valueCols
    val bad = mismatchedChunks(src, dst, chunkOf, cols)
      .select(col("chunk")).distinct()
    val srcBad = src.join(broadcast(bad), chunkOf === bad("chunk"), "left_semi")
    val dstBad = dst.join(broadcast(bad), chunkOf === bad("chunk"), "left_semi")
    val missing = Validation.missingInDst(srcBad, dstBad, keys)
      .select((keys ++ valueCols).map(col): _*)
      .withColumn("diff_kind", lit("missing"))
    val orphans = Validation.orphansInDst(srcBad, dstBad, keys)
      .select((keys ++ valueCols).map(col): _*)
      .withColumn("diff_kind", lit("orphan"))
    val mism = Validation.mismatched(srcBad, dstBad, keys, valueCols)
      .select((keys ++ valueCols).map(col): _*)
      .withColumn("diff_kind", lit("mismatched"))
    missing.unionByName(orphans).unionByName(mism)
  }

  /** Row-level diff narrowed to an ALREADY-KNOWN suspect chunk list as a
    * literal predicate — partition-prunable, and the plan carries no
    * checksum subplan (the checksum pass ran once in `run`). */
  def diffRowsForChunks(src: DataFrame, dst: DataFrame, keys: Seq[String],
      valueCols: Seq[String], chunkOf: Column,
      badChunks: Seq[Any]): DataFrame = {
    val pred = if (badChunks.isEmpty) lit(false) else chunkOf.isin(badChunks: _*)
    val srcBad = src.filter(pred)
    val dstBad = dst.filter(pred)
    val missing = Validation.missingInDst(srcBad, dstBad, keys)
      .select((keys ++ valueCols).map(col): _*)
      .withColumn("diff_kind", lit("missing"))
    val orphans = Validation.orphansInDst(srcBad, dstBad, keys)
      .select((keys ++ valueCols).map(col): _*)
      .withColumn("diff_kind", lit("orphan"))
    val mism = Validation.mismatched(srcBad, dstBad, keys, valueCols)
      .select((keys ++ valueCols).map(col): _*)
      .withColumn("diff_kind", lit("mismatched"))
    missing.unionByName(orphans).unionByName(mism)
  }

  /** Full run with a driver-side report. ONE probe action reads both
    * tables once: the total chunk count AND the mismatched-chunk list
    * ride the same aggregate (the suspect list is driver-bounded at the
    * operating point of continuous validation — few diverging chunks; a
    * fully-divergent target degenerates to the full diff regardless).
    * The row-level diff and the per-kind counts then touch ONLY the
    * suspect chunks via a literal predicate — no re-execution of the
    * checksum pass, no cached blocks pinned. The returned diff frame is
    * lazy; callers that iterate it further should stage it
    * (Staged.parquetStage) rather than re-materialize. */
  def run(src: DataFrame, dst: DataFrame, keys: Seq[String],
      valueCols: Seq[String], chunkOf: Column): (Report, DataFrame) = {
    val cols = keys ++ valueCols
    val cs = Checksum.chunkChecksums(src, chunkOf, cols)
      .withColumnRenamed("checksum", "src_checksum")
      .withColumnRenamed("n", "src_n")
    val cd = Checksum.chunkChecksums(dst, chunkOf, cols)
      .withColumnRenamed("checksum", "dst_checksum")
      .withColumnRenamed("n", "dst_n")
    val probe = cs.join(cd, Seq("chunk"), "full_outer")
      .agg(count(lit(1)).as("total"),
        collect_set(when(
          !(col("src_checksum") <=> col("dst_checksum")) ||
            !(col("src_n") <=> col("dst_n")), col("chunk"))).as("bad"))
      .head()
    val total = probe.getLong(0)
    val badChunks: Seq[Any] = probe.getSeq[Any](1)
    val diffs = diffRowsForChunks(src, dst, keys, valueCols, chunkOf, badChunks)
    val byKind = diffs.groupBy(col("diff_kind")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val report = Report(
      chunksTotal = total,
      chunksMismatched = badChunks.size,
      missing = byKind.getOrElse("missing", 0L),
      orphans = byKind.getOrElse("orphan", 0L),
      mismatched = byKind.getOrElse("mismatched", 0L))
    (report, diffs)
  }

  /** Reconciliation batch from the diff rows: the change stream that,
    * applied to dst (Appliers.upsert semantics), converges it to src —
    * missing→INSERT, mismatched→UPDATE, orphan→DELETE. */
  def reconciliationBatch(diffs: DataFrame): DataFrame =
    diffs.withColumn("op",
      when(col("diff_kind") === "missing", "INSERT")
        .when(col("diff_kind") === "orphan", "DELETE")
        .otherwise("UPDATE"))
      .drop("diff_kind")
}
