package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Source-vs-target diff joins for validation / reconciliation.
  *
  * Reference semantics: TableValidator.findDiffRecords compares src and dst
  * chunk-by-chunk, then row-by-row for mismatched chunks
  * (polardbx-cdc-rpl/.../validation/TableValidator.java:49,100-161);
  * reconciliation re-syncs the diff set (rpl/validation/reconciliation/).
  *
  * Spark mapping: anti joins for presence diffs, an inner join with value
  * inequality for content diffs. Both are shuffle-hash/sort-merge joins on
  * the key — the canonical distributed formulation; the chunked-checksum
  * pre-pass (Checksum.chunkChecksums) reduces the row-level join to
  * mismatched chunks only, which is what makes 100 TB validation feasible.
  */
object Validation {

  /** Rows present in src but missing in dst. */
  def missingInDst(src: DataFrame, dst: DataFrame, keys: Seq[String]): DataFrame =
    src.join(dst, keys, "left_anti")

  /** Rows present in dst but not in src (orphans). */
  def orphansInDst(src: DataFrame, dst: DataFrame, keys: Seq[String]): DataFrame =
    dst.join(src, keys, "left_anti")

  /** Keys present in both but with differing non-key column values. */
  def mismatched(src: DataFrame, dst: DataFrame, keys: Seq[String],
      valueCols: Seq[String]): DataFrame = {
    val s = src.select((keys ++ valueCols).map(col): _*)
    val d0 = dst.select((keys ++ valueCols).map(col): _*)
    val d = valueCols.foldLeft(d0)((acc, c) => acc.withColumnRenamed(c, s"__dst_$c"))
    val neq = valueCols.map(c =>
        !(col(c) <=> col(s"__dst_$c"))) // null-safe inequality
      .reduce(_ || _)
    s.join(d, keys, "inner").filter(neq)
  }

  /** Row-level three-kind diff in ONE pass: a single full-outer join
    * classifies every differing key as missing | orphan | mismatched —
    * the same rows the three fine-grained joins above produce, without
    * scanning either side three times (3 shuffle joins → 1; at 100 TB
    * the suspect sides are small after checksum narrowing, but the
    * stage count still triples the fixed cost). Values come from the
    * side that HAS the row: src for missing/mismatched (the
    * reconciliation image), dst for orphans. */
  def diffKinds(src: DataFrame, dst: DataFrame, keys: Seq[String],
      valueCols: Seq[String]): DataFrame = {
    val s = src.select((keys ++ valueCols).map(col): _*)
      .withColumn("__src", lit(1))
    val d = valueCols.foldLeft(
        dst.select((keys ++ valueCols).map(col): _*))((acc, c) =>
        acc.withColumnRenamed(c, s"__dst_$c"))
      .withColumn("__dst", lit(1))
    val joined = s.join(d, keys, "full_outer")
    val neq =
      if (valueCols.isEmpty) lit(false)
      else valueCols.map(c => !(col(c) <=> col(s"__dst_$c"))).reduce(_ || _)
    val kind = when(col("__dst").isNull, "missing")
      .when(col("__src").isNull, "orphan")
      .when(neq, "mismatched")
    val out = keys.map(col) ++ valueCols.map(c =>
      when(col("__src").isNull, col(s"__dst_$c")).otherwise(col(c)).as(c))
    joined.withColumn("diff_kind", kind)
      .filter(col("diff_kind").isNotNull)
      .select(out :+ col("diff_kind"): _*)
  }

  /** Full diff summary: (missing, orphan, mismatched) counts in one pass
    * via a full outer join. */
  def diffSummary(src: DataFrame, dst: DataFrame, keys: Seq[String],
      valueCols: Seq[String]): DataFrame = {
    val s = src.select((keys ++ valueCols).map(col): _*)
      .withColumn("__src", lit(1))
    val d = valueCols.foldLeft(
        dst.select((keys ++ valueCols).map(col): _*))((acc, c) =>
        acc.withColumnRenamed(c, s"__dst_$c"))
      .withColumn("__dst", lit(1))
    val joined = s.join(d, keys, "full_outer")
    val neq = valueCols.map(c => !(col(c) <=> col(s"__dst_$c"))).reduce(_ || _)
    joined.agg(
      sum(when(col("__dst").isNull, 1).otherwise(0)).as("missing"),
      sum(when(col("__src").isNull, 1).otherwise(0)).as("orphan"),
      sum(when(col("__src").isNotNull && col("__dst").isNotNull && neq, 1)
        .otherwise(0)).as("mismatched"))
  }
}
