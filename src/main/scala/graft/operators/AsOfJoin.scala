package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of / range joins: resolve each event against the dimension version
  * that was current at the event's timestamp.
  *
  * Reference semantics: every row event resolves its schema as of its TSO
  * against the time-versioned metadata store (polardbx-cdc-meta/.../
  * PolarDbXTableMetaManager.java:103; canal/core/ddl/tsdb/
  * MemoryTableMeta.java:82-147, snapshot + rollback).
  *
  * Spark mapping: the versioned dimension is small (schema versions), so
  * the as-of join is a broadcast range join: equi keys (table name) go
  * through the hash join, the validity interval is a residual predicate.
  * For big-big as-of joins, `asOfJoinSorted` uses the union-trick: tag both
  * sides, range-partition on (key, time), and carry the last dimension row
  * forward with a window — one shuffle, no N×M explosion.
  */
object AsOfJoin {

  /** Broadcast as-of join: fact.tsCol ∈ [dim.fromCol, dim.toCol).
    * Use when the versioned dimension fits in a broadcast (schema catalogs
    * always do). Equi keys keep it a hash join; the interval is residual. */
  def broadcastAsOf(fact: DataFrame, dim: DataFrame, equiKeys: Seq[String],
      tsCol: String, fromCol: String, toCol: String): DataFrame = {
    val cond = equiKeys.map(k => fact(k) === dim(k)).reduce(_ && _) &&
      fact(tsCol) >= dim(fromCol) && fact(tsCol) < dim(toCol)
    equiKeys.foldLeft(fact.join(broadcast(dim), cond, "left_outer"))(
      (df, k) => df.drop(dim(k)))
  }

  /** Big-big as-of join via the union trick: no validity intervals needed
    * on the dimension — just (key, versionTime, payload...). Both sides
    * union into one frame ordered by (key, time, side) and each fact row
    * picks up the latest preceding dimension payload with last(...,
    * ignoreNulls) — a single range shuffle, linear work, skew-safe.
    *
    * @param fact      left frame
    * @param dim       versioned right frame
    * @param key       shared join key column name
    * @param factTs    fact timestamp column
    * @param dimTs     dimension version-start column
    * @param dimPayload dimension payload columns carried onto matching facts
    */
  def asOfJoinSorted(fact: DataFrame, dim: DataFrame, key: String,
      factTs: String, dimTs: String, dimPayload: Seq[String]): DataFrame = {
    val factCols = fact.columns.toSeq
    // side 0 = dim (sorts before fact rows at equal ts), side 1 = fact
    val dimTagged = dim.select(
      (Seq(col(key), col(dimTs).as("__ts"), lit(0).as("__side")) ++
        dimPayload.map(c => col(c).as(s"__dim_$c")) ++
        factCols.filterNot(_ == key).map(c => lit(null).cast(fact.schema(c).dataType).as(c))): _*)
    val factTagged = fact.select(
      (Seq(col(key), col(factTs).cast(dim.schema(dimTs).dataType).as("__ts"),
        lit(1).as("__side")) ++
        dimPayload.map(c => lit(null).cast(dim.schema(c).dataType).as(s"__dim_$c")) ++
        factCols.filterNot(_ == key).map(col)): _*)
    val w = Window.partitionBy(col(key)).orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = dimTagged.unionByName(factTagged)
      .select((Seq(col(key), col("__ts"), col("__side")) ++
        factCols.filterNot(_ == key).map(col) ++
        dimPayload.map(c => last(col(s"__dim_$c"), ignoreNulls = true).over(w)
          .as(s"__dim_$c"))): _*)
    carried.filter(col("__side") === 1)
      .select((factCols.map(col) ++
        dimPayload.map(c => col(s"__dim_$c").as(c))): _*)
  }

  /** Equi + bounded-interval range join (e.g. event within N days of the
    * anchor): hash join on the equi keys with the range as residual — at
    * scale the equi key carries the distribution, so this is a plain
    * shuffled hash/sort-merge join, never a nested loop. */
  def rangeJoin(left: DataFrame, right: DataFrame, equi: Seq[(String, String)],
      leftTs: Column, lo: Column, hi: Column): DataFrame = {
    val cond = equi.map { case (l, r) => left(l) === right(r) }.reduce(_ && _) &&
      leftTs >= lo && leftTs <= hi
    left.join(right, cond, "inner")
  }
}
