package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Full-copy bootstrap: split a table into balanced key-range chunks and
  * scan them in parallel — the RPL full-extract stage.
  *
  * Reference semantics: MysqlFullProcessor pages through the table with
  * keyset pagination (`SELECT ... WHERE pk >= ? ORDER BY pk LIMIT fetch`)
  * and derives chunk bounds from the PK order
  * (polardbx-cdc-rpl/.../extractor/full/MysqlFullProcessor.java:59,109-199).
  *
  * Spark restatement: chunk bounds come from approx quantiles of the key
  * (one pass, driver gets only the cut points); each chunk is a pushed
  * range predicate — for JDBC sources these become the
  * partitionColumn/lowerBound/upperBound parallel scan, for parquet they
  * prune row groups. The chunk list is also the unit of checksum
  * validation (Checksum.chunkChecksums) and resumable copy.
  */
object FullCopy {

  /** Balanced chunk bounds [lo, hi) for a numeric key: n-quantile cut
    * points, first/last unbounded. Returns (chunkId, lo, hi) with
    * lo=None/hi=None at the edges. */
  def chunkBounds(df: DataFrame, keyCol: String, numChunks: Int,
      relErr: Double = 0.01): Seq[(Int, Option[Double], Option[Double])] = {
    require(numChunks > 0)
    if (numChunks == 1) return Seq((0, None, None))
    val probs = (1 until numChunks).map(_.toDouble / numChunks).toArray
    val cuts = df.stat.approxQuantile(keyCol, probs, relErr).distinct.sorted
    val bounds = (None +: cuts.map(Some(_)).toSeq) :+ None
    bounds.sliding(2).zipWithIndex.map {
      case (Seq(lo, hi), i) => (i, lo, hi)
      case (other, i) => (i, other.headOption.flatten, None)
    }.toSeq
  }

  /** Predicate for one chunk: lo <= key < hi (unbounded at edges). */
  def chunkPredicate(keyCol: String, lo: Option[Double], hi: Option[Double]): Column = {
    val c = col(keyCol)
    (lo, hi) match {
      case (Some(l), Some(h)) => c >= l && c < h
      case (Some(l), None) => c >= l
      case (None, Some(h)) => c < h
      case (None, None) => lit(true)
    }
  }

  /** The chunked copy plan: one DataFrame per chunk, each with its range
    * pushed to the scan. Callers union/iterate; a failed chunk re-runs
    * alone (resumability). */
  def chunkedScan(df: DataFrame, keyCol: String, numChunks: Int): Seq[DataFrame] =
    chunkBounds(df, keyCol, numChunks).map { case (_, lo, hi) =>
      df.filter(chunkPredicate(keyCol, lo, hi))
    }

  /** Chunk-id assignment column from precomputed bounds — lets a
    * distribution/monitoring query count all chunks in ONE pass instead
    * of one job per chunk. */
  def chunkIdColumn(keyCol: String,
      bounds: Seq[(Int, Option[Double], Option[Double])]): Column =
    bounds.foldLeft(lit(-1)) { case (acc, (i, lo, hi)) =>
      when(chunkPredicate(keyCol, lo, hi), lit(i)).otherwise(acc)
    }

  /** JDBC-style predicate strings for parallel partitioned reads
    * (spark.read.jdbc(url, table, predicates, ...)). */
  def jdbcPredicates(df: DataFrame, keyCol: String, numChunks: Int): Array[String] =
    chunkBounds(df, keyCol, numChunks).map { case (_, lo, hi) =>
      (lo, hi) match {
        case (Some(l), Some(h)) => s"$keyCol >= $l AND $keyCol < $h"
        case (Some(l), None) => s"$keyCol >= $l"
        case (None, Some(h)) => s"$keyCol < $h"
        case (None, None) => "1 = 1"
      }
    }.toArray
}
