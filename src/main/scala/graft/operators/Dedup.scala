package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication / last-image merge.
  *
  * Reference semantics: MergeApplier.mergeByTable collapses multiple DMLs
  * per primary key within a batch down to the final image, emitting one
  * REPLACE/DELETE per key (polardbx-cdc-rpl/.../applier/MergeApplier.java:46-156).
  *
  * Scale notes: `lastImage` is one shuffle on the PK (hash partition), with
  * partial ordering local to each partition — no global sort. `exactDedup`
  * is a hash aggregation (map-side partial combine makes it shuffle only
  * distinct keys). Both survive 100 TB as long as the key is well
  * distributed; skewed keys are handled by AQE skew-split.
  */
object Dedup {

  /** Keep only the last image per key: row_number over (key ORDER BY seq
    * DESC) = 1 — exact MergeApplier semantics. */
  def lastImage(df: DataFrame, keyCols: Seq[String], seqCol: String): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(seqCol).desc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** First image per key (e.g. earliest doc wins in corpus dedup). */
  def firstImage(df: DataFrame, keyCols: Seq[String], seqCol: String): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(seqCol).asc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Exact duplicate-group summary: one row per duplicate key with the
    * representative (min of tieBreaker) and the group size. groupBy → hash
    * agg with map-side combine; only group keys shuffle. */
  def exactGroups(df: DataFrame, keyCols: Seq[String], tieBreaker: String): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(min(col(tieBreaker)).as(tieBreaker), count(lit(1)).as("n"))

  /** Content dedup at scale: group by a 64-bit content hash instead of
    * the content itself, so the shuffle moves 8-byte keys rather than
    * whole documents. Collision risk at 64 bits is negligible for corpus
    * dedup (~N²/2⁶⁵); pair xxhash64 with crc32 for belt-and-braces. */
  def exactGroupsByHash(df: DataFrame, contentCol: String,
      tieBreaker: String): DataFrame =
    df.groupBy(xxhash64(col(contentCol)).as("content_hash"),
        crc32(col(contentCol)).as("content_crc"))
      .agg(min(col(tieBreaker)).as(tieBreaker), count(lit(1)).as("n"))

  /** Representative ids of content dedup: the min-tieBreaker id per
    * distinct content (by 64+32-bit hash pair). The join-back side for
    * dedup at scale — semi-join these ids against a CONTENT-FREE
    * projection of the corpus, so the heavy content column never enters a
    * shuffle at all: this aggregation moves (hash, crc, id) after partial
    * combine, and the semi join moves ids. Contrast firstImage on the
    * content column, whose window shuffles every full row keyed by the
    * content itself. */
  def representativeIds(df: DataFrame, contentCol: String,
      tieBreaker: String): DataFrame =
    exactGroupsByHash(df, contentCol, tieBreaker).select(col(tieBreaker))

  /** Representative ids when the content fingerprint is ALREADY a column
    * (a staged scan that hashed the text on the way in): group by the
    * hash columns, min-tiebreak. Lets a pipeline scan the corpus once,
    * stage a content-free (hash, stats) table, and run dedup plus every
    * downstream consumer off that stage — the content column is read
    * exactly once per corpus, not once per consumer. */
  def representativeIdsFromHashes(df: DataFrame, hashCols: Seq[String],
      tieBreaker: String): DataFrame =
    df.groupBy(hashCols.map(col): _*)
      .agg(min(col(tieBreaker)).as(tieBreaker))
      .select(col(tieBreaker))

  /** Exact dedup keeping representative row per content key. Implemented
    * as min-tiebreak + self-semi-join (not dropDuplicates, whose surviving
    * row is nondeterministic). */
  def exactDedup(df: DataFrame, keyCols: Seq[String], tieBreaker: String): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(tieBreaker).asc)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }
}
