package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact substring (k-token span) deduplication — the exact-overlap
  * member of the dedup family (cf. "Deduplicating Training Data Makes
  * Language Models Better": repeated 50-token spans across a corpus are
  * memorization fuel even when whole documents differ). Paragraph dedup
  * (ParagraphDedup) catches structural repetition; minhash catches
  * near-duplicate documents; THIS catches verbatim spans embedded in
  * otherwise-distinct documents — boilerplate sentences, quoted text,
  * mirrored passages.
  *
  * Scale shape: every k-token window hashes IN THE SCAN STAGE (the
  * q35 Rabin-Karp char fold — engine-independent, so external oracles
  * recompute it); only (id, pos, hash) rows ever shuffle — 8-byte keys,
  * never window text. Global duplicate detection is one groupBy(hash);
  * the scrub path's keep-first ranking is a window over the same
  * shuffle. Work is O(k·n) characters per document (windows re-hash
  * their k tokens) — a deliberate trade: the O(n) rolling form needs
  * cross-element running state that breaks expression-level codegen,
  * and k is a small constant.
  */
object SpanDedup {

  private def windowStructs(textCol: Column, k: Int): Column = {
    val toks = split(textCol, " ")
    when(size(toks) < k, array().cast("array<struct<pos:int,win:string>>"))
      .otherwise(transform(sequence(lit(0), size(toks) - k),
        i => struct(i.cast("int").as("pos"),
          array_join(slice(toks, i + 1, lit(k)), " ").as("win"))))
  }

  /** One row per k-token window: (idCol, pos, hash). pos is the
    * 0-based token index of the window start. The window text dies in
    * this projection — only the 8-byte hash leaves the scan. */
  def windowHashes(df: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame =
    df.select(col(idCol), explode(windowStructs(col(textCol), k)).as("w"))
      .select(col(idCol), col("w.pos").as("pos"),
        TextAnalysis.rollingFingerprint(col("w.win")).as("hash"))

  /** Per-document span statistics: total spans and spans whose hash
    * occurs more than once ANYWHERE in the corpus (including within the
    * same document). Documents shorter than k tokens have no spans and
    * produce no row. */
  def spanStats(df: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    val w = windowHashes(df, idCol, textCol, k)
    val counts = w.groupBy(col("hash")).agg(count(lit(1)).as("__n"))
    w.join(counts, Seq("hash"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_spans"),
        sum(when(col("__n") > 1, 1L).otherwise(0L)).as("n_dup_spans"))
  }

  /** Remove all-but-first occurrences of duplicated k-token spans: for
    * every hash seen more than once, the (idCol, pos)-least occurrence
    * survives and every other occurrence's k token positions are
    * dropped from their documents (overlapping dropped windows union).
    * Returns (idCol, textCol) with the scrubbed text — token-joined,
    * so inter-token whitespace normalizes to single spaces. */
  def scrubDuplicatedSpans(df: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    val hashes = windowHashes(df, idCol, textCol, k)
    val rankW = Window.partitionBy(col("hash"))
      .orderBy(col(idCol), col("pos"))
    val removed = hashes
      .withColumn("__rk", row_number().over(rankW))
      .filter(col("__rk") > 1) // keep-first rule
      .select(col(idCol),
        explode(sequence(col("pos"), col("pos") + (k - 1))).as("__tok"))
      .distinct()
    val toks = df.select(col(idCol), posexplode(split(col(textCol), " ")))
      .toDF(idCol, "__tok", "__t")
    val kept = toks.join(removed, Seq(idCol, "__tok"), "left_anti")
      .groupBy(col(idCol))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("__tok"), col("__t")))),
        x => x.getField("__t")), " ").as(textCol))
    // a document whose EVERY token sat in removed spans (an exact
    // mirror of an earlier doc) must survive as an empty-text row, not
    // vanish — callers join scrubbed text back by id and a missing row
    // reads as data loss, not as "fully deduplicated"
    df.select(col(idCol)).join(kept, Seq(idCol), "left")
      .select(col(idCol), coalesce(col(textCol), lit("")).as(textCol))
  }
}
