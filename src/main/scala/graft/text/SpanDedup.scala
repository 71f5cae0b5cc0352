package graft.text

import org.apache.spark.sql.{Column, DataFrame}
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
  * Scale shape: every k-token window hashes IN THE SCAN STAGE; only
  * (id, pos, hash) rows ever shuffle — a 16-byte composite key (two
  * independent xxhash64s, so the scrub path — which permanently
  * deletes text — keys on ~128 bits: birthday-safe past 2^40 windows,
  * where a single 64-bit key would already pick up spurious collisions
  * on a 100 TB corpus), never window text. Global duplicate detection
  * and winner election are map-side-combinable aggregations — NEVER a
  * window function: a ubiquitous boilerplate span (the exact thing span
  * dedup exists to remove) can occur 10⁷–10⁸ times, and a window over
  * its hash would single-task every occurrence, while partial
  * aggregation collapses them to one row per map task. Work is O(k·n)
  * characters per document (windows re-hash their k tokens) — a
  * deliberate trade: the O(n) rolling form needs cross-element running
  * state that breaks expression-level codegen, and k is a small
  * constant.
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
    * this projection — only the 16-byte composite hash leaves the scan
    * (h1/h2 are xxhash64 under two different seeds; equality on the
    * pair is window-text equality for any physically-possible corpus). */
  def windowHashes(df: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame =
    df.select(col(idCol), explode(windowStructs(col(textCol), k)).as("w"))
      .select(col(idCol), col("w.pos").as("pos"),
        struct(xxhash64(col("w.win")).as("h1"),
          xxhash64(lit(0x5bd1e995L), col("w.win")).as("h2")).as("hash"))

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

  /** Cross-corpus span decontamination: for every pool document, how
    * many of its k-token windows appear VERBATIM anywhere in a
    * reference corpus (the benchmark/eval set) — the corpus-level
    * decontamination check ("Deduplicating Training Data…" §decon;
    * q55's containment ratio scores a KNOWN doc pairing, this sweeps
    * the whole pool against the whole benchmark with no pairing).
    * Returns (idCol, n_spans, n_contaminated) per pool document with
    * at least one window; a row with n_contaminated > 0 leaks
    * benchmark text and should be dropped or scrubbed.
    *
    * Scale shape: both sides reduce to 16-byte window hashes in their
    * scan stages; the reference side dedups to one row per DISTINCT
    * benchmark span (bounded by the benchmark size — a few GB against
    * a 100 TB pool), so the join is hash-vs-small and AQE broadcasts
    * it; the pool never shuffles its text. */
  def crossSpanContamination(pool: DataFrame, reference: DataFrame,
      idCol: String, textCol: String, k: Int): DataFrame = {
    val pw = windowHashes(pool, idCol, textCol, k)
    val rw = windowHashes(reference, idCol, textCol, k)
      .select(col("hash")).distinct()
      .withColumn("__hit", lit(1L))
    pw.join(rw, Seq("hash"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_spans"),
        sum(coalesce(col("__hit"), lit(0L))).as("n_contaminated"))
  }

  /** MAXIMAL duplicated spans per document — the ExactSubstr removal
    * unit ("Deduplicating Training Data Makes Language Models Better"
    * §4.1: remove maximal duplicated substrings, not fixed windows).
    * Overlapping/adjacent duplicated k-token windows merge into one
    * span (gaps-and-islands over window positions), so a duplicated
    * passage much longer than k reports as ONE span with its exact
    * token boundaries instead of L-k+1 window-quantized fragments.
    * Returns one row per maximal span: (idCol, span_start, span_len,
    * n_windows) — span_start is the 0-based token index, span_len the
    * token count, n_windows the duplicated windows the span merged.
    *
    * `mergeGap` is the largest position step that still merges
    * (default 1 = strictly adjacent windows, the verbatim-duplicated
    * region; k merges any token-overlapping removal ranges).
    *
    * Scale shape: duplicate DETECTION stays the map-side-combinable
    * hash aggregate (never a window over the hash — a 10⁸-occurrence
    * boilerplate span partial-aggregates); the islands pass windows
    * over (idCol, pos) ONLY — per-document data, bounded by document
    * length, the q30 sessionize shape. */
  def maximalDupSpans(df: DataFrame, idCol: String, textCol: String,
      k: Int, mergeGap: Int = 1): DataFrame = {
    val w = windowHashes(df, idCol, textCol, k)
    val counts = w.groupBy(col("hash")).agg(count(lit(1)).as("__n"))
    val dup = w.join(counts.filter(col("__n") > 1), Seq("hash"))
      .select(col(idCol), col("pos"))
    val byDoc = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("pos"))
    dup
      .withColumn("__new", when(
        col("pos") - lag(col("pos"), 1).over(byDoc) <= mergeGap, 0)
        .otherwise(1))
      .withColumn("__island", sum(col("__new")).over(byDoc))
      .groupBy(col(idCol), col("__island"))
      .agg(min(col("pos")).as("span_start"),
        (max(col("pos")) - min(col("pos")) + k).as("span_len"),
        count(lit(1)).as("n_windows"))
      .select(col(idCol), col("span_start"), col("span_len"),
        col("n_windows"))
  }

  /** Remove all-but-first occurrences of duplicated k-token spans: for
    * every hash seen more than once, the (idCol, pos)-least occurrence
    * survives and every other occurrence's k token positions are
    * dropped from their documents (overlapping dropped windows union).
    * Returns (idCol, textCol) with the scrubbed text — token-joined,
    * so inter-token whitespace normalizes to single spaces.
    *
    * Winner election is groupBy(hash).agg(min(struct(id, pos))) — the
    * same map-side-combinable shape as ParagraphDedup — so a hash with
    * 10⁸ occurrences partial-aggregates in the map stage instead of
    * funneling into one window task. The join back on hash is
    * AQE-skew-splittable (the winner side is one row per duplicated
    * hash, replicable across splits of a hot partition) — a guarantee
    * no window over the same key can offer. */
  def scrubDuplicatedSpans(df: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    val hashes = windowHashes(df, idCol, textCol, k)
    val winners = hashes
      .groupBy(col("hash"))
      .agg(min(struct(col(idCol), col("pos"))).as("__keep"),
        count(lit(1)).as("__n"))
      .filter(col("__n") > 1) // unique spans never join, never shuffle twice
      .select(col("hash"), col("__keep"))
    val removed = hashes.join(winners, Seq("hash"))
      .filter(!(col(idCol) === col("__keep")(idCol) &&
        col("pos") === col("__keep")("pos"))) // keep-first rule
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
