package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Global paragraph-level exact dedup: across the WHOLE corpus each
  * distinct paragraph survives only at its first occurrence (smallest
  * doc id, then earliest position) and every later copy is dropped —
  * the cross-document complement of [[Boilerplate]] (which is
  * per-domain and threshold-gated). Catches chain-letter quotes, lorem
  * blocks and syndicated passages that sit below any per-domain
  * document-frequency threshold because they smear across domains.
  *
  * Scale shape: the winner election shuffles (paragraph hash, doc id,
  * position) — 24 bytes per paragraph occurrence, never text. The
  * surviving paragraph text then crosses exactly two intrinsic
  * shuffles: the winner attach (keyed by doc id + position) and the
  * document reassembly (keyed by doc id) — reassembling a document is
  * a co-location of its paragraphs by definition. xxhash64 paragraph
  * identity, same trade as [[Boilerplate]].
  */
object ParagraphDedup {

  /** `docs` with `textCol` rewritten to only first-occurrence
    * paragraphs; a document whose every paragraph is a later copy
    * keeps an empty string. Paragraph order inside each document is
    * preserved. */
  def dedupParagraphs(docs: DataFrame, idCol: String, textCol: String,
      sep: String = "\n\n"): DataFrame = {
    val parts = docs.select(col(idCol).cast("long").as("__doc"),
      posexplode(split(col(textCol), java.util.regex.Pattern.quote(sep)))
        .as(Seq("__pos", "__p")))
    // one winner per distinct paragraph: ids-only shuffle
    val winners = parts
      .select(xxhash64(col("__p")).as("__h"), col("__doc"), col("__pos"))
      .groupBy(col("__h"))
      .agg(min(struct(col("__doc"), col("__pos"))).as("__w"))
      .select(col("__w.__doc").as("__doc"), col("__w.__pos").as("__pos"))
    val kept = parts.join(winners, Seq("__doc", "__pos"), "left_semi")
    val reassembled = kept.groupBy(col("__doc"))
      .agg(array_join(
        transform(
          array_sort(collect_list(struct(col("__pos"), col("__p")))),
          x => x.getField("__p")),
        sep).as("__text"))
    docs.join(reassembled,
        docs(idCol).cast("long") === reassembled("__doc"), "left")
      .select(docs.columns.filter(c => c != textCol).map(docs(_)) :+
        coalesce(col("__text"), lit("")).as(textCol): _*)
  }
}
