package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Model-based quality scoring — the hashed bag-of-words linear
  * classifier (the fastText-style shape) that industrial curation
  * stacks run after the heuristic gates: score(doc) = Σ_tokens
  * W[h(token) mod D], keep docs above a threshold. Training happens
  * offline; this is the SERVING side, and it is deliberately exact
  * integer arithmetic so any engine recomputes it.
  *
  * Scale shape: the weight vector is the model — config-sized, not
  * corpus-sized — so it collapses to ONE broadcast map row
  * ([[UrlFilter]]'s blocklist trick) and scoring runs entirely in the
  * corpus's scan stage: no shuffle, no UDF, one pass per document
  * through nested higher-order functions. The token hash is the
  * portable Rabin-Karp fingerprint (mod largest prime < 2^31 —
  * ANSI-overflow-safe, recomputable in any SQL engine, same family as
  * [[TextAnalysis.rollingFingerprint]]).
  */
object QualityModel {

  /** Largest prime below 2^31 (shared with rollingFingerprint). */
  val HashMod: Long = 2147483629L

  /** Portable per-token hash: fold of `acc*31 + codepoint` mod
    * [[HashMod]] over the token's characters. Defined on code points;
    * astral-plane text may differ across engines that split by UTF-16
    * unit vs code point (same caveat as `rollingFingerprint`). */
  def tokenHash(tok: Column): Column =
    aggregate(split(tok, ""), lit(0L),
      (acc, c) => pmod(acc * 31L + ascii(c).cast("long"), lit(HashMod)))

  /** `docs` + `score`: the hashed-BoW linear score of `textCol` under
    * `weights` (`slotCol` in [0, dim), `wCol` integer weight; missing
    * slots score 0). A NULL text scores null — unknown, not zero —
    * so a quality threshold downstream drops it explicitly. Duplicate
    * slots in `weights` fail loudly (map_from_entries). */
  def scoreHashedBow(docs: DataFrame, textCol: String, weights: DataFrame,
      dim: Int, slotCol: String = "slot", wCol: String = "w",
      scoreCol: String = "score"): DataFrame = {
    require(dim > 0, s"dim must be positive: $dim")
    val wmap = weights.agg(
      map_from_entries(collect_list(struct(
        col(slotCol).cast("long"), col(wCol).cast("long"))))
        .as("graft_w"))
    docs.crossJoin(broadcast(wmap))
      .withColumn(scoreCol, aggregate(
        split(col(textCol), " "),
        lit(0L),
        (acc, t) => acc + coalesce(
          element_at(col("graft_w"), pmod(tokenHash(t), lit(dim.toLong))),
          lit(0L))))
      .drop("graft_w")
  }
}
