package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling and mixture construction for training-data
  * pipelines: after dedup and quality filtering, a corpus is SAMPLED to
  * a target composition — so many documents (or tokens) per language /
  * source / domain. Everything here is deterministic and engine-portable
  * (pure integer arithmetic, no RNG state): the same corpus always
  * yields the same sample, re-runs are reproducible, and an external
  * system (or the DuckDB oracle) can recompute the exact selection.
  */
object Sampling {

  /** The key space: keys land in [0, KeyMod). A Mersenne prime keeps
    * the affine rounds below a permutation-breaking common factor. */
  val KeyMod: Long = 2147483647L // 2^31 - 1

  /** Deterministic per-row shuffle key: two affine rounds mod 2^31-1
    * (Lehmer-style). Pure map-side arithmetic — computable by any
    * engine, stable across runs, uniform enough to decorrelate the
    * sample from id assignment order. Every intermediate stays below
    * 2^62, so Spark's ANSI mode can never see a long overflow whatever
    * the id (a bare Knuth multiply would throw past ids ~3.5e9). */
  def shuffleKey(id: Column): Column =
    pmod(pmod(pmod(id.cast("long"), lit(KeyMod)) * 1103515245L + 12345L,
      lit(KeyMod)) * 48271L, lit(KeyMod))

  /** Keep ~`fraction` of rows, chosen by hash threshold — NO shuffle,
    * no window, no state: the filter runs inside the scan stage, so this
    * is the 100 TB shape for "give me 1% of the corpus,
    * reproducibly". */
  /** Deterministic train/validation/test split assignment — the
    * eval-hygiene op every training pipeline needs: a document's split
    * is a pure function of (id, salt), so it NEVER moves when the
    * corpus grows, is re-partitioned, or is re-exported (row_number /
    * rand splits leak eval data on every such change). Weights are
    * 16ths-of-65536 units over the first 4 hex digits of md5(id:salt)
    * — boundaries are hex STRINGS compared lexicographically, so any
    * engine recomputes the identical assignment with two string ops
    * (the [[Sharding]] discipline: md5 prefix = contiguous key range).
    * Scan-stage only: no shuffle, no join, no RNG state. */
  def assignSplit(id: Column, salt: String,
      splits: Seq[(String, Int)]): Column = {
    require(splits.nonEmpty && splits.map(_._2).forall(_ > 0),
      "assignSplit: weights must be positive")
    require(splits.map(_._2).sum == 65536,
      s"assignSplit: weights must sum to 65536 (16^4 key units), " +
        s"got ${splits.map(_._2).sum}")
    require(splits.map(_._1).distinct.size == splits.size,
      "assignSplit: duplicate split names")
    val key = substring(
      md5(concat(id.cast("string"), lit(":" + salt))), 1, 4)
    val bounds = splits.map(_._2).scanLeft(0)(_ + _).tail
    // a NULL id yields a NULL split (the terminal is key-guarded): an
    // unguarded otherwise would silently dump every malformed row into
    // the LAST split — eval contamination in the op built to prevent it
    splits.init.zip(bounds.init).foldRight(
      when(key.isNotNull, lit(splits.last._1))) {
      case (((name, _), hi), rest) =>
        when(key < lit(f"$hi%04x"), lit(name)).otherwise(rest)
    }
  }

  def hashSample(df: DataFrame, idCol: String, fraction: Double): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction $fraction")
    df.filter(shuffleKey(col(idCol)) <
      lit((fraction * KeyMod.toDouble).toLong))
  }

  /** Exactly `k` rows per stratum (language, source, ...), picked in
    * deterministic hash order with the id as tiebreak. The rank filter
    * is recognized by Catalyst's InferWindowGroupLimit, which pushes a
    * per-partition top-k below the stratum shuffle (WindowGroupLimit in
    * the executed plan — asserted in SamplingSpec), so each map task
    * forwards at most k rows per stratum instead of its whole input:
    * the same partial/final shape as a distributed top-k. */
  def stratifiedTopK(df: DataFrame, stratumCol: String, idCol: String,
      k: Int): DataFrame = {
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(shuffleKey(col(idCol)), col(idCol))
    df.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k)
      .drop("__rk")
  }

  /** Greedy token-budget mixture: per stratum, admit documents in
    * deterministic hash order until the token budget is exhausted — a
    * document is kept if the budget was not already spent BEFORE it
    * (so the first over-budget document still enters, and every stratum
    * with any data contributes at least one document). This is the
    * "sample each language to N tokens" step that sets a training mix.
    *
    * The running sum is one window pass per stratum. A stratum's kept
    * prefix is ~budget/avg-tokens documents; at 100 TB pre-narrow with
    * `hashSample` (its keys are consistent with this ordering) when
    * budgets select a tiny fraction, so the window sorts a bounded
    * superset instead of the full stratum. */
  def tokenBudgetMix(df: DataFrame, stratumCol: String, idCol: String,
      tokensCol: String, budgetPerStratum: Long): DataFrame = {
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(shuffleKey(col(idCol)), col(idCol))
    df.withColumn("__cum", sum(col(tokensCol)).over(w))
      .filter(col("__cum") - col(tokensCol) < budgetPerStratum)
      .drop("__cum")
  }
}
