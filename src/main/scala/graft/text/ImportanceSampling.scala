package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR-style data selection (cf. Xie et al., "Data Selection for
  * Language Models via Importance Resampling", 2023): rank a raw pool
  * by how much more TARGET-like than pool-like each document's hashed
  * n-gram profile is, and keep the documents whose smoothed importance
  * ratio clears 1 — the standard way to tilt a web-scale pool toward a
  * small curated target corpus before training.
  *
  * Exactness stance: the published method scores with log-probability
  * sums; logs are not IEEE-exact across engines, so this
  * implementation scores with the log-free cross-multiplied form of
  * the SAME ratio test — integer affinities `aff_t = Σ_b n[b]·(t[b]+1)`
  * and `aff_s = Σ_b n[b]·(s[b]+1)` (add-one smoothing), kept when
  * `aff_t·(S+dim) > aff_s·(T+dim)` — every term a 64-bit integer any
  * engine recomputes bit-exactly (the [[QualityModel]] discipline;
  * ANSI mode would fail loudly on overflow instead of wrapping).
  *
  * Scale shape: bigram hashing runs in the pool's scan stage (the
  * portable Rabin–Karp token-pair fold mod `dim`); only (doc, bucket)
  * ids shuffle for the per-doc feature counts. The two corpus profiles
  * are at most `dim` rows — config-sized, not corpus-sized — so they
  * ride BROADCAST joins onto the feature rows, and the totals ride a
  * one-row broadcast ([[graft.text.UrlFilter]]'s trick): the pool
  * never shuffles for the model, only for its own per-doc aggregation.
  */
object ImportanceSampling {

  /** Hashed word-bigram features: one row per (idCol, bucket) with its
    * in-document count; bucket = portable pair hash mod `dim`.
    * Documents with fewer than two tokens have no features. */
  def hashedBigramCounts(docs: DataFrame, idCol: String, textCol: String,
      dim: Int): DataFrame = {
    require(dim > 0, s"dim must be positive: $dim")
    docs.select(col(idCol), explode(bigrams(col(textCol))).as("__bg"))
      .select(col(idCol),
        pmod(QualityModel.tokenHash(col("__bg")), lit(dim.toLong))
          .as("bucket"))
      .groupBy(col(idCol), col("bucket"))
      .agg(count(lit(1)).as("n"))
  }

  private def bigrams(textCol: Column): Column = {
    val toks = split(textCol, " ")
    when(size(toks) < 2, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(0), size(toks) - 2),
        i => concat(element_at(toks, i + 1), lit(" "),
          element_at(toks, i + 2))))
  }

  /** A corpus's bucket profile: (bucket, cnt) — at most `dim` rows. */
  def bucketProfile(docs: DataFrame, idCol: String, textCol: String,
      dim: Int): DataFrame =
    hashedBigramCounts(docs, idCol, textCol, dim)
      .groupBy(col("bucket")).agg(sum(col("n")).as("cnt"))

  /** Per-pool-document importance scores against a target corpus:
    * (idCol, n_bigrams, aff_target, aff_pool, keep) with keep = 1
    * when the smoothed importance ratio exceeds 1 (see object doc).
    * Documents with no bigram features produce no row — they carry no
    * evidence either way; gate them upstream on length if needed. */
  def importanceScores(pool: DataFrame, target: DataFrame, idCol: String,
      textCol: String, dim: Int): DataFrame = {
    val feats = hashedBigramCounts(pool, idCol, textCol, dim)
    val tProf = bucketProfile(target, idCol, textCol, dim)
      .withColumnRenamed("cnt", "__tc")
    val sProf = bucketProfile(pool, idCol, textCol, dim)
      .withColumnRenamed("cnt", "__sc")
    val totals = tProf.agg(sum(col("__tc")).as("__tTot")).crossJoin(
      sProf.agg(sum(col("__sc")).as("__sTot")))
    feats
      .join(broadcast(tProf), Seq("bucket"), "left")
      .join(broadcast(sProf), Seq("bucket")) // pool buckets always match
      .groupBy(col(idCol))
      .agg(sum(col("n")).as("n_bigrams"),
        sum(col("n") * (coalesce(col("__tc"), lit(0L)) + 1L))
          .as("aff_target"),
        sum(col("n") * (col("__sc") + 1L)).as("aff_pool"))
      .crossJoin(broadcast(totals))
      .withColumn("keep",
        (col("aff_target") * (col("__sTot") + dim) >
          col("aff_pool") * (col("__tTot") + dim)).cast("long"))
      .drop("__tTot", "__sTot")
  }
}
