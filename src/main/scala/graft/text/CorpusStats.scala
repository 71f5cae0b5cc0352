package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-relative token statistics — the two-phase "train stats over
  * the corpus, then score every document against them" shape that
  * LM-based quality filters (perplexity screens) use, kept
  * integer-exact so results cross-check against any SQL engine.
  *
  * Phase 1 aggregates per-token document frequency (one shuffle keyed
  * by token); phase 2 re-joins the exploded tokens to those frequencies
  * (same key — Catalyst reuses the exchange) and folds back to one row
  * per document (one shuffle keyed by doc id). Nothing touches the
  * driver; the vocabulary stays distributed (a broadcast would cap it).
  *
  * A token is "rare" relative to the corpus — df below a FRACTION of
  * the document count, not an absolute cut, so the signal survives any
  * corpus size. High rare-token ratio flags OCR noise, typo storms and
  * boilerplate-free gibberish; near-zero flags template text.
  */
object CorpusStats {

  /** (token, df): how many distinct documents contain each token.
    * Whitespace tokenization matches `TextAnalysis.tokenCount`. */
  def documentFrequency(docs: DataFrame, idCol: String, textCol: String)
      : DataFrame =
    docs.select(col(idCol), explode(split(col(textCol), " ")).as("token"))
      .groupBy(col("token"))
      .agg(countDistinct(col(idCol)).as("df"))

  /** Per-document (n_tokens, n_rare): total token occurrences and the
    * occurrences of tokens whose document frequency is below
    * `rareFracTenths`/10 of the corpus document count. Integer-exact:
    * the threshold compares df*10 < ndocs*rareFracTenths. */
  def rareTokenStats(docs: DataFrame, idCol: String, textCol: String,
      rareFracTenths: Int = 9): DataFrame = {
    val toks = docs
      .select(col(idCol), explode(split(col(textCol), " ")).as("token"))
    // df derives from the SAME toks frame — one tokenizer, one subtree
    // (an independent re-explode would fork correctness on any future
    // tokenizer change and rely on ReusedExchange to dedup the scans)
    val df = toks.groupBy(col("token"))
      .agg(countDistinct(col(idCol)).as("df"))
    // corpus doc count rides the df table (one row each — broadcast the
    // scalar, never the vocabulary)
    val n = docs.agg(countDistinct(col(idCol)).as("ndocs"))
    toks.join(df.crossJoin(broadcast(n)), "token")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        count(when(col("df") * 10 < col("ndocs") * rareFracTenths, 1))
          .as("n_rare"))
  }

  /** Corpus vocabulary with dense ids: one row per distinct token —
    * (token_id, token, tf, df) — where token_id is the 0-based rank of
    * the token in lexicographic order. The tokenizer-training prep op:
    * a stable, engine-portable token↔id mapping plus the frequency
    * columns a vocab-truncation pass filters on.
    *
    * Id assignment is the two-phase distributed prefix sum
    * (`Packing.packSequences`' shape): range-partition by token, local
    * row_number per partition, then per-partition COUNTS — P numbers,
    * metadata — fold into global offsets on the driver and rejoin as a
    * broadcast. No single-partition global sort, no
    * monotonically_increasing_id gaps: ids come out dense and equal to
    * the rank any SQL engine computes with one ORDER BY. */
  def vocabulary(docs: DataFrame, idCol: String, textCol: String,
      numParts: Int = 0): DataFrame = {
    val spark = docs.sparkSession
    val p = if (numParts > 0) numParts
      else spark.sessionState.conf.numShufflePartitions
    val toks = docs
      .select(col(idCol), explode(split(col(textCol), " ")).as("token"))
    val stats = toks.groupBy(col("token"))
      .agg(count(lit(1)).as("tf"), countDistinct(col(idCol)).as("df"))
    val ranged = stats.repartitionByRange(p, col("token"))
      .withColumn("__pid", org.apache.spark.sql.functions.spark_partition_id())
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__pid")).orderBy(col("token"))
    // localCheckpoint, not cache(): a CacheManager entry outlives the
    // call (repeated vocabulary builds on a long-lived session would
    // accumulate storage — r9 advisory); a checkpointed RDD is
    // reclaimed by the ContextCleaner once the returned frame is
    // dropped, and it cuts the ranked lineage for the rejoin below.
    val local = ranged
      .withColumn("__local", row_number().over(w).cast("long") - 1L)
      .localCheckpoint()
    val counts = local.groupBy(col("__pid")).agg(count(lit(1)).as("__n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val offsets = counts.scanLeft((0, 0L)) {
      case ((_, acc), (pid, n)) => (pid, acc + n)
    }.sliding(2).collect {
      case Array((_, acc), (pid, _)) => (pid, acc)
    }.toSeq
    val offsetsDf = spark.createDataFrame(offsets).toDF("__pid", "__offset")
    local.join(broadcast(offsetsDf), Seq("__pid"))
      .select((col("__offset") + col("__local")).as("token_id"),
        col("token"), col("tf"), col("df"))
  }

  /** Inverted index: one row per token — (token, df, postings), the
    * sorted list of documents containing it. The retrieval-prep
    * complement of [[vocabulary]] (BM25/boolean search serve off
    * exactly this table).
    *
    * `dfMax` caps posting-list length: at corpus scale stopword
    * postings are the whole corpus (a "the" list over 10¹⁰ docs is not
    * an index, it is a second copy of the id column) — real
    * deployments df-cut them, and the cap doubles as the hot-key
    * guard. The cap prunes BEFORE collection: a cheap count-distinct
    * pass finds the surviving tokens and only their ids are ever
    * gathered into sets — a stopword's 10¹⁰-id array is never built
    * just to be thrown away (the pre-filter is the whole point of the
    * cap; filtering after collect_set would OOM on exactly the tokens
    * the cap exists for). Uncapped by default for oracle-exact
    * fixtures, where one collect_set pass suffices. */
  def postings(docs: DataFrame, idCol: String, textCol: String,
      dfMax: Long = Long.MaxValue): DataFrame = {
    val toks = docs
      .select(col(idCol), explode(split(col(textCol), " ")).as("token"))
    if (dfMax == Long.MaxValue)
      toks.groupBy(col("token"))
        .agg(sort_array(collect_set(col(idCol))).as("postings"))
        .withColumn("df", size(col("postings")).cast("long"))
        .select(col("token"), col("df"), col("postings"))
    else {
      val keep = toks.groupBy(col("token"))
        .agg(countDistinct(col(idCol)).as("df"))
        .filter(col("df") <= dfMax)
      toks.join(keep, "token")
        .groupBy(col("token"), col("df"))
        .agg(sort_array(collect_set(col(idCol))).as("postings"))
        .select(col("token"), col("df"), col("postings"))
    }
  }

  /** BM25 top-k retrieval — the consumer of the [[postings]] /
    * [[vocabulary]] statistics (an index nobody queries is a table,
    * not an index). Okapi BM25 with the Lucene idf
    * (ln(1 + (N-df+0.5)/(df+0.5))), k1/b defaults per the literature.
    *
    * Scale shape: the corpus token stream filters to the QUERY's terms
    * at the scan (isin over a literal list — predicate-pushable,
    * nothing else ever shuffles for tf); per-term df and the
    * document-length table are one aggregation each; the score join
    * fans a query-sized frame across the matching docs only. Top-k is
    * a TakeOrderedAndProject, never a full sort.
    *
    * Exactly TWO corpus-wide explode passes (plan-asserted in
    * CorpusStatsSpec): the length table is staged once
    * (localCheckpoint — O(ndocs) compact rows) so the global
    * ndocs/avgdl aggregation reads the stage instead of re-running
    * the explode, and `df` derives from `tf` for free — tf is one row
    * per (doc, token), so its per-token row count IS the distinct
    * document count. */
  def bm25(docs: DataFrame, idCol: String, textCol: String,
      query: Seq[String], k: Int = 10, k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    require(query.nonEmpty, "bm25: empty query")
    val toks = docs
      .select(col(idCol), explode(split(col(textCol), " ")).as("token"))
    val lens = toks.groupBy(col(idCol))
      .agg(count(lit(1)).as("dl"))
      .localCheckpoint()
    val scalars = lens.agg(count(lit(1)).cast("double").as("ndocs"),
      avg(col("dl")).as("avgdl"))
    val qtoks = toks.filter(col("token").isin(query.distinct: _*))
    // tf is staged too: df derives from it (one row per (doc, token),
    // so per-token row count IS the distinct-doc count), and without
    // the stage Catalyst rewrites the df branch into its own
    // distinct-aggregate over a SECOND full explode — the exchange
    // shapes diverge and nothing reuses. The stage is query-matched
    // rows only (docs × query terms at worst), the join's working set
    // anyway.
    val tf = qtoks.groupBy(col(idCol), col("token"))
      .agg(count(lit(1)).as("tf"))
      .localCheckpoint()
    val df = tf.groupBy(col("token"))
      .agg(count(lit(1)).as("df"))
    val idf = log(lit(1.0) +
      (col("ndocs") - col("df") + 0.5) / (col("df") + 0.5))
    tf.join(broadcast(df.crossJoin(scalars)), "token")
      .join(lens, idCol)
      .withColumn("__s", idf * (col("tf") * (k1 + 1)) /
        (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / col("avgdl"))))
      .groupBy(col(idCol))
      .agg(sum(col("__s")).as("score"),
        count(lit(1)).as("matched_terms"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }

  /** Integer-exact retrieval rank — the oracle-checkable analog of
    * [[bm25]] (the q92 discipline: no floats cross the engine
    * boundary). Per matched term the weight is the idf surrogate
    * `(N*1000) div df` — integer, monotone in 1/df — and a document's
    * score is Σ tf·weight; ties break on doc id. The tf saturation and
    * length normalization BM25 adds are ranking refinements; the
    * integer rank keeps the same rare-terms-dominate ordering while
    * being bit-reproducible in any SQL engine. */
  def searchRank(docs: DataFrame, idCol: String, textCol: String,
      query: Seq[String], k: Int = 10): DataFrame = {
    require(query.nonEmpty, "searchRank: empty query")
    val toks = docs
      .select(col(idCol), explode(split(col(textCol), " ")).as("token"))
    val n = docs.agg(countDistinct(col(idCol)).as("ndocs"))
    val qtoks = toks.filter(col("token").isin(query.distinct: _*))
    // ONE corpus explode pass: tf is staged (query-matched rows only)
    // and df derives from it — one row per (doc, token), so per-token
    // row count IS the distinct-doc count (see bm25 for why the stage
    // is needed, not just the derivation)
    val tf = qtoks.groupBy(col(idCol), col("token"))
      .agg(count(lit(1)).as("tf"))
      .localCheckpoint()
    val df = tf.groupBy(col("token"))
      .agg(count(lit(1)).as("df"))
    tf.join(broadcast(df.crossJoin(n)), "token")
      .withColumn("__w", expr("(ndocs * 1000) div df"))
      .groupBy(col(idCol))
      .agg(sum(col("tf") * col("__w")).as("score"),
        count(lit(1)).as("matched_terms"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }

  /** Vocabulary coverage / OOV analysis — the tokenizer-budget
    * question ("how much of the corpus does a top-N vocabulary
    * cover?") answered integer-exact per document. The vocabulary is
    * the top `vocabSize` tokens by (tf desc, token asc) — a TOTAL
    * order (token is unique), so the cut at the boundary is
    * deterministic and any SQL engine selects the identical set.
    * Returns one row per document: (id, n_tokens, n_oov) where n_oov
    * counts occurrences of out-of-vocabulary tokens.
    *
    * Scale shape: two corpus explode passes (tf, then membership) —
    * deliberately NOT staged: the exploded token stream IS the corpus
    * again, so materializing it would trade cheap recompute CPU for
    * corpus-scale storage (the bm25 tf stage is different — that one
    * is query-matched rows only). Top-N via orderBy+limit =
    * TakeOrderedAndProject (distributed partial top-k, never a global
    * sort), a vocab-sized broadcast join flags membership, and one
    * per-document aggregation folds the counts. */
  def vocabCoverage(docs: DataFrame, idCol: String, textCol: String,
      vocabSize: Int): DataFrame = {
    require(vocabSize >= 1, s"vocabSize must be >= 1, got $vocabSize")
    val toks = docs
      .select(col(idCol), explode(split(col(textCol), " ")).as("token"))
    val tf = toks.groupBy(col("token")).agg(count(lit(1)).as("tf"))
    val vocab = tf.orderBy(col("tf").desc, col("token").asc)
      .limit(vocabSize).select(col("token"), lit(1).as("__iv"))
    toks.join(broadcast(vocab), Seq("token"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        count(when(col("__iv").isNull, 1)).as("n_oov"))
  }

  /** Per-document characteristic terms — tf-idf keyword extraction with
    * an integer-exact ranking. The tf-idf ordering (tf·log(N/df)) is
    * dominated by tf and penalizes common terms; ranking by
    * (tf desc, df asc, token asc) preserves exactly that preference
    * while never materializing a float, so Spark and any SQL oracle
    * produce the identical top-k — no log(), no epsilon, no
    * cross-engine double drift.
    *
    * Same two-shuffle shape as [[rareTokenStats]]: one aggregation
    * keyed by (doc, token) for tf, one keyed by token for df (both
    * map-side combinable), a token-keyed join back, and a per-document
    * top-k window that Catalyst's InferWindowGroupLimit turns into a
    * partial top-k below the shuffle. The vocabulary stays distributed
    * throughout. */
  def characteristicTerms(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 3): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val toks = docs
      .select(col(idCol), explode(split(col(textCol), " ")).as("token"))
    val tf = toks.groupBy(col(idCol), col("token"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("token"))
      .agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol))
      .orderBy(col("tf").desc, col("df").asc, col("token").asc)
    tf.join(dfreq, "token")
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(idCol), col("rank"), col("token"), col("tf"), col("df"))
  }
}
