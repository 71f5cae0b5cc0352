package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed BPE merge training (Sennrich et al. 2016, "Neural
  * Machine Translation of Rare Words with Subword Units"): start from
  * characters, repeatedly count adjacent symbol pairs across the
  * corpus and merge the most frequent pair, K times. The merge list IS
  * the tokenizer.
  *
  * Scale shape: the corpus collapses ONCE to (word, freq) — pair
  * statistics are identical on the deduplicated vocabulary, and a
  * 100 TB corpus has a bounded word-form vocabulary. Each round is one
  * map-side-combinable aggregation over that vocabulary (pairs weighted
  * by word freq) and brings exactly ONE row (the argmax) to the
  * driver; the merge itself is a pure expression fold over each word's
  * symbol array — no UDF, no driver-side corpus pass, rounds cut
  * lineage with localCheckpoint so K rounds stay K jobs, not a 2^K
  * plan.
  *
  * Deterministic: ties break on the lexicographically smallest pair,
  * so the same corpus always yields the same merge list (the property
  * that makes a trained tokenizer reproducible — BpeTrainerSpec pins
  * it against a sequential reference implementation).
  */
object BpeTrainer {

  /** Greedy left-to-right single-pair merge of a symbol array:
    * every non-overlapping (a,b) adjacency becomes a+b, scanning from
    * the left (standard BPE apply semantics). Pure expression fold. */
  private[text] def mergePair(syms: Column, a: String, b: String): Column = {
    val init = struct(
      array().cast("array<string>").as("out"),
      lit("").as("prev"),
      lit(false).as("hasPrev"))
    val folded = aggregate(syms, init,
      (acc, s) => {
        val isMerge = acc.getField("hasPrev") &&
          acc.getField("prev") === lit(a) && s === lit(b)
        struct(
          when(isMerge,
            concat(acc.getField("out"), array(lit(a + b))))
            .when(acc.getField("hasPrev"),
              concat(acc.getField("out"), array(acc.getField("prev"))))
            .otherwise(acc.getField("out")).as("out"),
          when(isMerge, lit("")).otherwise(s).as("prev"),
          when(isMerge, lit(false)).otherwise(lit(true)).as("hasPrev"))
      },
      acc => when(acc.getField("hasPrev"),
        concat(acc.getField("out"), array(acc.getField("prev"))))
        .otherwise(acc.getField("out")))
    folded
  }

  /** Drop a localCheckpoint'd frame's backing blocks NOW rather than at
    * the ContextCleaner's leisure: the train loop checkpoints a new
    * vocabulary every round, and without an explicit release a long
    * merge list holds K copies of the vocabulary in executor storage
    * (r9 advisory). */
  private def releaseCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ => ()
    }

  /** The deduplicated training vocabulary: (syms: array<string> of
    * single characters, freq). */
  private def initialVocab(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(split(col(textCol), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .select(split(col("w"), "").as("syms"), col("freq"))

  /** Adjacent-pair statistics of a (syms, freq) vocabulary: one
    * combinable aggregation — (a, b, cnt). */
  private def pairsOf(vocab: DataFrame): DataFrame =
    vocab
      .select(explode(zip_with(
        slice(col("syms"), lit(1), size(col("syms")) - 1),
        slice(col("syms"), lit(2), size(col("syms")) - 1),
        (x, y) => struct(x.as("a"), y.as("b")))).as("p"), col("freq"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum(col("freq")).as("cnt"))

  /** Round-1 pair statistics straight off a corpus — the distributed
    * counting core of [[train]], exposed so an external engine can
    * recompute it exactly (q101's oracle does; the iterative loop
    * itself is gated by BpeTrainerSpec's sequential reference). */
  def pairStats(docs: DataFrame, textCol: String): DataFrame =
    pairsOf(initialVocab(docs, textCol))

  /** Train `numMerges` merges. Returns the ordered merge list — fewer
    * rows if the corpus runs out of repeated pairs first. */
  def train(docs: DataFrame, textCol: String,
      numMerges: Int): Seq[(String, String)] = {
    require(numMerges >= 1, s"numMerges must be >= 1: $numMerges")
    var vocab = initialVocab(docs, textCol).localCheckpoint()
    val merges = Seq.newBuilder[(String, String)]
    var round = 0
    var exhausted = false
    while (round < numMerges && !exhausted) {
      // one combinable aggregation; ONE row to the driver
      val best = pairsOf(vocab)
        .filter(col("cnt") >= 2)
        .orderBy(col("cnt").desc, col("a").asc, col("b").asc)
        .limit(1)
        .collect()
      best.headOption match {
        case None => exhausted = true
        case Some(r) =>
          val (a, b) = (r.getString(0), r.getString(1))
          merges += ((a, b))
          val prev = vocab
          vocab = vocab
            .select(mergePair(col("syms"), a, b).as("syms"), col("freq"))
            .localCheckpoint() // eager: prev is fully consumed here
          releaseCheckpoint(prev)
          round += 1
      }
    }
    merges.result()
  }

  /** Apply a trained merge list to a token column: the tokenizer's
    * segment step — each merge folds over the symbol array in order.
    * Returns array<string> of subword units. Plan size grows with the
    * merge count (one fold per merge): fine for a handful of merges,
    * but a 500-merge list is a 500-deep expression tree (plan blowup,
    * codegen limits) — use [[segmentJoin]] at scale. */
  def segment(token: Column, merges: Seq[(String, String)]): Column =
    merges.foldLeft(split(token, "")) {
      case (syms, (a, b)) => mergePair(syms, a, b)
    }

  /** The trained tokenizer applied as a TABLE, not an expression: the
    * scale path for long merge lists. The frame's DISTINCT tokens are
    * segmented once (the merge folds run over the word-form
    * vocabulary, with a lineage cut every `checkpointEvery` merges so
    * the plan stays ≤ `checkpointEvery` folds deep at every point),
    * and the result joins back on the token — O(1) plan depth at
    * apply time regardless of merge count, and the fold work is
    * O(vocabulary), not O(corpus tokens), because equal words segment
    * equally (the same dedup-once insight [[train]] uses).
    *
    * Because the vocabulary derives from `df` ITSELF, every token has
    * a row — no unseen-word fallback path. The join key is the token
    * column: Catalyst/AQE broadcast a small vocabulary and shuffle a
    * big one; nothing here forces a driver-sized collect.
    *
    * Returns `df` plus `subwordsCol` (array<string>), token-identical
    * to [[segment]] (BpeTrainerSpec pins the equality). */
  def segmentJoin(df: DataFrame, tokenCol: String,
      merges: Seq[(String, String)], subwordsCol: String = "subwords",
      checkpointEvery: Int = 16): DataFrame = {
    require(checkpointEvery >= 1, s"checkpointEvery must be >= 1")
    // the vocab frame's working columns must not collide with the
    // caller's — a pre-existing __word would silently join-key-alias
    require(!df.columns.contains("__word") && !df.columns.contains("__syms"),
      "segmentJoin: input must not carry reserved columns __word/__syms")
    var vocab = df.select(col(tokenCol).as("__word"))
      .filter(col("__word").isNotNull).distinct()
      .select(col("__word"), split(col("__word"), "").as("__syms"))
    var sinceCut = 0
    merges.foreach { case (a, b) =>
      vocab = vocab.select(col("__word"),
        mergePair(col("__syms"), a, b).as("__syms"))
      sinceCut += 1
      if (sinceCut >= checkpointEvery) {
        val prev = vocab
        vocab = vocab.localCheckpoint()
        releaseCheckpoint(prev)
        sinceCut = 0
      }
    }
    // LEFT join: a NULL token keeps its row with null subwords —
    // exactly what the expression path segment() yields (an inner join
    // would silently drop such rows from the output)
    df.join(vocab.withColumnRenamed("__syms", subwordsCol),
      df(tokenCol) === vocab("__word"), "left")
      .drop("__word")
  }
}
