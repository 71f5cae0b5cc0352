package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing — the last stage of a pretraining data pipeline:
  * the corpus is laid out as ONE deterministic token stream
  * (concatenation in [[Sampling.shuffleKey]] order) and chunked into
  * fixed-length training sequences; each document learns its global
  * token offset and the sequence range it spans (GPT-style
  * concat-then-chunk, where documents may straddle a boundary).
  *
  * The global offset is a prefix sum over a total order — the naive
  * window (`ORDER BY key` with no partition) would funnel the corpus
  * through ONE task. This is the classic two-phase distributed scan
  * instead: range-partition by key, local prefix sums per partition,
  * then each partition's total — P rows of metadata, not data — is
  * collected and folded into per-partition global offsets that join
  * back as a broadcast. No single-partition exchange anywhere
  * (asserted in PackingSpec); the output is independent of P and of
  * where the sampled range boundaries land, because a prefix sum over
  * a total order does not care how the order was cut.
  */
object Packing {

  /** `docs` + `start_tok` (global 0-based token offset), `seq_first`
    * and `seq_last` (the training sequences the document spans, each
    * `seqLen` tokens). `tokensCol` must be a non-negative count; a
    * zero-token document occupies no space (`seq_first == seq_last` at
    * its offset).
    *
    * Phase 1 is MATERIALIZED once (staged to `stagingDir` — the
    * zero-cached-blocks lake shape — or `cache()`d, caller owns the
    * lifecycle): both consumers (the totals collect and the output
    * join) read that single execution, so the corpus is scanned and
    * range-shuffled ONCE, and the pid↔offset pairing can never split
    * across two executions of a nondeterministic upstream. */
  def packSequences(docs: DataFrame, idCol: String, tokensCol: String,
      seqLen: Long, numParts: Int = 0,
      stagingDir: Option[String] = None): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive: $seqLen")
    val spark = docs.sparkSession
    val p = if (numParts > 0) numParts
      else spark.sessionState.conf.numShufflePartitions

    val keyed = docs.withColumn("__key", Sampling.shuffleKey(col(idCol)))
    val ranged = keyed.repartitionByRange(p, col("__key"), col(idCol))
      .withColumn("__pid", spark_partition_id())
    // phase 1: local prefix sums, one window per range partition
    val w = Window.partitionBy(col("__pid"))
      .orderBy(col("__key"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val localPlan = ranged.withColumn("__before",
      coalesce(sum(col(tokensCol)).over(w), lit(0L)))
    val local = stagingDir match {
      case Some(dir) =>
        graft.operators.Staged.parquetStage(localPlan, s"$dir/packing_local")
      case None => localPlan.cache()
    }
    // phase 2: per-partition totals are metadata (P rows) — fold them
    // into global offsets on the driver, rejoin as a broadcast
    val totals = local.groupBy(col("__pid"))
      .agg(sum(col(tokensCol)).as("__total"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val offsets = totals.scanLeft((0, 0L)) {
      case ((_, acc), (pid, tot)) => (pid, acc + tot)
    }.sliding(2).collect {
      case Array((_, acc), (pid, _)) => (pid, acc)
    }.toSeq
    val offsetsDf = spark.createDataFrame(offsets)
      .toDF("__pid", "__offset")
    val start = col("__offset") + col("__before")
    local.join(broadcast(offsetsDf), Seq("__pid"))
      .withColumn("start_tok", start)
      .withColumn("seq_first", expr(s"start_tok div $seqLen"))
      .withColumn("seq_last",
        expr(s"greatest(start_tok, start_tok + `$tokensCol` - 1) div $seqLen"))
      .drop("__pid", "__key", "__before", "__offset")
  }
}
