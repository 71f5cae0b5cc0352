package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`array<float>`).
  *
  * Baseline: brute-force cosine top-k — corpus scanned once, query set
  * broadcast, ranking via per-query window. Scale path: random-hyperplane
  * LSH buckets (Charikar 2002) so the candidate join touches only
  * bucket-colliding vectors, plus embedding-cosine near-dup pairing.
  * All vector math is expression-level (`zip_with`/`aggregate`), i.e.
  * codegen-compatible — no UDF per row.
  *
  * == The sign-LSH recall/collision envelope (single source of truth) ==
  *
  * Every approximate path here (lshTopK / q40, cosineNearDupPairs /
  * q54+q74, and IvfIndex / q53 by analogy) shares one contract:
  * candidates are generated approximately, then verified with the EXACT
  * cosine — so precision is exact and only RECALL is probabilistic.
  *
  * For a pair at cosine angle θ (θ = arccos(sim)):
  *   - one table of `p` hyperplanes collides with prob (1 − θ/π)^p
  *   - `t` independent tables (OR-amplification) give
  *       recall = 1 − (1 − (1 − θ/π)^p)^t
  *   - planes SHRINK buckets (2^p bucket space per table → candidate
  *     count and skew fall), tables RAISE recall at t× the explode cost.
  * Worked defaults (t=8, p=16): sim 0.999 → recall ≈ 1−(1−0.996)^8 ≈ 1;
  * sim 0.95 → ≈ 0.86; sim 0.9 → ≈ 0.67. Near-dup thresholds live at
  * sim ≥ 0.99 where the envelope is effectively exhaustive.
  *
  * When a result legitimately diverges from an exact oracle: a fixture
  * DENSE in pairs just above the threshold but at moderate cosine
  * (0.9–0.95) can drop pairs at the rates above — that is the
  * documented envelope, not a components/join bug (AnnRecallSpec pins
  * measured recall on the driver's own testdata; q67/q74 notes point
  * here). Planted near-dup fixtures sit at cosine ≈ 1 where recall ≈ 1
  * for ANY (p, t), which is why re-banding never changes their output.
  */
object Similarity {

  /** Plane count sized to the corpus: the smallest p with expected
    * bucket occupancy N/2^p at or under `targetBucketRows` (then bounded
    * to [4, 30] — below 4 the bucket space is degenerate; past 30 the
    * 2^p space outruns any corpus and recall-per-table collapses). This
    * is the knob the q54/q74 FIXTURE entries hard-code at 4 for ~1k
    * vectors; at corpus scale call this instead — with the in-plan
    * cardinality guard as the backstop for skewed (non-uniform) buckets
    * the expectation argument cannot see. Recall lost to larger p is
    * bought back with tables: see the envelope above. */
  def recommendedPlanes(corpusRows: Long,
      targetBucketRows: Long = 10000L): Int = {
    require(corpusRows >= 0 && targetBucketRows > 0,
      "corpusRows must be >= 0 and targetBucketRows > 0")
    val needed = math.ceil(
      math.log(math.max(1.0, corpusRows.toDouble / targetBucketRows))
        / math.log(2.0)).toInt
    math.min(30, math.max(4, needed))
  }

  /** Dot product of two numeric-array columns (double accumulation).
    * Native fused kernel: the HOF chain
    * `aggregate(zip_with(a, b, (x, y) => x.cast(double) * y.cast(double)),
    *  0.0, _ + _)` is CodegenFallback — interpreted lambdas allocating an
    * intermediate array PER CANDIDATE PAIR, the measured wall of the
    * whole ANN family (optimization guide §1.2 step 2 / §4.1). Same
    * accumulation order and null/length semantics (VecDot doc), so every
    * oracle-checked sim/rank is bit-identical. */
  def dot(a: Column, b: Column): Column =
    graft.functions.sketch.vec_dot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = {
    val d = norm(a) * norm(b)
    when(d === 0.0, lit(0.0)).otherwise(dot(a, b) / d)
  }

  /** Scalar int8 quantization of an embedding column: per-vector scale =
    * max|x|/127, components round(x/scale) as tinyint — 4x smaller than
    * float on the wire, which at corpus scale is the dominant ANN cost
    * (vectors ride every shuffle and candidate join-back). Deterministic
    * double math per component, so an external engine recomputes the
    * exact bytes. Zero vectors quantize to scale 0 + zero components.
    * Appends `<vecCol>_qscale` (double) and `<vecCol>_qvec`
    * (array<tinyint>); expression-level, stays in codegen. */
  def quantizeInt8(df: DataFrame, vecCol: String): DataFrame = {
    val maxAbs = aggregate(col(vecCol), lit(0.0d),
      (acc, x) => greatest(acc, abs(x.cast("double"))))
    val scale = when(maxAbs === 0.0d, lit(0.0d)).otherwise(maxAbs / 127.0d)
    df.withColumn(s"${vecCol}_qscale", scale)
      .withColumn(s"${vecCol}_qvec",
        when(col(s"${vecCol}_qscale") === 0.0d,
          transform(col(vecCol), _ => lit(0).cast("tinyint")))
        .otherwise(transform(col(vecCol),
          x => round(x.cast("double") / col(s"${vecCol}_qscale"), 0)
            .cast("tinyint"))))
  }

  /** Asymmetric quantized dot product: full-precision query against an
    * int8 corpus vector — scale * Σ qv_i * q_i. Asymmetric scoring keeps
    * the query exact, so quantization error enters once, not squared
    * (the standard ADC trade from the PQ literature). */
  def dotQuantized(scale: Column, qvec: Column, queryVec: Column): Column =
    scale * graft.functions.sketch.vec_dot(qvec, queryVec)

  /** Brute-force cosine top-k over an int8-quantized corpus: same scan
    * shape as bruteForceTopK, but the corpus column that scans, shuffles
    * and joins is array<tinyint> + one double — the 100 TB I/O path.
    * Both sides normalize BEFORE quantization so the asymmetric dot is
    * the cosine estimate; exactness is recall-gated (AnnRecallSpec), not
    * assumed. */
  def quantizedTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    val qcorp = quantizeInt8(
      corpus.select(col(idCol).as("corpus_id"),
        normalize(col(vecCol)).as("cv")), "cv")
      .drop("cv") // the float vector never leaves the scan stage
    val qv = queries.select(col(idCol).as("query_id"),
      normalize(col(vecCol)).as("qv"))
    rankTopK(qcorp.join(broadcast(qv),
        col("corpus_id") =!= col("query_id"), "inner")
      .select(col("query_id"), col("corpus_id"),
        dotQuantized(col("cv_qscale"), col("cv_qvec"), col("qv")).as("sim")),
      k)
  }

  /** Per-query rank over a scored (query_id, corpus_id, sim) frame —
    * the tail every top-k variant (here and in IvfIndex) shares
    * (deterministic corpus_id tie-break). */
  private[ml] def rankTopK(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("corpus_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Brute-force cosine top-k: for each query vector, the k most similar
    * corpus vectors. Queries are broadcast (small side); the corpus is
    * scanned exactly once regardless of |queries| — the right baseline at
    * any corpus size. Pre-normalizing both sides turns cosine into a plain
    * dot product in the hot loop. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    val qn = queries.select(col(idCol).as("query_id"),
      normalize(col(vecCol)).as("qv"))
    val cn = corpus.select(col(idCol).as("corpus_id"),
      normalize(col(vecCol)).as("cv"))
    rankTopK(cn.join(broadcast(qn),
        col("corpus_id") =!= col("query_id"), "inner")
      .select(col("query_id"), col("corpus_id"),
        dot(col("qv"), col("cv")).as("sim")), k)
  }

  /** L2-normalize a numeric-array column (returns array<double>).
    * Native fused kernel — the when/transform chain evaluated the
    * interpreted norm TWICE per row (zero guard + divisor); semantics
    * identical (VecNormalize doc). */
  def normalize(v: Column): Column =
    graft.functions.sketch.vec_normalize(v)

  /** Deterministic random hyperplanes: `numPlanes` × `dim` Gaussian
    * components from a fixed seed, embedded as a plan literal. */
  private[ml] def planes(numPlanes: Int, dim: Int, seed: Long = 42L): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(numPlanes)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** Sign-LSH bucket id: one bit per hyperplane (dot-product sign), packed
    * into a long. Vectors in the same bucket are likely cosine-close. */
  def lshBucket(vecCol: Column, numPlanes: Int, dim: Int, seed: Long = 42L): Column = {
    val ps = planes(numPlanes, dim, seed)
    val bits = ps.zipWithIndex.map { case (p, i) =>
      val planeLit = array(p.map(lit): _*)
      when(dot(vecCol, planeLit) > 0.0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Multi-table LSH bucket ids: `numTables` independent sign-LSH tables
    * (OR-amplification), each from `numPlanes` hyperplanes with a distinct
    * seed. Returns array<struct<table,bucket>> for explode+equi-join.
    * Recall for a pair at cosine-angle θ: 1 − (1 − (1−θ/π)^planes)^tables —
    * tables raise recall, planes shrink buckets (candidate count). */
  def lshTables(vecCol: Column, numTables: Int, numPlanes: Int, dim: Int,
      seed: Long = 42L): Column =
    array((0 until numTables).map { t =>
      struct(lit(t).as("table"),
        lshBucket(vecCol, numPlanes, dim, seed + t).as("bucket"))
    }: _*)

  /** Multiprobe probe lists (Lv et al. 2007, "Multi-probe LSH"): for
    * each table, the vector's own bucket PLUS every bucket at Hamming
    * distance 1 (one sign bit flipped). A near-miss pair — differing on
    * exactly one hyperplane in a table — still collides, so one probed
    * table does the recall work of ~numPlanes+1 independent tables
    * while the table count (and with it the CORPUS-side explode, the
    * cost that scales with 100 TB) shrinks. Probing expands only the
    * side it is applied to; apply it to the small/query side and keep
    * the corpus on exact buckets. */
  def lshProbeTables(vecCol: Column, numTables: Int, numPlanes: Int,
      dim: Int, seed: Long = 42L): Column = {
    val masks = array((0 until numPlanes).map(i => lit(1L << i)): _*)
    val base = lshTables(vecCol, numTables, numPlanes, dim, seed)
    flatten(transform(base, tb => concat(
      array(tb),
      transform(masks, m => struct(
        tb.getField("table").as("table"),
        tb.getField("bucket").bitwiseXOR(m).as("bucket"))))))
      .cast("array<struct<table:int,bucket:bigint>>")
  }

  /** Query sides whose PLAN-estimated size is at or below this many bytes
    * broadcast by default in lshTopK (the ANN-serving shape: small query
    * set vs huge corpus). Statistics-based, so the default decision costs
    * zero jobs on the serving path. */
  val QueryBroadcastBytes: BigInt = BigInt(64L << 20)

  /** LSH-accelerated top-k: bucket both sides into `numTables` independent
    * hash tables, join on (table, bucket), dedupe candidate pairs, rank
    * within query. Single-table sign-LSH has poor recall for moderate
    * cosine (collision prob (1−θ/π)^planes); the OR over tables is the
    * standard amplification (MMDS ch.3). At 100 TB the bucket join
    * replaces the corpus-×-queries product with |colliding pairs| —
    * the shuffle carries (table,bucket) keys, never all pairs.
    *
    * `queryBroadcast`: Some(true) forces the serving shape (query side
    * broadcast — it must fit the driver), Some(false) the corpus-vs-corpus
    * shape (shuffled equi-joins; AQE still broadcasts at runtime if the
    * side turns out small), None gates on the optimizer's size estimate
    * vs QueryBroadcastBytes — statistics only, NO extra job (an earlier
    * revision ran a count() per search call here), and an unconditional
    * broadcast would OOM the driver the first time someone passes a
    * corpus as the query set. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, numPlanes: Int, dim: Int,
      numTables: Int = 1, queryBroadcast: Option[Boolean] = None,
      multiprobe: Boolean = false): DataFrame = {
    val small = queryBroadcast.getOrElse(
      queries.queryExecution.optimizedPlan.stats.sizeInBytes <= QueryBroadcastBytes)
    def maybeBroadcast(df: DataFrame): DataFrame =
      if (small) broadcast(df) else df
    // ids-only candidate generation: the (table,bucket) join shuffles
    // 8-byte ids, never vectors; vectors join back once per UNIQUE pair
    // (cf. minhashCandidatePairs — same written-signature shape at scale).
    // multiprobe widens only the QUERY side (own bucket + 1-bit flips,
    // lshProbeTables doc) — the corpus-side explode, the term that
    // scales with the corpus, stays at numTables exact buckets.
    val qBuckets =
      if (multiprobe) lshProbeTables(col(vecCol), numTables, numPlanes, dim)
      else lshTables(col(vecCol), numTables, numPlanes, dim)
    val qIds = queries.select(col(idCol).as("query_id"),
      explode(qBuckets).as("tb"))
    val cIds = corpus.select(col(idCol).as("corpus_id"),
      explode(lshTables(col(vecCol), numTables, numPlanes, dim)).as("tb"))
    val candidates = cIds.join(maybeBroadcast(qIds), Seq("tb"))
      .filter(col("corpus_id") =!= col("query_id"))
      .select(col("query_id"), col("corpus_id"))
      .distinct()
    val qv = queries.select(col(idCol).as("query_id"),
      normalize(col(vecCol)).as("qv"))
    val cv = corpus.select(col(idCol).as("corpus_id"),
      normalize(col(vecCol)).as("cv"))
    rankTopK(candidates
      .join(maybeBroadcast(qv), Seq("query_id"))
      .join(cv, Seq("corpus_id"))
      .select(col("query_id"), col("corpus_id"),
        dot(col("qv"), col("cv")).as("sim")), k)
  }

  /** Embedding-cosine near-duplicate pairs — the embedding-space member
    * of the dedup family. Multi-table banded sign-LSH (`numTables` ×
    * `numPlanes`, see the object doc for the recall math) generates
    * ids-only candidates; the exact cosine verifies every pair, so the
    * banding only ever affects recall, never precision.
    *
    * Scale shape (the 100 TB contract, mirroring minhashCandidatePairs):
    * the self-join key is (table, bucket) with 2^numPlanes buckets PER
    * table — bucket occupancy ~N/2^p, so candidate volume is
    * Σ_buckets O(n_b²) over SMALL n_b, not O(N²/constant) as a
    * single-table low-plane bucketing would be. The (table,bucket)
    * shuffle carries 8-byte ids; vectors join back once per UNIQUE
    * candidate pair. A per-bucket cardinality guard `raise_error`s
    * inside the same job (no extra action) instead of silently going
    * quadratic when the plane count is too low for the corpus — the
    * loud-failure stance of Components' fixpoint guard.
    *
    * `numPlanes` is planes PER TABLE. Defaults (8×16) put the planted
    * ≥0.99-cosine family at recall ≈ 1 (object doc). */
  def cosineNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, numPlanes: Int, dim: Int,
      stagingDir: Option[String] = None, numTables: Int = 8,
      maxBucketRows: Long = 4L * 1000 * 1000): DataFrame = {
    // materialize normalize+buckets once: projection collapse would
    // inline the vector math into both self-join branches (cf.
    // DedupApprox). stagingDir → written stage (zero cached blocks, the
    // lake shape); None → cache(), caller owns the lifecycle.
    val prepared = df.select(col(idCol).as("id"), normalize(col(vecCol)).as("v"),
      lshTables(col(vecCol), numTables, numPlanes, dim).as("tbs"))
    val n = stagingDir match {
      case Some(dir) =>
        graft.operators.Staged.parquetStageOnce(prepared, dir + "/cosine_buckets")
      case None => prepared.cache()
    }
    val ids = n.select(col("id"), explode(col("tbs")).as("tb"))
    // cardinality guard: one row per NON-EMPTY bucket (bounded by both
    // numTables·2^numPlanes and the exploded row count). The raise_error
    // must live in a FILTER predicate, not a projected column: a
    // projection that nothing downstream reads is deleted by Catalyst's
    // ColumnPruning and the error never fires (shipped dead exactly that
    // way once). A Filter's condition is evaluated for every row by
    // construction, so an oversized bucket fails the job loudly before
    // materializing its O(n_b²) pairs — no extra Spark action.
    val guarded = ids.groupBy("tb").agg(count(lit(1)).as("bucket_rows"))
    val bucketOk = when(col("bucket_rows") > maxBucketRows, raise_error(concat(
        lit("cosineNearDupPairs: LSH bucket (table="),
        col("tb.table").cast("string"), lit(", bucket="),
        col("tb.bucket").cast("string"), lit(") holds "),
        col("bucket_rows").cast("string"),
        lit(s" rows > maxBucketRows=$maxBucketRows — raise numPlanes" +
          " (shrinks buckets) or the cap"))).cast("boolean"))
      .otherwise(lit(true))
    val a = ids.join(guarded, Seq("tb")).filter(bucketOk)
      .select(col("tb"), col("id").as("id1"))
    val b = ids.select(col("tb"), col("id").as("id2"))
    // ids-only pair dedup BEFORE vectors join back: a pair colliding in
    // k tables still fetches/scores its vectors exactly once
    val candidates = a.join(b, Seq("tb"))
      .filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2"))
      .distinct()
    candidates
      .join(n.select(col("id").as("id1"), col("v").as("v1")), Seq("id1"))
      .join(n.select(col("id").as("id2"), col("v").as("v2")), Seq("id2"))
      .select(col("id1"), col("id2"), dot(col("v1"), col("v2")).as("sim"))
      .filter(col("sim") >= threshold)
  }
}
