package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate (near-duplicate) deduplication: MinHash+LSH, SimHash,
  * n-gram Jaccard. Built for the 100 TB corpus case: everything is
  * expression-level (codegen'd), candidate generation is a bucket
  * equi-join (shuffle on band hash, never an all-pairs cross join), and
  * verification runs only on bucket-collision candidates.
  *
  * Algorithms from the public literature (Broder 1997 minwise hashing;
  * Charikar 2002 SimHash; Leskovec/Rajaraman/Ullman MMDS ch.3 banding).
  */
object DedupApprox {

  /** Word-level shingles (n-grams) of a text column, distinct. */
  def shingles(text: Column, n: Int): Column = {
    val toks = split(trim(lower(text)), "\\s+")
    array_distinct(
      filter(
        transform(sequence(lit(1), greatest(size(toks) - (n - 1), lit(0))),
          i => concat_ws(" ", slice(toks, i, lit(n)))),
        s => length(s) > 0))
  }

  /** Shingle set hashed to longs — set operations (intersect/union) on
    * long arrays are far cheaper than on strings, and 64-bit collisions
    * are negligible at corpus scale. One pass via the native
    * HashedShingles expression (tokenize+hash+combine+dedupe fused). */
  def hashedShingles(text: Column, n: Int): Column =
    graft.functions.sketch.hashed_shingles(text, n)

  /** MinHash signature: k independent min-hashes of the shingle set.
    * Hash family = xxhash64 seeded by position (seed literal mixed in).
    * k-pass HOF formulation — prefer `minhashSignatureHashed` (native
    * one-pass expression) on pre-hashed shingles in hot paths. */
  def minhashSignature(shinglesCol: Column, k: Int): Column =
    array((0 until k).map { seed =>
      array_min(transform(shinglesCol, s => xxhash64(lit(seed), s)))
    }: _*)

  /** One-pass k-slot MinHash signature over hashed (long) shingles —
    * native Catalyst expression with codegen (graft.functions). */
  def minhashSignatureHashed(hashedShinglesCol: Column, k: Int): Column =
    graft.functions.sketch.minhash_signature(hashedShinglesCol, k)

  /** LSH band hashes: signature split into b bands of r rows, each band
    * hashed to one bucket id. b*r must equal the signature length. */
  def bandHashes(sigCol: Column, b: Int, r: Int): Column =
    array((0 until b).map { i =>
      struct(lit(i).as("band"), hash(slice(sigCol, i * r + 1, r)).as("bucket"))
    }: _*)

  /** End-to-end MinHash LSH candidate pairs over (idCol, textCol):
    * shingle → signature → band → explode → self-join per bucket →
    * distinct (id1 < id2) pairs with exact Jaccard verification.
    *
    * The self-join shuffles on (band, bucket) — bounded bucket sizes keep
    * it linear; `jaccardThreshold` filters false positives exactly.
    */
  def minhashCandidatePairs(df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, numHashes: Int = 32, bands: Int = 8,
      jaccardThreshold: Double = 0.5,
      stagingDir: Option[String] = None): DataFrame = {
    val rows = numHashes / bands
    // Materialize the shingle+signature stage ONCE: Catalyst's projection
    // collapse would otherwise inline the (expensive) shingle transform
    // into every branch of the self-join and the verify joins, computing
    // it 4×. With `stagingDir` the stage is a WRITTEN signature table
    // (the lake-scale shape; zero cached blocks — see Staged); without,
    // cache() is the materialization point and the CALLER owns the
    // lifecycle (unpersist via the returned plan's cached leaves).
    val prepared = df
      .select(col(idCol).as("id"),
        hashedShingles(col(textCol), shingleN).as("sh"))
      .filter(size(col("sh")) > 0)
      .withColumn("sig", minhashSignatureHashed(col("sh"), numHashes))
    val shingled = stagingDir match {
      case Some(dir) =>
        graft.operators.Staged.parquetStageOnce(prepared, dir + "/minhash_signatures")
      case None => prepared.cache()
    }
    // band hashes derive from the materialized signature for pennies — no
    // second materialization needed
    val banded = shingled
      .withColumn("bh", explode(bandHashes(col("sig"), bands, rows)))
      .select(col("id"), col("bh.band"), col("bh.bucket"))
    // Candidate ids first — the distinct shuffles only (id1, id2) pairs;
    // shingle arrays join back once per UNIQUE pair for verification.
    val candidates = banded.select(col("band"), col("bucket"), col("id").as("id1"))
      .join(banded.select(col("band"), col("bucket"), col("id").as("id2")),
        Seq("band", "bucket"))
      .filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2"))
      .distinct()
    candidates
      .join(shingled.select(col("id").as("id1"), col("sh").as("sh1")), Seq("id1"))
      .join(shingled.select(col("id").as("id2"), col("sh").as("sh2")), Seq("id2"))
      .withColumn("inter", size(array_intersect(col("sh1"), col("sh2"))))
      .select(col("id1"), col("id2"),
        (col("inter").cast("double") /
          (size(col("sh1")) + size(col("sh2")) - col("inter"))).as("jaccard"))
      .filter(col("jaccard") >= jaccardThreshold)
  }

  /** 64-bit SimHash of a token array: per-bit vote of token hashes,
    * sign-packed — one pass via the native SimHash64 expression. */
  def simhash(tokensCol: Column): Column =
    graft.functions.sketch.simhash64(transform(tokensCol, t => xxhash64(t)))

  /** Hamming distance between two 64-bit fingerprints. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup pairs: fingerprints banded into 4×16-bit chunks —
    * any pair within Hamming distance 3 shares at least one exact chunk
    * (pigeonhole), so candidate generation is again an equi-join. */
  def simhashCandidatePairs(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): DataFrame = {
    val fp = df.select(col(idCol).as("id"),
      simhash(split(trim(lower(col(textCol))), "\\s+")).as("fp"))
    val chunked = fp.withColumn("chunk", explode(array((0 until 4).map { i =>
      struct(lit(i).as("ci"),
        shiftright(col("fp"), i * 16).bitwiseAND(0xFFFFL).as("cv"))
    }: _*)))
    val a = chunked.select(col("chunk"), col("id").as("id1"), col("fp").as("fp1"))
    val b = chunked.select(col("chunk"), col("id").as("id2"), col("fp").as("fp2"))
    a.join(b, Seq("chunk"))
      .filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2"), hamming(col("fp1"), col("fp2")).as("dist"))
      .distinct()
      .filter(col("dist") <= maxHamming)
  }

  /** Benchmark-contamination detection: which corpus documents share at
    * least `minOverlap` distinct n-grams with any benchmark document —
    * the standard train/eval leakage check. Candidate generation is an
    * equi-join on hashed n-grams (shuffle carries 8-byte keys), grouped
    * back per (doc, benchmark) pair; never an all-pairs product. At
    * 100 TB the benchmark side is tiny — AQE broadcasts it. */
  def contamination(corpus: DataFrame, corpusId: String, corpusText: String,
      benchmark: DataFrame, benchId: String, benchText: String,
      shingleN: Int = 5, minOverlap: Int = 3): DataFrame = {
    val c = corpus.select(col(corpusId).as("doc_id"),
        explode(hashedShingles(col(corpusText), shingleN)).as("h"))
    val b = benchmark.select(col(benchId).as("bench_id"),
        explode(hashedShingles(col(benchText), shingleN)).as("h"))
    c.join(b, Seq("h"))
      .groupBy(col("doc_id"), col("bench_id"))
      .agg(count(lit(1)).as("n_overlap"))
      .filter(col("n_overlap") >= minOverlap)
  }

  /** Jaccard of two pre-computed distinct shingle arrays, via
    * |A∩B| / (|A|+|B|−|A∩B|) — one intersect, no union materialized. */
  def jaccardFromShingles(sa: Column, sb: Column): Column = {
    val inter = size(array_intersect(sa, sb))
    val uni = size(sa) + size(sb) - inter
    when(uni === 0, lit(0.0)).otherwise(inter.cast("double") / uni)
  }

  /** Exact n-gram Jaccard similarity for given pairs — the verification
    * primitive, also usable standalone on a candidate list. Prefer
    * shingling each side once in a projection and calling
    * `jaccardFromShingles` when a document participates in many pairs. */
  def ngramJaccard(aText: Column, bText: Column, n: Int): Column =
    jaccardFromShingles(shingles(aText, n), shingles(bText, n))
}
