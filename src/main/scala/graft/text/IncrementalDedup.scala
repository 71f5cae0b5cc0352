package graft.text

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Incremental near-duplicate screening: each NEW batch of documents is
  * checked against a persisted SIGNATURE INDEX of everything admitted
  * before it — the "is this crawl shard already in the corpus" gate a
  * growing training set needs, without ever recomputing the corpus.
  *
  * The index is ONE append-only parquet table under `indexDir` —
  * `sigs/batch=<id>`: (doc_id, sig array<long>) — written per source
  * batch (so a replayed batch OVERWRITES its own partition — idempotent
  * under foreachBatch retries). Banded buckets derive from the stored
  * signatures on read (fewer bytes than a stored b-rows-per-doc bucket
  * table). Candidate generation joins banded buckets on (band, bucket)
  * — ids only, the 8-byte shuffle; signatures attach once per unique
  * candidate pair and
  * similarity is estimated as the matching-slot fraction of the two
  * MinHash signatures (E[match fraction] = Jaccard), so the check
  * never re-reads document text. Within-batch duplicates are caught by
  * the same banded join of the batch against itself (smaller id wins).
  *
  * At 100 TB: per batch the work is O(batch) signature compute + a
  * bucket equi-join whose index side prunes to colliding buckets; the
  * index grows by admitted docs only. (The bucket table is the natural
  * candidate for bucketBy(band) at very large index sizes.)
  */
object IncrementalDedup {

  /** Screen one batch. Returns the batch with a `dup_of` column: the
    * smallest doc id among matches (estimated Jaccard >= `threshold`)
    * drawn from EVERY already-admitted doc — regardless of id order —
    * plus smaller-id docs of the same batch (the in-batch tiebreak);
    * null if the document is novel. Side effect: the novel rows'
    * signatures are committed to the index under `batch=<batchId>`.
    *
    * `dup_of` is one HOP in the duplicate graph, not the canonical
    * representative: it may name a sibling batch doc that was itself
    * rejected (its own `dup_of` continues the chain), and it may equal
    * the doc's own id when that id was already admitted by an earlier
    * batch (a re-delivery). Consumers that need one representative per
    * group close the chains with `operators/Components` over the
    * (doc_id, dup_of) pairs. */
  def dedupeBatch(batch: DataFrame, idCol: String, textCol: String,
      indexDir: String, batchId: Long, shingleN: Int = 3,
      numHashes: Int = 32, bands: Int = 8,
      threshold: Double = 0.5): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    require(!batch.columns.contains("dup_of") && !batch.columns.contains("sig"),
      "dedupeBatch reserves the 'dup_of' and 'sig' column names")
    val spark = batch.sparkSession
    val rows = numHashes / bands

    val sigs = batch.select(col(idCol).cast("long").as("doc_id"),
      DedupApprox.minhashSignatureHashed(
        DedupApprox.hashedShingles(col(textCol), shingleN), numHashes)
        .as("sig"))
    // one signature job; everything below reads this tiny table
    val sigPath = s"$indexDir/__stage/batch=$batchId"
    sigs.write.mode(SaveMode.Overwrite).parquet(sigPath)
    val batchSigs = spark.read.parquet(sigPath)

    // banded buckets derive from signatures ON READ — the index stores
    // one table (sigs); exploding k-long arrays reads fewer bytes than
    // a stored (band, bucket, id) table b rows wide, and saves a write
    // per batch
    def buckets(sigTable: DataFrame, as: String): DataFrame =
      sigTable.select(col("doc_id").as(as),
          explode(DedupApprox.bandHashes(col("sig"), bands, rows)).as("bh"))
        .select(col("bh.band").as("band"), col("bh.bucket").as("bucket"),
          col(as))
    // exclude THIS batch's partition from the index: under foreachBatch
    // replay it holds the prior attempt's output — reading it would both
    // re-match the batch against itself and race the overwrite below
    val indexSigs = readOrEmpty(spark, s"$indexDir/sigs",
      "doc_id LONG, sig ARRAY<LONG>", batchId)

    // candidates: batch vs index — ANY admitted doc is prior art,
    // whatever its id (an id-ordered tiebreak here would silently admit
    // near-dups of larger-id corpus docs) — plus batch vs its own
    // smaller ids (the in-batch tiebreak: smallest id wins)
    val priorSide = buckets(indexSigs, "prior_id")
      .withColumn("in_index", lit(true))
      .unionByName(buckets(batchSigs, "prior_id")
        .withColumn("in_index", lit(false)))
    val cand = buckets(batchSigs, "doc_id").join(priorSide, Seq("band", "bucket"))
      .filter(col("in_index") || col("prior_id") < col("doc_id"))
      .select(col("doc_id"), col("prior_id")).distinct()

    val priorSigs = indexSigs
      .unionByName(batchSigs)
      .select(col("doc_id").as("prior_id"), col("sig").as("prior_sig"))
    val matchFrac = {
      val eq = zip_with(col("sig"), col("prior_sig"),
        (a, b) => when(a === b, 1).otherwise(0))
      aggregate(eq, lit(0), (acc, x) => acc + x).cast("double") / numHashes
    }
    val dupOf = cand
      .join(batchSigs, "doc_id")
      .join(priorSigs, "prior_id")
      .filter(matchFrac >= threshold)
      .groupBy(col("doc_id")).agg(min(col("prior_id")).as("dup_of"))

    // ONE materialization carries the verdicts, the screened batch AND
    // the signatures — executed BEFORE the index partition overwrite
    // (nothing below may lazily re-run this plan), and every later
    // consumer (the novel-sig index commit, the caller's splits) reads
    // this tiny stage instead of re-scanning the source or re-running
    // the verdict join
    val screenedPath = s"$indexDir/__stage/screened_batch=$batchId"
    val staged = batch
      .withColumn("__did", col(idCol).cast("long"))
      .join(dupOf.withColumnRenamed("doc_id", "__vid"),
        col("__did") === col("__vid"), "left")
      // one sig row per DISTINCT id: a batch that re-delivers the same
      // id twice must not have its rows multiplied by the join
      .join(batchSigs.dropDuplicates("doc_id")
          .withColumnRenamed("doc_id", "__sid"),
        col("__did") === col("__sid"), "left")
      .drop("__vid", "__sid", "__did")
    val stagedSchema = staged.schema
    staged.write.mode(SaveMode.Overwrite).parquet(screenedPath)
    val screened = spark.read.schema(stagedSchema).parquet(screenedPath)

    // admit novel docs: commit their signatures under this batch's
    // partition (a replay rewrites the same partition; one sig per
    // distinct admitted id even if the batch re-delivered rows)
    screened.filter(col("dup_of").isNull)
      .select(col(idCol).cast("long").as("doc_id"), col("sig"))
      .dropDuplicates("doc_id")
      .write.mode(SaveMode.Overwrite)
      .parquet(s"$indexDir/sigs/batch=$batchId")
    screened.drop("sig")
  }

  private def readOrEmpty(spark: SparkSession, dir: String,
      ddl: String, excludeBatch: Long): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val schema = StructType.fromDDL(ddl)
    if (graft.util.HadoopIo.fsOf(p).exists(p))
      // partition-prune away the current batch (replay safety) and
      // project the index columns (drops the discovered partition col)
      spark.read.parquet(dir)
        .filter(col("batch") =!= excludeBatch)
        .select(schema.fieldNames.map(col): _*)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
  }

  /** The standing form: a document stream screened batch-by-batch
    * against the growing index; novel rows land in `outDir`, duplicates
    * in `outDir/../rejected` with their `dup_of` attribution. */
  def start(spark: SparkSession, sourceDir: String, sourceSchema: StructType,
      idCol: String, textCol: String, indexDir: String, outDir: String,
      rejectedDir: String, checkpointDir: String,
      shingleN: Int = 3, numHashes: Int = 32, bands: Int = 8,
      threshold: Double = 0.5): StreamingQuery = {
    spark.readStream.schema(sourceSchema)
      .option("maxFilesPerTrigger", 16)
      .parquet(sourceDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, bid: Long) =>
        // dedupeBatch's result is stage-backed: both splits below are
        // cheap reads of the screened stage, not re-screens
        val screened = dedupeBatch(batch, idCol, textCol, indexDir, bid,
          shingleN, numHashes, bands, threshold)
        screened.filter(col("dup_of").isNull).drop("dup_of")
          .write.mode(SaveMode.Overwrite).parquet(s"$outDir/batch=$bid")
        screened.filter(col("dup_of").isNotNull)
          .write.mode(SaveMode.Overwrite).parquet(s"$rejectedDir/batch=$bid")
        // both outputs are materialized — the batch's scratch (staged
        // signatures + screened image) has no live readers; a standing
        // query must not grow __stage forever
        val stage = new org.apache.hadoop.fs.Path(s"$indexDir/__stage")
        val fs = graft.util.HadoopIo.fsOf(stage)
        Seq(s"batch=$bid", s"screened_batch=$bid")
          .foreach { n =>
            val p = new org.apache.hadoop.fs.Path(stage, n)
            if (fs.exists(p)) fs.delete(p, true)
          }
        ()
      }
      .start()
  }
}
