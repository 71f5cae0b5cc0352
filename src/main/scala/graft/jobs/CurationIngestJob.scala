package graft.jobs

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.text.{Attributes, IncrementalDedup}

/** The standing curation service — the streaming counterpart of the
  * q80 batch pipeline, run the way a crawl actually arrives: documents
  * stream in, each micro-batch is attribute-tagged (`text/Attributes`,
  * tag-don't-drop), quality rejects are PRESERVED with their tags (the
  * Dolma attributes-file discipline: an audit is a GROUP BY, a
  * threshold change is a re-filter of the rejects, not a re-crawl),
  * survivors are screened against the growing near-dup index
  * (`text/IncrementalDedup` — banded MinHash vs everything already
  * accepted, per-batch pruned probes), and the novel clean documents
  * land in the corpus.
  *
  * Exactly-once across restarts: every output is written
  * `SaveMode.Overwrite` under `batch=<id>` with the streaming
  * checkpoint owning the batch ids — a replayed trigger overwrites its
  * own outputs byte-identically (the OrderedSink/IncrementalDedup
  * stance), and the dedup index commit is batch-id idempotent.
  *
  * Outputs:
  *  - `outDir/batch=<id>`            — novel, quality-passing docs
  *  - `rejectedDir/quality/batch=<id>` — keep=false docs + their tags
  *  - `rejectedDir/dups/batch=<id>`    — near-dups + `dup_of`
  */
object CurationIngestJob {

  def start(spark: SparkSession, sourceDir: String,
      sourceSchema: StructType, idCol: String, textCol: String,
      indexDir: String, outDir: String, rejectedDir: String,
      checkpointDir: String, shingleN: Int = 3, numHashes: Int = 32,
      bands: Int = 8, threshold: Double = 0.5,
      maxFilesPerTrigger: Int = 16): StreamingQuery = {
    spark.readStream.schema(sourceSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(sourceDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, bid: Long) =>
        // NULL text (realistic in a crawl feed) yields keep=NULL from
        // the attribute expressions, and NULL fails BOTH keep filters —
        // the doc would silently vanish from every output, breaking the
        // every-doc-accounted-for discipline. Route it explicitly: a
        // quality reject with its own attributable tag.
        val tagged = Attributes.tag(batch, textCol)
          .withColumn("tags", when(col(textCol).isNull,
            array(lit("null_text"))).otherwise(col("tags")))
          .withColumn("keep", coalesce(col("keep"), lit(false)))
        tagged.filter(!col("keep"))
          .select(col(idCol), col(textCol), col("tags"))
          .write.mode(SaveMode.Overwrite)
          .parquet(s"$rejectedDir/quality/batch=$bid")
        val pass = tagged.filter(col("keep"))
          .select(batch.columns.map(col).toIndexedSeq: _*)
        // screened is stage-backed: the two splits below read the
        // screened stage, they do not re-run the banded join
        val screened = IncrementalDedup.dedupeBatch(pass, idCol, textCol,
          indexDir, bid, shingleN, numHashes, bands, threshold)
        screened.filter(col("dup_of").isNull).drop("dup_of")
          .write.mode(SaveMode.Overwrite).parquet(s"$outDir/batch=$bid")
        screened.filter(col("dup_of").isNotNull)
          .write.mode(SaveMode.Overwrite)
          .parquet(s"$rejectedDir/dups/batch=$bid")
        IncrementalDedup.cleanupBatchScratch(indexDir, bid)
      }
      .start()
  }
}
