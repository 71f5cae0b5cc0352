package graft.ml

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, batch-oriented decode / feature-extract /
  * resize / frame-sample stages.
  *
  * The Spark-side machinery (schema, partition sizing, per-partition batch
  * iteration, output shape) is real and tested; the codec step itself is a
  * clearly-marked DETERMINISTIC STUB (no image/audio libraries in this
  * environment). Swapping `decodeStub`/`featuresStub` for a real decoder
  * (JNI or vectorized batch UDF) changes no plumbing.
  */
object Multimodal {

  /** Typed media record: what a 100 TB media lake's rows look like. */
  final case class MediaRecord(media_id: Long, media: Array[Byte],
      mime: String, source: String)
  final case class MediaMeta(media_id: Long, n_bytes: Long, width: Int,
      height: Int, channels: Int)
  final case class MediaFeatures(media_id: Long, features: Array[Float])

  /** Build a media frame from any (id, string) source — the string bytes
    * stand in for encoded media (deterministic fake payload). */
  def mediaFromText(df: DataFrame, idCol: String, textCol: String,
      mime: String = "image/fake"): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      col(textCol).cast("binary").as("media"),
      lit(mime).as("mime"),
      lit("synthetic").as("source"))

  /** STUB decode: derives plausible (width, height, channels) metadata
    * deterministically from the payload bytes. A real implementation reads
    * the codec header; everything around it is the production path. */
  private def decodeStub(bytes: Array[Byte]): (Int, Int, Int) = {
    val h = java.util.Arrays.hashCode(bytes)
    val w = 64 + math.floorMod(h, 1024)
    val ht = 64 + math.floorMod(h >> 10, 1024)
    (w, ht, 3)
  }

  /** STUB feature extraction: `dim` floats derived from a rolling hash of
    * the payload. A real implementation runs a vision/audio encoder over
    * the decoded batch; the per-partition batching below is exactly where
    * a model-inference call sits (one model load per partition, batched
    * input). */
  private def featuresStub(bytes: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    var acc = 1469598103934665603L // FNV offset basis
    var i = 0
    while (i < bytes.length) { acc = (acc ^ bytes(i)) * 1099511628211L; i += 1 }
    var j = 0
    var s = acc
    while (j < dim) {
      s = s * 6364136223846793005L + 1442695040888963407L // splitmix-ish
      out(j) = ((s >>> 40).toInt % 1000) / 1000.0f
      j += 1
    }
    out
  }

  /** Decode stage: per-partition iteration (mapPartitions) so a real codec
    * initializes once per partition, not once per row. */
  def decode(media: Dataset[MediaRecord])(implicit spark: SparkSession): Dataset[MediaMeta] = {
    import spark.implicits._
    media.mapPartitions { it =>
      // real impl: open codec context here, close on iterator end
      it.map { r =>
        val (w, h, c) = decodeStub(r.media)
        MediaMeta(r.media_id, r.media.length.toLong, w, h, c)
      }
    }
  }

  /** Feature-extract stage: batches of `batchSize` rows per inference call
    * (the shape a GPU/ONNX runtime wants), emitted flat. */
  def extractFeatures(media: Dataset[MediaRecord], dim: Int = 64,
      batchSize: Int = 64)(implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // real impl: one model.forward(batch) call here
        batch.map(r => MediaFeatures(r.media_id, featuresStub(r.media, dim)))
      }
    }
  }

  /** Frame-sample stage (video analog): every k-th "frame" (chunk) of the
    * payload as its own row — demonstrates the explode-shaped output of a
    * frame sampler with bounded per-row amplification. */
  def frameSample(df: DataFrame, mediaCol: String, chunkBytes: Int,
      everyK: Int): DataFrame =
    df.withColumn("n_frames",
        greatest(ceil(length(col(mediaCol)) / chunkBytes.toDouble), lit(1)).cast("int"))
      .withColumn("frame_idx",
        explode(filter(sequence(lit(0), col("n_frames") - 1),
          i => i % everyK === 0)))
      .withColumn("frame",
        expr(s"substring(cast($mediaCol as string), frame_idx * $chunkBytes + 1, $chunkBytes)"))
      .drop("n_frames")
}
