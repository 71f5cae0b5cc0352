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
    * deterministically from the payload bytes — the fallback for formats
    * with no pure-JVM parser in this environment. */
  private def decodeStub(bytes: Array[Byte]): (Int, Int, Int) = {
    val h = java.util.Arrays.hashCode(bytes)
    val w = 64 + math.floorMod(h, 1024)
    val ht = 64 + math.floorMod(h >> 10, 1024)
    (w, ht, 3)
  }

  /** REAL header decode for BMP and WAV/RIFF (pure JVM — no codec libs
    * needed for header metadata; format layouts are public):
    *  - BMP: 'BM' magic; BITMAPINFOHEADER width/height as LE int32 at
    *    offsets 18/22, bits-per-pixel LE int16 at 28 → channels = bpp/8.
    *  - WAV: 'RIFF'+'WAVE' magic; fmt chunk → (sampleRate, bitsPerSample,
    *    channels) reported as (width, height, channels).
    * Unknown formats fall back to the deterministic stub (clearly the
    * place a JNI/vectorized codec plugs in). */
  private[ml] def parseHeader(bytes: Array[Byte]): (Int, Int, Int) = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    if (bytes.length >= 54 && bytes(0) == 'B' && bytes(1) == 'M') {
      val w = bb.getInt(18)
      val h = bb.getInt(22)
      val bpp = bb.getShort(28)
      (w, math.abs(h), math.max(1, bpp / 8)) // negative h = top-down BMP
    } else if (bytes.length >= 44 &&
        bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F' &&
        bytes(8) == 'W' && bytes(9) == 'A' && bytes(10) == 'V' && bytes(11) == 'E') {
      val channels = bb.getShort(22).toInt
      val sampleRate = bb.getInt(24)
      val bits = bb.getShort(34).toInt
      (sampleRate, bits, channels)
    } else decodeStub(bytes)
  }

  /** Build a minimal valid BMP (54-byte BITMAPINFOHEADER, 24bpp) with the
    * given dimensions and `payload` standing in for pixel data. */
  def bmpBytes(width: Int, height: Int, payload: Array[Byte]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(54 + payload.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte)
    bb.putInt(54 + payload.length) // file size
    bb.putInt(0)                   // reserved
    bb.putInt(54)                  // pixel-data offset
    bb.putInt(40)                  // DIB header size
    bb.putInt(width)
    bb.putInt(height)
    bb.putShort(1)                 // planes
    bb.putShort(24)                // bpp
    bb.putInt(0)                   // compression: BI_RGB
    bb.putInt(payload.length)      // image size
    bb.putInt(2835).putInt(2835)   // 72 dpi
    bb.putInt(0).putInt(0)         // palette
    bb.put(payload)
    bb.array()
  }

  /** Build a minimal valid WAV header (44 bytes, PCM) + payload. */
  def wavBytes(sampleRate: Int, bitsPerSample: Int, channels: Int,
      payload: Array[Byte]): Array[Byte] = {
    val byteRate = sampleRate * channels * bitsPerSample / 8
    val bb = java.nio.ByteBuffer.allocate(44 + payload.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes)
    bb.putInt(36 + payload.length)
    bb.put("WAVE".getBytes)
    bb.put("fmt ".getBytes)
    bb.putInt(16)                        // PCM fmt chunk size
    bb.putShort(1)                       // PCM
    bb.putShort(channels.toShort)
    bb.putInt(sampleRate)
    bb.putInt(byteRate)
    bb.putShort((channels * bitsPerSample / 8).toShort) // block align
    bb.putShort(bitsPerSample.toShort)
    bb.put("data".getBytes)
    bb.putInt(payload.length)
    bb.put(payload)
    bb.array()
  }

  /** Deterministic BMP media fixture from a documents-like frame: each
    * row becomes a real BMP whose dimensions derive from the row
    * (width = 16 + len(text) mod 512, height = 16 + id mod 256) and whose
    * pixel payload is the text bytes — giving decode() a header a real
    * parser must read, with dimensions an external oracle can predict. */
  def bmpFromDocs(df: DataFrame, idCol: String, textCol: String)(
      implicit spark: SparkSession): Dataset[MediaRecord] = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol).cast("string"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val payload = text.getBytes("UTF-8")
        MediaRecord(id,
          bmpBytes(16 + payload.length % 512, 16 + (id % 256).toInt, payload),
          "image/bmp", "synthetic")
      }
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
      // BMP/WAV headers parse for real; other formats hit the stub — a
      // full codec (JNI/vectorized) initializes here, once per partition
      it.map { r =>
        val (w, h, c) = parseHeader(r.media)
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
