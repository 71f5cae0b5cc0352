package graft.ml

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._
  private implicit def sp: SparkSession = spark

  private lazy val media = Multimodal.mediaFromText(
    Seq((1L, "hello world"), (2L, "a much longer payload body for frames"))
      .toDF("id", "text"), "id", "text").as[Multimodal.MediaRecord]

  test("mediaFromText builds binary payloads with metadata") {
    val rows = media.collect().sortBy(_.media_id)
    assert(rows.map(_.media_id).toSeq == Seq(1L, 2L))
    assert(new String(rows(0).media, "UTF-8") == "hello world")
    assert(rows.forall(_.mime == "image/fake"))
  }

  test("decode is deterministic and emits plausible metadata") {
    val a = Multimodal.decode(media).collect().sortBy(_.media_id)
    val b = Multimodal.decode(media).collect().sortBy(_.media_id)
    assert(a.toSeq == b.toSeq)
    assert(a.forall(m => m.width >= 64 && m.height >= 64 && m.channels == 3))
    assert(a(0).n_bytes == "hello world".length)
  }

  test("BMP header round-trip: build then parse recovers the dimensions") {
    val payload = "pixels".getBytes
    val bmp = Multimodal.bmpBytes(640, 480, payload)
    assert(Multimodal.parseHeader(bmp) == ((640, 480, 3)))
    // top-down BMP (negative height) normalizes
    val bb = java.nio.ByteBuffer.wrap(bmp.clone())
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(22, -480)
    assert(Multimodal.parseHeader(bb.array()) == ((640, 480, 3)))
  }

  test("WAV header round-trip: sampleRate/bits/channels recovered") {
    val wav = Multimodal.wavBytes(44100, 16, 2, Array.fill(10)(0.toByte))
    assert(Multimodal.parseHeader(wav) == ((44100, 16, 2)))
    assert(Multimodal.parseHeader(Multimodal.wavBytes(8000, 8, 1,
      Array.empty)) == ((8000, 8, 1)))
  }

  test("decode parses real BMP fixtures end-to-end") {
    val docs = Seq((7L, "abc"), (300L, "a longer text body here"))
      .toDF("doc_id", "text")
    val metas = Multimodal.decode(Multimodal.bmpFromDocs(docs, "doc_id", "text"))
      .collect().sortBy(_.media_id)
    assert(metas(0).width == 16 + 3 && metas(0).height == 16 + 7)
    assert(metas(0).n_bytes == 54 + 3 && metas(0).channels == 3)
    assert(metas(1).height == 16 + (300 % 256))
  }

  test("extractFeatures yields fixed-dim deterministic vectors in batches") {
    val f1 = Multimodal.extractFeatures(media, dim = 8, batchSize = 1)
      .collect().sortBy(_.media_id)
    val f2 = Multimodal.extractFeatures(media, dim = 8, batchSize = 64)
      .collect().sortBy(_.media_id)
    assert(f1.forall(_.features.length == 8))
    // batch size must not change results
    assert(f1.map(_.features.toSeq).toSeq == f2.map(_.features.toSeq).toSeq)
    // different payloads → different features
    assert(f1(0).features.toSeq != f1(1).features.toSeq)
  }

  test("frameSample emits every k-th chunk with bounded amplification") {
    val df = Multimodal.frameSample(media.toDF(), "media", chunkBytes = 8, everyK = 2)
    val rows = df.select("media_id", "frame_idx", "frame")
      .as[(Long, Int, String)].collect()
    // doc2: 38 bytes → 5 chunks → frames 0,2,4
    val doc2 = rows.filter(_._1 == 2L).map(_._2).sorted.toSeq
    assert(doc2 == Seq(0, 2, 4))
    val frame0 = rows.find(r => r._1 == 2L && r._2 == 0).get._3
    assert(frame0 == "a much l")
  }
}
