package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SketchExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val arrays = Seq(
    (1L, Seq(10L, 20L, 30L)),
    (2L, Seq(10L, 20L, 30L)),          // identical → identical sketches
    (3L, Seq(10L, 20L, 30L, 40L, 50L)), // superset → mostly-equal minhash
    (4L, Seq.empty[Long])
  ).toDF("id", "hs")

  test("minhash_signature: deterministic, k slots, empty → MaxValue slots") {
    val sig = arrays.select($"id",
      sketch.minhash_signature($"hs", 16).as("sig"))
    val m = sig.as[(Long, Seq[Long])].collect().toMap
    assert(m.values.forall(_.length == 16))
    assert(m(1L) == m(2L))
    assert(m(4L).forall(_ == Long.MaxValue))
    // superset agrees on most slots (minhash property: agreement ≈ jaccard = 3/5)
    val agree = m(1L).zip(m(3L)).count { case (a, b) => a == b }
    assert(agree >= 4, s"agreement too low: $agree/16")
    assert(agree < 16)
  }

  test("minhash_signature: interpreted eval matches codegen") {
    // force interpreted path by eval'ing the expression directly
    val expr = MinHashSignature(
      org.apache.spark.sql.graftbridge.ColumnBridge.expression(lit(null)), 8)
    val data = org.apache.spark.sql.catalyst.util.ArrayData
      .toArrayData(Array(10L, 20L, 30L))
    val interpreted = expr.nullSafeEval(data)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toLongArray()
    val viaPlan = arrays.filter($"id" === 1L)
      .select(sketch.minhash_signature($"hs", 8))
      .as[Seq[Long]].head()
    assert(interpreted.toSeq == viaPlan)
  }

  test("simhash64: deterministic, empty → 0, near inputs near in hamming") {
    val fp = arrays.select($"id", sketch.simhash64($"hs").as("fp"))
      .as[(Long, Long)].collect().toMap
    assert(fp(1L) == fp(2L))
    assert(fp(4L) == 0L)
    val dist = java.lang.Long.bitCount(fp(1L) ^ fp(3L))
    assert(dist <= 32, s"superset drifted too far: $dist")
  }

  test("simhash64: interpreted eval matches codegen") {
    val expr = SimHash64(
      org.apache.spark.sql.graftbridge.ColumnBridge.expression(lit(null)))
    val data = org.apache.spark.sql.catalyst.util.ArrayData
      .toArrayData(Array(10L, 20L, 30L))
    val interpreted = expr.nullSafeEval(data).asInstanceOf[Long]
    val viaPlan = arrays.filter($"id" === 1L)
      .select(sketch.simhash64($"hs")).as[Long].head()
    assert(interpreted == viaPlan)
  }

  test("null input propagates null") {
    val df = Seq((1L, Option.empty[Seq[Long]])).toDF("id", "hs")
    val got = df.select(sketch.minhash_signature($"hs", 4).as("s"),
      sketch.simhash64($"hs").as("f")).head()
    assert(got.isNullAt(0) && got.isNullAt(1))
  }

  test("nfc_normalize: composes decomposed accents; NFC text unchanged") {
    val df = Seq(
      (1L, "café menu"),   // e + combining acute → é
      (2L, "café menu"),    // already precomposed
      (3L, "plain ascii"),
      (4L, "Å ring"))      // A + combining ring → Å
      .toDF("id", "text")
    val got = df.select($"id", sketch.nfc_normalize($"text").as("n"))
      .as[(Long, String)].collect().toMap
    assert(got(1L) == "café menu")
    assert(got(1L) == got(2L))
    assert(got(3L) == "plain ascii")
    assert(got(4L) == "Å ring")
  }

  test("nfc_normalize: interpreted eval matches codegen; null propagates") {
    import org.apache.spark.unsafe.types.UTF8String
    val expr = NfcNormalize(
      org.apache.spark.sql.graftbridge.ColumnBridge.expression(lit(null)))
    val interpreted = expr
      .nullSafeEval(UTF8String.fromString("café")).toString
    val viaPlan = Seq("café").toDF("t")
      .select(sketch.nfc_normalize($"t")).as[String].head()
    assert(interpreted == viaPlan && viaPlan == "café")
    val nulls = Seq(Option.empty[String]).toDF("t")
      .select(sketch.nfc_normalize($"t")).head()
    assert(nulls.isNullAt(0))
  }
}
