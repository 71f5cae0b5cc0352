package graft

import org.apache.spark.sql.functions._
import graft.functions.sketch

/** The SQL surface of the native sketch expressions, registered through
  * `spark.sql.extensions=graft.GraftExtensions` (SparkSpec's builder sets
  * it, so this session IS an extension-loaded session — the test proves
  * the injection path, not a side-channel registration). */
class GraftExtensionsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy dog"),
    (3L, "a completely different document body here"),
    (4L, "")
  ).toDF("id", "body")

  test("extension-registered SQL functions exist in the catalog") {
    val names = spark.sql("SHOW FUNCTIONS").as[String].collect().toSet
    for (f <- Seq("hashed_shingles", "minhash_signature", "simhash64",
        "nfc_normalize"))
      assert(names.exists(_.endsWith(f)), s"$f not registered")
  }

  test("SQL hashed_shingles/minhash_signature/simhash64 ≡ Column API") {
    docs.createOrReplaceTempView("ext_docs")
    val viaSql = spark.sql(
      """SELECT id,
        |  hashed_shingles(body, 3) AS hs,
        |  minhash_signature(hashed_shingles(body, 3), 16) AS sig,
        |  simhash64(hashed_shingles(body, 1)) AS sh
        |FROM ext_docs""".stripMargin)
      .as[(Long, Seq[Long], Seq[Long], Long)].collect().sortBy(_._1)
    val viaCols = docs.select($"id",
        sketch.hashed_shingles($"body", 3).as("hs"),
        sketch.minhash_signature(sketch.hashed_shingles($"body", 3), 16).as("sig"),
        sketch.simhash64(sketch.hashed_shingles($"body", 1)).as("sh"))
      .as[(Long, Seq[Long], Seq[Long], Long)].collect().sortBy(_._1)
    assert(viaSql.toSeq == viaCols.toSeq)
    // sanity: identical docs agree, different doc does not
    val byId = viaSql.map(r => r._1 -> r._4).toMap
    assert(byId(1L) == byId(2L))
    assert(byId(1L) != byId(3L))
  }

  test("SQL nfc_normalize ≡ Column API and composes normalization") {
    // decomposed e + combining acute (NFD) normalizes to the composed
    // form; the SQL path must be the same codegen expression
    Seq((1L, "cafe\u0301"), (2L, "already nfc"))
      .toDF("id", "t").createOrReplaceTempView("ext_nfc")
    val viaSql = spark.sql(
        "SELECT id, nfc_normalize(t) AS n FROM ext_nfc")
      .as[(Long, String)].collect().sortBy(_._1)
    assert(viaSql(0)._2 == "caf\u00e9")
    assert(viaSql(1)._2 == "already nfc")
  }

  test("non-literal int parameter is rejected at analysis time") {
    docs.createOrReplaceTempView("ext_docs")
    val e = intercept[Exception] {
      spark.sql("SELECT minhash_signature(hashed_shingles(body, 3), id) FROM ext_docs")
        .collect()
    }
    assert(e.getMessage.contains("integer literal")
      || Option(e.getCause).exists(_.getMessage.contains("integer literal")))
  }
}
