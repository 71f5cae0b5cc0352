package graft.jobs

import graft.SparkSpec

/** `CurationIngestJob` — the standing tag → gate → dedup → admit
  * service, exactly-once across restarts. */
class CurationIngestJobSpec extends SparkSpec {
  import spark.implicits._

  // pure-alpha distinct tokens (digits would trip attr_digit_heavy)
  private def alphaWords(prefix: String, n: Int): String =
    (0 until n).map(i =>
      s"$prefix${('a' + i / 26).toChar}${('a' + i % 26).toChar}")
      .mkString(" ")

  test("quality rejects keep tags, dups keep dup_of, novel clean docs land") {
    val root = java.nio.file.Files.createTempDirectory("graft-curing")
    val src = s"$root/src"
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "doc_id LONG, text STRING")
    def run(): Unit = {
      val q = CurationIngestJob.start(spark, src, schema, "doc_id",
        "text", s"$root/index", s"$root/out", s"$root/rejected",
        s"$root/ckpt")
      q.awaitTermination()
    }
    Seq(
      (1L, alphaWords("rho", 30)),  // clean + novel → admitted
      (2L, "too short"),            // quality reject (too_short)
      (3L, alphaWords("sig", 30)),  // clean + novel → admitted
      (4L, null: String))           // NULL text → quality reject, tagged
      .toDF("doc_id", "text").coalesce(1)
      .write.mode("append").parquet(src)
    run()
    // second shard arrives while the job is down
    Seq(
      (11L, alphaWords("rho", 30)), // near-dup of 1 → dup reject
      (12L, alphaWords("tau", 30)), // clean + novel → admitted
      (13L, ("x1 " * 30).trim))     // digit-heavy → quality reject
      .toDF("doc_id", "text").coalesce(1)
      .write.mode("append").parquet(src)
    run()

    val admitted = spark.read.parquet(s"$root/out")
      .select($"doc_id").as[Long].collect().toSet
    assert(admitted == Set(1L, 3L, 12L))
    val quality = spark.read.parquet(s"$root/rejected/quality")
      .select($"doc_id", $"tags").as[(Long, Seq[String])].collect().toMap
    assert(quality.keySet == Set(2L, 4L, 13L))
    assert(quality(2L).contains("too_short"))
    assert(quality(4L) == Seq("null_text")) // accounted for, attributable
    assert(quality(13L).contains("digit_heavy"))
    val dups = spark.read.parquet(s"$root/rejected/dups")
      .select($"doc_id", $"dup_of").as[(Long, Long)].collect().toSet
    assert(dups == Set((11L, 1L)))
    // restart with nothing new: exactly-once — no output grows
    run()
    assert(spark.read.parquet(s"$root/out").count() == 3L)
    assert(spark.read.parquet(s"$root/rejected/quality").count() == 3L)
    assert(spark.read.parquet(s"$root/rejected/dups").count() == 1L)
  }
}
