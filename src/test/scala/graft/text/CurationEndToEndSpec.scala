package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The whole training-data path composed end to end over the real
  * testdata tables — the "a user runs their pipeline on this library"
  * smoke: tag → quality gate → exact dedup → split assignment → shard
  * export, with CONSERVATION asserted at every boundary (every input
  * document is accounted for exactly once; nothing vanishes, nothing
  * doubles — the discipline each stage promises individually, checked
  * here across their composition). */
class CurationEndToEndSpec extends SparkSpec {
  import spark.implicits._

  test("tag -> gate -> dedup -> split -> shard: documents conserved at every boundary") {
    val docs = graft.sources.Tables.documents(spark, sf)
      .select($"doc_id", $"text")
    val total = docs.count()
    assert(total > 0)

    // 1. attribute tagging (tag-don't-drop): all rows survive, keep is
    //    a column — accounting starts intact
    val tagged = Attributes.tag(docs, "text")
      .withColumn("keep", coalesce($"keep", lit(false)))
    assert(tagged.count() == total)
    val kept = tagged.filter($"keep").select($"doc_id", $"text")
    val rejected = tagged.filter(!$"keep").count()

    // 2. exact dedup on normalized text fingerprints: winners + dups
    val keyed = kept.withColumn("k", md5(NfcSupport.normalized($"text")))
    val winners = keyed
      .withColumn("__rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy($"k").orderBy($"doc_id")))
      .filter($"__rn" === 1).drop("__rn")
    val dups = keyed.count() - winners.count()
    assert(winners.count() + dups + rejected == total)

    // 3. split assignment: total function over the winners
    val splits = Seq("train" -> 58982, "val" -> 3277, "test" -> 3277)
    val assigned = winners.withColumn("split",
      Sampling.assignSplit($"doc_id", "e2e", splits))
    assert(assigned.filter($"split".isNull).count() == 0)
    val bySplit = assigned.groupBy($"split").count()
      .as[(String, Long)].collect().toMap
    assert(bySplit.values.sum == winners.count())

    // 4. shard export of the train split; the manifest accounts for
    //    every exported document and the written layout reads back whole
    val out = java.nio.file.Files.createTempDirectory("graft-e2e")
      .toString
    val train = assigned.filter($"split" === "train")
      .select($"doc_id", $"text")
    Sharding.writeShards(train, "doc_id", salt = "e2e", hexDigits = 1,
      outDir = out)
    val manifest = Sharding.shardStats(train, "doc_id", salt = "e2e",
      hexDigits = 1).agg(sum($"n_docs")).as[Long].head()
    assert(manifest == bySplit("train"))
    val back = spark.read.parquet(out)
    assert(back.count() == bySplit("train"))
    assert(back.select($"doc_id").distinct().count() == bySplit("train"))
  }

  /** NFC normalization helper shared with the q76 path. */
  private object NfcSupport {
    def normalized(c: org.apache.spark.sql.Column) =
      org.apache.spark.sql.functions.call_function("nfc_normalize", c)
  }
}
