package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class AppliersSpec extends SparkSpec {
  import spark.implicits._

  private lazy val batch = Seq(
    // (pk, seq, op, v)
    (1L, 1L, "INSERT", "a1"), (1L, 2L, "UPDATE", "a2"),
    (2L, 3L, "UPDATE", "b1"), (2L, 4L, "DELETE", "b1"),
    (3L, 5L, "UPDATE", "c1"),
    (4L, 6L, "INSERT", "d1"), (4L, 7L, "DELETE", "d1"), (4L, 8L, "INSERT", "d2")
  ).toDF("pk", "seq", "op", "v")

  test("mergeToFinalImages collapses to one action per key") {
    val got = Appliers.mergeToFinalImages(batch, Seq("pk"), "seq", "op")
      .select("pk", "v", "effective_op").as[(Long, String, String)]
      .collect().toSet
    assert(got == Set(
      (1L, "a2", "REPLACE"),  // insert+update → replace with last image
      (2L, "b1", "DELETE"),   // update then delete → delete
      (3L, "c1", "UPDATE"),   // bare update stays update
      (4L, "d2", "REPLACE"))) // ins/del/ins → replace
  }

  test("upsert applies final images onto a target snapshot") {
    val target = Seq((1L, "old1"), (2L, "old2"), (9L, "keep"))
      .toDF("pk", "v")
    val images = Appliers.mergeToFinalImages(batch, Seq("pk"), "seq", "op")
      .select("pk", "v", "effective_op")
    val got = Appliers.upsert(target, images, Seq("pk"))
      .as[(Long, String)].collect().toSet
    assert(got == Set((1L, "a2"), (3L, "c1"), (4L, "d2"), (9L, "keep")))
  }

  test("splitByKey keeps each key in one partition, ordered by seq") {
    val laid = Appliers.splitByKey(batch, Seq("pk"), "seq", 3)
    val perPart = laid.select("pk", "seq").rdd.mapPartitionsWithIndex {
      (i, it) => it.map(r => (i, r.getLong(0), r.getLong(1)))
    }.collect()
    // no key spans two partitions
    val keyParts = perPart.groupBy(_._2).view.mapValues(_.map(_._1).toSet)
    assert(keyParts.values.forall(_.size == 1))
    // within a partition, rows of one key are seq-ascending
    perPart.groupBy(x => (x._1, x._2)).foreach { case (_, rows) =>
      val seqs = rows.map(_._3).toSeq
      assert(seqs == seqs.sorted)
    }
  }

  test("flagKeyChanges marks before/after key mismatches") {
    val df = Seq((1L, 1L), (2L, 5L)).toDF("bk", "ak")
    val got = Appliers.flagKeyChanges(df, $"bk", $"ak")
      .select("bk", "pk_changed").as[(Long, Boolean)].collect().toMap
    assert(got == Map(1L -> false, 2L -> true))
  }

  test("applyBatchToParquet round-trips through a parquet target") {
    val dir = java.nio.file.Files.createTempDirectory("graft-apply")
      .resolve("target").toString
    Appliers.applyBatchToParquet(batch, Seq("pk"), "seq", "op", dir)
    val after1 = spark.read.parquet(dir).select("pk", "v")
      .as[(Long, String)].collect().toSet
    assert(after1 == Set((1L, "a2"), (3L, "c1"), (4L, "d2")))
    // second batch: delete pk=1, update pk=3, insert pk=7
    val b2 = Seq((1L, 10L, "DELETE", "a2"), (3L, 11L, "UPDATE", "c9"),
      (7L, 12L, "INSERT", "g1")).toDF("pk", "seq", "op", "v")
    Appliers.applyBatchToParquet(b2, Seq("pk"), "seq", "op", dir)
    val after2 = spark.read.parquet(dir).select("pk", "v")
      .as[(Long, String)].collect().toSet
    assert(after2 == Set((3L, "c9"), (4L, "d2"), (7L, "g1")))
  }
}
