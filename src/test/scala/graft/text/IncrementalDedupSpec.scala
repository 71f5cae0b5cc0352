package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** `IncrementalDedup` — batch-over-index near-dup screening. */
class IncrementalDedupSpec extends SparkSpec {
  import spark.implicits._

  private def words(prefix: String, n: Int): String =
    (1 to n).map(i => s"$prefix$i").mkString(" ")

  test("new batch screens against the admitted index; novel docs are admitted") {
    val dir = java.nio.file.Files.createTempDirectory("graft-incdedup").toString
    val b1 = Seq(
      (1L, words("alpha", 30)), (2L, words("beta", 30)),
      (3L, words("gamma", 30)), (4L, words("delta", 30)))
      .toDF("doc_id", "text")
    val r1 = IncrementalDedup.dedupeBatch(b1, "doc_id", "text",
      s"$dir/index", batchId = 0L)
    assert(r1.filter($"dup_of".isNotNull).count() == 0)

    val b2 = Seq(
      // near-copy of doc 2: first two words dropped
      (11L, words("beta", 30).split(" ").drop(2).mkString(" ")),
      (12L, words("epsilon", 30)), // novel
      (13L, words("delta", 30)), // exact copy of doc 4
      // SMALLER id than its admitted original: the index match must
      // still reject it (id order carries no authority vs the corpus)
      (0L, words("gamma", 30)))
      .toDF("doc_id", "text")
    val r2 = IncrementalDedup.dedupeBatch(b2, "doc_id", "text",
      s"$dir/index", batchId = 1L)
      .select($"doc_id", $"dup_of").as[(Long, Option[Long])]
      .collect().toMap
    assert(r2 == Map(11L -> Some(2L), 12L -> None, 13L -> Some(4L),
      0L -> Some(3L)))

    // the index admitted ONLY the novel doc from batch 1+2
    val indexed = spark.read.parquet(s"$dir/index/sigs")
      .select($"doc_id").as[Long].collect().toSet
    assert(indexed == Set(1L, 2L, 3L, 4L, 12L))
  }

  test("within-batch duplicates resolve to the smallest id; replay is idempotent") {
    val dir = java.nio.file.Files.createTempDirectory("graft-incdedup2").toString
    val b = Seq(
      (21L, words("zeta", 30)),
      (22L, words("zeta", 30)), // in-batch dup of 21
      (23L, words("eta", 30)))
      .toDF("doc_id", "text")
    def run() = IncrementalDedup.dedupeBatch(b, "doc_id", "text",
        s"$dir/index", batchId = 7L)
      .select($"doc_id", $"dup_of").as[(Long, Option[Long])]
      .collect().toMap
    val first = run()
    assert(first == Map(21L -> None, 22L -> Some(21L), 23L -> None))
    // replay of the same batch id: same answer, index unchanged
    assert(run() == first)
    val indexed = spark.read.parquet(s"$dir/index/sigs")
      .select($"doc_id").as[Long].collect().toSet
    assert(indexed == Set(21L, 23L))
  }

  test("compactIndex folds history into batch=-1; attribution survives") {
    val dir = java.nio.file.Files.createTempDirectory("graft-incdedup5").toString
    val idx = s"$dir/index"
    IncrementalDedup.dedupeBatch(
      Seq((1L, words("kappa", 30)), (2L, words("lambda", 30)))
        .toDF("doc_id", "text"), "doc_id", "text", idx, batchId = 0L)
    IncrementalDedup.dedupeBatch(
      Seq((3L, words("mu", 30))).toDF("doc_id", "text"),
      "doc_id", "text", idx, batchId = 1L)

    IncrementalDedup.compactIndex(spark, idx, upToBatch = 1L)
    def batchDirs(sub: String) =
      new java.io.File(s"$idx/$sub").listFiles
        .filter(f => f.isDirectory && f.getName.startsWith("batch="))
        .map(_.getName).toSet
    assert(batchDirs("sigs") == Set("batch=-1"))
    assert(batchDirs("buckets") == Set("batch=-1"))

    // a post-compaction batch still screens against the folded history
    val r = IncrementalDedup.dedupeBatch(
      Seq((9L, words("lambda", 30)), (10L, words("nu", 30)))
        .toDF("doc_id", "text"), "doc_id", "text", idx, batchId = 2L)
      .select($"doc_id", $"dup_of").as[(Long, Option[Long])]
      .collect().toMap
    assert(r == Map(9L -> Some(2L), 10L -> None))

    // second compaction folds the new batch into the same partition;
    // content is the union (nothing lost, nothing doubled)
    IncrementalDedup.compactIndex(spark, idx, upToBatch = 2L)
    assert(batchDirs("sigs") == Set("batch=-1"))
    val sigIds = spark.read.parquet(s"$idx/sigs")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(sigIds == Seq(1L, 2L, 3L, 10L))
  }

  test("crash between swap steps heals at the PROBE, not only at compaction") {
    val dir = java.nio.file.Files.createTempDirectory("graft-incdedup6").toString
    val idx = s"$dir/index"
    IncrementalDedup.dedupeBatch(
      Seq((1L, words("xi", 30))).toDF("doc_id", "text"),
      "doc_id", "text", idx, batchId = 0L)
    IncrementalDedup.compactIndex(spark, idx, upToBatch = 0L)
    // simulate the crash window: compacted partition moved aside, its
    // replacement never landed
    for (sub <- Seq("sigs", "buckets")) {
      val ok = new java.io.File(s"$idx/$sub/batch=-1")
        .renameTo(new java.io.File(s"$idx/$sub/.compact_old"))
      assert(ok)
    }
    // the NEXT BATCH must still see doc 1 as prior art: if the probe
    // did not restore the aside partition, the duplicate would be
    // admitted as novel — a wrong verdict, not just duplicate work
    val r = IncrementalDedup.dedupeBatch(
      Seq((5L, words("xi", 30))).toDF("doc_id", "text"),
      "doc_id", "text", idx, batchId = 1L)
      .select($"dup_of").as[Option[Long]].collect().toSeq
    assert(r == Seq(Some(1L)))
    val sigIds = spark.read.parquet(s"$idx/sigs")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(sigIds == Seq(1L)) // duplicate not admitted; history restored
  }

  test("an index from the old partition-dir layout fails loudly, not deep in a plan") {
    val dir = java.nio.file.Files.createTempDirectory("graft-incdedup7").toString
    // fabricate the pre-flat layout: bucket files without the pp column
    Seq((0, 12345, 1L)).toDF("band", "bucket", "doc_id")
      .write.parquet(s"$dir/index/buckets/batch=0")
    val e = intercept[RuntimeException] {
      IncrementalDedup.prunedIndexBuckets(spark, s"$dir/index",
        excludeBatch = 1L, Seq((0, 1)), bucketParts = 16).collect()
    }
    assert(e.getMessage.contains("pp") && e.getMessage.contains("Rebuild"),
      e.getMessage)
  }

  test("probe prunes at the scan: flat sorted files, pushed IN on the key") {
    val dir = java.nio.file.Files.createTempDirectory("graft-incdedup4").toString
    // admit a wide batch: its banded buckets span many pp values
    val wide = (1 to 40).map(i => (i.toLong, words(s"corpus$i", 30)))
      .toDF("doc_id", "text")
    IncrementalDedup.dedupeBatch(wide, "doc_id", "text", s"$dir/index",
      batchId = 0L)
    // the batch commit is FLAT — no per-key partition directories (a
    // K-dir dynamic commit costs K metadata round-trips per batch)
    val bucketRoot = new java.io.File(s"$dir/index/buckets/batch=0")
    assert(bucketRoot.isDirectory)
    assert(!bucketRoot.listFiles.exists(_.isDirectory),
      bucketRoot.listFiles.map(_.getName).mkString(", "))
    val distinctPp = spark.read.parquet(s"$dir/index/buckets")
      .select("pp").distinct().count()
    assert(distinctPp > 8, s"fixture too narrow: $distinctPp pp values")

    // a one-doc probe collides with at most `bands` pp values — the
    // filter must reach the parquet scan so sorted row-group stats can
    // skip everything else
    val pairs = Seq((0, 3), (1, 5))
    val probe = IncrementalDedup.prunedIndexBuckets(spark, s"$dir/index",
      excludeBatch = 99L, pairs, bucketParts = 16)
    val got = probe.collect()
    val scan = probe.queryExecution.executedPlan.collectLeaves()
      .collect { case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
    assert(scan.nonEmpty, probe.queryExecution.executedPlan.toString)
    val scanStr = scan.head.toString
    // batch exclusion prunes at the directory; pp pushes into parquet
    assert(scanStr.contains("PartitionFilters"), scanStr.take(800))
    assert(scanStr.contains("PushedFilters") && scanStr.contains("In(pp"),
      scanStr.take(800))
    // and the filter is consistent with what comes back
    val wanted = pairs.map { case (b, m) => b * 16 + m }.toSet
    val all = spark.read.parquet(s"$dir/index/buckets")
    val expected = all.filter(col("pp").isin(wanted.toSeq: _*)).count()
    assert(got.length == expected && expected < all.count())
  }

  test("standing form: novel to out, duplicates to rejected, across restarts") {
    val root = java.nio.file.Files.createTempDirectory("graft-incdedup3")
    val src = s"$root/src"
    val docsSchema = org.apache.spark.sql.types.StructType.fromDDL(
      "doc_id LONG, text STRING")
    Seq((1L, words("rho", 30)), (2L, words("sigma", 30)))
      .toDF("doc_id", "text").coalesce(1)
      .write.mode("append").parquet(src)
    def run(): Unit = {
      val q = IncrementalDedup.start(spark, src, docsSchema, "doc_id",
        "text", s"$root/index", s"$root/out", s"$root/rejected",
        s"$root/ckpt")
      q.awaitTermination()
    }
    run()
    // second shard arrives while the job is down: one dup, one novel
    Seq((11L, words("rho", 30)), (12L, words("tau", 30)))
      .toDF("doc_id", "text").coalesce(1)
      .write.mode("append").parquet(src)
    run()
    val admitted = spark.read.parquet(s"$root/out")
      .select($"doc_id").as[Long].collect().toSet
    val rejected = spark.read.parquet(s"$root/rejected")
      .select($"doc_id", $"dup_of").as[(Long, Long)].collect().toSet
    assert(admitted == Set(1L, 2L, 12L))
    assert(rejected == Set((11L, 1L)))
  }
}
