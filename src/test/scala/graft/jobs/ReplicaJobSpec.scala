package graft.jobs

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.operators.Filters

class ReplicaJobSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("db", StringType), StructField("tbl", StringType),
    StructField("pk", LongType), StructField("seq", LongType),
    StructField("op", StringType), StructField("v", StringType)))

  test("stream → replica filter → merge apply converges the target") {
    val root = Files.createTempDirectory("graft-rpl").toString
    val srcDir = s"$root/src"; val target = s"$root/target"
    new java.io.File(srcDir).mkdirs()
    val spec = Filters.ReplicaSpec(doDbs = Seq("app"),
      ignoreTables = Seq(("app", "skipme")))

    // wave 1: inserts on app.t, noise on sys.x and app.skipme
    Seq(
      ("app", "t", 1L, 1L, "INSERT", "a1"),
      ("app", "t", 2L, 2L, "INSERT", "b1"),
      ("app", "skipme", 9L, 3L, "INSERT", "IGNORED"),
      ("sys", "x", 8L, 4L, "INSERT", "IGNORED")
    ).toDF("db", "tbl", "pk", "seq", "op", "v")
      .write.parquet(s"$srcDir/w1.parquet")
    val q1 = ReplicaJob.start(spark, s"$srcDir/*", schema, spec,
      "db", "tbl", Seq("pk"), "seq", "op", target, s"$root/ckpt")
    q1.awaitTermination(120000)
    val t1 = spark.read.parquet(target).select($"pk", $"v")
      .as[(Long, String)].collect().toSet
    assert(t1 == Set((1L, "a1"), (2L, "b1")))

    // wave 2: update pk1 twice (last image wins), delete pk2, insert pk3
    Seq(
      ("app", "t", 1L, 5L, "UPDATE", "a2"),
      ("app", "t", 1L, 6L, "UPDATE", "a3"),
      ("app", "t", 2L, 7L, "DELETE", "b1"),
      ("app", "t", 3L, 8L, "INSERT", "c1")
    ).toDF("db", "tbl", "pk", "seq", "op", "v")
      .write.parquet(s"$srcDir/w2.parquet")
    val q2 = ReplicaJob.start(spark, s"$srcDir/*", schema, spec,
      "db", "tbl", Seq("pk"), "seq", "op", target, s"$root/ckpt")
    q2.awaitTermination(120000)
    val t2 = spark.read.parquet(target).select($"pk", $"v")
      .as[(Long, String)].collect().toSet
    assert(t2 == Set((1L, "a3"), (3L, "c1")))
  }

  test("bucketed mode (nBuckets>0) converges to the same state as flat") {
    val root = Files.createTempDirectory("graft-rplb").toString
    val srcDir = s"$root/src"; val target = s"$root/target"
    new java.io.File(srcDir).mkdirs()
    val spec = Filters.ReplicaSpec(doDbs = Seq("app"))

    Seq(
      ("app", "t", 1L, 1L, "INSERT", "a1"),
      ("app", "t", 2L, 2L, "INSERT", "b1"),
      ("app", "t", 3L, 3L, "INSERT", "c1")
    ).toDF("db", "tbl", "pk", "seq", "op", "v")
      .write.parquet(s"$srcDir/w1.parquet")
    ReplicaJob.start(spark, s"$srcDir/*", schema, spec,
      "db", "tbl", Seq("pk"), "seq", "op", target, s"$root/ckpt",
      nBuckets = 4).awaitTermination(120000)

    Seq(
      ("app", "t", 1L, 5L, "UPDATE", "a2"),
      ("app", "t", 2L, 6L, "DELETE", "b1"),
      ("app", "t", 7L, 7L, "INSERT", "g1")
    ).toDF("db", "tbl", "pk", "seq", "op", "v")
      .write.parquet(s"$srcDir/w2.parquet")
    ReplicaJob.start(spark, s"$srcDir/*", schema, spec,
      "db", "tbl", Seq("pk"), "seq", "op", target, s"$root/ckpt",
      nBuckets = 4).awaitTermination(120000)

    // the bucketed target reads back to the same converged state
    val got = graft.operators.Appliers.readBucketed(spark, target)
      .select($"pk", $"v").as[(Long, String)].collect().toSet
    assert(got == Set((1L, "a2"), (3L, "c1"), (7L, "g1")))
    // and the layout is actually bucketed (partition dirs on disk)
    val dirs = new java.io.File(target).listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("__bucket="))
    assert(dirs.nonEmpty)
  }

  test("txn-preserving mode: replica from nothing, txn-boundary states only") {
    val root = Files.createTempDirectory("graft-rplt").toString
    val srcDir = s"$root/src"; val target = s"$root/target"
    new java.io.File(srcDir).mkdirs()
    val spec = Filters.ReplicaSpec(doDbs = Seq("app"))
    val tschema = StructType(schema.fields :+ StructField("tso", LongType))

    // txn 10 inserts pks 1,2; txn 20 updates pk1 + inserts pk3
    Seq(
      ("app", "t", 1L, 1L, "INSERT", "a1", 10L),
      ("app", "t", 2L, 2L, "INSERT", "b1", 10L),
      ("app", "t", 1L, 3L, "UPDATE", "a2", 20L),
      ("app", "t", 3L, 4L, "INSERT", "c1", 20L),
      ("sys", "x", 9L, 5L, "INSERT", "IGNORED", 20L)
    ).toDF("db", "tbl", "pk", "seq", "op", "v", "tso")
      .write.parquet(s"$srcDir/w1.parquet")
    ReplicaJob.start(spark, s"$srcDir/*", tschema, spec,
      "db", "tbl", Seq("pk"), "seq", "op", target, s"$root/ckpt",
      nBuckets = 4, txnPreserving = Some("tso")).awaitTermination(120000)
    import graft.operators.TxnApplier
    val got = TxnApplier.readCurrent(spark, target)
      .select($"pk", $"v").as[(Long, String)].collect().toSet
    assert(got == Set((1L, "a2"), (2L, "b1"), (3L, "c1")))
    // every observable state is a transaction boundary: empty bootstrap,
    // after txn 10, after txn 20 — never a half-txn mix
    val states = TxnApplier.versions(target).map { v =>
      val df = TxnApplier.readVersion(spark, target, v)
      // the empty bootstrap version has no files, hence no schema
      if (df.columns.isEmpty) Set.empty[(Long, String)]
      else df.select($"pk", $"v").as[(Long, String)].collect().toSet
    }
    assert(states == Seq(
      Set.empty,
      Set((1L, "a1"), (2L, "b1")),
      Set((1L, "a2"), (2L, "b1"), (3L, "c1"))))
    assert(TxnApplier.currentCommit(target).exists(_.lastTso == 20L))

    // a replay (fresh checkpoint, same source) is exactly-once
    ReplicaJob.start(spark, s"$srcDir/*", tschema, spec,
      "db", "tbl", Seq("pk"), "seq", "op", target, s"$root/ckpt2",
      nBuckets = 4, txnPreserving = Some("tso")).awaitTermination(120000)
    assert(TxnApplier.versions(target).size == 3)
  }
}
