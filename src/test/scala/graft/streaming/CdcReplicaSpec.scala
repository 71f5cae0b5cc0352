package graft.streaming

import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.jobs.WireReplicaJob
import graft.model.GtidSet
import graft.operators.TxnApplier
import graft.sinks.BinlogWire

/** The packaged streaming replica (`CdcReplica.start`) end to end, and
  * the restart-stability of its vacuum cadence: the schedule counts
  * Spark's MONOTONIC batchId, so `vacuumEveryBatches = k` fires on the
  * k-th batch of the QUERY, not the k-th batch since the latest
  * restart — a closure counter would reset to zero on every restart
  * and, under frequent restarts, never fire at all. */
class CdcReplicaSpec extends SparkSpec {
  import spark.implicits._

  private val sid = java.util.UUID.fromString(
    "0a1b2c3d-8888-4444-3333-222211110000")

  private val tableCols = Map(("db", "t") -> Seq("k", "seq", "v"))

  private def ev(rows: Seq[(Long, String)]) =
    rows.map { case (tso, v) =>
      (tso, tso, "INSERT", "db", "t", Map.empty[String, String],
        Map("k" -> tso.toString, "seq" -> "1", "v" -> v), null: String,
        1700000000L)
    }.toDF("tso", "txnId", "op", "schemaName", "tableName", "before",
      "after", "ddl", "tsoTime")

  private def writeCall(rows: Seq[(Long, String)], prior: String,
      intoDir: String, asIndex: Int): Unit = {
    val d = java.nio.file.Files
      .createTempDirectory("graft-cdcrep-call").toString
    BinlogWire.writeChangeStreamBinlogFiles(
      ev(rows).coalesce(1).sortWithinPartitions("tso"), tableCols, d,
      checksummed = true, gtidSid = Some(sid),
      priorExecuted = GtidSet.parse(prior))
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(d, "binlog.000000"),
      java.nio.file.Paths.get(intoDir, f"binlog.$asIndex%06d"))
    ()
  }

  test("vacuum cadence counts Spark's batchId, stable across restarts") {
    val root = java.nio.file.Files.createTempDirectory("graft-cdcrep1")
    val served = s"$root/served"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(served))
    val targets = Seq(WireReplicaJob.TableTarget("db", "t",
      Seq("k" -> "long", "seq" -> "long", "v" -> "string"),
      Seq("k"), "seq", s"$root/target", 2))

    def runOnce(port: Int): Unit = {
      val q = CdcReplica.start(spark,
        endpoints = Seq(("dn1", "localhost", port)),
        user = "repl", password = "pw",
        tableCols = tableCols, targets = targets,
        checkpointDir = s"$root/ckpt", stagingDir = s"$root/staging",
        registryDir = s"$root/registry",
        txnsPerCommit = 2, vacuumEveryBatches = 2,
        trigger = Trigger.AvailableNow())
      q.awaitTermination()
    }
    def versionDirs(): Int = {
      val d = new java.io.File(s"$root/target/data")
      Option(d.listFiles()).toSeq.flatten.count(_.isDirectory)
    }

    // run A = Spark batchId 0: (0+1) % 2 != 0 — NO vacuum, so the
    // txnsPerCommit=2 apply over 4 txns leaves superseded version dirs
    writeCall((1L to 4L).map(t => (t, s"a$t")), "", served, 0)
    val srv1 = new graft.sinks.BinlogDumpServer(served, "repl", "pw")
    try runOnce(srv1.port) finally srv1.close()
    assert(versionDirs() >= 2,
      "expected superseded versions to SURVIVE batch 0 (cadence is 2)")

    // run B (a RESTART) = Spark batchId 1: (1+1) % 2 == 0 — vacuum
    // fires. A restart-reset counter would see n=1 here and skip it.
    writeCall(Seq((5L, "a5"), (6L, "a6")), s"$sid:1-4", served, 1)
    val srv2 = new graft.sinks.BinlogDumpServer(served, "repl", "pw")
    try runOnce(srv2.port) finally srv2.close()
    assert(versionDirs() == 1,
      "vacuum did not fire on Spark batchId 1 — the cadence reset on " +
        "restart (closure counter instead of batchId)")

    // and the replica state is exactly the applied stream
    val got = TxnApplier.readCurrent(spark, s"$root/target")
      .select(col("k"), col("v")).as[(Long, String)].collect().toMap
    assert(got == (1L to 6L).map(t => t -> s"a$t").toMap)
  }
}
