package graft.jobs

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.TxnApplier
import graft.sinks.BinlogWire

/** The COMPOSED replica lifecycle, end to end through the one
  * deployment call: bootstrap → rotation (cumulative PREVIOUS_GTIDS
  * threaded across writer calls) → an in-stream RENAME COLUMN that
  * rebuilds the routed target while rows straddle it on the wire →
  * kill → source FAILOVER to a renumbered log → restart from the
  * cursor+registry sidecars. Every piece is spec'd alone elsewhere;
  * this audit proves the composition: the restarted runner passes the
  * ORIGINAL (stale) table registry and an EMPTY cursor, and still
  * converges — the executed-set sidecar supplies the position, the
  * registry sidecar supplies the post-rename column names (without it
  * the promoted log's new rows would silently decode under the old
  * name and the renamed column would null out), and file pruning skips
  * the fully-executed prefix, proven by CORRUPTING it: the restart
  * poll succeeds only because that file is never opened. */
class ReplicaLifecycleSpec extends SparkSpec {
  import spark.implicits._

  test("bootstrap → rotate → in-stream rename rebuild → failover → sidecar restart, one standing GTID runner") {
    val root = java.nio.file.Files.createTempDirectory("graft-lifecycle")
    val sid = java.util.UUID.fromString(
      "0a1b2c3d-5555-4444-3333-222211110000")
    val regV1 = Map(("db", "t") -> Seq("k", "seq", "v"))
    val regV2 = Map(("db", "t") -> Seq("k", "seq", "v2"))
    val targets = Seq(WireReplicaJob.TableTarget("db", "t",
      Seq("k" -> "long", "seq" -> "long", "v" -> "string"),
      Seq("k"), "seq", s"$root/target", 2))
    val served = s"$root/served"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(served))

    def ev(rows: Seq[(Long, String, Map[String, String], String)]) =
      rows.map { case (tso, op, after, ddl) =>
        (tso, tso, op, "db", "t", Map.empty[String, String], after, ddl,
          1700000000L)
      }.toDF("tso", "txnId", "op", "schemaName", "tableName", "before",
        "after", "ddl", "tsoTime")
    def writeCall(rows: Seq[(Long, String, Map[String, String], String)],
        reg: Map[(String, String), Seq[String]], prior: String,
        intoDir: String, asIndex: Int): Unit = {
      val d = java.nio.file.Files
        .createTempDirectory("graft-lc-call").toString
      BinlogWire.writeChangeStreamBinlogFiles(
        ev(rows).coalesce(1).sortWithinPartitions("tso"), reg, d,
        checksummed = true, gtidSid = Some(sid),
        priorExecuted = graft.model.GtidSet.parse(prior))
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(d, "binlog.000000"),
        java.nio.file.Paths.get(intoDir, f"binlog.$asIndex%06d"))
    }
    def ins(t: Long, valName: String, value: String) =
      (t, "INSERT", Map("k" -> s"$t", "seq" -> "1", valName -> value),
        null: String)
    def state(): Map[Long, String] =
      TxnApplier.readCurrent(spark, s"$root/target")
        .select($"k", col("v2"))
        .as[(Long, String)].collect().toMap

    // ---- phase 1: bootstrap — txns 1..4 under the original schema
    writeCall((1L to 4L).map(t => ins(t, "v", s"a$t")), regV1, "", served, 0)
    val srv1 = new graft.sinks.BinlogDumpServer(served, "repl", "pw")
    val afterP1 = try {
      LiveReplicaJob.runGtid(spark,
        Seq(LiveReplicaJob.GtidEndpoint("dn1", "localhost", srv1.port,
          "repl", "pw")),
        regV1, targets, s"$root/stage", s"$root/cursors",
        intervalMs = 0, maxTriggers = 1, txnsPerCommit = 2,
        ddlInStream = true, vacuumEvery = 1)
    } finally srv1.close()
    assert(afterP1.head.executed.text == s"$sid:1-4")
    assert(TxnApplier.readCurrent(spark, s"$root/target")
      .select($"k", $"v").as[(Long, String)].collect().toMap
      == (1L to 4L).map(t => t -> s"a$t").toMap)

    // ---- phase 2: the producer rotates TWICE — txn 5 still under the
    // old name, txn 6 RENAMES v -> v2, txns 7..8 under the new name
    // (the post-DDL writer registry is evolved, as a real source's
    // TABLE_MAP is after an ALTER). The runner restarts with the STALE
    // registry; in-segment schema tracking + the rebuild land every row.
    writeCall(Seq(ins(5L, "v", "a5"),
      (6L, "DDL", Map.empty[String, String],
        "ALTER TABLE t RENAME COLUMN v TO v2")), regV1, s"$sid:1-4",
      served, 1)
    writeCall(Seq(ins(7L, "v2", "b7"), ins(8L, "v2", "b8")), regV2,
      s"$sid:1-6", served, 2)
    val srv2 = new graft.sinks.BinlogDumpServer(served, "repl", "pw")
    val afterP2 = try {
      LiveReplicaJob.runGtid(spark,
        Seq(LiveReplicaJob.GtidEndpoint("dn1", "localhost", srv2.port,
          "repl", "pw")),
        regV1, targets, s"$root/stage", s"$root/cursors",
        intervalMs = 0, maxTriggers = 1, txnsPerCommit = 2,
        ddlInStream = true, vacuumEvery = 1)
    } finally srv2.close()
    assert(afterP2.head.executed.text == s"$sid:1-8")
    assert(state() == ((1L to 5L).map(t => t -> s"a$t") ++
      Seq(7L -> "b7", 8L -> "b8")).toMap)
    // the registry sidecar committed the rename for future restarts
    assert(LiveReplicaJob.resumeRegistry(s"$root/cursors", regV1)
      == regV2)
    // vacuumEvery=1 reclaimed the rebuild-superseded versions in the
    // SAME trigger the rename-rebuild landed in: the pre-rebuild v1
    // layout is gone from disk (a standing replica seeing periodic
    // re-type DDL must not accumulate doubled copies forever), while
    // the current state above still reads intact
    assert(!new java.io.File(s"$root/target/data/v00000001").exists())

    // ---- phase 3: FAILOVER — the primary dies; a promoted source
    // re-serves the same content under renumbered names and has new
    // txns 9..10. The fully-executed history file is CORRUPTED past
    // its last event: the restart poll can only succeed by pruning it
    // unopened (prev-set of the newest file ⊆ the sidecar's cursor).
    val promoted = s"$root/promoted"
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(promoted))
    new java.io.File(served).listFiles
      .filter(_.getName.startsWith("binlog.")).foreach { f =>
        val n = f.getName.stripPrefix("binlog.").toInt
        java.nio.file.Files.copy(f.toPath,
          java.nio.file.Paths.get(promoted, f"binlog.${n + 500}%06d"))
      }
    writeCall(Seq(ins(9L, "v2", "b9"), ins(10L, "v2", "b10")), regV2,
      s"$sid:1-8", promoted, 503)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(promoted, "binlog.000500"),
      Array.fill[Byte](19)(0xFF.toByte),
      java.nio.file.StandardOpenOption.APPEND)

    val srv3 = new graft.sinks.BinlogDumpServer(promoted, "repl", "pw")
    val afterP3 = try {
      // fresh endpoints (empty cursor), the ORIGINAL registry, same
      // sidecars — the restart must take position AND names from disk
      LiveReplicaJob.runGtid(spark,
        Seq(LiveReplicaJob.GtidEndpoint("dn1", "localhost", srv3.port,
          "repl", "pw")),
        regV1, targets, s"$root/stage", s"$root/cursors",
        intervalMs = 0, maxTriggers = 1, txnsPerCommit = 2,
        ddlInStream = true, vacuumEvery = 1)
    } finally srv3.close()
    assert(afterP3.head.executed.text == s"$sid:1-10")
    assert(state() == ((1L to 5L).map(t => t -> s"a$t") ++
      Seq(7L -> "b7", 8L -> "b8", 9L -> "b9", 10L -> "b10")).toMap)
  }
}
