package graft.jobs

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.TxnApplier
import graft.sinks.BinlogWire
import graft.sinks.BinlogWire._
import graft.sources.BinlogDumpClient

/** The standing LIVE replica over the real dump dialogue: poll/apply
  * triggers against a protocol-faithful server converge to the same
  * state as reading the files directly, cursors advance across
  * triggers, an un-rotated successor is quietly "no new data", and a
  * full re-poll from the start replays into the applier's position
  * gate without doubling a transaction. */
class LiveReplicaSpec extends SparkSpec {
  import spark.implicits._

  private val specs = Seq(ColSpec("acct", LongLong), ColSpec("seq", LongLong),
    ColSpec("balance", LongLong))
  private val tableCols = Map(("bank", "accounts") -> specs.map(_.name))
  private val colTypes =
    Seq("acct" -> "long", "seq" -> "long", "balance" -> "long")

  private def lastImages(dir: String): Map[Long, Long] =
    BinlogWire.readBinlogFiles(spark, dir, tableCols)
      .select(element_at($"after", "acct").cast("long"),
        element_at($"after", "seq").cast("long"),
        element_at($"after", "balance").cast("long"))
      .as[(Long, Long, Long)].collect()
      .groupBy(_._1).map { case (a, rs) => a -> rs.maxBy(_._2)._3 }

  test("poll/apply triggers: incremental convergence, kept cursors, replay gate") {
    val root = java.nio.file.Files.createTempDirectory("graft-live")
    val full = s"$root/full"
    val served = s"$root/served"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(served))
    val target = s"$root/replica"
    val staging = s"$root/stage"

    // 8 transfer txns, 4-file rotate-chained log with running balances
    val transfers = (1L to 8L).map(t => (t, (t % 6) + 1, ((t + 2) % 6) + 1, t * 5))
    val bal = scala.collection.mutable.Map[Long, Long]()
      .withDefaultValue(1000L)
    val images = transfers.flatMap { case (t, f, to, amt) =>
      bal(f) = bal(f) - amt; bal(to) = bal(to) + amt
      Seq((t, 2 * t, f, bal(f)), (t, 2 * t + 1, to, bal(to)))
    }
    val batch = images.toDF("tso", "seq", "acct", "balance")
      .select($"acct", $"seq", lit("UPDATE").as("op"), $"balance", $"tso")
      .withColumn("ts", lit(1700000000L))
    val ordered = graft.operators.MergeSort.sortedRunsGrouped(
      batch, 4, Seq("tso"), Seq("seq"))
    BinlogWire.writeTxnFramedBinlogFiles(ordered, specs, "bank", "accounts",
      "op", "ts", "tso", full, checksummed = true, rotateChain = true,
      tsoCarrier = "sequence")
    def publish(names: String*): Unit = names.foreach { n =>
      java.nio.file.Files.copy(java.nio.file.Paths.get(full, n),
        java.nio.file.Paths.get(served, n))
    }
    def state(): Map[Long, Long] = TxnApplier.readCurrent(spark, target)
      .select($"acct", $"balance").as[(Long, Long)].collect().toMap

    publish("binlog.000000", "binlog.000001")
    val srv = new graft.sinks.BinlogDumpServer(served, "repl", "pw")
    try {
      val ep0 = Seq(BinlogDumpClient.Endpoint("dn1", "localhost", srv.port,
        "repl", "pw", "binlog.000000", 4L))
      def trigger(eps: Seq[BinlogDumpClient.Endpoint]) =
        LiveReplicaJob.pollApplyOnce(spark, eps, tableCols, "bank",
          "accounts", colTypes, Seq("acct"), "seq", target, staging,
          nBuckets = 4, txnsPerCommit = 2)

      // trigger 1: the first two files apply; cursor lands on the
      // successor the rotate chain names
      val ep1 = trigger(ep0)
      assert(state() == lastImages(served))
      assert(ep1.head.binlogFile == "binlog.000002" && ep1.head.pos == 4L)

      // trigger 2 with NOTHING rotated yet: no new data, cursor kept
      val ep1b = trigger(ep1)
      assert(ep1b == ep1 && state() == lastImages(served))

      // the producer rotates twice; trigger 3 applies exactly the rest
      publish("binlog.000002", "binlog.000003")
      val ep2 = trigger(ep1b)
      assert(state() == bal.toMap)
      assert(ep2.head.binlogFile == "binlog.000004")
      val versionsDone = TxnApplier.versions(target).size

      // a full re-poll from the START replays everything into the
      // position gate: no txn doubles, no new observable state
      val ep3 = trigger(ep0)
      assert(ep3.head.binlogFile == "binlog.000004")
      assert(state() == bal.toMap)
      assert(TxnApplier.versions(target).size == versionsDone)

      // BOUNDED bootstrap: a fresh replica catching up on the full
      // history with a per-poll byte cap converges over SEVERAL
      // triggers (never one unbounded drain), to the identical state
      val target2 = s"$root/replica2"
      val staging2 = s"$root/stage2"
      var eps = ep0
      var triggers = 0
      var advanced = true
      while (advanced && triggers < 32) {
        val next = LiveReplicaJob.pollApplyOnce(spark, eps, tableCols,
          "bank", "accounts", colTypes, Seq("acct"), "seq", target2,
          staging2, nBuckets = 4, txnsPerCommit = 2,
          maxBytesPerPoll = 400L)
        advanced = next != eps
        eps = next
        triggers += 1
      }
      assert(triggers >= 3, s"cap ignored: converged in $triggers triggers")
      assert(TxnApplier.readCurrent(spark, target2)
        .select($"acct", $"balance").as[(Long, Long)].collect().toMap
        == bal.toMap)
    } finally srv.close()
  }

  test("routed replica: a two-table stream applies through ONE poll loop, per-table convergence + replay gate") {
    val root = java.nio.file.Files.createTempDirectory("graft-routed")
    val wire = s"$root/wire"
    val tableCols2 = Map(
      ("bank", "accounts") -> Seq("acct", "seq", "balance"),
      ("bank", "audit") -> Seq("aid", "seq", "note"))
    // interleaved txns; txn 3 touches BOTH tables in one commit
    val ev = Seq(
      (1L, 1L, "INSERT", "bank", "accounts", Map.empty[String, String],
        Map("acct" -> "1", "seq" -> "1", "balance" -> "100")),
      (2L, 2L, "INSERT", "bank", "audit", Map.empty[String, String],
        Map("aid" -> "10", "seq" -> "1", "note" -> "open")),
      (3L, 3L, "UPDATE", "bank", "accounts",
        Map("acct" -> "1", "seq" -> "1", "balance" -> "100"),
        Map("acct" -> "1", "seq" -> "2", "balance" -> "150")),
      (3L, 3L, "INSERT", "bank", "audit", Map.empty[String, String],
        Map("aid" -> "11", "seq" -> "2", "note" -> "credit")),
      (4L, 4L, "DELETE", "bank", "audit",
        Map("aid" -> "10", "seq" -> "3", "note" -> "open"),
        Map.empty[String, String]),
      (5L, 5L, "INSERT", "bank", "accounts", Map.empty[String, String],
        Map("acct" -> "2", "seq" -> "4", "balance" -> "70")))
      .toDF("tso", "txnId", "op", "schemaName", "tableName", "before",
        "after")
      .withColumn("tsoTime", lit(1700000000L).cast("timestamp"))
    BinlogWire.writeChangeStreamBinlogFiles(
      ev.coalesce(1).sortWithinPartitions("tso", "txnId"), tableCols2,
      wire, checksummed = true)
    val srv = new graft.sinks.BinlogDumpServer(wire, "repl", "pw")
    try {
      val targets = Seq(
        WireReplicaJob.TableTarget("bank", "accounts",
          Seq("acct" -> "long", "seq" -> "long", "balance" -> "long"),
          Seq("acct"), "seq", s"$root/t_accounts", 2),
        WireReplicaJob.TableTarget("bank", "audit",
          Seq("aid" -> "long", "seq" -> "long", "note" -> "string"),
          Seq("aid"), "seq", s"$root/t_audit", 2))
      val ep0 = Seq(BinlogDumpClient.Endpoint("dn1", "localhost",
        srv.port, "repl", "pw", "binlog.000000", 4L))
      def poll(eps: Seq[BinlogDumpClient.Endpoint]) =
        LiveReplicaJob.pollApplyOnceRouted(spark, eps, tableCols2,
          targets, s"$root/stage", txnsPerCommit = 2)
      poll(ep0) // ONE dial, both tables land
      def accounts() = TxnApplier.readCurrent(spark, s"$root/t_accounts")
        .select($"acct", $"balance").as[(Long, Long)].collect().toMap
      def audit() = TxnApplier.readCurrent(spark, s"$root/t_audit")
        .select($"aid", $"note").as[(Long, String)].collect().toMap
      assert(accounts() == Map(1L -> 150L, 2L -> 70L))
      assert(audit() == Map(11L -> "credit")) // 10 deleted by txn 4
      // full replay from the start: each table's own gate drops it all
      val vA = TxnApplier.versions(s"$root/t_accounts").size
      val vB = TxnApplier.versions(s"$root/t_audit").size
      poll(ep0)
      assert(accounts() == Map(1L -> 150L, 2L -> 70L))
      assert(audit() == Map(11L -> "credit"))
      assert(TxnApplier.versions(s"$root/t_accounts").size == vA)
      assert(TxnApplier.versions(s"$root/t_audit").size == vB)
      // misrouting fails loudly at validation, not by silent overwrite
      intercept[IllegalArgumentException] {
        WireReplicaJob.validateTargets(targets.map(_.copy(
          targetDir = s"$root/same")))
      }
      intercept[IllegalArgumentException] {
        WireReplicaJob.validateTargets(Seq(targets.head, targets.head))
      }
    } finally srv.close()
  }

  test("GTID replica loop: bounded catch-up, then SOURCE FAILOVER to a renumbered log mid-stream") {
    import graft.model.GtidSet
    val root = java.nio.file.Files.createTempDirectory("graft-gtidrpl")
    val sid = java.util.UUID.fromString(
      "0a1b2c3d-9999-8888-7777-666655554444")
    // 8 single-row txns on one table, gno := tso
    val ev = (1L to 8L).map { t =>
      (t, t, "INSERT", "bank", "accounts",
        Map.empty[String, String],
        Map("acct" -> s"$t", "seq" -> "1", "balance" -> s"${t * 10}"),
        1700000000L)
    }.toDF("tso", "txnId", "op", "schemaName", "tableName", "before",
      "after", "tsoTime")
    val primary = s"$root/primary"
    BinlogWire.writeChangeStreamBinlogFiles(
      ev.coalesce(1).sortWithinPartitions("tso"), tableCols, primary,
      checksummed = true, gtidSid = Some(sid))
    val targets = Seq(WireReplicaJob.TableTarget("bank", "accounts",
      colTypes, Seq("acct"), "seq", s"$root/target", 2))
    def state(): Map[Long, Long] =
      TxnApplier.readCurrent(spark, s"$root/target")
        .select($"acct", $"balance").as[(Long, Long)].collect().toMap

    // phase 1: bounded poll against the primary — PARTIAL progress
    val srv1 = new graft.sinks.BinlogDumpServer(primary, "repl", "pw")
    val afterP1 = try {
      val ep0 = Seq(LiveReplicaJob.GtidEndpoint("dn1", "localhost",
        srv1.port, "repl", "pw"))
      LiveReplicaJob.pollApplyOnceGtid(spark, ep0, tableCols, targets,
        s"$root/stage", txnsPerCommit = 2, maxBytesPerPoll = 400L)
    } finally srv1.close()
    val partial = afterP1.head.executed
    assert(!partial.isEmpty && !partial.contains(s"$sid:8"),
      s"cap ignored: ${partial.text}")
    assert(state().nonEmpty && state().size < 8)

    // phase 2: the primary dies; a promoted source re-serves the SAME
    // transactions under renumbered file names. The GTID cursor keeps
    // working — repoint and continue; nothing applies twice.
    val promoted = s"$root/promoted"
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(promoted))
    new java.io.File(primary).listFiles
      .filter(_.getName.startsWith("binlog.")).foreach { f =>
        val n = f.getName.stripPrefix("binlog.").toInt
        java.nio.file.Files.copy(f.toPath,
          java.nio.file.Paths.get(promoted, f"binlog.${n + 500}%06d"))
      }
    val srv2 = new graft.sinks.BinlogDumpServer(promoted, "repl", "pw")
    try {
      var eps = afterP1.map(_.copy(host = "localhost", port = srv2.port))
      var triggers = 0
      var advanced = true
      while (advanced && triggers < 16) {
        val next = LiveReplicaJob.pollApplyOnceGtid(spark, eps,
          tableCols, targets, s"$root/stage", txnsPerCommit = 2,
          maxBytesPerPoll = 400L)
        advanced = next.head.executed != eps.head.executed
        eps = next
        triggers += 1
      }
      assert(eps.head.executed.text == s"$sid:1-8")
      assert(state() == (1L to 8L).map(t => t -> t * 10).toMap)
    } finally srv2.close()
  }

  test("standing runner: kill between triggers, resume from the cursor sidecar, drain only new data; silence raises the no-data alarm") {
    val root = java.nio.file.Files.createTempDirectory("graft-runner")
    val full = s"$root/full"
    val served = s"$root/served"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(served))
    val transfers = (1L to 8L).map(t =>
      (t, (t % 6) + 1, ((t + 2) % 6) + 1, t * 5))
    val bal = scala.collection.mutable.Map[Long, Long]()
      .withDefaultValue(1000L)
    val images = transfers.flatMap { case (t, f, to, amt) =>
      bal(f) = bal(f) - amt; bal(to) = bal(to) + amt
      Seq((t, 2 * t, f, bal(f)), (t, 2 * t + 1, to, bal(to)))
    }
    val batch = images.toDF("tso", "seq", "acct", "balance")
      .select($"acct", $"seq", lit("UPDATE").as("op"), $"balance", $"tso")
      .withColumn("ts", lit(1700000000L))
    BinlogWire.writeTxnFramedBinlogFiles(
      graft.operators.MergeSort.sortedRunsGrouped(batch, 4, Seq("tso"),
        Seq("seq")),
      specs, "bank", "accounts", "op", "ts", "tso", full,
      checksummed = true, rotateChain = true, tsoCarrier = "sequence")
    def publish(names: String*): Unit = names.foreach { n =>
      java.nio.file.Files.copy(java.nio.file.Paths.get(full, n),
        java.nio.file.Paths.get(served, n))
    }
    def state(): Map[Long, Long] =
      TxnApplier.readCurrent(spark, s"$root/replica")
        .select($"acct", $"balance").as[(Long, Long)].collect().toMap
    publish("binlog.000000", "binlog.000001")
    val srv = new graft.sinks.BinlogDumpServer(served, "repl", "pw")
    try {
      val ep0 = Seq(BinlogDumpClient.Endpoint("dn1", "localhost",
        srv.port, "repl", "pw", "binlog.000000", 4L))
      val targets = Seq(WireReplicaJob.TableTarget("bank", "accounts",
        colTypes, Seq("acct"), "seq", s"$root/replica", 4))
      val mon = new graft.streaming.StallMonitor(noDataThresholdSeconds = 0)
      // alarm policy layer on top of the watchdog: zero thresholds so
      // the idle trigger pages immediately, fatal-armed — the FIRST
      // trigger consumed, so the escalation fires alongside
      val paged = new graft.streaming.AlarmChannel.Buffer
      val mgr = new graft.streaming.AlarmManager(
        Seq(graft.streaming.AlarmPolicy(graft.streaming.Alarms.DumperNoData,
          threshold = 1, intervalSeconds = 0,
          fatalIfActiveConsumer = true),
          graft.streaming.AlarmPolicy(graft.streaming.Alarms.DumperDelay)),
        Seq(paged))
      // the runner IS the deployment loop: 2 triggers — one drains,
      // one idles (and the idle one trips the zero-threshold watchdog)
      val e1 = LiveReplicaJob.run(spark, ep0, tableCols, targets,
        s"$root/stage", s"$root/cursors", intervalMs = 0,
        maxTriggers = 2, monitor = Some(mon), alarms = Some(mgr),
        txnsPerCommit = 2)
      assert(e1.head.binlogFile == "binlog.000002")
      assert(state() == lastImages(served))
      assert(mon.alarms.exists(a =>
        a.kind == "no_data" && a.queryId == "live-replica"))
      // the typed page went out the channel, escalated: the loop itself
      // consumed one trigger earlier, so a silent producer with an
      // active consumer is the fatal shape
      assert(paged.events.exists(e =>
        e.key == graft.streaming.Alarms.DumperNoData && !e.fatal))
      assert(paged.events.exists(e =>
        e.key == graft.streaming.Alarms.Fatal && e.fatal))
      // the sidecar committed the ADVANCED cursor: a dead driver's
      // replacement resumes there, not at the caller's bootstrap value
      assert(LiveReplicaJob.resume(s"$root/cursors", ep0)
        .head.binlogFile == "binlog.000002")

      // KILL (the runner returned); the producer rotates on; RESTART
      // with the stale bootstrap endpoints + the same cursorDir
      publish("binlog.000002", "binlog.000003")
      val e2 = LiveReplicaJob.run(spark, ep0, tableCols, targets,
        s"$root/stage", s"$root/cursors", intervalMs = 0,
        maxTriggers = 1, txnsPerCommit = 2)
      assert(e2.head.binlogFile == "binlog.000004")
      assert(state() == bal.toMap)
      // no history re-drain: the restart trigger STAGED only the two
      // new files' transactions (the staged parquet is the trigger's
      // durable input — what it holds is what was polled)
      val stagedTsos = graft.sources.ChangeEventSource.fromWireSegments(
          spark.read.parquet(s"$root/stage")
            .filter(length($"payload") > 0).select($"dn", $"payload"),
          "dn", "payload", tableCols)
        .select($"tso").as[Long].collect().toSet
      assert(stagedTsos == Set(5L, 6L, 7L, 8L), s"staged $stagedTsos")
    } finally srv.close()
  }

  test("standing GTID runner: failover repoint + sidecar resume; the promoted log's executed prefix is pruned, not re-walked") {
    import graft.model.GtidSet
    val root = java.nio.file.Files.createTempDirectory("graft-grunner")
    val sid = java.util.UUID.fromString(
      "0a1b2c3d-7777-6666-5555-444433332222")
    def ev(lo: Long, hi: Long) = (lo to hi).map { t =>
      (t, t, "INSERT", "bank", "accounts",
        Map.empty[String, String],
        Map("acct" -> s"$t", "seq" -> "1", "balance" -> s"${t * 10}"),
        1700000000L)
    }.toDF("tso", "txnId", "op", "schemaName", "tableName", "before",
      "after", "tsoTime")
    val primary = s"$root/primary"
    BinlogWire.writeChangeStreamBinlogFiles(
      ev(1L, 8L).coalesce(1).sortWithinPartitions("tso"), tableCols,
      primary, checksummed = true, gtidSid = Some(sid))
    val targets = Seq(WireReplicaJob.TableTarget("bank", "accounts",
      colTypes, Seq("acct"), "seq", s"$root/target", 2))
    def state(): Map[Long, Long] =
      TxnApplier.readCurrent(spark, s"$root/target")
        .select($"acct", $"balance").as[(Long, Long)].collect().toMap

    val srv1 = new graft.sinks.BinlogDumpServer(primary, "repl", "pw")
    try {
      val ep0 = Seq(LiveReplicaJob.GtidEndpoint("dn1", "localhost",
        srv1.port, "repl", "pw"))
      val e1 = LiveReplicaJob.runGtid(spark, ep0, tableCols, targets,
        s"$root/stage", s"$root/cursors", intervalMs = 0,
        maxTriggers = 1, txnsPerCommit = 2)
      assert(e1.head.executed.text == s"$sid:1-8")
      assert(state() == (1L to 8L).map(t => t -> t * 10).toMap)
    } finally srv1.close()

    // primary dies. The promoted source re-serves the SAME txns under
    // a renamed file AND has committed new ones (its writer threads
    // priorExecuted across the rotation, so the new file's
    // PREVIOUS_GTIDS is real). Corrupt the renamed history file's
    // tail: if the restarted runner re-walked it the poll would die —
    // pruning via the populated previous-set must skip it UNOPENED.
    val promoted = s"$root/promoted"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(promoted))
    new java.io.File(primary).listFiles
      .filter(_.getName.startsWith("binlog.")).foreach { f =>
        val n = f.getName.stripPrefix("binlog.").toInt
        java.nio.file.Files.copy(f.toPath,
          java.nio.file.Paths.get(promoted, f"binlog.${n + 500}%06d"))
      }
    val fresh = s"$root/fresh"
    BinlogWire.writeChangeStreamBinlogFiles(
      ev(9L, 12L).coalesce(1).sortWithinPartitions("tso"), tableCols,
      fresh, checksummed = true, gtidSid = Some(sid),
      priorExecuted = GtidSet.parse(s"$sid:1-8"))
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(fresh, "binlog.000000"),
      java.nio.file.Paths.get(promoted, "binlog.000501"))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(promoted, "binlog.000500"),
      Array.fill[Byte](19)(0xFF.toByte),
      java.nio.file.StandardOpenOption.APPEND)

    val srv2 = new graft.sinks.BinlogDumpServer(promoted, "repl", "pw")
    try {
      // restart with EMPTY-cursor bootstrap endpoints repointed at the
      // promoted source — the sidecar supplies the real executed set
      val epNew = Seq(LiveReplicaJob.GtidEndpoint("dn1", "localhost",
        srv2.port, "repl", "pw"))
      val e2 = LiveReplicaJob.runGtid(spark, epNew, tableCols, targets,
        s"$root/stage", s"$root/cursors", intervalMs = 0,
        maxTriggers = 1, txnsPerCommit = 2)
      assert(e2.head.executed.text == s"$sid:1-12")
      assert(state() == (1L to 12L).map(t => t -> t * 10).toMap)
    } finally srv2.close()
  }
}
