package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.model.GtidSet
import graft.sinks.BinlogWire

/** Randomized fuzz over the LIVE Global-Binlog production pipeline
  * (CdcBinlog): seeded random transactions spread across THREE DNs,
  * revealed in random phases with PARTIAL heartbeat coverage (only a
  * random subset of DNs heartbeats each phase, so the frontier barrier
  * genuinely holds transactions back across runs), drained by a
  * RESTARTED checkpointed query per phase, with a simulated crash
  * between latestOffset and commit after a random phase, and a
  * byte-capped round that splits every phase into several bounded
  * batches. The ORACLE is total: the final wire log, decoded in file
  * order, must be EXACTLY the full transaction set sorted by TSO —
  * conservation (nothing lost, nothing duplicated by replays) and
  * total order (nothing emitted past a frontier it should have waited
  * for) in one assertion. */
class CdcBinlogFuzzSpec extends SparkSpec {
  import spark.implicits._

  private val dns = Seq("dn1", "dn2", "dn3")
  private val reg = Map(
    ("db", "t") -> Seq("k", "seq", "v"),
    ("db", "hb") -> Seq("k"))

  // (tso, table): real txns into db.t, heartbeats into db.hb
  private def ev(rows: Seq[(Long, String)]) =
    rows.map { case (tso, table) =>
      val after = if (table == "hb") Map("k" -> tso.toString)
        else Map("k" -> tso.toString, "seq" -> "1", "v" -> s"a$tso")
      (tso, tso, "INSERT", "db", table, Map.empty[String, String],
        after, null: String, 1700000000L)
    }.toDF("tso", "txnId", "op", "schemaName", "tableName", "before",
      "after", "ddl", "tsoTime")

  test("random 3-DN production over phased restarts, partial heartbeats, crash replay and a capped round == total-order fold (2 rounds)") {
    val rnd = new scala.util.Random(20260817L)
    (1 to 2).foreach { round =>
      val root = java.nio.file.Files
        .createTempDirectory(s"graft-binlogfuzz$round").toString
      val out = s"$root/out"
      val sids = dns.map(dn => dn -> java.util.UUID.fromString(
        f"00000000-1111-4000-8000-${round}%06d${dns.indexOf(dn)}%06d"))
        .toMap
      dns.foreach(dn => java.nio.file.Files.createDirectories(
        java.nio.file.Paths.get(s"$root/$dn")))

      val nTxn = 15L + rnd.nextInt(16)
      val txns = (1L to nTxn).map(t => t -> dns(rnd.nextInt(dns.size)))
      val cuts = (rnd.shuffle((1L until nTxn).toList).take(2).sorted
        :+ nTxn).distinct
      val prior = scala.collection.mutable.Map(
        dns.map(_ -> GtidSet.Empty): _*)
      val fileIdx = scala.collection.mutable.Map(dns.map(_ -> 0): _*)
      var hbTso = 1000L

      def publish(dn: String, rows: Seq[(Long, String)]): Unit = {
        if (rows.isEmpty) return
        val d = java.nio.file.Files
          .createTempDirectory("graft-binlogfuzz-w").toString
        BinlogWire.writeChangeStreamBinlogFiles(
          ev(rows).coalesce(1).sortWithinPartitions("tso"), reg, d,
          checksummed = true, gtidSid = Some(sids(dn)),
          priorExecuted = prior(dn))
        java.nio.file.Files.copy(
          java.nio.file.Paths.get(d, "binlog.000000"),
          java.nio.file.Paths.get(s"$root/$dn",
            f"binlog.${fileIdx(dn)}%06d"))
        fileIdx(dn) += 1
        prior(dn) = rows.foldLeft(prior(dn))((s, r) =>
          s.add(sids(dn), r._1))
      }

      val capOpt =
        if (round == 2) 1500L else CdcConf.DefaultMaxBytesPerPoll
      // rotation under fuzz: round 1 fixed runs, round 2 volume-scaled
      // (tiny target -> many one/two-row files; total order must hold
      // across ALL of them and crash replays must stay byte-stable)
      val rotTarget = if (round == 2) 1 + rnd.nextInt(3) else 0
      def drain(ports: Map[String, Int]): Unit = {
        val q = CdcBinlog.start(spark,
          dns.map(dn => (dn, "localhost", ports(dn))),
          "repl", "pw", reg, out, s"$root/ckpt", s"$root/work",
          numPartitions = 2, heartbeatTables = Set(("db", "hb")),
          trigger = Trigger.AvailableNow(), maxBytesPerPoll = capOpt,
          targetRowsPerFile = rotTarget)
        q.awaitTermination()
      }
      def withServers(body: Map[String, Int] => Unit): Unit = {
        val servers = dns.map(dn =>
          dn -> new graft.sinks.BinlogDumpServer(s"$root/$dn",
            "repl", "pw")).toMap
        try body(servers.view.mapValues(_.port).toMap)
        finally servers.values.foreach(_.close())
      }
      def simulateCrash(): Unit = {
        val commits = new java.io.File(s"$root/ckpt/commits")
        val entries = Option(commits.listFiles()).toSeq.flatten
          .filter(_.getName.forall(_.isDigit))
        if (entries.nonEmpty) {
          val victim = entries.maxBy(_.getName.toInt)
          new java.io.File(commits, s".${victim.getName}.crc").delete()
          victim.delete()
          if (rnd.nextBoolean()) {
            val stage = java.nio.file.Paths.get(s"$root/ckpt/graft-stage")
            if (java.nio.file.Files.exists(stage)) {
              import scala.jdk.CollectionConverters._
              java.nio.file.Files.walk(stage).iterator().asScala.toSeq
                .reverse.foreach(java.nio.file.Files.delete)
            }
          }
        }
      }
      // the 6→12-digit pad UPGRADE mid-history: rename every produced
      // file back to the legacy narrow pad (as if written pre-upgrade);
      // the next drain must migrate them and, when the downgrade rides
      // a crash window, the replay must supersede BOTH widths — the
      // total-order oracle below catches any duplicate or lost txn
      def simulatePadDowngrade(): Unit =
        Option(new java.io.File(out).listFiles()).toSeq.flatten
          .filter(f => f.isFile &&
            f.getName.matches("""binlog\.\d{12}\..*"""))
          .foreach { f =>
            val narrow = f.getName.replaceFirst(
              """^binlog\.000000(\d{6})\.""", "binlog.$1.")
            if (narrow != f.getName)
              java.nio.file.Files.move(f.toPath,
                f.toPath.resolveSibling(narrow))
          }

      val crashAfterPhase = rnd.nextInt(cuts.size)
      val downgradeAfterPhase = rnd.nextInt(cuts.size)
      var lo = 0L
      cuts.zipWithIndex.foreach { case (hi, phase) =>
        val isLast = phase == cuts.size - 1
        // only a random subset heartbeats mid-stream (the barrier must
        // hold the rest back); the LAST phase heartbeats everyone so
        // the full set eventually emits
        val hbDns =
          if (isLast) dns.toSet
          else dns.filter(_ => rnd.nextBoolean()).toSet
        dns.foreach { dn =>
          val mine = txns.filter(t => t._2 == dn && t._1 > lo &&
            t._1 <= hi).map(t => (t._1, "t"))
          publish(dn, mine)
          // heartbeats arrive through the REAL producer (CdcHeartbeat,
          // the TsoHeartbeat analog): a separate appended wire file
          // with its own GTID continuation — the deployment shape,
          // now fuzzed under crash/replay/caps like everything else
          if (hbDns.contains(dn)) {
            hbTso += 1
            CdcHeartbeat.beatOnce(spark, s"$root/$dn", sids(dn), hbTso,
              schema = "db", table = "hb", keyCol = "k")
            prior(dn) = prior(dn).add(sids(dn), hbTso)
            fileIdx(dn) += 1
          }
        }
        lo = hi
        withServers(drain)
        if (phase == crashAfterPhase) simulateCrash()
        if (phase == downgradeAfterPhase) simulatePadDowngrade()
      }
      // final idle run replays any crashed batch, then changes nothing
      withServers(drain)

      // TOTAL oracle: decoded file-order tsos == every txn exactly
      // once, in global TSO order
      val got = BinlogWire.readBinlogFiles(spark, out, reg)
        .filter(col("op") === "INSERT")
        .select(col("log_file"), col("tso")).collect().toSeq
        .map(r => (r.getString(0), r.getLong(1)))
        .sortBy(_._1).map(_._2)
      assert(got == (1L to nTxn),
        s"round $round diverged (seed-fixed): got $got")
    }
  }
}
