package graft.sinks

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.model.GtidSet
import graft.streaming.{CdcBinlog, CdcHeartbeat}

/** Backup-coupled retention beside the Global-Binlog production
  * (BinlogRetention): local purge is admitted ONLY for files whose
  * archived copy exists at the right length — the reference's
  * purgeLocal-covers-only-purgeRemote contract (backup/.../clean/
  * BinlogCleaner.java:75,122). Covers the deterministic lifecycle
  * (produce → archive → sabotaged archive VETOES purge → repaired pass
  * purges exactly the archived prefix → a fresh consumer bootstraps
  * the FULL history across the purge boundary) and the live shape
  * (retention passes racing a standing ProcessingTime production). */
class BinlogRetentionSpec extends SparkSpec {
  import spark.implicits._

  private val hbKey = ("db", "hb")
  private val reg = Map(
    ("db", "t") -> Seq("k", "seq", "v"),
    hbKey -> Seq("k"))

  private val sid1 = java.util.UUID.fromString(
    "0a1b2c3d-4444-4444-3333-000000000001")
  private val sid2 = java.util.UUID.fromString(
    "0a1b2c3d-4444-4444-3333-000000000002")

  private def ev(rows: Seq[(Long, String)]) =
    rows.map { case (tso, table) =>
      val after = if (table == "hb") Map("k" -> tso.toString)
        else Map("k" -> tso.toString, "seq" -> "1", "v" -> s"a$tso")
      (tso, tso, "INSERT", "db", table, Map.empty[String, String], after,
        null: String, 1700000000L)
    }.toDF("tso", "txnId", "op", "schemaName", "tableName", "before",
      "after", "ddl", "tsoTime")

  private def wc(rows: Seq[(Long, String)], sid: java.util.UUID,
      prior: GtidSet, intoDir: String, asIndex: Int): Unit = {
    val d = java.nio.file.Files
      .createTempDirectory("graft-retention-w").toString
    BinlogWire.writeChangeStreamBinlogFiles(
      ev(rows).coalesce(1).sortWithinPartitions("tso"), reg, d,
      checksummed = true, gtidSid = Some(sid), priorExecuted = prior)
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(d, "binlog.000000"),
      java.nio.file.Paths.get(intoDir, f"binlog.$asIndex%06d"))
    ()
  }

  private def localNames(dir: String): Seq[String] =
    Option(new java.io.File(dir).listFiles()).toSeq.flatten
      .filter(f => f.isFile && f.getName.startsWith("binlog."))
      .map(_.getName).sorted

  private def decodedOrder(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    df.filter(col("op") === "INSERT")
      .select(col("log_file"), col("tso")).collect().toSeq
      .map(r => (r.getString(0), r.getLong(1)))
      .sortBy(_._1).map(_._2)

  test("lifecycle: produce → archive → unarchived file VETOES purge → repaired pass purges archived prefix → full-history bootstrap across the boundary") {
    val root = java.nio.file.Files.createTempDirectory("graft-retention1")
    val (d1, d2) = (s"$root/dn1", s"$root/dn2")
    Seq(d1, d2).foreach(d => java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(d)))
    val out = s"$root/out"
    val arch = s"$root/archive"
    val gsid = java.util.UUID.fromString(
      "0a1b2c3d-4444-4444-3333-00000000000f")
    def produce(p1: Int, p2: Int): Unit = {
      val q = CdcBinlog.start(spark,
        Seq(("dn1", "localhost", p1), ("dn2", "localhost", p2)),
        "repl", "pw", reg, out, s"$root/ckpt", s"$root/work",
        numPartitions = 2, heartbeatTables = Set(hbKey),
        trigger = Trigger.AvailableNow(), gtidSid = Some(gsid))
      q.awaitTermination()
    }
    def served(body: Seq[Int] => Unit): Unit = {
      val srvs = Seq(d1, d2).map(d =>
        new BinlogDumpServer(d, "repl", "pw"))
      try body(srvs.map(_.port)) finally srvs.foreach(_.close())
    }

    // two produced batches: txns 1-4, then 5,6
    wc(Seq((1L, "t"), (3L, "t"), (11L, "hb")), sid1, GtidSet.Empty, d1, 0)
    wc(Seq((2L, "t"), (4L, "t"), (12L, "hb")), sid2, GtidSet.Empty, d2, 0)
    served { case Seq(p1, p2) => produce(p1, p2) }
    wc(Seq((5L, "t"), (13L, "hb")), sid1,
      GtidSet.Empty.add(sid1, 1L).add(sid1, 3L).add(sid1, 11L), d1, 1)
    wc(Seq((6L, "t"), (14L, "hb")), sid2,
      GtidSet.Empty.add(sid2, 2L).add(sid2, 4L).add(sid2, 12L), d2, 1)
    served { case Seq(p1, p2) => produce(p1, p2) }

    val allLocal = localNames(out)
    assert(allLocal.size >= 3, s"need a multi-file log, got $allLocal")
    val preBytes = allLocal.map(n => n ->
      java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(out, n)).toSeq).toMap

    // archive the finished prefix (everything but the active head)
    val archived = BinlogRetention.archiveFinished(spark, out, arch)
    assert(archived == allLocal.dropRight(1),
      s"finished files must archive: $archived vs $allLocal")
    // idempotent: nothing new on a second pass
    assert(BinlogRetention.archiveFinished(spark, out, arch).isEmpty)

    // SABOTAGE: drop the first file's archived copy — the purge barrier
    // must refuse to delete anything (prefix-only: the first unarchived
    // file stops the whole purge)
    val archDir = s"$arch/${new java.io.File(out).getName}"
    assert(new java.io.File(archDir, allLocal.head).delete())
    assert(BinlogRetention.purgeArchivedBefore(spark, out, arch, 4L)
      .isEmpty, "purge must never delete a file the archive lacks")
    assert(localNames(out) == allLocal)

    // a repaired pass: re-archives the missing file, then purges the
    // prefix wholly at/below tso 4 — all of it now archive-covered
    val (reArchived, purged) = BinlogRetention.pass(spark, out, arch, 4L)
    assert(reArchived == Seq(allLocal.head))
    assert(purged.nonEmpty && allLocal.startsWith(purged),
      s"purge must take a name-ordered prefix: $purged")
    assert(localNames(out) == allLocal.drop(purged.size),
      "survivors must be the contiguous suffix")
    // every purged byte is still served by the archive, byte-identical
    purged.foreach { n =>
      assert(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(archDir, n)).toSeq == preBytes(n),
        s"archived copy of purged $n diverged")
    }
    // the purged prefix held txns 1-4's files only (5,6 live on)
    assert(decodedOrder(BinlogWire.readBinlogFiles(spark, out, reg))
      .forall(_ > 4L))
    // auto-position contract survives the purge: the live log's
    // executed set still covers the purged history
    assert(BinlogCatalog.executedGtidSet(spark, out).text ==
      s"$gsid:1-6")

    // a FRESH consumer bootstraps the FULL history across the purge
    // boundary: archived prefix + live suffix, nothing lost, total order
    assert(decodedOrder(BinlogRetention.readStitched(spark, out, arch,
      reg)) == (1L to 6L))

    // MIXED pad widths (a pad upgrade in flight) make name order lie —
    // retention must refuse loudly, never guess a purge prefix
    java.nio.file.Files.write(
      java.nio.file.Paths.get(out, "binlog.000001.000000"),
      "legacy".getBytes("UTF-8"))
    intercept[IllegalArgumentException] {
      BinlogRetention.archiveFinished(spark, out, arch)
    }
    intercept[IllegalArgumentException] {
      BinlogRetention.purgeArchivedBefore(spark, out, arch, 99L)
    }
    java.nio.file.Files.delete(
      java.nio.file.Paths.get(out, "binlog.000001.000000"))
  }

  test("LIVE: retention passes race a standing ProcessingTime production — no unarchived file is ever purged, history stays complete") {
    val root = java.nio.file.Files.createTempDirectory("graft-retention2")
    val (d1, d2) = (s"$root/dn1", s"$root/dn2")
    Seq(d1, d2).foreach(d => java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(d)))
    val out = s"$root/out"
    val arch = s"$root/archive"
    wc(Seq((1L, "t"), (2L, "t")), sid1, GtidSet.Empty, d1, 0)
    wc(Seq((3L, "t")), sid2, GtidSet.Empty, d2, 0)

    val srvs = Seq(d1, d2).map(d => new BinlogDumpServer(d, "repl", "pw"))
    val q = CdcBinlog.start(spark,
      Seq(("dn1", "localhost", srvs(0).port),
        ("dn2", "localhost", srvs(1).port)),
      "repl", "pw", reg, out, s"$root/ckpt", s"$root/work",
      numPartitions = 2, heartbeatTables = Set(hbKey),
      trigger = Trigger.ProcessingTime(100L),
      targetRowsPerFile = 1) // rotate hard: every txn its own file
    val purgedAll = Seq.newBuilder[String]
    try {
      // heartbeats come from the test loop (single writer per DN dir);
      // their TSOs climb in steps so the mid-flight txns (100, 101)
      // stay ABOVE the frontier when they arrive — a DN's own log must
      // deliver in TSO order
      var hbTso = 10L
      var fed = false
      val deadline = System.nanoTime() + 120_000_000_000L
      var done = false
      while (!done && System.nanoTime() < deadline) {
        CdcHeartbeat.beatOnce(spark, d1, sid1, hbTso,
          schema = "db", table = "hb", keyCol = "k")
        CdcHeartbeat.beatOnce(spark, d2, sid2, hbTso + 1L,
          schema = "db", table = "hb", keyCol = "k")
        hbTso += 10L
        Thread.sleep(300)
        // retention races the producer: archive whatever is finished,
        // purge what the archive covers (watermark at txn 2)
        val (_, p) = try BinlogRetention.pass(spark, out, arch, 2L)
          catch { case scala.util.control.NonFatal(_) =>
            (Seq.empty[String], Seq.empty[String]) }
        purgedAll ++= p
        // progress reads the STITCHED view: the racing purge may
        // already have moved the emitted prefix into the archive
        val emitted = try decodedOrder(
            BinlogRetention.readStitched(spark, out, arch, reg))
          catch { case scala.util.control.NonFatal(_) => Seq.empty[Long] }
        if (!fed && emitted.containsSlice(Seq(1L, 2L, 3L))) {
          // mid-flight feed: more txns arrive WHILE retention runs, at
          // the DN's next file index with its CURRENT executed set as
          // the GTID continuation. Their TSOs (100000, 100001) sit far
          // above any frontier the stepped beats could have reached, so
          // dn1's log stays TSO-ordered however slow the loop ran; the
          // beat clock then JUMPS past them to release the emission.
          val idx = localNames(d1).size
          wc(Seq((100000L, "t"), (100001L, "t")), sid1,
            BinlogCatalog.executedGtidSet(spark, d1), d1, idx)
          hbTso = 100010L
          fed = true
        }
        done = fed && emitted.contains(100001L)
      }
      assert(done, "live production never caught up")
    } finally {
      q.stop(); srvs.foreach(_.close())
    }
    // final settled pass, then the invariants:
    val (_, pFinal) = BinlogRetention.pass(spark, out, arch, 2L)
    purgedAll ++= pFinal
    val archDir = s"$arch/${new java.io.File(out).getName}"
    // 1) nothing was purged that the archive does not hold
    purgedAll.result().foreach(n =>
      assert(new java.io.File(archDir, n).isFile,
        s"purged $n has no archived copy"))
    // 2) the full history is intact across the boundary, in total order
    assert(decodedOrder(BinlogRetention.readStitched(spark, out, arch,
      reg)) == Seq(1L, 2L, 3L, 100000L, 100001L))
    // 3) something actually purged (the test exercised the race)
    assert(purgedAll.result().nonEmpty,
      "watermark 2 with per-txn rotation must purge at least one file")
  }
}
