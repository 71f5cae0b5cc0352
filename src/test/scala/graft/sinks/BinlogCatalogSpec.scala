package graft.sinks

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sinks.BinlogWire._

/** The dump-service SHOW surface: listings, the master cursor, and the
  * per-event view must agree with each other and with the raw files —
  * the invariants DuckDB cannot oracle (byte positions, file sizes). */
class BinlogCatalogSpec extends SparkSpec {
  import spark.implicits._

  private def writeFixture(carrier: String = "mark"): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-catalog").toString
    val specs = Seq(ColSpec("id", LongLong), ColSpec("v", VarChar(32)))
    val df = (1L to 40L).map(i =>
        (i, s"v$i", "INSERT", (i - 1) / 5 + 1, i))
      .toDF("id", "v", "op", "tso", "seq")
      .withColumn("ts", lit(1700000000L))
    val ordered = graft.operators.MergeSort.sortedRunsGrouped(df, 3,
      Seq("tso"), Seq("seq"))
    writeTxnFramedBinlogFiles(ordered, specs, "app", "t", "op", "ts",
      "tso", dir, tsoCarrier = carrier)
    dir
  }

  /** Three files with KNOWN tso ranges: binlog.000000 = tsos 1-5,
    * .000001 = 6-10, .000002 = 11-15. */
  private def rangedFixture(): String = {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-catalog-purge").toString
    val specs = Seq(ColSpec("id", LongLong), ColSpec("v", VarChar(32)))
    (0 until 3).foreach { idx =>
      val lo = idx * 5 + 1
      val df = (lo.toLong to lo + 4L).map(t =>
          (t, s"v$t", "INSERT", t, t))
        .toDF("id", "v", "op", "tso", "seq")
        .withColumn("ts", lit(1700000000L))
      val d = java.nio.file.Files
        .createTempDirectory("graft-catalog-purge-w").toString
      writeTxnFramedBinlogFiles(df.coalesce(1).sortWithinPartitions("tso"),
        specs, "app", "t", "op", "ts", "tso", d)
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(d, "binlog.000000"),
        java.nio.file.Paths.get(dir, f"binlog.$idx%06d"))
    }
    dir
  }

  test("purgeBefore: prefix-only, head-protected, barrier-vetoed retention") {
    // watermark 10: files 0,1 (tsos 1-10) are wholly at/below → purged
    val dir = rangedFixture()
    assert(BinlogCatalog.purgeBefore(spark, dir, 10L) ==
      Seq("binlog.000000", "binlog.000001"))
    def names(d: String) = new java.io.File(d).listFiles()
      .filter(_.getName.startsWith("binlog.")).map(_.getName).sorted.toSeq
    assert(names(dir) == Seq("binlog.000002"))
    // idempotent, and the head file NEVER purges however high the mark
    assert(BinlogCatalog.purgeBefore(spark, dir, 10L).isEmpty)
    assert(BinlogCatalog.purgeBefore(spark, dir, 999L).isEmpty)
    assert(names(dir) == Seq("binlog.000002"))
    // the survivor still serves seeks
    val (f, _) = BinlogCatalog.seekTso(spark, dir, 11L)
    assert(f == "binlog.000002")

    // a cleaner barrier vetoing the FIRST file stops the purge cold
    // (prefix-wise — the surviving log must stay a contiguous suffix)
    val dir2 = rangedFixture()
    assert(BinlogCatalog.purgeBefore(spark, dir2, 10L,
      barrier = _ != "binlog.000000").isEmpty)
    assert(names(dir2).size == 3)
    // vetoing only the SECOND file purges just the first
    assert(BinlogCatalog.purgeBefore(spark, dir2, 10L,
      barrier = _ != "binlog.000001") == Seq("binlog.000000"))
    assert(names(dir2) == Seq("binlog.000001", "binlog.000002"))
  }

  test("a purged log still serves cursors past the purge point; a cursor inside it fails loudly (1236 semantics)") {
    val dir = rangedFixture()
    // make the log GTID-carrying so auto-position cursors exist
    val gdir = java.nio.file.Files
      .createTempDirectory("graft-catalog-purge-g").toString
    val sid = java.util.UUID.fromString(
      "0a1b2c3d-bbbb-4444-3333-000000000001")
    val reg = Map(("db", "t") -> Seq("k", "seq", "v"))
    var prior = graft.model.GtidSet.Empty
    (0 until 3).foreach { idx =>
      val lo = idx * 5 + 1
      val rows = (lo.toLong to lo + 4L).map { t =>
        (t, t, "INSERT", "db", "t", Map.empty[String, String],
          Map("k" -> t.toString, "seq" -> "1", "v" -> s"v$t"),
          null: String, 1700000000L)
      }.toDF("tso", "txnId", "op", "schemaName", "tableName", "before",
        "after", "ddl", "tsoTime")
      val d = java.nio.file.Files
        .createTempDirectory("graft-catalog-purge-gw").toString
      BinlogWire.writeChangeStreamBinlogFiles(
        rows.coalesce(1).sortWithinPartitions("tso"), reg, d,
        checksummed = true, gtidSid = Some(sid), priorExecuted = prior)
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(d, "binlog.000000"),
        java.nio.file.Paths.get(gdir, f"binlog.$idx%06d"))
      prior = (lo.toLong to lo + 4L).foldLeft(prior)(_.add(sid, _))
    }
    assert(BinlogCatalog.purgeBefore(spark, gdir, 10L).size == 2)

    val srv = new BinlogDumpServer(gdir, "repl", "pw")
    try {
      // cursor past the purge point: serves exactly the surviving txns
      val seg = graft.sources.BinlogDumpClient.dumpSegmentGtid(
        "localhost", srv.port, "repl", "pw",
        graft.model.GtidSet.parse(s"$sid:1-10"))
      val served = graft.sources.BinlogDumpClient
        .advanceExecuted(seg, graft.model.GtidSet.parse(s"$sid:1-10"))
      assert(served.text == s"$sid:1-15")
      // cursor INSIDE the purged range: the server must answer the
      // loud purged-log error, never a silent subset
      val ex = intercept[graft.sources.BinlogDumpClient.ServerError] {
        graft.sources.BinlogDumpClient.dumpSegmentGtid(
          "localhost", srv.port, "repl", "pw",
          graft.model.GtidSet.parse(s"$sid:1-3"))
      }
      assert(ex.code == graft.sources.BinlogDumpClient.ErrUnknownLog ||
        ex.getMessage.toLowerCase.contains("purged"),
        s"expected the purged-log refusal, got: ${ex.getMessage}")
    } finally srv.close()
  }

  test("showBinaryLogs lists every wire file with its FS size, name-ordered") {
    val dir = writeFixture()
    val listed = BinlogCatalog.showBinaryLogs(spark, dir)
      .as[(String, Long)].collect().toSeq
    val onDisk = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("binlog.")).sortBy(_.getName)
      .map(f => (f.getName, f.length())).toSeq
    assert(listed == onDisk && listed.nonEmpty)
  }

  test("showMasterStatus is the max file at its end position; empty dir = ('',4)") {
    val dir = writeFixture()
    val (file, pos) = BinlogCatalog.showMasterStatus(spark, dir)
      .as[(String, Long)].collect().head
    val maxFile = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("binlog.")).maxBy(_.getName)
    assert(file == maxFile.getName && pos == maxFile.length())
    val empty = java.nio.file.Files.createTempDirectory("graft-empty").toString
    assert(BinlogCatalog.showMasterStatus(spark, empty)
      .as[(String, Long)].collect().head == (("", 4L)))
    // a MISSING directory is only tolerated by the master cursor; the
    // listing surfaces fail loudly — a typo'd log dir must not read as
    // an empty log
    val gone = empty + "/does-not-exist"
    assert(BinlogCatalog.showMasterStatus(spark, gone)
      .as[(String, Long)].collect().head == (("", 4L)))
    intercept[java.io.FileNotFoundException] {
      BinlogCatalog.showBinaryLogs(spark, gone)
    }
    intercept[java.io.FileNotFoundException] {
      BinlogCatalog.fileStats(spark, gone)
    }
  }

  test("showBinlogEvents positions chain: first at 4, next = prev end, last = size") {
    val dir = writeFixture()
    val events = BinlogCatalog.showBinlogEvents(spark, dir)
      .orderBy($"log_name", $"pos")
      .select($"log_name", $"pos", $"event_type", $"end_log_pos")
      .as[(String, Long, String, Long)].collect().toSeq
    val sizes = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("binlog."))
      .map(f => f.getName -> f.length()).toMap
    events.groupBy(_._1).foreach { case (name, evs) =>
      assert(evs.head._2 == 4L, s"$name first event not at 4")
      evs.sliding(2).foreach {
        case Seq((_, _, _, end), (_, pos, _, _)) =>
          assert(end == pos, s"$name position chain broken at $pos")
        case _ => ()
      }
      assert(evs.last._4 == sizes(name), s"$name last end_log_pos != size")
      // every file opens with the header pair
      assert(evs.map(_._3).take(2) == Seq("Format_desc", "Table_map"))
    }
  }

  test("IN/FROM/LIMIT windowing and the Info column") {
    val dir = writeFixture(carrier = "sequence")
    val all = BinlogCatalog.showBinlogEvents(spark, dir)
    val one = all.select($"log_name").as[String].collect().min
    // IN: only the named file
    val scoped = BinlogCatalog.showBinlogEvents(spark, dir, Some(one))
    assert(scoped.select($"log_name").distinct().as[String]
      .collect().toSeq == Seq(one))
    // FROM pos skips the header; LIMIT caps rows per file
    val windowed = BinlogCatalog
      .showBinlogEvents(spark, dir, Some(one), pos = 5L, limit = 3L)
      .orderBy($"pos").as[(String, Long, String, Long, Long, String)]
      .collect().toSeq
    assert(windowed.size == 3 && windowed.head._3 != "Format_desc")
    // unknown file fails loudly, like the reference's missing-file path
    intercept[IllegalArgumentException] {
      BinlogCatalog.showBinlogEvents(spark, dir, Some("binlog.999999"))
    }
    // Info: BEGIN statements, xids, and the sequence carrier's tso
    val infos = scoped.select($"event_type", $"info")
      .as[(String, String)].collect().toSeq
    assert(infos.exists { case (t, i) => t == "Query" && i == "BEGIN" })
    assert(infos.exists { case (t, i) =>
      t == "Xid" && i.startsWith("COMMIT /* xid=") })
    assert(infos.exists { case (t, i) =>
      t == "Sequence" && i.startsWith("sequence: COMMIT ") })
  }

  test("checksummed + rotate-chained logs list with intact position chains") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cat-crc").toString
    val specs = Seq(ColSpec("id", LongLong))
    val df = (1L to 20L).map(i => (i, "INSERT", (i - 1) / 4 + 1, i))
      .toDF("id", "op", "tso", "seq")
      .withColumn("ts", lit(1700000000L))
    val ordered = graft.operators.MergeSort.sortedRunsGrouped(df, 2,
      Seq("tso"), Seq("seq"))
    writeTxnFramedBinlogFiles(ordered, specs, "app", "t", "op", "ts",
      "tso", dir, checksummed = true, rotateChain = true,
      gtidSid = Some(java.util.UUID.fromString(
        "11111111-2222-3333-4444-555555555555")))
    val events = BinlogCatalog.showBinlogEvents(spark, dir)
      .orderBy($"log_name", $"pos")
      .select($"log_name", $"pos", $"event_type", $"end_log_pos", $"info")
      .as[(String, Long, String, Long, String)].collect().toSeq
    val sizes = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("binlog."))
      .map(f => f.getName -> f.length()).toMap
    assert(sizes.size == 2)
    events.groupBy(_._1).foreach { case (name, evs) =>
      // CRC trailers count toward positions: the chain must still hit
      // the exact file size even though parseStream strips the bytes
      assert(evs.head._2 == 4L)
      evs.sliding(2).foreach {
        case Seq((_, _, _, end, _), (_, pos, _, _, _)) => assert(end == pos)
        case _ => ()
      }
      assert(evs.last._4 == sizes(name))
      // the chain: every file ends in a Rotate naming its successor
      val (_, _, t, _, info) = evs.last
      assert(t == "Rotate" && info.startsWith("binlog."), s"$name: $t $info")
      // GTID mode surfaces Previous_gtids in the preamble and Gtid per txn
      assert(evs.exists(_._3 == "Previous_gtids"))
      assert(evs.exists(_._3 == "Gtid"))
    }
  }

  test("seekTso: first txn above the cursor in file order; end-of-log past the max") {
    val dir = writeFixture(carrier = "sequence")
    // independent expectation from the event listing: the first COMMIT
    // sequence with seq > t in (file, pos) order — no GTID in this
    // fixture, so the txn unit starts at the carrier itself
    val events = BinlogCatalog.showBinlogEvents(spark, dir)
      .orderBy($"log_name", $"pos")
      .select($"log_name", $"pos", $"event_type", $"info")
      .as[(String, Long, String, String)].collect().toSeq
    def expected(t: Long): (String, Long) = events.collectFirst {
      case (f, p, "Sequence", info)
        if info.startsWith("sequence: COMMIT ") &&
          info.stripPrefix("sequence: COMMIT ").toLong > t => (f, p)
    }.get
    for (t <- Seq(0L, 3L, 7L))
      assert(BinlogCatalog.seekTso(spark, dir, t) == expected(t), s"t=$t")
    // the whole log at or below the cursor → cursor = END of last file
    // (nothing to replay); an empty dir answers like showMasterStatus
    val last = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("binlog.")).maxBy(_.getName)
    assert(BinlogCatalog.seekTso(spark, dir, 100L) ==
      ((last.getName, last.length())))
    val empty = java.nio.file.Files.createTempDirectory("graft-seek-e").toString
    assert(BinlogCatalog.seekTso(spark, empty, 0L) == (("", 4L)))
  }

  test("seekTime: wall-clock positioning over time-shaped TSOs (physical ms << 22)") {
    // a log whose tsos carry real wall-clock physical components —
    // three txns committed at t0, t0+1000ms, t0+5000ms
    val dir = java.nio.file.Files
      .createTempDirectory("graft-seektime").toString
    val specs = Seq(ColSpec("id", LongLong), ColSpec("v", VarChar(32)))
    val t0 = 1700000000000L
    val tsos = Seq(t0, t0 + 1000L, t0 + 5000L).map(_ << 22)
    val df = tsos.zipWithIndex.map { case (tso, i) =>
        (i.toLong, s"v$i", "INSERT", tso, i.toLong)
      }.toDF("id", "v", "op", "tso", "seq")
      .withColumn("ts", lit(1700000000L))
    writeTxnFramedBinlogFiles(
      graft.operators.MergeSort.sortedRunsGrouped(df, 1,
        Seq("tso"), Seq("seq")),
      specs, "app", "t", "op", "ts", "tso", dir, tsoCarrier = "sequence")
    // a time strictly before every commit → the log head; between
    // commits → the next commit's unit; after the last → end-of-log
    assert(BinlogCatalog.seekTime(spark, dir, t0 - 1L) ==
      BinlogCatalog.seekTso(spark, dir, 0L))
    assert(BinlogCatalog.seekTime(spark, dir, t0 + 1L) ==
      BinlogCatalog.seekTso(spark, dir, tsos(1) - 1L),
      "a time between commits must land on the NEXT txn")
    assert(BinlogCatalog.seekTime(spark, dir, t0 + 1000L) ==
      BinlogCatalog.seekTso(spark, dir, tsos(1) - 1L),
      "a time exactly at a commit must serve that txn")
    val last = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("binlog.")).maxBy(_.getName)
    assert(BinlogCatalog.seekTime(spark, dir, t0 + 6000L) ==
      ((last.getName, last.length())))
  }

  test("seekTso over a rotate-chained GTID log starts at the txn's GTID frame") {
    // CRC32 + rotate chain + per-txn GTIDs, CTS-mark carrier: the txn
    // unit opens at the Gtid frame, and the seek must point THERE — a
    // reader starting at the cursor sees whole transactions only
    val dir = java.nio.file.Files.createTempDirectory("graft-seek-rot").toString
    val specs = Seq(ColSpec("id", LongLong))
    val df = (1L to 20L).map(i => (i, "INSERT", (i - 1) / 4 + 1, i))
      .toDF("id", "op", "tso", "seq")
      .withColumn("ts", lit(1700000000L))
    val ordered = graft.operators.MergeSort.sortedRunsGrouped(df, 2,
      Seq("tso"), Seq("seq"))
    writeTxnFramedBinlogFiles(ordered, specs, "app", "t", "op", "ts",
      "tso", dir, checksummed = true, rotateChain = true,
      gtidSid = Some(java.util.UUID.fromString(
        "11111111-2222-3333-4444-555555555555")))
    val events = BinlogCatalog.showBinlogEvents(spark, dir)
      .orderBy($"log_name", $"pos")
      .select($"log_name", $"pos", $"event_type", $"info")
      .as[(String, Long, String, String)].collect().toSeq
    def expected(t: Long): (String, Long) = {
      val idx = events.indexWhere { case (_, _, tp, info) =>
        tp == "Rows_query" && info.startsWith("CTS::") &&
          info.stripPrefix("CTS::").toLong > t
      }
      val file = events(idx)._1
      // the Gtid frame immediately preceding the qualifying mark
      events.take(idx).reverse
        .collectFirst { case (f, p, "Gtid", _) if f == file => (f, p) }.get
    }
    for (t <- Seq(0L, 2L, 4L))
      assert(BinlogCatalog.seekTso(spark, dir, t) == expected(t), s"t=$t")
  }

  test("fileStats frame/txn counts agree with showBinlogEvents") {
    val dir = writeFixture()
    val stats = BinlogCatalog.fileStats(spark, dir)
      .select($"log_file", $"n_frames", $"n_txns")
      .as[(String, Long, Long)].collect().toSeq.sortBy(_._1)
    val byType = BinlogCatalog.showBinlogEvents(spark, dir)
      .groupBy($"log_name")
      .agg(count(lit(1)).as("frames"),
        sum(when($"event_type" === "Xid", 1L).otherwise(0L)).as("txns"))
      .as[(String, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(stats == byType)
  }
}
