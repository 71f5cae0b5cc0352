package graft.sinks

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sinks.BinlogWire._

/** The DataFrame→binlog-file sink: partition-indexed rotated files whose
  * frames parse back in order. */
class BinlogWireSinkSpec extends SparkSpec {
  import spark.implicits._

  test("ordered frame encodes to rotated files that parse back in order") {
    val dir = java.nio.file.Files.createTempDirectory("graft-wire").toString
    val specs = Seq(ColSpec("id", LongLong), ColSpec("v", VarChar(64)),
      ColSpec("amt", NewDecimal(12, 2)))
    val df = (1L to 100L).map(i =>
        (i, s"payload-$i", BigDecimal(i * 100 + i).setScale(2) / 100,
          if (i % 10 == 0) "DELETE" else "INSERT", 1700000000L + i))
      .toDF("id", "v", "amt", "op", "ts")
    val ordered = graft.operators.MergeSort.sortedRuns(df, 4, Seq("id"))
    val n = writeBinlogFiles(ordered, specs, "app", "t", "op", "ts", dir)
    assert(n == 4) // one file per sorted-run partition

    // every file: magic + FDE + TABLE_MAP + rows events; ids inside are
    // ordered and the union is exactly the input
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("binlog.")).sortBy(_.getName)
    assert(files.length == 4)
    val allIds = scala.collection.mutable.ArrayBuffer.empty[Long]
    var deletes = 0
    files.foreach { f =>
      val frames = parseFile(java.nio.file.Files.readAllBytes(f.toPath))
      assert(frames.head.typeCode == FormatDescriptionEvent)
      assert(frames(1).typeCode == TableMapEvent)
      val fileIds = scala.collection.mutable.ArrayBuffer.empty[Long]
      frames.drop(2).foreach { fr =>
        val (tc, body) = (fr.typeCode, fr.body)
        assert(tc == WriteRowsEventV2 || tc == DeleteRowsEventV2)
        if (tc == DeleteRowsEventV2) deletes += 1
        // decode each row image's id cell (first col, after the
        // 1-byte null bitmap for 3 columns)
        var i = 6 + 2 + 2 + 1 + 1 // table_id, flags, extra, colcount lenenc, present bitmap
        while (i < body.length) {
          i += 1 // null bitmap (3 cols → 1 byte; no nulls in this data)
          var id = 0L
          (0 until 8).foreach(k => id |= (body(i + k) & 0xFFL) << (8 * k))
          fileIds += id
          i += 8 // id cell
          i += 1 + (body(i) & 0xFF) // varchar: 1-byte len + bytes
          i += 6 // DECIMAL(12,2): 4+1 int bytes? (10 int digits → 1+4) + 1 frac byte
        }
      }
      assert(fileIds == fileIds.sorted, s"${f.getName} ids out of order")
      allIds ++= fileIds
    }
    assert(allIds.sorted == (1L to 100L))
    assert(deletes >= 1) // delete runs framed as DELETE_ROWS events
  }

  test("txn framing: mark + BEGIN + rows + XID per transaction, update pairs") {
    val dir = java.nio.file.Files.createTempDirectory("graft-wiretxn").toString
    val specs = Seq(ColSpec("id", LongLong), ColSpec("v", VarChar(32)))
    // txn 100: insert 1, insert 2; txn 200: update 1 (with before image),
    // delete 2
    val df = Seq(
        (1L, "a1", null.asInstanceOf[String], "INSERT", 100L, 1L),
        (2L, "b1", null.asInstanceOf[String], "INSERT", 100L, 2L),
        (1L, "a2", "a1", "UPDATE", 200L, 3L),
        (2L, "b1", "b1", "DELETE", 200L, 4L))
      .toDF("id", "v", "v_before", "op", "tso", "seq")
      .withColumn("ts", lit(1700000000L))
      .coalesce(1).sortWithinPartitions("tso", "seq")
    val n = writeTxnFramedBinlogFiles(df, specs, "app", "t", "op", "ts",
      "tso", dir, beforeCols = Some(Seq("id", "v_before")))
    assert(n == 1)
    val bytes = java.nio.file.Files.readAllBytes(
      new java.io.File(dir, "binlog.000000").toPath)
    val frames = parseFile(bytes)
    assert(frames.map(_.typeCode) == Seq(
      FormatDescriptionEvent, TableMapEvent,
      RowsQueryEvent, QueryEvent, WriteRowsEventV2, WriteRowsEventV2,
      XidEvent,
      RowsQueryEvent, QueryEvent, UpdateRowsEventV2, DeleteRowsEventV2,
      XidEvent))
    // the marks carry the TSOs; the XIDs are the txn ids little-endian
    val marks = frames.filter(_.typeCode == RowsQueryEvent)
      .map(f => new String(f.body.drop(1), "UTF-8"))
    assert(marks == Seq("CTS::100", "CTS::200"))
    val xids = frames.filter(_.typeCode == XidEvent).map { f =>
      (0 until 8).map(k => (f.body(k) & 0xFFL) << (8 * k)).sum
    }
    assert(xids == Seq(100L, 200L))
    // BEGIN body ends with the statement text
    val begin = frames(3).body
    assert(new String(begin.takeRight(5), "UTF-8") == "BEGIN")
    // the update event carries TWO images (before shows the old value)
    val upd = frames(9).body
    assert(new String(upd, java.nio.charset.StandardCharsets.ISO_8859_1)
      .contains("a1"))
    assert(new String(upd, java.nio.charset.StandardCharsets.ISO_8859_1)
      .contains("a2"))
  }

  test("SEQUENCE/GCN tso carriers: frame shape + decoded tso identical to marks") {
    val specs = Seq(ColSpec("id", LongLong), ColSpec("v", VarChar(32)))
    val df = Seq(
        (1L, "a", "INSERT", 100L, 1L), (2L, "b", "INSERT", 100L, 2L),
        (3L, "c", "INSERT", 200L, 3L))
      .toDF("id", "v", "op", "tso", "seq")
      .withColumn("ts", lit(1700000000L))
      .coalesce(1).sortWithinPartitions("tso", "seq")
    Seq("sequence" -> SequenceEvent, "gcn" -> GcnEvent).foreach {
      case (carrier, code) =>
        val dir = java.nio.file.Files
          .createTempDirectory(s"graft-wire-$carrier").toString
        writeTxnFramedBinlogFiles(df, specs, "app", "t", "op", "ts",
          "tso", dir, tsoCarrier = carrier)
        val frames = parseFile(java.nio.file.Files.readAllBytes(
          new java.io.File(dir, "binlog.000000").toPath))
        // the carrier replaces the CTS rows-query mark, nothing else moves
        assert(frames.map(_.typeCode) == Seq(
          FormatDescriptionEvent, TableMapEvent,
          code, QueryEvent, WriteRowsEventV2, WriteRowsEventV2, XidEvent,
          code, QueryEvent, WriteRowsEventV2, XidEvent))
        assert(!frames.exists(_.typeCode == RowsQueryEvent))
        // decode authority: the carrier's number IS the txn tso
        val rows = readBinlogFiles(spark, dir, Map(("app", "t") -> Seq("id", "v")))
          .select($"tso", element_at($"after", "id"))
          .as[(Option[Long], String)].collect().toSeq.sortBy(_._2)
        assert(rows == Seq((Some(100L), "1"), (Some(100L), "2"),
          (Some(200L), "3")))
    }
  }

  test("GTID mode + rotate chain: sid:tso gtids per txn, verifiable file chain") {
    val dir = java.nio.file.Files.createTempDirectory("graft-wiregtid").toString
    val sid = java.util.UUID.fromString("3E11FA47-71CA-11E1-9E33-C80AA9429562")
    val specs = Seq(ColSpec("id", LongLong))
    val df = (1L to 40L).map(i => (i, "INSERT", i, 1700000000L))
      .toDF("id", "op", "tso", "ts")
    val ordered = graft.operators.MergeSort.sortedRuns(df, 4, Seq("tso"))
    val n = writeTxnFramedBinlogFiles(ordered, specs, "app", "t", "op",
      "ts", "tso", dir, gtidSid = Some(sid), rotateChain = true)
    assert(n == 4)
    // every decoded row carries its transaction's gtid, gno = tso
    val rows = BinlogWire.readBinlogFiles(spark, dir,
      Map(("app", "t") -> Seq("id")))
      .select($"tso", $"gtid").as[(Option[Long], Option[String])]
      .collect()
    assert(rows.length == 40)
    rows.foreach { case (tso, gtid) =>
      assert(gtid.contains(s"${sid.toString.toLowerCase}:${tso.get}"))
    }
    // the rotate chain verifies: each file names its successor
    val chain = BinlogWire.verifyRotateChain(spark, dir)
    assert(chain.length == 4)
    assert(chain.init.map(_._2.get) == chain.tail.map(_._1))
    // PREVIOUS_GTIDS opens every file (after the FDE)
    val bytes = java.nio.file.Files.readAllBytes(
      new java.io.File(dir, "binlog.000000").toPath)
    assert(parseFile(bytes).map(_.typeCode).take(2) ==
      Seq(FormatDescriptionEvent, PreviousGtidsEvent))
    // a lost middle segment is DETECTED
    assert(new java.io.File(dir, "binlog.000001").delete())
    val e = intercept[IllegalArgumentException] {
      BinlogWire.verifyRotateChain(spark, dir)
    }
    assert(e.getMessage.contains("log segment is missing"))
  }

  test("multi-table change stream: per-table maps inside txn envelopes") {
    val dir = java.nio.file.Files.createTempDirectory("graft-wirecdc").toString
    val ev = Seq(
      // txn 7 at tso 100: one insert per table
      (100L, 7L, "INSERT", "app", "t1", Map.empty[String, String],
        Map("id" -> "1", "v" -> "x"), 1700000000L),
      (101L, 7L, "INSERT", "app", "t2", Map.empty[String, String],
        Map("k" -> "a"), 1700000000L),
      // txn 8 at tso 200: update with a before image, then a delete
      (200L, 8L, "UPDATE", "app", "t1", Map("id" -> "1", "v" -> "x"),
        Map("id" -> "1", "v" -> "y"), 1700000001L),
      (201L, 8L, "DELETE", "app", "t2", Map("k" -> "a"),
        Map.empty[String, String], 1700000001L))
      .toDF("tso", "txnId", "op", "schemaName", "tableName", "before",
        "after", "tsoTime")
      .coalesce(1).sortWithinPartitions("tso")
    val n = BinlogWire.writeChangeStreamBinlogFiles(ev,
      Map(("app", "t1") -> Seq("id", "v"), ("app", "t2") -> Seq("k")), dir)
    assert(n == 1)
    val frames = parseFile(java.nio.file.Files.readAllBytes(
      new java.io.File(dir, "binlog.000000").toPath))
    assert(frames.map(_.typeCode) == Seq(
      FormatDescriptionEvent,
      RowsQueryEvent, QueryEvent,
      TableMapEvent, WriteRowsEventV2, TableMapEvent, WriteRowsEventV2,
      XidEvent,
      RowsQueryEvent, QueryEvent,
      TableMapEvent, UpdateRowsEventV2, TableMapEvent, DeleteRowsEventV2,
      XidEvent))
    // table maps carry distinct table ids; xids are the txn ids
    val tmIds = frames.filter(_.typeCode == TableMapEvent)
      .map(f => (0 until 6).map(k => (f.body(k) & 0xFFL) << (8 * k)).sum)
    assert(tmIds.distinct.size == 2)
    val xids = frames.filter(_.typeCode == XidEvent).map { f =>
      (0 until 8).map(k => (f.body(k) & 0xFFL) << (8 * k)).sum
    }
    assert(xids == Seq(7L, 8L))
    // the delete's image comes from the BEFORE map
    val del = new String(frames(13).body,
      java.nio.charset.StandardCharsets.ISO_8859_1)
    assert(del.contains("a"))
  }

  test("schema-tracking decode: in-stream DDL evolves the name registry") {
    val ts = 1700000000L
    def callBytes(rows: Seq[(Long, Long, String, String, String,
        Map[String, String], Map[String, String], String)],
        cols: Map[(String, String), Seq[String]]): Array[Byte] = {
      val d = java.nio.file.Files
        .createTempDirectory("graft-sst").toString
      val ev = rows.map { case (tso, txn, op, sn, tn, b, a, ddl) =>
        (tso, txn, op, sn, tn, b, a, ddl, ts)
      }.toDF("tso", "txnId", "op", "schemaName", "tableName", "before",
        "after", "ddl", "tsoTime")
      BinlogWire.writeChangeStreamBinlogFiles(
        ev.coalesce(1).sortWithinPartitions("tso"), cols, d,
        checksummed = true)
      java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(d, "binlog.000000"))
    }
    def concat(segs: Array[Byte]*): Array[Byte] =
      segs.head ++ segs.tail.flatMap(_.drop(4)) // one magic

    // RENAME mid-stream: a consumer holding only the INITIAL registry
    // decodes post-DDL rows under the NEW name — the poll-segment
    // shape (a dump concatenates files, so the rename and the rows it
    // renames travel in one decoded stream)
    val segA = callBytes(Seq(
      (1L, 1L, "INSERT", "db", "t", Map.empty, Map("k" -> "1", "v" -> "a"), null),
      (2L, 2L, "DDL", "db", "t", Map.empty, Map.empty,
        "ALTER TABLE t RENAME COLUMN v TO v2")),
      Map(("db", "t") -> Seq("k", "v")))
    val segB = callBytes(Seq(
      (3L, 3L, "INSERT", "db", "t", Map.empty, Map("k" -> "2", "v2" -> "b"), null)),
      Map(("db", "t") -> Seq("k", "v2")))
    val rows = BinlogWire.decodeFile(concat(segA, segB),
      Map(("db", "t") -> Seq("k", "v"))).filter(_.op == "INSERT")
    assert(rows.map(_.after) == Seq(
      Map("k" -> "1", "v" -> "a"), Map("k" -> "2", "v2" -> "b")))

    // CREATE TABLE registers a brand-new table: decode needs NO
    // caller registry at all
    val segC = callBytes(Seq(
      (1L, 1L, "DDL", "db", "t2", Map.empty, Map.empty,
        "CREATE TABLE t2 (a INT, b VARCHAR(10))"),
      (2L, 2L, "INSERT", "db", "t2", Map.empty,
        Map("a" -> "7", "b" -> "x"), null)),
      Map(("db", "t2") -> Seq("a", "b")))
    val created = BinlogWire.decodeFile(segC).filter(_.op == "INSERT")
    assert(created.map(_.after) == Seq(Map("a" -> "7", "b" -> "x")))

    // ADD COLUMN ... AFTER honors MySQL's ordinal placement
    val segD = callBytes(Seq(
      (1L, 1L, "DDL", "db", "t3", Map.empty, Map.empty,
        "ALTER TABLE t3 ADD COLUMN n INT AFTER k")),
      Map(("db", "t3") -> Seq("k", "v")))
    val segE = callBytes(Seq(
      (2L, 2L, "INSERT", "db", "t3", Map.empty,
        Map("k" -> "1", "n" -> "5", "v" -> "z"), null)),
      Map(("db", "t3") -> Seq("k", "n", "v")))
    val placed = BinlogWire.decodeFile(concat(segD, segE),
      Map(("db", "t3") -> Seq("k", "v"))).filter(_.op == "INSERT")
    assert(placed.map(_.after) == Seq(
      Map("k" -> "1", "n" -> "5", "v" -> "z")))

    // an INCONSISTENT producer (DDL shrank the table, layout did not)
    // fails loudly, never silently misnames cells
    val segF = callBytes(Seq(
      (1L, 1L, "DDL", "db", "t4", Map.empty, Map.empty,
        "ALTER TABLE t4 DROP COLUMN v")),
      Map(("db", "t4") -> Seq("k", "v")))
    val segG = callBytes(Seq(
      (2L, 2L, "INSERT", "db", "t4", Map.empty,
        Map("k" -> "1", "v" -> "stale"), null)),
      Map(("db", "t4") -> Seq("k", "v")))
    val err = intercept[IllegalArgumentException] {
      BinlogWire.decodeFile(concat(segF, segG),
        Map(("db", "t4") -> Seq("k", "v")))
    }
    assert(err.getMessage.contains("schema tracking"))

    // a rename ONTO an existing column (a statement MySQL never emits)
    // leaves the registry untouched instead of duplicating a name
    val segH = callBytes(Seq(
      (1L, 1L, "DDL", "db", "t5", Map.empty, Map.empty,
        "ALTER TABLE t5 RENAME COLUMN k TO v"),
      (2L, 2L, "INSERT", "db", "t5", Map.empty,
        Map("k" -> "9", "v" -> "w"), null)),
      Map(("db", "t5") -> Seq("k", "v")))
    val kept = BinlogWire.decodeFile(segH,
      Map(("db", "t5") -> Seq("k", "v"))).filter(_.op == "INSERT")
    assert(kept.map(_.after) == Seq(Map("k" -> "9", "v" -> "w")))
  }

  test("DDL rows travel as QUERY statement events and decode back") {
    val dir = java.nio.file.Files.createTempDirectory("graft-wireddl").toString
    val ev = Seq(
      (100L, 7L, "INSERT", "app", "t1", Map.empty[String, String],
        Map("id" -> "1"), null.asInstanceOf[String], 1700000000L),
      (150L, 8L, "DDL", "app", "t1", Map.empty[String, String],
        Map.empty[String, String],
        "ALTER TABLE t1 ADD COLUMN note TEXT", 1700000001L),
      (200L, 9L, "INSERT", "app", "t1", Map.empty[String, String],
        Map("id" -> "2"), null.asInstanceOf[String], 1700000002L))
      .toDF("tso", "txnId", "op", "schemaName", "tableName", "before",
        "after", "ddl", "tsoTime")
      .coalesce(1).sortWithinPartitions("tso")
    BinlogWire.writeChangeStreamBinlogFiles(ev,
      Map(("app", "t1") -> Seq("id")), dir, checksummed = true)
    val decoded = BinlogWire.readBinlogFiles(spark, dir,
        Map(("app", "t1") -> Seq("id")))
      .select($"op", $"after", $"tso", $"ddl")
      .as[(String, Map[String, String], Option[Long], Option[String])]
      .collect().toSeq
    assert(decoded.map(_._1) == Seq("INSERT", "DDL", "INSERT"))
    assert(decoded(1)._4.contains("ALTER TABLE t1 ADD COLUMN note TEXT"))
    assert(decoded(1)._3.contains(150L)) // the DDL's TSO mark survived
    assert(decoded(2)._2 == Map("id" -> "2"))
  }

  test("decode roundtrip: typed cells survive encode∘decode exactly") {
    val dir = java.nio.file.Files.createTempDirectory("graft-wirerd").toString
    val specs = Seq(ColSpec("id", LongLong), ColSpec("sm", Short),
      ColSpec("v", VarChar(32)), ColSpec("amt", NewDecimal(10, 3)),
      ColSpec("d", Date3), ColSpec("f", Double8))
    val df = Seq(
        (1L, 7, "alpha", BigDecimal("12.345"),
          java.sql.Date.valueOf("2024-03-05"), 2.5, "INSERT", 100L, 1L),
        (2L, -3, "βeta", BigDecimal("-0.001"),
          java.sql.Date.valueOf("1999-12-31"), -1.25, "INSERT", 100L, 2L),
        (1L, 7, "alpha", BigDecimal("12.345"),
          java.sql.Date.valueOf("2024-03-05"), 2.5, "DELETE", 200L, 3L))
      .toDF("id", "sm", "v", "amt", "d", "f", "op", "tso", "seq")
      .withColumn("ts", lit(1700000100L))
      .coalesce(1).sortWithinPartitions("tso", "seq")
    writeTxnFramedBinlogFiles(df, specs, "app", "t", "op", "ts", "tso", dir)
    val decoded = decodeFile(java.nio.file.Files.readAllBytes(
      new java.io.File(dir, "binlog.000000").toPath),
      Map(("app", "t") -> specs.map(_.name)))
    assert(decoded.length == 3)
    val first = decoded.head
    assert(first.op == "INSERT" && first.tso.contains(100L) &&
      first.xid.contains(100L))
    assert(first.after == Map("id" -> "1", "sm" -> "7", "v" -> "alpha",
      "amt" -> "12.345", "d" -> "2024-03-05", "f" -> "2.5"))
    assert(decoded(1).after("v") == "βeta")
    assert(decoded(1).after("amt") == "-0.001")
    assert(decoded(1).after("sm") == "-3")
    assert(decoded(1).after("f") == "-1.25")
    // the delete decodes as a BEFORE image with the same cells
    assert(decoded(2).op == "DELETE" && decoded(2).tso.contains(200L))
    assert(decoded(2).before("amt") == "12.345")
  }

  test("readBinlogFiles: the wire output reads back as a change frame") {
    val dir = java.nio.file.Files.createTempDirectory("graft-wiresrc").toString
    val ev = Seq(
      (100L, 7L, "INSERT", "app", "t1", Map.empty[String, String],
        Map("id" -> "1"), 1700000000L),
      (200L, 8L, "UPDATE", "app", "t1", Map("id" -> "1"),
        Map("id" -> "2"), 1700000001L))
      .toDF("tso", "txnId", "op", "schemaName", "tableName", "before",
        "after", "tsoTime")
      .coalesce(1).sortWithinPartitions("tso")
    BinlogWire.writeChangeStreamBinlogFiles(ev,
      Map(("app", "t1") -> Seq("id")), dir)
    val back = BinlogWire.readBinlogFiles(spark, dir,
      Map(("app", "t1") -> Seq("id")))
      .select($"op", $"before", $"after", $"tso", $"xid")
      .as[(String, Map[String, String], Map[String, String],
        Option[Long], Option[Long])].collect().toSeq
    assert(back == Seq(
      ("INSERT", Map.empty, Map("id" -> "1"), Some(100L), Some(7L)),
      ("UPDATE", Map("id" -> "1"), Map("id" -> "2"), Some(200L), Some(8L))))
  }

  // ---- one-txn-per-file producer contract (TxnApplier's exactly-once
  // gate drops the second half of a txn split across triggers) ----

  test("txn-framed writer refuses a txn split across files") {
    val dir = java.nio.file.Files.createTempDirectory("graft-wiresplit").toString
    val specs = Seq(ColSpec("id", LongLong))
    // two txns interleaved over seq: range-partitioning on SEQ (the
    // wrong key) puts rows of BOTH txns in BOTH files
    val df = (1L to 12L).map(s => (s, "INSERT", s % 2 + 1, s, 1700000000L))
      .toDF("id", "op", "tso", "seq", "ts")
    val split = df.repartitionByRange(2, col("seq"))
      .sortWithinPartitions("tso", "seq")
    val e = intercept[IllegalStateException] {
      writeTxnFramedBinlogFiles(split, specs, "app", "t", "op", "ts",
        "tso", dir)
    }
    assert(e.getMessage.contains("split or interleaved"))
  }

  test("txn-framed writer refuses an unordered feed that reopens a txn") {
    val dir = java.nio.file.Files.createTempDirectory("graft-wireorder").toString
    val specs = Seq(ColSpec("id", LongLong))
    // tso sequence 1,2,1 in one partition: txn 1 would reopen after its
    // commit — a duplicate CTS mark in a single file
    val df = Seq((1L, "INSERT", 1L, 1700000000L),
        (2L, "INSERT", 2L, 1700000000L),
        (3L, "INSERT", 1L, 1700000000L))
      .toDF("id", "op", "tso", "ts").coalesce(1)
    val e = intercept[org.apache.spark.SparkException] {
      writeTxnFramedBinlogFiles(df, specs, "app", "t", "op", "ts",
        "tso", dir)
    }
    assert(e.getCause.getMessage.contains("reopen"))
  }

  test("change-stream writer refuses a txn spanning a file boundary") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cdcsplit").toString
    // txn 2 is wide (tsos 3..22): any near-half range boundary on tso
    // falls inside it, so file 0 closes with txn 2 and file 1 reopens it
    val rows =
      Seq((1L, 1L), (2L, 1L)) ++ (3L to 22L).map(t => (t, 2L)) ++
        Seq((23L, 3L), (24L, 3L))
    val ev = rows.map { case (tso, txn) =>
      (tso, txn, "INSERT", "app", "t1", Map.empty[String, String],
        Map("id" -> s"$tso"), 1700000000L)
    }.toDF("tso", "txnId", "op", "schemaName", "tableName", "before",
      "after", "tsoTime")
    val split = ev.repartitionByRange(2, col("tso"))
      .sortWithinPartitions("tso")
    val e = intercept[IllegalStateException] {
      BinlogWire.writeChangeStreamBinlogFiles(split,
        Map(("app", "t1") -> Seq("id")), dir)
    }
    assert(e.getMessage.contains("spans files"))
  }

  test("grouped multi-partition producer satisfies the contract") {
    val dir = java.nio.file.Files.createTempDirectory("graft-wireok").toString
    val specs = Seq(ColSpec("id", LongLong))
    // 6 txns × 4 rows over 3 files via the documented producer shape
    val df = (1L to 24L).map(s => (s, "INSERT", (s - 1) / 4 + 1, s, 1700000000L))
      .toDF("id", "op", "tso", "seq", "ts")
    val ordered = graft.operators.MergeSort.sortedRunsGrouped(
      df, 3, Seq("tso"), Seq("seq"))
    val n = writeTxnFramedBinlogFiles(ordered, specs, "app", "t", "op",
      "ts", "tso", dir)
    assert(n >= 2) // genuinely multi-file
    val rows = BinlogWire.readBinlogFiles(spark, dir,
      Map(("app", "t") -> Seq("id")))
    // every txn decodes whole, each under exactly one CTS mark
    val perTxn = rows.groupBy($"tso").count()
      .as[(Option[Long], Long)].collect().toMap
    assert(perTxn == (1L to 6L).map(t => Option(t) -> 4L).toMap)
  }
}
