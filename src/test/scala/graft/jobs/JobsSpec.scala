package graft.jobs

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.operators.{MergeSort, StreamHash}
import graft.sinks.OrderedSink

class JobsSpec extends SparkSpec {
  import spark.implicits._

  // ---- transfer invariant (polardbx-cdc-transfer Bank analog) ----

  test("bank invariant: SUM(balance) constant at every complete-txn cut") {
    val nAccounts = 20
    val rnd = new scala.util.Random(42)
    val initial = (0 until nAccounts).map(a => (a.toLong, 1000L))
    // each txn t: debit account x by d, credit account y by d (paired rows)
    val transfers = (1 to 200).flatMap { t =>
      val x = rnd.nextInt(nAccounts); var y = rnd.nextInt(nAccounts)
      if (y == x) y = (y + 1) % nAccounts
      val d = 1 + rnd.nextInt(50)
      Seq((t.toLong, 2L * t, x.toLong, -d.toLong),
        (t.toLong, 2L * t + 1, y.toLong, d.toLong))
    }
    val ev = transfers.toDF("txnId", "tso", "account", "delta")
    val total = initial.map(_._2).sum
    // at each complete-transaction cut (every 50 txns), balances must sum
    // to the invariant — applying a PREFIX of whole transactions only
    Seq(50L, 100L, 150L, 200L).foreach { cut =>
      val applied = ev.filter($"txnId" <= cut)
        .groupBy($"account").agg(sum($"delta").as("d"))
      val balances = initial.toDF("account", "balance")
        .join(applied, Seq("account"), "left_outer")
        .select(($"balance" + coalesce($"d", lit(0L))).as("b"))
      assert(balances.agg(sum($"b")).head().getLong(0) == total,
        s"invariant broken at cut $cut")
      assert(balances.filter($"b" < 0).count() >= 0) // sanity: evaluable
    }
    // a HALF-transaction cut must break the invariant (shows the test bites)
    val halfApplied = ev.filter($"tso" <= 100L) // includes debit of txn 50 only
      .groupBy($"account").agg(sum($"delta").as("d"))
    val halfSum = initial.toDF("account", "balance")
      .join(halfApplied, Seq("account"), "left_outer")
      .select(($"balance" + coalesce($"d", lit(0L))).as("b"))
      .agg(sum($"b")).head().getLong(0)
    assert(halfSum != total)
  }

  // ---- Binlog-X fan-out (HashLevelTest analog) ----

  test("binlog-x fan-out: complete, balanced, per-stream ordered, markers everywhere") {
    val events = graft.sources.Tables.events(spark, sf)
      .select($"event_id".as("tso"), lit("app").as("db"),
        concat(lit("t"), ($"user_id" % 7)).as("tbl"), $"user_id".as("pk"),
        ($"event_type" === "signup").as("marker"))
    val m = 4
    val out = BinlogXJob.fanOut(events, m, StreamHash.ByRecord,
      "db", "tbl", Seq("pk"), "tso", isMarker = col("marker"))
    val nData = events.filter(!$"marker").count()
    val nMarkers = events.filter($"marker").count()
    // completeness: every data row exactly once, every marker M times
    assert(out.filter(!$"marker").count() == nData)
    assert(out.filter($"marker").count() == nMarkers * m)
    // each stream sees every marker
    val perStream = out.filter($"marker").groupBy($"stream").count()
      .as[(Int, Long)].collect().toMap
    assert(perStream.keySet == (0 until m).toSet)
    assert(perStream.values.forall(_ == nMarkers))
    // per-key locality: a pk's data rows all land in one stream
    val keySpread = out.filter(!$"marker").groupBy($"pk")
      .agg(countDistinct($"stream").as("s")).filter($"s" > 1).count()
    assert(keySpread == 0)
    // balance: no stream more than 3x the smallest (hash spread sanity)
    val sizes = out.filter(!$"marker").groupBy($"stream").count()
      .as[(Int, Long)].collect().map(_._2)
    assert(sizes.max <= sizes.min * 3, s"skewed: ${sizes.toSeq}")
    // per-stream order: within each partition, tso ascending
    val disorder = out.select($"stream", $"tso").rdd.mapPartitions { it =>
      val rows = it.map(r => (r.getInt(0), r.getLong(1))).toSeq
      Iterator(rows.sliding(2).count {
        case Seq((s1, t1), (s2, t2)) => s1 == s2 && t1 > t2
        case _ => false
      })
    }.collect().sum
    assert(disorder == 0)
  }

  test("binlog-x wire: per-stream rotated binlog sets, DDL in every stream's log") {
    val dir = java.nio.file.Files.createTempDirectory("graft-bxwire").toString
    val m = 3
    // 30 single-row txns over two tables, plus one DDL marker
    val data = (1L to 30L).map { i =>
      (i, i, "INSERT", "app", if (i % 2 == 0) "t0" else "t1",
        Map.empty[String, String], Map("id" -> i.toString),
        1700000000L, null.asInstanceOf[String], false)
    }
    val ddl = Seq((31L, 31L, "DDL", "app", "t0", Map.empty[String, String],
      Map.empty[String, String], 1700000000L,
      "ALTER TABLE t0 ADD COLUMN x INT", true))
    val events = (data ++ ddl).toDF("tso", "txnId", "op", "schemaName",
      "tableName", "before", "after", "tsoTime", "ddl", "marker")
    val fanned = BinlogXJob.fanOut(events, m, StreamHash.ByTable,
      "schemaName", "tableName", Seq("tso"), "tso", isMarker = $"marker")
    val tables = Map(("app", "t0") -> Seq("id"), ("app", "t1") -> Seq("id"))
    BinlogXJob.writeStreamWire(fanned, m, tables, dir, filesPerStream = 2)
    val perStream = (0 until m).map { s =>
      graft.sinks.BinlogWire.readBinlogFiles(spark, s"$dir/stream=$s", tables)
    }
    // every data row exactly once ACROSS streams; tables stay whole
    val ids = perStream.flatMap(_.filter($"op" =!= "DDL")
      .select($"after.id").as[String].collect().map(_.toLong))
    assert(ids.sorted == (1L to 30L))
    perStream.foreach { df =>
      assert(df.filter($"op" =!= "DDL")
        .select($"tableName").distinct().count() <= 1)
      // the DDL marker is in EVERY stream's log, exactly once
      assert(df.filter($"op" === "DDL").select($"ddl").as[String]
        .collect().toSeq == Seq("ALTER TABLE t0 ADD COLUMN x INT"))
    }
    // each stream's file chain verifies independently (a 1-row stream —
    // the marker-only one — may legitimately range-partition to 1 file)
    (0 until m).foreach { s =>
      assert(graft.sinks.BinlogWire
        .verifyRotateChain(spark, s"$dir/stream=$s").nonEmpty)
    }
  }

  test("streaming binlog-x: per-stream dirs, markers everywhere, replay-safe") {
    import org.apache.spark.sql.types._
    val root = java.nio.file.Files.createTempDirectory("graft-bx").toString
    val srcDir = s"$root/src"
    new java.io.File(srcDir).mkdirs()
    val schema = StructType(Seq(
      StructField("tso", LongType), StructField("db", StringType),
      StructField("tbl", StringType), StructField("pk", LongType),
      StructField("marker", BooleanType)))
    (1 to 40).map(i => (i.toLong, "app", s"t${i % 5}", (i % 7).toLong,
        i % 10 == 0))
      .toDF("tso", "db", "tbl", "pk", "marker")
      .write.parquet(s"$srcDir/w1.parquet")
    def run() = {
      val q = BinlogXJob.startStream(spark, s"$srcDir/*", schema, m = 3,
        StreamHash.ByRecord, "db", "tbl", Seq("pk"), "tso",
        isMarker = col("marker"), s"$root/out", s"$root/ckpt")
      q.awaitTermination(120000)
    }
    run()
    val streams = (0 until 3).map(i =>
      spark.read.parquet(s"$root/out/stream=$i"))
    // data completeness: 36 data rows exactly once across streams
    assert(streams.map(_.filter(!$"marker").count()).sum == 36)
    // markers in every stream
    streams.foreach(s => assert(s.filter($"marker").count() == 4))
    // per-stream order
    streams.foreach { s =>
      assert(MergeSort.disorderCount(s.orderBy($"tso"), "tso") == 0)
    }
    // replay after checkpoint loss: no duplicates (position idempotence)
    org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(s"$root/ckpt"))
    run()
    assert((0 until 3).map(i =>
      spark.read.parquet(s"$root/out/stream=$i").count()).sum == 48)
  }

  // ---- ordered sink: framing, recovery, idempotent append ----

  test("ordered sink: txn framing survives file-order reads; recovery + idempotent append") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sink").toString
    val events = Seq(
      (10L, 3L, "02", "U"), (10L, 2L, "01", "I"),
      (11L, 5L, "01", "D"), (12L, 8L, "01", "I"))
      .toDF("txnId", "tso", "traceId", "op")
    val framed = OrderedSink.writeTxnFramed(events, "txnId", "tso", "traceId",
      Seq("op"), numPartitions = 2, outDir = Some(s"$dir/framed"))
    val got = spark.read.parquet(s"$dir/framed")
    assert(got.count() == 3)
    // intra-txn order restored by traceId
    val t10 = got.filter($"txnId" === 10L).select($"events").head()
      .getSeq[org.apache.spark.sql.Row](0).map(_.getString(1))
    assert(t10 == Seq("I", "U"))
    // recovery position = max tso
    assert(OrderedSink.recoverPosition(spark, s"$dir/framed", "commit_tso")
      .contains(8L))
    // idempotent append: replaying the same flat events adds nothing
    OrderedSink.appendSince(events.select($"tso", $"op"), "tso",
      s"$dir/log", 2)
    val n1 = spark.read.parquet(s"$dir/log").count()
    OrderedSink.appendSince(events.select($"tso", $"op"), "tso",
      s"$dir/log", 2)
    assert(spark.read.parquet(s"$dir/log").count() == n1)
    // new data past the cursor does append
    OrderedSink.appendSince(Seq((9L, "I"), (3L, "stale")).toDF("tso", "op"),
      "tso", s"$dir/log", 2)
    assert(spark.read.parquet(s"$dir/log").count() == n1 + 1)
  }

  test("showBinlogEvents lists per-file TSO ranges over the ordered log") {
    val dir = java.nio.file.Files.createTempDirectory("graft-show")
      .toString + "/log"
    (0 until 3).foreach { b =>
      OrderedSink.appendSince(
        (b * 10 until (b + 1) * 10).map(i => (i.toLong, s"e$i"))
          .toDF("tso", "op"), "tso", dir, 2)
    }
    val listing = OrderedSink.showBinlogEvents(spark, dir, "tso")
      .as[(String, Long, Long, Long)].collect()
    // counts cover the log; every file's range is internally consistent
    assert(listing.map(_._4).sum == 30L)
    assert(listing.forall(r => r._2 <= r._3))
    // the listing is a seek index: ordered by start_tso
    val starts = listing.map(_._2).toSeq
    assert(starts == starts.sorted)
    // a point lookup (tso=15) is served by at least one listed file range
    assert(listing.exists(r => r._2 <= 15L && 15L <= r._3))
    // the footer-stats listing must agree with a full-scan ground truth
    // per file (the serving path itself opens no data pages — row-group
    // statistics only)
    val byScan = OrderedSink.showBinlogEventsByScan(spark, dir, "tso")
      .as[(String, Long, Long, Long)].collect()
      .map(r => (r._1.split('/').last, r._2, r._3, r._4)).toSet
    assert(listing.map(r => (r._1.split('/').last, r._2, r._3, r._4))
      .toSet == byScan)
  }

  test("recovery cursor is the O(1) sidecar, not a log scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cursor")
      .toString + "/log"
    OrderedSink.appendSince(Seq((1L, "a"), (5L, "b")).toDF("tso", "op"),
      "tso", dir, 2)
    // appendSince committed a cursor sidecar
    val cf = new java.io.File(dir, "_graft_cursor")
    assert(cf.isFile)
    assert(OrderedSink.recoverPosition(spark, dir, "tso").contains(5L))
    // recovery must come FROM the sidecar: plant a sentinel value the data
    // does not contain (keeping the recorded file count valid) — a
    // scanning implementation would return 5
    val nFiles = new java.io.File(dir).listFiles()
      .count(f => f.isFile && !f.getName.startsWith("_") &&
        !f.getName.startsWith("."))
    java.nio.file.Files.write(cf.toPath, s"777,$nFiles".getBytes)
    assert(OrderedSink.recoverPosition(spark, dir, "tso").contains(777L))
    // a DESYNCED cursor (recorded file count != directory) must NOT be
    // trusted: the crash-between-append-and-cursor-write window — fall
    // back to the scan and repair
    java.nio.file.Files.write(cf.toPath, s"777,${nFiles + 9}".getBytes)
    assert(OrderedSink.recoverPosition(spark, dir, "tso").contains(5L))
    assert(new String(java.nio.file.Files.readAllBytes(cf.toPath))
      .startsWith("5,"), "desync fallback should repair the cursor")
    // legacy single-field cursors are unverifiable: re-scan once, upgrade
    java.nio.file.Files.write(cf.toPath, "777".getBytes)
    assert(OrderedSink.recoverPosition(spark, dir, "tso").contains(5L))
    // legacy dir without a cursor: one-time scan, then self-repairs
    assert(cf.delete())
    assert(OrderedSink.recoverPosition(spark, dir, "tso").contains(5L))
    assert(cf.isFile, "fallback scan should repair the cursor sidecar")
    // the sidecar must not break plain parquet readers
    assert(spark.read.parquet(dir).count() == 2)
    // crash window end-to-end: append a batch, then roll the cursor back
    // to the pre-batch state (as if the process died after the parquet
    // commit but before the cursor write) — replaying the same batch must
    // not duplicate rows
    val preCursor = new String(java.nio.file.Files.readAllBytes(cf.toPath))
    OrderedSink.appendSince(Seq((8L, "c"), (9L, "d")).toDF("tso", "op"),
      "tso", dir, 2)
    assert(spark.read.parquet(dir).count() == 4)
    java.nio.file.Files.write(cf.toPath, preCursor.getBytes) // stale cursor
    OrderedSink.appendSince(Seq((8L, "c"), (9L, "d")).toDF("tso", "op"),
      "tso", dir, 2)
    assert(spark.read.parquet(dir).count() == 4,
      "stale-cursor replay must not duplicate the batch")
  }

  test("torn append: recovery quarantines past-cursor files, never advances") {
    val dir = java.nio.file.Files.createTempDirectory("graft-tornapp")
      .toString + "/log"
    OrderedSink.appendSince(Seq((1L, "a"), (5L, "b")).toDF("tso", "op"),
      "tso", dir, 2)
    // a torn append: SOME of a batch's files commit (tso 8) but the batch
    // dies before finishing — its sibling row (tso 9) never hit disk and
    // no cursor update happened
    Seq((8L, "c")).toDF("tso", "op").coalesce(1)
      .write.mode("append").parquet(dir)
    // recovery resumes at the TRUSTED position — advancing to max(8)
    // would lose tso 9 forever (replay filters > 8)
    assert(OrderedSink.recoverPosition(spark, dir, "tso").contains(5L))
    // and the torn file is quarantined: the log is exactly the trusted prefix
    assert(spark.read.parquet(dir).count() == 2)
    // the source replays the WHOLE batch; both rows land exactly once
    OrderedSink.appendSince(Seq((8L, "c"), (9L, "d")).toDF("tso", "op"),
      "tso", dir, 2)
    assert(spark.read.parquet(dir).select("tso").as[Long].collect().toSet ==
      Set(1L, 5L, 8L, 9L))
  }

  test("torn recovery refuses a foreign file it cannot classify") {
    // a parquet file WITHOUT tsoCol footer stats (foreign writer) cannot
    // be proven pre-existing or torn — retaining it silently would both
    // duplicate rows under replay and bake it into the cursor file count
    val dir = java.nio.file.Files.createTempDirectory("graft-tornfgn")
      .toString + "/log"
    OrderedSink.appendSince(Seq((1L, "a"), (5L, "b")).toDF("tso", "op"),
      "tso", dir, 2)
    Seq(("x", 1L)).toDF("other", "v").coalesce(1)
      .write.mode("append").parquet(dir) // foreign schema: no tso column
    val e = intercept[RuntimeException] {
      OrderedSink.recoverPosition(spark, dir, "tso")
    }
    assert(e.getMessage.contains("no 'tso' footer statistics"))
  }

  test("compaction merges small appended runs, preserving content and order") {
    val dir = java.nio.file.Files.createTempDirectory("graft-compact")
      .toString + "/log"
    // 5 micro-batch appends → many small files
    (0 until 5).foreach { b =>
      OrderedSink.appendSince(
        (b * 10 until (b + 1) * 10).map(i => (i.toLong, s"e$i"))
          .toDF("tso", "op"), "tso", dir, 2)
    }
    val beforeTsos = spark.read.parquet(dir).select("tso")
      .as[Long].collect().toSet
    val filesBefore = new java.io.File(dir).listFiles()
      .count(_.getName.endsWith(".parquet"))
    OrderedSink.compact(spark, dir, "tso", 2)
    val after = spark.read.parquet(dir)
    val filesAfter = new java.io.File(dir).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(filesAfter < filesBefore)
    assert(filesAfter == 2)
    assert(after.count() == 50)
    assert(after.select("tso").as[Long].collect().toSet == beforeTsos)
    assert(MergeSort.disorderCount(
      spark.read.parquet(dir).orderBy($"tso"), "tso") == 0)
    // appends still work after compaction (cursor preserved)
    OrderedSink.appendSince(Seq((99L, "new")).toDF("tso", "op"), "tso", dir, 2)
    assert(spark.read.parquet(dir).count() == 51)
  }

  // ---- flashback ----

  test("flashback: inverted ops, reversed order, scoped; inversion is involution") {
    val events = Seq(
      (1L, "INSERT", Map("k" -> "a"), Map("k" -> "b"), "t1"),
      (2L, "UPDATE", Map("k" -> "b"), Map("k" -> "c"), "t1"),
      (3L, "DELETE", Map("k" -> "c"), Map[String, String](), "t2"),
      (9L, "INSERT", Map("k" -> "z"), Map("k" -> "z"), "t1"))
      .toDF("tso", "op", "before", "after", "tbl")
    val fb = FlashbackJob.build(events, "tso", 1L, 3L, "op", "before",
      "after", "tbl", tables = Seq("t1"))
    val rows = fb.select($"tso", $"op").as[(Long, String)].collect().toSeq
    // newest-first, only t1 rows in [1,3]
    assert(rows == Seq((2L, "UPDATE"), (1L, "DELETE")))
    // involution: invert twice = identity
    val twice = FlashbackJob.invertTwice(events, "op", "before", "after")
    assert(twice.select($"tso", $"op", $"before", $"after").collect().toSet ==
      events.select($"tso", $"op", $"before", $"after").collect().toSet)
  }
}
