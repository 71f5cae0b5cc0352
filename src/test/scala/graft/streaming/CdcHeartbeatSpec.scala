package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.model.GtidSet
import graft.sinks.BinlogWire

/** The heartbeat PRODUCER (TsoHeartbeat analog): an idle-but-alive DN
  * must not stall live Global-Binlog production — the producer's
  * periodic heartbeat transactions keep its frontier advancing, so
  * the other DNs' transactions emit WITHOUT force-complete (and
  * without ever risking a wrongful seal-out of a merely idle DN). */
class CdcHeartbeatSpec extends SparkSpec {
  import spark.implicits._

  private val sid1 = java.util.UUID.fromString(
    "0a1b2c3d-7777-4444-3333-000000000001")
  private val sid2 = java.util.UUID.fromString(
    "0a1b2c3d-7777-4444-3333-000000000002")

  // production registry: the user table, plus the heartbeat table in
  // BOTH tableCols and heartbeatTables — the deployment contract
  private val hbKey = (CdcHeartbeat.DefaultSchema,
    CdcHeartbeat.DefaultTable)
  private val reg = Map(
    ("db", "t") -> Seq("k", "seq", "v"),
    hbKey -> Seq("id"))

  private def ev(rows: Seq[Long]) =
    rows.map { tso =>
      (tso, tso, "INSERT", "db", "t", Map.empty[String, String],
        Map("k" -> tso.toString, "seq" -> "1", "v" -> s"a$tso"),
        null: String, 1700000000L)
    }.toDF("tso", "txnId", "op", "schemaName", "tableName", "before",
      "after", "ddl", "tsoTime")

  private def writeTxns(rows: Seq[Long], sid: java.util.UUID,
      prior: GtidSet, intoDir: String, asIndex: Int): Unit = {
    val d = java.nio.file.Files
      .createTempDirectory("graft-hb-call").toString
    BinlogWire.writeChangeStreamBinlogFiles(
      ev(rows).coalesce(1).sortWithinPartitions("tso"), reg, d,
      checksummed = true, gtidSid = Some(sid), priorExecuted = prior)
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(d, "binlog.000000"),
      java.nio.file.Paths.get(intoDir, f"binlog.$asIndex%06d"))
    ()
  }

  test("driver-side beat framing is byte-identical to the Spark wire writer; a 16-DN beat cycle launches ZERO Spark jobs") {
    // byte identity: the fast path must produce EXACTLY what
    // writeChangeStreamBinlogFiles produces for the same one-row txn —
    // dump servers, decoders and the executed-set fold see no
    // difference between a beat and any other segment
    val prior = GtidSet.Empty.add(sid1, 7L).add(sid2, 3L)
    val d = java.nio.file.Files
      .createTempDirectory("graft-hb-bytes").toString
    val row = Seq((42L, 42L, "INSERT", "db", "hb",
      Map.empty[String, String], Map("k" -> "42"), null: String,
      1700000000L))
      .toDF("tso", "txnId", "op", "schemaName", "tableName", "before",
        "after", "ddl", "tsoTime")
    BinlogWire.writeChangeStreamBinlogFiles(
      row.coalesce(1), Map(("db", "hb") -> Seq("k")), d,
      checksummed = true, gtidSid = Some(sid1), priorExecuted = prior)
    val viaSpark = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(d, "binlog.000000"))
    val direct = BinlogWire.singleTxnSegmentBytes("db", "hb", Seq("k"),
      Map("k" -> "42"), 42L, sid1, prior, checksummed = true)
    assert(direct.toSeq == viaSpark.toSeq,
      "driver-side framing diverged from the Spark wire writer")

    // O(1) (here: zero) Spark jobs for a whole 16-DN beat cycle — the
    // producer must not cost 2N scheduler round-trips per period
    val root = java.nio.file.Files.createTempDirectory("graft-hb16")
    val dns = (0 until 16).map { i =>
      val dir = s"$root/dn$i"
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
      (dir, java.util.UUID.fromString(
        f"0a1b2c3d-7777-4444-3333-$i%012d"))
    }
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          s: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      // two full cycles: the second exercises the non-empty-dir path
      // (executed-set fold over the previous beat)
      dns.foreach { case (dir, sid) =>
        CdcHeartbeat.beatOnce(spark, dir, sid, 100L,
          schema = "db", table = "hb", keyCol = "k")
      }
      dns.foreach { case (dir, sid) =>
        CdcHeartbeat.beatOnce(spark, dir, sid, 200L,
          schema = "db", table = "hb", keyCol = "k")
      }
      Thread.sleep(1500) // listener bus is async — let events drain
      assert(jobs.get() == 0,
        s"a beat cycle must be driver-side metadata work, saw " +
          s"${jobs.get()} Spark jobs for 32 beats")
    } finally spark.sparkContext.removeSparkListener(listener)
    // the beats are REAL segments: each DN's executed set advanced
    dns.take(2).foreach { case (dir, sid) =>
      assert(graft.sinks.BinlogCatalog.executedGtidSetLocal(dir) ==
        GtidSet.Empty.add(sid, 100L).add(sid, 200L))
    }
  }

  test("an idle DN kept alive by the heartbeat producer never stalls production — no force-complete involved") {
    val root = java.nio.file.Files.createTempDirectory("graft-hb1")
    val (d1, d2) = (s"$root/dn1", s"$root/dn2")
    Seq(d1, d2).foreach(d => java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(d)))
    val out = s"$root/out"
    def run(p1: Int, p2: Int): Unit = {
      val q = CdcBinlog.start(spark,
        Seq(("dn1", "localhost", p1), ("dn2", "localhost", p2)),
        "repl", "pw", reg, out, s"$root/ckpt", s"$root/work",
        numPartitions = 2, heartbeatTables = Set(hbKey),
        trigger = Trigger.AvailableNow())
      q.awaitTermination()
    }
    def served(body: Seq[Int] => Unit): Unit = {
      val srvs = Seq(d1, d2).map(d =>
        new graft.sinks.BinlogDumpServer(d, "repl", "pw"))
      try body(srvs.map(_.port)) finally srvs.foreach(_.close())
    }

    // dn2 NEVER carries user transactions — only the producer's
    // beats. Three phases; each phase dn1 appends one txn and the
    // producer beats dn2 past it.
    var prior1 = GtidSet.Empty
    (1 to 3).foreach { p =>
      writeTxns(Seq(p.toLong), sid1, prior1, d1, p - 1)
      prior1 = prior1.add(sid1, p.toLong)
      CdcHeartbeat.beatOnce(spark, d2, sid2, 100L * p)
      served { case Seq(p1, p2) => run(p1, p2) }
      val got = BinlogWire.readBinlogFiles(spark, out, reg)
        .filter(col("op") === "INSERT")
        .select(col("log_file"), col("tso")).collect().toSeq
        .map(r => (r.getString(0), r.getLong(1)))
        .sortBy(_._1).map(_._2)
      assert(got == (1L to p.toLong),
        s"phase $p: the live DN's txns must emit while dn2 is idle " +
          s"but heartbeat-kept-alive (got $got)")
    }
    // the heartbeat rows advanced frontiers but never reached the log
    val tables = BinlogWire.readBinlogFiles(spark, out, reg)
      .select(col("tableName")).distinct()
      .collect().map(_.getString(0)).toSet
    assert(!tables.contains(CdcHeartbeat.DefaultTable),
      "heartbeat transactions must be consumed at the merge, not " +
        "emitted into the produced log")
  }

  test("beatOnce appends a dump-servable GTID continuation; stale TSOs are refused") {
    val root = java.nio.file.Files.createTempDirectory("graft-hb2")
    val d1 = s"$root/dn1"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(d1))
    CdcHeartbeat.beatOnce(spark, d1, sid1, 10L)
    CdcHeartbeat.beatOnce(spark, d1, sid1, 20L)
    assert(graft.sinks.BinlogCatalog.executedGtidSet(spark, d1).text ==
      s"$sid1:10:20")
    // a re-beat of an executed TSO is refused loudly
    val ex = intercept[IllegalArgumentException] {
      CdcHeartbeat.beatOnce(spark, d1, sid1, 10L)
    }
    assert(ex.getMessage.contains("fresh"))
    // the appended files decode as heartbeat-table INSERTs in order
    val rows = BinlogWire.readBinlogFiles(spark, d1,
        Map(hbKey -> Seq("id")))
      .filter(col("op") === "INSERT")
      .select(col("tableName"), col("tso"),
        element_at(col("after"), "id"))
      .collect().toSeq.sortBy(_.getLong(1))
    assert(rows.map(_.getLong(1)) == Seq(10L, 20L))
    assert(rows.forall(_.getString(0) == CdcHeartbeat.DefaultTable))
    assert(rows.map(_.getString(2)) == Seq("10", "20"))
  }

  test("LIVE integration: a ProcessingTime production query flows continuously while the scheduled producer keeps an idle DN's frontier moving") {
    val root = java.nio.file.Files.createTempDirectory("graft-hb4")
    val (d1, d2) = (s"$root/dn1", s"$root/dn2")
    Seq(d1, d2).foreach(d => java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(d)))
    val out = s"$root/out"
    // dn1 carries txns 1-3, dn2 only txn 4 — then BOTH go quiet; only
    // the producer's wall-clock beats (tsos ~2^43, far above any txn)
    // advance the frontiers, so emission of every txn is exactly the
    // liveness the producer exists to provide
    writeTxns(Seq(1L, 2L, 3L), sid1, GtidSet.Empty, d1, 0)
    writeTxns(Seq(4L), sid2, GtidSet.Empty, d2, 0)
    def decoded(): Seq[Long] =
      BinlogWire.readBinlogFiles(spark, out, reg)
        .filter(col("op") === "INSERT")
        .select(col("log_file"), col("tso")).collect().toSeq
        .map(r => (r.getString(0), r.getLong(1)))
        .sortBy(_._1).map(_._2)

    val srvs = Seq(d1, d2).map(d =>
      new graft.sinks.BinlogDumpServer(d, "repl", "pw"))
    val hb = CdcHeartbeat.start(spark,
      Seq((d1, sid1), (d2, sid2)), periodMs = 150L)
    val q = CdcBinlog.start(spark,
      Seq(("dn1", "localhost", srvs(0).port),
        ("dn2", "localhost", srvs(1).port)),
      "repl", "pw", reg, out, s"$root/ckpt", s"$root/work",
      numPartitions = 2, heartbeatTables = Set(hbKey),
      trigger = org.apache.spark.sql.streaming.Trigger
        .ProcessingTime(100L))
    try {
      val deadline = System.nanoTime() + 120_000_000_000L
      var got = Seq.empty[Long]
      while (got != Seq(1L, 2L, 3L, 4L) &&
          System.nanoTime() < deadline) {
        Thread.sleep(500)
        // the out log is being written concurrently — a mid-write read
        // may see a truncated tail; poll, don't assert, until stop
        got = try decoded() catch { case scala.util.control.NonFatal(_) =>
          Seq.empty }
      }
    } finally {
      q.stop()
      hb.close()
      srvs.foreach(_.close())
    }
    assert(decoded() == Seq(1L, 2L, 3L, 4L),
      "a standing ProcessingTime production must emit every txn in " +
        "total order with frontiers advanced ONLY by the scheduled " +
        "heartbeat producer")
    val tables = BinlogWire.readBinlogFiles(spark, out, reg)
      .select(col("tableName")).distinct()
      .collect().map(_.getString(0)).toSet
    assert(!tables.contains(CdcHeartbeat.DefaultTable))
  }

  test("the scheduled producer beats on a timer with monotone wall-clock TSOs") {
    val root = java.nio.file.Files.createTempDirectory("graft-hb3")
    val d1 = s"$root/dn1"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(d1))
    val handle = CdcHeartbeat.start(spark, Seq((d1, sid1)),
      periodMs = 50L)
    try {
      val deadline = System.nanoTime() + 30_000_000_000L
      var n = 0L
      while (n < 2 && System.nanoTime() < deadline) {
        Thread.sleep(100)
        n = graft.sinks.BinlogCatalog.executedGtidSet(spark, d1).gnoCount
      }
      assert(n >= 2, s"expected at least 2 scheduled beats, saw $n")
    } finally handle.close()
    // FILE order (= beat order) must carry strictly increasing TSOs
    val tsos = BinlogWire.readBinlogFiles(spark, d1,
        Map(hbKey -> Seq("id")))
      .filter(col("op") === "INSERT")
      .select(col("log_file"), col("tso")).collect().toSeq
      .sortBy(_.getString(0)).map(_.getLong(1))
    assert(tsos.size >= 2 &&
      tsos.zip(tsos.tail).forall { case (a, b) => a < b },
      s"scheduled beats must carry strictly increasing TSOs: $tsos")
  }
}
