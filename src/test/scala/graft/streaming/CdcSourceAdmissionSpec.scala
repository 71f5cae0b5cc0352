package graft.streaming

import scala.collection.immutable.SortedMap

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.connector.read.streaming.ReadLimit

import graft.SparkSpec
import graft.model.{ChangeEvent, GtidSet}
import graft.sinks.BinlogWire
import graft.sources.BinlogDumpClient

/** Admission control and stage lifecycle of the graft-cdc source,
  * driven at the MicroBatchStream level so the spec can emulate the
  * EXACT Spark 4.x call ordering (`commit(N-1)` lands AFTER
  * `latestOffset(N)` already staged batch N — verified against the
  * shipped MicroBatchExecution):
  *
  *  - commit must be scoped to the committed batch's stage (plus
  *    earlier ones), never the stage root wholesale — otherwise every
  *    steady-state reader silently falls back to a re-dump and the
  *    staged fast path is dead code;
  *  - the default read limit IS the byte cap, so a deep backlog splits
  *    across multiple bounded triggers instead of one unbounded drain;
  *  - the replay fallback re-dump terminates at range coverage and
  *    fails loudly on a range the source can no longer re-serve;
  *  - the byte-level replay filter refuses malformed frames loudly.
  */
class CdcSourceAdmissionSpec extends SparkSpec {

  private val sid = java.util.UUID.fromString(
    "0a1b2c3d-7777-4444-3333-222211110000")

  private def ev(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.map { case (tso, v) =>
      (tso, tso, "INSERT", "db", "t", Map.empty[String, String],
        Map("k" -> tso.toString, "seq" -> "1", "v" -> v), null: String,
        1700000000L)
    }.toDF("tso", "txnId", "op", "schemaName", "tableName", "before",
      "after", "ddl", "tsoTime")
  }

  private val reg = Map(("db", "t") -> Seq("k", "seq", "v"))

  /** Append one wire file serving txns `rows` on top of `prior`. */
  private def writeCall(rows: Seq[(Long, String)], prior: String,
      intoDir: String, asIndex: Int): Unit = {
    val d = java.nio.file.Files
      .createTempDirectory("graft-cdcadm-call").toString
    BinlogWire.writeChangeStreamBinlogFiles(
      ev(rows).coalesce(1).sortWithinPartitions("tso"), reg, d,
      checksummed = true, gtidSid = Some(sid),
      priorExecuted = GtidSet.parse(prior))
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(d, "binlog.000000"),
      java.nio.file.Paths.get(intoDir, f"binlog.$asIndex%06d"))
    ()
  }

  private def confFor(port: Int, extra: Map[String, String] = Map.empty) =
    CdcConf.fromOptions(Map(
      "endpoints" -> s"dn1@localhost:$port",
      "user" -> "repl", "password" -> "pw",
      "tables" -> "db.t:k,seq,v") ++ extra)

  /** Drain one planned range through the partition readers, returning
    * the decoded INSERT tsos. */
  private def readRange(stream: GraftCdcMicroBatchStream,
      s: GtidSetOffset, e: GtidSetOffset): Seq[Long] = {
    val dec = ExpressionEncoder[ChangeEvent]().resolveAndBind()
      .createDeserializer()
    val factory = stream.createReaderFactory()
    stream.planInputPartitions(s, e).toSeq.flatMap { p =>
      val r = factory.createReader(p)
      val out = Seq.newBuilder[ChangeEvent]
      while (r.next()) out += dec(r.get())
      r.close()
      out.result()
    }.filter(_.op == "INSERT").map(_.tso)
  }

  private def offsetOf(o: Any): GtidSetOffset =
    o.asInstanceOf[GtidSetOffset]

  test("commit is SCOPED: a later batch's stage survives commit of the prior batch (Spark 4.x ordering), readers never re-dial") {
    val root = java.nio.file.Files.createTempDirectory("graft-cdcadm1")
    val served = s"$root/served"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(served))
    writeCall((1L to 3L).map(t => (t, s"a$t")), "", served, 0)
    val srv = new graft.sinks.BinlogDumpServer(served, "repl", "pw")
    try {
      val stream = new GraftCdcMicroBatchStream(
        confFor(srv.port), s"$root/ckpt")
      val start = offsetOf(stream.initialOffset())

      // batch 1: drain + read off the stage — the read must not dial
      val end1 = offsetOf(
        stream.latestOffset(start, stream.getDefaultReadLimit))
      val dialsAfterDrain1 = srv.sessionsServed.get()
      assert(readRange(stream, start, end1).sorted == Seq(1L, 2L, 3L))
      assert(srv.sessionsServed.get() == dialsAfterDrain1,
        "steady-state reader must take the STAGED path, not re-dial")

      // producer rotates; Spark 4.x ordering: latestOffset(batch 2)
      // stages FIRST, commit(batch 1) lands AFTER it
      writeCall(Seq((4L, "a4"), (5L, "a5")), s"$sid:1-3", served, 1)
      val end2 = offsetOf(
        stream.latestOffset(end1, stream.getDefaultReadLimit))
      stream.commit(end1)

      // batch 2's stage must have survived the commit: the read still
      // takes the staged path (zero new sessions) and is correct
      val dialsBeforeRead2 = srv.sessionsServed.get()
      assert(readRange(stream, end1, end2).sorted == Seq(4L, 5L))
      assert(srv.sessionsServed.get() == dialsBeforeRead2,
        "commit(N-1) wiped batch N's stage — the staged path is dead " +
          "in steady state and every reader re-dials")

      // after the final commit the stage root is fully reclaimed
      stream.commit(end2)
      val stageRoot = new java.io.File(s"$root/ckpt/graft-stage")
      val leftovers = Option(stageRoot.listFiles()).toSeq.flatten
        .filterNot(_.getName == "inflight")
      assert(leftovers.isEmpty,
        s"unreclaimed stages: ${leftovers.map(_.getName).mkString(",")}")
      val inflight = new java.io.File(stageRoot, "inflight")
      assert(!inflight.exists() ||
        Option(inflight.listFiles()).toSeq.flatten.isEmpty)
    } finally srv.close()
  }

  test("post-RESTART commit (key from the previous run's queue) never deletes this run's later stages") {
    val root = java.nio.file.Files.createTempDirectory("graft-cdcadm6")
    val served = s"$root/served"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(served))
    writeCall((1L to 3L).map(t => (t, s"a$t")), "", served, 0)
    val srv = new graft.sinks.BinlogDumpServer(served, "repl", "pw")
    try {
      // run 1 drains batch 1 and dies before committing it
      val run1 = new GraftCdcMicroBatchStream(
        confFor(srv.port), s"$root/ckpt")
      val start = offsetOf(run1.initialOffset())
      val end1 = offsetOf(
        run1.latestOffset(start, run1.getDefaultReadLimit))

      // run 2 = the restart: a FRESH stream object over the same
      // checkpoint (its publish queue does not contain end1's key).
      // Spark 4.x ordering: latestOffset(batch 2) stages first, then
      // commit(batch 1) — whose key run 2 never published.
      writeCall(Seq((4L, "a4"), (5L, "a5")), s"$sid:1-3", served, 1)
      val run2 = new GraftCdcMicroBatchStream(
        confFor(srv.port), s"$root/ckpt")
      val end2 = offsetOf(
        run2.latestOffset(end1, run2.getDefaultReadLimit))
      run2.commit(end1)

      // batch 2's stage must survive: the reader takes the staged path
      // with ZERO extra dials, not the replay re-dump
      val dialsBeforeRead = srv.sessionsServed.get()
      assert(readRange(run2, end1, end2).sorted == Seq(4L, 5L))
      assert(srv.sessionsServed.get() == dialsBeforeRead,
        "commit of a previous-run key drained this run's queue and " +
          "wiped the freshly staged batch — readers re-dialed")
      run2.commit(end2)
    } finally srv.close()
  }

  test("default read limit is the byte cap; a deep backlog splits across bounded triggers that advance monotonically and conserve") {
    val root = java.nio.file.Files.createTempDirectory("graft-cdcadm2")
    val served = s"$root/served"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(served))
    // ~40 txns x ~300B values: far more than the 2000B cap
    val all = (1L to 40L).map(t => (t, "x" * 300))
    writeCall(all, "", served, 0)
    val srv = new graft.sinks.BinlogDumpServer(served, "repl", "pw")
    try {
      val cap = 2000L
      val stream = new GraftCdcMicroBatchStream(
        confFor(srv.port, Map("maxBytesPerPoll" -> cap.toString)),
        s"$root/ckpt")
      assert(stream.getDefaultReadLimit == ReadLimit.maxBytes(cap))

      var cur = offsetOf(stream.initialOffset())
      var triggers = 0
      var perTriggerGnos = List.empty[Long]
      var advanced = true
      while (advanced && triggers < 100) {
        val nxt = offsetOf(
          stream.latestOffset(cur, stream.getDefaultReadLimit))
        val before = GtidSet.parse(cur.sets.getOrElse("dn1", ""))
        val after = GtidSet.parse(nxt.sets.getOrElse("dn1", ""))
        // monotone: every trigger's end is a superset of its start
        assert(before.isSubsetOf(after))
        if (nxt == cur) advanced = false
        else {
          perTriggerGnos ::= after.gnoCount - before.gnoCount
          assert(readRange(stream, cur, nxt).nonEmpty)
          triggers += 1
        }
        cur = nxt
      }
      // the backlog SPLIT: multiple triggers, none of which drained
      // everything, and the union conserves exactly
      assert(triggers > 3, s"expected a split catch-up, got $triggers")
      assert(perTriggerGnos.forall(_ < all.size),
        "one trigger drained the whole backlog despite the cap")
      assert(GtidSet.parse(cur.sets("dn1")).gnoCount == all.size)

      // a TIGHTER limit from Spark composes (min) with the option cap
      val root2 = java.nio.file.Files.createTempDirectory("graft-cdcadm2b")
      val s2 = new GraftCdcMicroBatchStream(
        confFor(srv.port, Map("maxBytesPerPoll" -> "1000000")),
        s"$root2/ckpt")
      val firstWide = offsetOf(s2.latestOffset(
        offsetOf(s2.initialOffset()), ReadLimit.maxBytes(700L)))
      assert(GtidSet.parse(firstWide.sets("dn1")).gnoCount < all.size,
        "ReadLimit.maxBytes from Spark was ignored")
    } finally srv.close()
  }

  test("Trigger.AvailableNow drains a deep backlog across MULTIPLE capped batches, then stops (SupportsTriggerAvailableNow)") {
    val root = java.nio.file.Files.createTempDirectory("graft-cdcadm9")
    val served = s"$root/served"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(served))
    val all = (1L to 40L).map(t => (t, "x" * 300))
    writeCall(all, "", served, 0)
    val srv = new graft.sinks.BinlogDumpServer(served, "repl", "pw")
    val seen = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    try {
      // without the trait Spark falls back to ONE Trigger.Once batch —
      // a 2000-byte cap would then deliver only the first slice and
      // strand the rest of the backlog until the next manual run
      val q = spark.readStream.format("graft-cdc")
        .option("endpoints", s"dn1@localhost:${srv.port}")
        .option("user", "repl").option("password", "pw")
        .option("tables", "db.t:k,seq,v")
        .option("maxBytesPerPoll", "2000")
        .load()
        .writeStream
        .option("checkpointLocation", s"$root/ckpt")
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
          val tsos = batch.select(batch.col("tso"))
            .collect().map(_.getLong(0))
          seen.synchronized { seen ++= tsos.map(t => (id, t)) }
          ()
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      assert(q.awaitTermination(120000),
        "AvailableNow run did not terminate")
      val tsos = seen.synchronized(seen.map(_._2).sorted.toSeq)
      assert(tsos == (1L to 40L),
        s"catch-up lost or duplicated data: got ${tsos.size} rows")
      val batches = seen.synchronized(seen.map(_._1).distinct.size)
      assert(batches > 3,
        s"expected the backlog to split across many capped batches, got $batches")
    } finally srv.close()
  }

  test("covering replay drain stops at range coverage and fails loudly on an un-servable range") {
    val root = java.nio.file.Files.createTempDirectory("graft-cdcadm3")
    val served = s"$root/served"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(served))
    writeCall((1L to 10L).map(t => (t, s"a$t")), "", served, 0)
    val srv = new graft.sinks.BinlogDumpServer(served, "repl", "pw")
    try {
      // replayed range [empty, 1-3]: the drain must terminate at the
      // first transaction PAST coverage — txns 4..10 (the post-range
      // backlog) are never buffered
      val seg = BinlogDumpClient.dumpSegmentGtidCovering("localhost",
        srv.port, "repl", "pw", GtidSet.Empty,
        GtidSet.parse(s"$sid:1-3"))
      val served3 = BinlogDumpClient.advanceExecuted(seg, GtidSet.Empty)
      assert(served3.text == s"$sid:1-3",
        s"drain overshot the range: served '${served3.text}'")

      // a range the log can no longer cover must fail, not subset
      val ex = intercept[java.io.IOException] {
        BinlogDumpClient.dumpSegmentGtidCovering("localhost", srv.port,
          "repl", "pw", GtidSet.Empty, GtidSet.parse(s"$sid:1-12"))
      }
      assert(ex.getMessage.contains("re-serve"))
    } finally srv.close()
  }

  test("replay filter refuses malformed frames loudly (zero-length and truncated)") {
    val d = java.nio.file.Files
      .createTempDirectory("graft-cdcadm4").toString
    BinlogWire.writeChangeStreamBinlogFiles(
      ev((1L to 3L).map(t => (t, s"a$t"))).coalesce(1)
        .sortWithinPartitions("tso"), reg, d,
      checksummed = true, gtidSid = Some(sid))
    val bytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(d, "binlog.000000"))
    val within = GtidSet.parse(s"$sid:1-3")

    // a frame declaring length 0 would loop the filter forever
    val zeroLen = bytes.clone()
    zeroLen(4 + 9) = 0; zeroLen(4 + 10) = 0
    zeroLen(4 + 11) = 0; zeroLen(4 + 12) = 0
    val e1 = intercept[IllegalArgumentException] {
      CdcSegmentFilter.keepWithin(zeroLen, within)
    }
    assert(e1.getMessage.contains("offset 4"))

    // a truncated final frame would throw an opaque AIOOBE mid-copy
    val truncated = bytes.dropRight(5)
    val e2 = intercept[IllegalArgumentException] {
      CdcSegmentFilter.keepWithin(truncated, within)
    }
    assert(e2.getMessage.contains("malformed event frame"))
  }

  test("replay filter refuses a frame whose declared length would overflow Int arithmetic") {
    val d = java.nio.file.Files
      .createTempDirectory("graft-cdcadm7").toString
    BinlogWire.writeChangeStreamBinlogFiles(
      ev(Seq((1L, "a1"))).coalesce(1).sortWithinPartitions("tso"), reg, d,
      checksummed = true, gtidSid = Some(sid))
    val bytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(d, "binlog.000000"))
    // declared length 0x7FFFFFF0: off + len wraps negative in Int, so
    // an Int-compared guard passes and the copy AIOOBEs — the guard
    // must compare in Long and refuse by name
    val huge = bytes.clone()
    huge(4 + 9) = 0xF0.toByte; huge(4 + 10) = 0xFF.toByte
    huge(4 + 11) = 0xFF.toByte; huge(4 + 12) = 0x7F.toByte
    val e = intercept[IllegalArgumentException] {
      CdcSegmentFilter.keepWithin(huge, GtidSet.parse(s"$sid:1"))
    }
    assert(e.getMessage.contains("malformed event frame"))
  }

  test("covering replay drain fails loudly at an unparseable GTID event instead of draining to EOF") {
    import graft.sinks.BinlogWire._
    val root = java.nio.file.Files.createTempDirectory("graft-cdcadm8")
    val served = s"$root/served"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(served))
    // a log whose SECOND transaction's GTID event carries a truncated
    // body (parseGtidBody → None): coverage of :1-2 can never complete,
    // and without the loud refusal the drain would buffer to EOF and
    // misreport a purged log
    val ts = 1700000000L
    val events = Seq(
      formatDescription(ts, 1L),
      previousGtidsEvent(ts, 1L, Nil),
      gtidEvent(ts, 1L, sid, 1L),
      beginEvent(ts, 1L),
      commitEvent(ts, 1L, 1L),
      Event(ts, GtidEvent, 1L, new Array[Byte](10)),
      beginEvent(ts, 1L),
      commitEvent(ts, 1L, 2L))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(served, "binlog.000000"),
      assembleFile(events))
    val srv = new graft.sinks.BinlogDumpServer(served, "repl", "pw")
    try {
      val e = intercept[IllegalArgumentException] {
        BinlogDumpClient.dumpSegmentGtidCovering("localhost", srv.port,
          "repl", "pw", GtidSet.Empty, GtidSet.parse(s"$sid:1-2"))
      }
      assert(e.getMessage.contains("unparseable GTID event body"))
    } finally srv.close()
  }

  test("source metrics surface drained bytes and per-DN lag in StreamingQueryProgress") {
    val root = java.nio.file.Files.createTempDirectory("graft-cdcadm5")
    val served = s"$root/served"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(served))
    writeCall((1L to 5L).map(t => (t, s"a$t")), "", served, 0)
    val srv = new graft.sinks.BinlogDumpServer(served, "repl", "pw")
    try {
      val q = spark.readStream.format("graft-cdc")
        .option("endpoints", s"dn1@localhost:${srv.port}")
        .option("user", "repl").option("password", "pw")
        .option("tables", "db.t:k,seq,v")
        .load()
        .writeStream
        .option("checkpointLocation", s"$root/ckpt")
        .foreachBatch { (_: org.apache.spark.sql.DataFrame, _: Long) => () }
        .start()
      try {
        q.processAllAvailable()
        val progresses = q.recentProgress.toSeq
        val metrics = progresses.flatMap(_.sources.toSeq)
          .map(_.metrics).filter(m => m != null && !m.isEmpty)
        assert(metrics.nonEmpty, "no source metrics reported")
        assert(metrics.exists(_.get("drainedBytes").toLong > 0L),
          "drained bytes never surfaced")
        assert(metrics.forall(_.containsKey("pendingTxns.dn1")))
        // fully consumed: the latest lag reading is zero
        assert(metrics.last.get("pendingTxns.dn1") == "0")
        // merge delay: ms since the DN's newest event (fixture header
        // timestamps are 2023-11 → a large positive number)
        val delays = metrics.filter(_.containsKey("delayMs.dn1"))
        assert(delays.nonEmpty, "delayMs.dn1 never surfaced")
        assert(delays.forall(_.get("delayMs.dn1").toLong > 0L))
      } finally q.stop()
    } finally srv.close()
  }
}
