package graft.jobs

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Staged
import graft.sources.{BinlogDumpClient, ChangeEventSource}
import graft.sources.BinlogDumpClient.Endpoint

/** The LIVE replica: a standing poll loop over the COM_BINLOG_DUMP
  * dialogue — the reference's full live hop (MysqlConnection dialing
  * the DN + DirectLogFetcher draining the dump + the RPL applier,
  * canal/core/dump/MysqlConnection.java + rpl/applier/
  * TransactionApplier.java:50-87) as repeated bounded micro-batches:
  * each trigger polls every DN once from its cursor (NON_BLOCK dumps —
  * per-trigger bytes are the DN's new data, never log history), stages
  * the drained segments, replays them through the txn-preserving
  * applier, and returns the advanced cursors for the next trigger.
  *
  * Exactly-once without source replay: the dump transport cannot
  * rewind, so the guarantees sit where the file replica's do — the
  * staged segments are the durable trigger input (dial once per
  * trigger; decode and cursor reads both come off the stage), and
  * `TxnApplier`'s committed position drops anything a re-poll or
  * crash-restart re-serves at or below the target's last committed
  * TSO. A DN whose cursor names a not-yet-rotated successor file
  * (server answer 1236) simply has no new data this trigger: its
  * cursor is kept and retried — the real replica's behavior on an
  * active log.
  *
  * Scale shape: one DN = one executor task for the dial+drain; the
  * stage write, decode, and apply are the same distributed plans the
  * file replica uses. Cursors are the only driver-side state — one
  * (file, pos) pair per DN.
  */
object LiveReplicaJob {

  /** Triggers of uninterrupted 1236 answers from one DN before the
    * standing runner starts logging the condition loudly. */
  val Skip1236AlarmThreshold = 3

  /** One DN's poll outcome, reported per trigger to the `onPoll`
    * observer: `payloadBytes` > 4 (the wire magic) means the dialogue
    * carried FRAMES — data, prologue, or an idle HEARTBEAT — so the
    * runner can tell a live-but-idle source from a dead dialogue;
    * `skip1236` carries a tolerated 1236's message for the
    * consecutive-skip accounting. */
  final case class PollNote(dn: String, payloadBytes: Long,
      skip1236: Option[String])

  /** A 1236 whose message signals an UNRECOVERABLE condition, never a
    * transient rotate/promotion window: a malformed GTID set is a
    * config/encode bug, and a source that PURGED binlogs still holding
    * required GTIDs can never serve them — retrying either forever
    * reads as a silently stalled replica. MySQL's purged-gtid texts
    * ("the master has purged binary logs containing GTIDs that the
    * slave requires" / the 8.0 source/replica wording) both carry
    * "purged". */
  private[graft] def fatal1236(msg: String): Boolean = {
    val m = if (msg == null) "" else msg
    m.contains("Malformed GTID set") || m.toLowerCase.contains("purged")
  }

  /** One trigger: poll every endpoint, apply the new transactions to
    * the bucketed replica target, return the advanced endpoints.
    * `stagingDir` holds this trigger's drained segments (overwritten
    * per call — the applier's position gate makes replays idempotent).
    * `fromTso` seeds the apply gate on FIRST bootstrap, for replicas
    * started from a dump-from-TSO cursor. Single-table convenience
    * over [[pollApplyOnceRouted]]. */
  def pollApplyOnce(spark: SparkSession, endpoints: Seq[Endpoint],
      tableCols: Map[(String, String), Seq[String]],
      schemaName: String, tableName: String,
      colTypes: Seq[(String, String)], keyCols: Seq[String],
      seqCol: String, targetDir: String, stagingDir: String,
      nBuckets: Int, txnsPerCommit: Int = 8,
      fromTso: Option[Long] = None, serverId: Long = 12345L,
      soTimeoutMs: Int = 30000,
      maxBytesPerPoll: Long = Long.MaxValue): Seq[Endpoint] =
    pollApplyOnceRouted(spark, endpoints, tableCols,
      Seq(WireReplicaJob.TableTarget(schemaName, tableName, colTypes,
        keyCols, seqCol, targetDir, nBuckets)),
      stagingDir, txnsPerCommit, fromTso, serverId, soTimeoutMs,
      maxBytesPerPoll)

  /** One trigger applying the WHOLE filtered stream, routed per table —
    * the usable replica shape: every DN dials ONCE and its decoded
    * multi-table batch fans out to per-table targets
    * ([[WireReplicaJob.applyRouted]], the reference's SplitApplier
    * semantics). The per-DN cursor is the ONE shared source position:
    * it advances only after every table applied, and each table's own
    * committed-TSO gate makes the replayed prefix idempotent when a
    * crash lands between tables. With more than one target the decoded
    * rows are staged once (`stagingDir`_decoded) so routing never
    * re-runs the wire decode per table. */
  def pollApplyOnceRouted(spark: SparkSession, endpoints: Seq[Endpoint],
      tableCols: Map[(String, String), Seq[String]],
      targets: Seq[WireReplicaJob.TableTarget], stagingDir: String,
      txnsPerCommit: Int = 8,
      fromTso: Option[Long] = None, serverId: Long = 12345L,
      soTimeoutMs: Int = 30000,
      maxBytesPerPoll: Long = Long.MaxValue,
      ddlInStream: Boolean = false,
      onPoll: PollNote => Unit = _ => ()): Seq[Endpoint] = {
    import spark.implicits._
    WireReplicaJob.validateTargets(targets)
    val polled = spark.createDataset(endpoints)
      .repartition(math.max(1, endpoints.size))
      .map { e =>
        try {
          // maxBytesPerPoll bounds the bootstrap/catch-up drain (txn-
          // boundary soft cap): a capped poll's advanced cursor makes
          // the NEXT trigger continue the catch-up — the standing loop
          // needs no special case
          val (seg, nf, np) = BinlogDumpClient.dumpSegmentWithCursor(
            e.host, e.port, e.user, e.password, e.binlogFile, e.pos,
            serverId, soTimeoutMs, maxBytesPerPoll)
          (e.dn, seg, nf, np, null: String)
        } catch {
          case err: BinlogDumpClient.ServerError
              if err.code == BinlogDumpClient.ErrUnknownLog =>
            // the producer has not rotated to this cursor's file yet —
            // no new data this trigger; keep the cursor and retry. The
            // skip reason rides the staged row so the standing runner
            // can count consecutive 1236s per DN (a PERMANENT condition
            // — e.g. the file was purged — must become loud, not read
            // as a merely idle replica).
            (e.dn, Array.emptyByteArray, e.binlogFile, e.pos,
              Option(err.getMessage).getOrElse("1236"))
        }
      }.toDF("dn", "payload", "nextFile", "nextPos", "skip1236")
    // dial each DN exactly ONCE per trigger: decode and the cursor
    // collect both read the staged parquet, never a second dump
    val staged = Staged.parquetStage(polled, stagingDir)
    val changes = ChangeEventSource.fromWireSegments(
      staged.filter(length(col("payload")) > 0).select("dn", "payload"),
      "dn", "payload", tableCols)
    // one target consumes the decode once anyway; N targets (or the
    // DDL fold's extra passes) read a decoded stage so the wire decode
    // never re-runs per table
    val decoded =
      if (targets.size == 1 && !ddlInStream) changes
      else Staged.parquetStage(changes, stagingDir + "_decoded")
    if (ddlInStream)
      WireReplicaJob.applyRoutedWithDdl(decoded, targets, txnsPerCommit,
        fromTso)
    else WireReplicaJob.applyRouted(decoded, targets, txnsPerCommit,
      fromTso)
    val polledRows = staged
      .select($"dn", $"nextFile", $"nextPos", $"skip1236",
        length($"payload").cast("long"))
      .as[(String, String, Long, Option[String], Long)].collect()
    polledRows.foreach { case (dn, _, _, skip, bytes) =>
      onPoll(PollNote(dn, bytes, skip))
    }
    val cursors = polledRows
      .map { case (dn, f, p, _, _) => dn -> ((f, p)) }.toMap
    endpoints.map { e =>
      cursors.get(e.dn).map { case (f, p) =>
        e.copy(binlogFile = f, pos = p)
      }.getOrElse(e)
    }
  }

  /** A DN endpoint whose cursor is its executed GTID SET — the
    * failover-proof replica position (see
    * [[graft.sources.BinlogDumpClient.dumpSegmentGtid]]). */
  case class GtidEndpoint(dn: String, host: String, port: Int,
      user: String, password: String,
      executed: graft.model.GtidSet = graft.model.GtidSet.Empty)

  /** [[pollApplyOnceRouted]] with GTID AUTO-POSITION cursors: each DN
    * dials COM_BINLOG_DUMP_GTID with its executed set and the set
    * advances by exactly the GTIDs the poll drained. The replica then
    * survives what kills a (file, pos) loop — source failover, log
    * renumbering, a relay re-serving renamed files — because the
    * cursor names transactions, not byte addresses: repoint an
    * endpoint's host/port at the promoted source and the next trigger
    * continues from content. Cursor state per DN is O(GTID intervals),
    * carried as text in the staged trigger input (one row per DN). */
  def pollApplyOnceGtid(spark: SparkSession,
      endpoints: Seq[GtidEndpoint],
      tableCols: Map[(String, String), Seq[String]],
      targets: Seq[WireReplicaJob.TableTarget], stagingDir: String,
      txnsPerCommit: Int = 8,
      fromTso: Option[Long] = None, serverId: Long = 12345L,
      soTimeoutMs: Int = 30000,
      maxBytesPerPoll: Long = Long.MaxValue,
      ddlInStream: Boolean = false,
      onPoll: PollNote => Unit = _ => ()): Seq[GtidEndpoint] = {
    import spark.implicits._
    WireReplicaJob.validateTargets(targets)
    val eps = endpoints.map(e =>
      (e.dn, e.host, e.port, e.user, e.password, e.executed.text))
    val polled = spark.createDataset(eps)
      .repartition(math.max(1, endpoints.size))
      .map { case (dn, host, port, user, password, executedText) =>
        try {
          val (seg, advanced) = BinlogDumpClient.dumpSegmentGtidWithCursor(
            host, port, user, password,
            graft.model.GtidSet.parse(executedText), serverId,
            soTimeoutMs, maxBytesPerPoll)
          (dn, seg, advanced.text, null: String)
        } catch {
          // mirror the file/pos path's 1236 tolerance: a source amid
          // rotate/promotion has no new data THIS trigger — keep the
          // cursor, apply the other DNs' polls, retry next trigger.
          // UNRECOVERABLE 1236s stay loud (fatal1236): a malformed set
          // is a config/encode bug, and a source that PURGED binlogs
          // holding required GTIDs can never serve them — tolerated,
          // either would retry forever and read as an idle replica.
          // Tolerated skips carry their reason for the runner's
          // consecutive-1236 accounting.
          case err: BinlogDumpClient.ServerError
              if err.code == BinlogDumpClient.ErrUnknownLog &&
                !fatal1236(err.getMessage) =>
            (dn, Array.emptyByteArray, executedText,
              Option(err.getMessage).getOrElse("1236"))
        }
      }.toDF("dn", "payload", "nextExecuted", "skip1236")
    val staged = Staged.parquetStage(polled, stagingDir)
    val changes = ChangeEventSource.fromWireSegments(
      staged.filter(length(col("payload")) > 0).select("dn", "payload"),
      "dn", "payload", tableCols)
    val decoded =
      if (targets.size == 1 && !ddlInStream) changes
      else Staged.parquetStage(changes, stagingDir + "_decoded")
    if (ddlInStream)
      WireReplicaJob.applyRoutedWithDdl(decoded, targets, txnsPerCommit,
        fromTso)
    else WireReplicaJob.applyRouted(decoded, targets, txnsPerCommit,
      fromTso)
    val polledRows = staged
      .select($"dn", $"nextExecuted", $"skip1236",
        length($"payload").cast("long"))
      .as[(String, String, Option[String], Long)].collect()
    polledRows.foreach { case (dn, _, skip, bytes) =>
      onPoll(PollNote(dn, bytes, skip))
    }
    val cursors = polledRows.map { case (dn, t, _, _) => dn -> t }.toMap
    endpoints.map { e =>
      cursors.get(e.dn)
        .map(t => e.copy(executed = graft.model.GtidSet.parse(t)))
        .getOrElse(e)
    }
  }

  // ---- cursor persistence (the live loop's restart story) ----

  private def cursorFile(dir: String) =
    new org.apache.hadoop.fs.Path(dir, "_graft_cursors")

  private def writeCursorLines(dir: String, lines: Seq[String]): Unit = {
    val dst = cursorFile(dir)
    graft.util.HadoopIo.fsOf(dst).mkdirs(dst.getParent)
    graft.util.HadoopIo.writeSwap(
      new org.apache.hadoop.fs.Path(dir, "._graft_cursors.tmp"), dst,
      lines.mkString("\n"))
  }

  private def readCursorLines(dir: String): Map[String, Seq[String]] = {
    val dst = cursorFile(dir)
    if (!graft.util.HadoopIo.fsOf(dst).exists(dst)) Map.empty
    else graft.util.HadoopIo.readString(dst).split("\n").toSeq
      .filter(_.nonEmpty).map(_.split("\t", -1).toSeq)
      .map(f => f.head -> f.tail).toMap
  }

  /** Commit the fleet's (file, pos) cursors to an O(1) sidecar — the
    * `OrderedSink._graft_cursor` pattern for the LIVE loop (reference
    * analog: the RPL task's persisted position in its state machine,
    * rpl/taskmeta/FSMMetaManager.java). Call after each trigger; a
    * driver restart then [[resume]]s from the last committed trigger
    * instead of the caller's stale bootstrap value. Atomic swap: a
    * crash mid-save leaves the previous committed cursors, whose
    * replayed prefix the per-table apply gates drop. ONE runner per
    * cursorDir: concurrent loops sharing a sidecar would clobber each
    * other's commits (last write wins — correct state, wasted
    * re-polls); give each fleet its own directory. */
  def saveCursors(cursorDir: String, endpoints: Seq[Endpoint]): Unit = {
    require(endpoints.forall(e => !e.dn.exists("\t\n".contains(_))),
      "DN names must not contain tab/newline")
    writeCursorLines(cursorDir,
      endpoints.map(e => s"${e.dn}\tF\t${e.binlogFile}\t${e.pos}"))
  }

  /** [[saveCursors]] for GTID auto-position cursors (executed-set
    * text — compact: O(intervals), not O(transactions)). */
  def saveGtidCursors(cursorDir: String,
      endpoints: Seq[GtidEndpoint]): Unit = {
    require(endpoints.forall(e => !e.dn.exists("\t\n".contains(_))),
      "DN names must not contain tab/newline")
    writeCursorLines(cursorDir,
      endpoints.map(e => s"${e.dn}\tG\t${e.executed.text}"))
  }

  /** Endpoints with each DN's cursor replaced by the sidecar's last
    * committed value (connection coordinates stay the caller's — a
    * failover repoint composes with a cursor resume). A DN without a
    * saved cursor, or an absent sidecar, keeps the caller's bootstrap
    * value. */
  def resume(cursorDir: String, endpoints: Seq[Endpoint]): Seq[Endpoint] = {
    val saved = readCursorLines(cursorDir)
    endpoints.map { e =>
      saved.get(e.dn) match {
        case Some(Seq("F", file, pos)) =>
          e.copy(binlogFile = file, pos = pos.toLong)
        case _ => e
      }
    }
  }

  /** [[resume]] for GTID endpoints. */
  def resumeGtid(cursorDir: String,
      endpoints: Seq[GtidEndpoint]): Seq[GtidEndpoint] = {
    val saved = readCursorLines(cursorDir)
    endpoints.map { e =>
      saved.get(e.dn) match {
        case Some(Seq("G", text)) =>
          e.copy(executed = graft.model.GtidSet.parse(text))
        case _ => e
      }
    }
  }

  /** Persist the evolved wire NAME REGISTRY beside the cursors. The
    * decoder tracks DDL within a segment ([[graft.sinks.BinlogWire
    * .evolveRegistry]]), but ACROSS triggers and restarts the registry
    * must persist or a rename would silently misname later segments'
    * cells (a renamed column decodes under its old name, the shape
    * step reads null, data quietly lost). The runner saves it after
    * any trigger whose stream carried registry-changing DDL — BEFORE
    * the cursors, so a crash between the two replays the DDL segment
    * against the already-evolved registry (position-based decode keeps
    * the values; the gates drop the replayed rows). */
  def saveRegistry(cursorDir: String,
      reg: Map[(String, String), Seq[String]]): Unit = {
    val dst = new org.apache.hadoop.fs.Path(cursorDir, "_graft_registry")
    graft.util.HadoopIo.fsOf(dst).mkdirs(dst.getParent)
    graft.util.HadoopIo.writeSwap(
      new org.apache.hadoop.fs.Path(cursorDir, "._graft_registry.tmp"),
      dst, serializeRegistry(reg))
  }

  /** One registry's sidecar text — the [[mergeRegistry]] round-trip
    * format, shared by [[saveRegistry]] and the batch-versioned
    * snapshots ([[graft.streaming.CdcBinlog]]). The delimiter guard
    * (the saveCursors pattern) refuses at serialize time any
    * schema/table/column name carrying the sidecar's own separators —
    * those would corrupt the file, failing MatchError or silently
    * misbinding columns on resume. */
  private[graft] def serializeRegistry(
      reg: Map[(String, String), Seq[String]]): String = {
    reg.foreach { case ((s, t), cols) =>
      require(!(s + t).exists("\t\n".contains(_)),
        s"registry names must not contain tab/newline: '$s'.'$t'")
      require(cols.forall(c => !c.exists(",\t\n".contains(_))),
        s"column names must not contain comma/tab/newline: '$s'.'$t'")
    }
    reg.toSeq.sortBy(t => (t._1._1, t._1._2)).map { case ((s, t), cols) =>
      s"$s\t$t\t${cols.mkString(",")}"
    }.mkString("\n")
  }

  /** The caller's registry with any persisted evolution applied —
    * sidecar entries override matching tables, tables the sidecar
    * never saw keep the caller's value. */
  def resumeRegistry(cursorDir: String,
      initial: Map[(String, String), Seq[String]])
      : Map[(String, String), Seq[String]] = {
    val dst = new org.apache.hadoop.fs.Path(cursorDir, "_graft_registry")
    if (!graft.util.HadoopIo.fsOf(dst).exists(dst)) initial
    else mergeRegistry(graft.util.HadoopIo.readString(dst), initial)
  }

  /** The sidecar-body half of [[resumeRegistry]], for callers that
    * read the file themselves (executor-side readers carrying an
    * explicit Hadoop conf — the driver's session conf is not active
    * there). */
  private[graft] def mergeRegistry(sidecarText: String,
      initial: Map[(String, String), Seq[String]])
      : Map[(String, String), Seq[String]] = {
    val saved = sidecarText.split("\n").toSeq
      .filter(_.nonEmpty).map { line =>
        val Array(s, t, cols) = line.split("\t", 3)
        (s, t) -> cols.split(",").toSeq.filter(_.nonEmpty)
      }.toMap
    initial.map { case (k, v) => k -> saved.getOrElse(k, v) } ++
      (saved -- initial.keySet)
  }

  /** One batch's registry evolution: fold the decoded batch's DDL
    * statements into `reg` — the cross-trigger half of the decoder's
    * in-segment schema tracking, shared by the standing runner and
    * streaming (graft-cdc foreachBatch) consumers. Ordered by
    * (tso, ddl) — the SAME tie-break as applyRoutedWithDdl's
    * target-side fold, so equal-tso statements cannot fold differently
    * into registry vs target schema across a restart. */
  def evolveRegistryFromBatch(decoded: org.apache.spark.sql.DataFrame,
      reg: Map[(String, String), Seq[String]])
      : Map[(String, String), Seq[String]] = {
    val spark = decoded.sparkSession
    import spark.implicits._
    val ddls = decoded
      .filter(col("op") === "DDL" && col("ddl").isNotNull)
      .select(col("tso").cast("long"), col("schemaName"), col("ddl"))
      .orderBy(col("tso"), col("ddl"))
      .as[(Long, String, String)].collect()
    ddls.foldLeft(reg) { case (r, (_, sch, stmt)) =>
      graft.sinks.BinlogWire.evolveRegistry(r, sch, stmt)
    }
  }

  /** [[evolveRegistryFromBatch]] over a staged decoded trigger. */
  private def evolveFromStage(spark: SparkSession, decodedStage: String,
      reg: Map[(String, String), Seq[String]])
      : Map[(String, String), Seq[String]] = {
    val root = new org.apache.hadoop.fs.Path(decodedStage)
    if (!graft.util.HadoopIo.fsOf(root).exists(root)) reg
    else evolveRegistryFromBatch(spark.read.parquet(decodedStage), reg)
  }

  // ---- the standing-loop runner ----

  /** Per-DN consecutive-1236 accounting for the standing loops: a DN
    * answering 1236 for [[Skip1236AlarmThreshold]] straight triggers
    * is logged loudly every trigger thereafter — the StallMonitor's
    * silence clock only says "no data"; this names WHY (a persistent
    * 1236 usually means required binlogs were purged, which no amount
    * of retrying recovers). */
  private def note1236(counts: scala.collection.mutable.Map[String, Int],
      skipped: scala.collection.Map[String, String],
      dns: Seq[String], loopId: String): Unit =
    dns.foreach { dn =>
      skipped.get(dn) match {
        case Some(msg) =>
          val c = counts.getOrElse(dn, 0) + 1
          counts(dn) = c
          if (c >= Skip1236AlarmThreshold)
            System.err.println(s"[$loopId] DN $dn: $c consecutive 1236 " +
              s"answers from the source ('$msg') — a persistent 1236 " +
              "suggests required binlogs were purged or the cursor is " +
              "permanently unservable; intervene at the source")
        case None =>
          counts.remove(dn)
          ()
      }
    }

  /** THE deployment call: poll → route-apply → commit cursors, every
    * `intervalMs`, until `shouldStop` (or `maxTriggers`). Composes
    * [[pollApplyOnceRouted]] + the cursor sidecar + an optional
    * [[graft.streaming.StallMonitor]] no-data alarm — the loop every
    * caller otherwise hand-writes. Resumes from `cursorDir` first, so
    * kill-and-restart continues at the last committed trigger without
    * re-draining history; returns the final endpoints.
    *
    * The monitor sees 1 input row for an advancing trigger and 0 for
    * an idle one — enough for its silence clock; alarms surface via
    * `monitor.alarms` exactly as in the streaming pipelines. */
  def run(spark: SparkSession, endpoints: Seq[Endpoint],
      tableCols: Map[(String, String), Seq[String]],
      targets: Seq[WireReplicaJob.TableTarget], stagingDir: String,
      cursorDir: String, intervalMs: Long,
      shouldStop: () => Boolean = () => false,
      maxTriggers: Long = Long.MaxValue,
      monitor: Option[graft.streaming.StallMonitor] = None,
      alarms: Option[graft.streaming.AlarmManager] = None,
      loopId: String = "live-replica",
      txnsPerCommit: Int = 8, fromTso: Option[Long] = None,
      serverId: Long = 12345L, soTimeoutMs: Int = 30000,
      maxBytesPerPoll: Long = Long.MaxValue,
      ddlInStream: Boolean = false,
      vacuumEvery: Long = 0L): Seq[Endpoint] = {
    var eps = resume(cursorDir, endpoints)
    var reg = resumeRegistry(cursorDir, tableCols)
    var n = 0L
    val c1236 = scala.collection.mutable.Map.empty[String, Int]
    while (!shouldStop() && n < maxTriggers) {
      val notes = scala.collection.mutable.ArrayBuffer.empty[PollNote]
      val next = pollApplyOnceRouted(spark, eps, reg, targets,
        stagingDir, txnsPerCommit, fromTso, serverId, soTimeoutMs,
        maxBytesPerPoll, ddlInStream, notes += _)
      note1236(c1236,
        notes.flatMap(x => x.skip1236.map(x.dn -> _)).toMap,
        eps.map(_.dn), loopId)
      if (ddlInStream) {
        val evolved = evolveFromStage(spark, stagingDir + "_decoded", reg)
        if (evolved != reg) { reg = evolved; saveRegistry(cursorDir, reg) }
      }
      saveCursors(cursorDir, next)
      // reclaim superseded target versions on a schedule: a rebuild-
      // triggering DDL (MODIFY/CHANGE/RENAME) doubles a target on disk
      // until vacuum runs, and a long-lived replica seeing periodic
      // re-type DDL would otherwise accumulate versions forever.
      // vacuumEvery=1 reclaims at the SAME trigger a rebuild lands in.
      if (vacuumEvery > 0 && (n + 1) % vacuumEvery == 0)
        targets.foreach(t => graft.operators.TxnApplier.vacuum(t.targetDir))
      // liveness for the silence clock: an advancing cursor OR any
      // served frames (a caught-up idle poll against a heartbeating
      // server carries a HEARTBEAT frame — the dialogue is alive, the
      // source is idle; reference TsoHeartbeat.java:53-67, progress
      // guaranteed even when idle). A dead dialogue serves nothing
      // and the no-data alarm still fires.
      val advanced = next != eps || notes.exists(_.payloadBytes > 4)
      val raised = monitor.map(_.noteBatch(loopId, n,
        if (advanced) 1L else 0L)).getOrElse(Seq.empty)
      // alarm policy layer: route watchdog alarms into their typed
      // policies, arm the fatal escalation with this loop's own
      // consumption (this replica IS the downstream consumer), and
      // evaluate — one check per trigger, pure driver metadata
      alarms.foreach { a =>
        if (advanced) a.noteConsumed()
        graft.streaming.Alarms.route(a, raised)
        a.check()
      }
      eps = next
      n += 1
      if (!shouldStop() && n < maxTriggers && intervalMs > 0)
        Thread.sleep(intervalMs)
    }
    eps
  }

  /** [[run]] with GTID auto-position cursors — the failover-proof
    * standing loop (repoint an endpoint's host/port mid-run via a
    * fresh `endpoints` list on restart; the sidecar's executed set
    * carries over untouched). */
  def runGtid(spark: SparkSession, endpoints: Seq[GtidEndpoint],
      tableCols: Map[(String, String), Seq[String]],
      targets: Seq[WireReplicaJob.TableTarget], stagingDir: String,
      cursorDir: String, intervalMs: Long,
      shouldStop: () => Boolean = () => false,
      maxTriggers: Long = Long.MaxValue,
      monitor: Option[graft.streaming.StallMonitor] = None,
      alarms: Option[graft.streaming.AlarmManager] = None,
      loopId: String = "live-replica-gtid",
      txnsPerCommit: Int = 8, fromTso: Option[Long] = None,
      serverId: Long = 12345L, soTimeoutMs: Int = 30000,
      maxBytesPerPoll: Long = Long.MaxValue,
      ddlInStream: Boolean = false,
      vacuumEvery: Long = 0L): Seq[GtidEndpoint] = {
    var eps = resumeGtid(cursorDir, endpoints)
    var reg = resumeRegistry(cursorDir, tableCols)
    var n = 0L
    val c1236 = scala.collection.mutable.Map.empty[String, Int]
    while (!shouldStop() && n < maxTriggers) {
      val notes = scala.collection.mutable.ArrayBuffer.empty[PollNote]
      val next = pollApplyOnceGtid(spark, eps, reg, targets,
        stagingDir, txnsPerCommit, fromTso, serverId, soTimeoutMs,
        maxBytesPerPoll, ddlInStream, notes += _)
      note1236(c1236,
        notes.flatMap(x => x.skip1236.map(x.dn -> _)).toMap,
        eps.map(_.dn), loopId)
      if (ddlInStream) {
        val evolved = evolveFromStage(spark, stagingDir + "_decoded", reg)
        if (evolved != reg) { reg = evolved; saveRegistry(cursorDir, reg) }
      }
      saveGtidCursors(cursorDir, next)
      // see run(): scheduled reclaim of rebuild-superseded versions
      if (vacuumEvery > 0 && (n + 1) % vacuumEvery == 0)
        targets.foreach(t => graft.operators.TxnApplier.vacuum(t.targetDir))
      // liveness for the silence clock: an advancing cursor OR any
      // served frames (a caught-up idle poll against a heartbeating
      // server carries a HEARTBEAT frame — the dialogue is alive, the
      // source is idle; reference TsoHeartbeat.java:53-67, progress
      // guaranteed even when idle). A dead dialogue serves nothing
      // and the no-data alarm still fires.
      val advanced = next != eps || notes.exists(_.payloadBytes > 4)
      val raised = monitor.map(_.noteBatch(loopId, n,
        if (advanced) 1L else 0L)).getOrElse(Seq.empty)
      // see run(): typed alarm policies over the watchdog's signals
      alarms.foreach { a =>
        if (advanced) a.noteConsumed()
        graft.streaming.Alarms.route(a, raised)
        a.check()
      }
      eps = next
      n += 1
      if (!shouldStop() && n < maxTriggers && intervalMs > 0)
        Thread.sleep(intervalMs)
    }
    eps
  }
}
