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
      ddlInStream: Boolean = false): Seq[Endpoint] = {
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
          (e.dn, seg, nf, np)
        } catch {
          case err: BinlogDumpClient.ServerError
              if err.code == BinlogDumpClient.ErrUnknownLog =>
            // the producer has not rotated to this cursor's file yet —
            // no new data this trigger; keep the cursor and retry
            (e.dn, Array.emptyByteArray, e.binlogFile, e.pos)
        }
      }.toDF("dn", "payload", "nextFile", "nextPos")
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
    val cursors = staged.select($"dn", $"nextFile", $"nextPos")
      .as[(String, String, Long)].collect()
      .map { case (dn, f, p) => dn -> ((f, p)) }.toMap
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
      ddlInStream: Boolean = false): Seq[GtidEndpoint] = {
    import spark.implicits._
    WireReplicaJob.validateTargets(targets)
    val eps = endpoints.map(e =>
      (e.dn, e.host, e.port, e.user, e.password, e.executed.text))
    val polled = spark.createDataset(eps)
      .repartition(math.max(1, endpoints.size))
      .map { case (dn, host, port, user, password, executedText) =>
        val (seg, advanced) = BinlogDumpClient.dumpSegmentGtidWithCursor(
          host, port, user, password,
          graft.model.GtidSet.parse(executedText), serverId,
          soTimeoutMs, maxBytesPerPoll)
        (dn, seg, advanced.text)
      }.toDF("dn", "payload", "nextExecuted")
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
    val cursors = staged.select($"dn", $"nextExecuted")
      .as[(String, String)].collect().toMap
    endpoints.map { e =>
      cursors.get(e.dn)
        .map(t => e.copy(executed = graft.model.GtidSet.parse(t)))
        .getOrElse(e)
    }
  }
}
