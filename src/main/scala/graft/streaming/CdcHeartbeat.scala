package graft.streaming

import org.apache.spark.sql.SparkSession

import graft.model.GtidSet
import graft.sinks.{BinlogCatalog, BinlogWire}

/** The heartbeat PRODUCER — the reference's TsoHeartbeat
  * (polardbx-cdc-common/.../heartbeat/TsoHeartbeat.java:53-67), which
  * writes a `REPLACE INTO __cdc__.__cdc_heartbeat__` transaction into
  * every DN on a schedule precisely so that IDLE sources keep the
  * merge barrier advancing: [[CdcBinlog]]'s frontier gate (like
  * LogEventMerger's HeartBeatWindow) needs every DN's frontier to
  * move, and a DN with no user traffic moves only through these
  * heartbeat transactions.
  *
  * Deployment contract (also in SCALING.md): the production query
  * must list the heartbeat table in BOTH `tableCols` (so the drain
  * can decode its rows) and `heartbeatTables` (so the rows advance
  * frontiers but are filtered from the produced log). In the
  * reference the heartbeat is written THROUGH each DN's SQL layer and
  * lands in its binlog via the normal commit pipeline — which is what
  * makes it a proof that everything committed before it has reached
  * the log. This producer is its analog for wire-served DN logs (the
  * topology this engine's dump servers expose): it appends a
  * one-transaction binlog file per beat, carrying the DN's own GTID
  * stream continuation and cumulative PREVIOUS_GTIDS, so the dump
  * protocol serves it like any user transaction.
  *
  * Scale note: a beat is pure driver-side metadata work — executed-set
  * fold over the log's (steady-state O(1)) summary suffix, 8 framed
  * events, one FS publish; a cycle over N DNs launches ZERO Spark
  * jobs. At a 1000-DN deployment the reference's shape is still
  * better — the DNs write their own heartbeats (one REPLACE each, no
  * central writer); use this producer where the CDC side owns the DN
  * wire logs (tests, relay topologies) and [[CdcBinlog]]'s
  * `advanceIdleFrontiers` where touching DN logs is impossible.
  */
object CdcHeartbeat {

  /** Default heartbeat identity — the reference's `__cdc__` system
    * schema and heartbeat table. */
  val DefaultSchema = "__cdc__"
  val DefaultTable = "__cdc_heartbeat__"

  /** A fresh TSO in the reference's layout (physical millis << 22,
    * logical zero): monotone across wall time, above every TSO issued
    * at an earlier instant. */
  def tsoNow(): Long = System.currentTimeMillis() << 22

  /** Append ONE heartbeat transaction to the DN wire log at `dnDir`:
    * a single-row INSERT into the heartbeat table at `tso`, framed as
    * the next `binlog.NNNNNN` file with PREVIOUS_GTIDS = the log's
    * executed set — byte-servable by the dump protocol, GTID
    * `sid:tso` (the fixtures' gno := tso convention). `tso` must be
    * fresh: a TSO already executed on this log is refused (re-beating
    * an old TSO could not advance any frontier and would corrupt the
    * executed-set arithmetic). */
  def beatOnce(spark: SparkSession, dnDir: String,
      sid: java.util.UUID, tso: Long,
      schema: String = DefaultSchema, table: String = DefaultTable,
      keyCol: String = "id", checksummed: Boolean = true): Unit = {
    require(tso > 0, s"heartbeat tso must be positive, got $tso")
    // everything here is DRIVER-SIDE metadata work — the executed-set
    // fold over the (steady-state O(1)) file suffix, 8 framed events,
    // one FS publish. A beat cycle over N DNs launches ZERO Spark jobs;
    // the previous shape (executed-set job + 1-row write job per DN)
    // cost 2N scheduler round-trips per period for ~200 bytes of output.
    val prior = BinlogCatalog.executedGtidSetLocal(dnDir)
    require(!prior.contains(sid, tso),
      s"heartbeat tso $tso already executed on $dnDir — beats must " +
        "carry fresh (monotone) TSOs")
    val root = new org.apache.hadoop.fs.Path(dnDir)
    val fs = graft.util.HadoopIo.fsOf(root)
    val nextIdx =
      if (!fs.exists(root)) { fs.mkdirs(root); 0L }
      else fs.listStatus(root).toSeq
        .filter(st => st.isFile && st.getPath.getName.startsWith("binlog."))
        .flatMap(st =>
          st.getPath.getName.stripPrefix("binlog.").toLongOption)
        .maxOption.map(_ + 1L).getOrElse(0L)
    // %06d overflows SILENTLY (binlog.1000000 name-sorts before
    // binlog.999999, breaking the name-order contract the catalog's
    // backward GTID walk and retention listing rely on) — refuse
    // loudly instead; DN logs stay 6-digit for fixture compatibility,
    // so widening here is not an option (mixed pads mis-sort too).
    require(nextIdx < 1000000L,
      s"heartbeat index $nextIdx would overflow the 6-digit DN pad on " +
        s"$dnDir (binlog.1000000 name-sorts before binlog.999999); " +
        "rotate/purge the DN log before continuing")
    val bytes = BinlogWire.singleTxnSegmentBytes(schema, table,
      Seq(keyCol), Map(keyCol -> tso.toString), tso, sid, prior,
      checksummed = checksummed)
    val dst = new org.apache.hadoop.fs.Path(root, f"binlog.$nextIdx%06d")
    // ATOMIC publish: write to a dot-named staging file (invisible to
    // the dump server's "binlog." prefix listing) and rename into place
    // — an interrupted beat (scheduler shutdown mid-write) must never
    // leave a TORN wire file where a dump would read it
    val staging = new org.apache.hadoop.fs.Path(root, s".${dst.getName}.tmp")
    try {
      val out = fs.create(staging, true)
      try out.write(bytes) finally out.close()
      if (!fs.rename(staging, dst))
        sys.error(s"heartbeat publish $staging -> $dst failed")
    } finally {
      if (fs.exists(staging)) fs.delete(staging, false)
      ()
    }
  }

  /** The SCHEDULED producer: beat every DN in `dns` (log dir + its
    * GTID sid) every `periodMs`, TSOs from `tso` (default: wall-clock
    * TSO layout — strictly monotone across beats because consecutive
    * calls straddle distinct milliseconds at any sane period). A
    * failed beat (transient FS error) logs and retries next period —
    * heartbeats are a liveness aid, never a correctness gate. Close
    * the handle to stop. */
  def start(spark: SparkSession, dns: Seq[(String, java.util.UUID)],
      periodMs: Long, tso: () => Long = () => tsoNow(),
      schema: String = DefaultSchema, table: String = DefaultTable,
      keyCol: String = "id", checksummed: Boolean = true)
      : AutoCloseable = {
    require(periodMs > 0, "periodMs must be positive")
    val exec = java.util.concurrent.Executors
      .newSingleThreadScheduledExecutor(r => {
        val t = new Thread(r, "graft-cdc-heartbeat")
        t.setDaemon(true)
        t
      })
    exec.scheduleAtFixedRate(() =>
      dns.foreach { case (dir, sid) =>
        try beatOnce(spark, dir, sid, tso(), schema, table, keyCol,
          checksummed)
        catch {
          case scala.util.control.NonFatal(e) =>
            System.err.println(
              s"[cdc-heartbeat] beat on $dir failed (will retry): " +
                e.getMessage)
        }
      }, periodMs, periodMs, java.util.concurrent.TimeUnit.MILLISECONDS)
    () => { exec.shutdownNow(); () }
  }
}
