package graft.streaming

import scala.collection.concurrent.TrieMap
import scala.jdk.CollectionConverters._

/** One alarm TYPE's paging policy — the reference's MonitorType tuple
  * (monitor/MonitorType.java:20-47) restated: `threshold` raw triggers
  * accumulate into one page, `intervalSeconds` gates how soon the same
  * type may page again, `expireSeconds` decays an `expirable` type's
  * accumulation once triggers stop (the expirable cache,
  * monitor/MonitorManager.java:63-70 — a transient burst that never
  * reaches threshold must not page an hour later), and
  * `fatalIfActiveConsumer` escalates to a FATAL page when a downstream
  * consumer was recently consuming (MonitorManager.sendAlarm's
  * ALARM_LATEST_CONSUME_TIME check: a broken producer with a live
  * consumer is data loss in flight, not just lag). */
final case class AlarmPolicy(key: String, threshold: Int = 1,
    intervalSeconds: Long = 300, expireSeconds: Long = 600,
    expirable: Boolean = true, fatalIfActiveConsumer: Boolean = false)

/** One page sent to a channel. `triggerValue` is the measured quantity
  * behind the page (lag seconds, disk bytes) — the reference's
  * MonitorValue. */
final case class AlarmEvent(key: String, message: String,
    triggerValue: Option[Double], count: Int, atMs: Long,
    fatal: Boolean = false)

/** Where pages go. The engine is a library: a deployment plugs its
  * pager/webhook here; specs and dashboards use [[AlarmChannel.Buffer]]. */
trait AlarmChannel { def send(e: AlarmEvent): Unit }

object AlarmChannel {

  /** Collecting channel — the dashboard/spec sink. */
  final class Buffer extends AlarmChannel {
    private val buf =
      new java.util.concurrent.ConcurrentLinkedQueue[AlarmEvent]()
    def send(e: AlarmEvent): Unit = { buf.add(e); () }
    def events: Seq[AlarmEvent] = buf.iterator().asScala.toSeq
  }

  /** A high-urgency (phone-style) channel with a nightly silence
    * window: inside [startMin, endMin) minutes-of-day, only a STORM
    * (count ≥ stormCount) pages; outside, everything the manager sends
    * pages. MonitorManager.isAlarmPhone / PHONE_SILENCE_TIME — do not
    * wake an operator at 3am for a page that self-expires, but a
    * sustained storm overrides the window. `minuteOfDay` is injectable
    * so the window is testable without wall-clock. FATAL pages always
    * pass — escalation exists precisely to beat the silence window. */
  final class Silenced(inner: AlarmChannel, startMin: Int, endMin: Int,
      stormCount: Int,
      minuteOfDay: () => Int = () =>
        java.time.LocalTime.now().toSecondOfDay / 60)
    extends AlarmChannel {
    def send(e: AlarmEvent): Unit = {
      val m = minuteOfDay()
      // An overnight window (e.g. 22:00-06:00) has startMin > endMin:
      // the silence wraps midnight, so membership is the OR of the two
      // half-ranges — the reference's PHONE_SILENCE_TIME is exactly
      // this overnight shape.
      val silenced =
        if (startMin <= endMin) m >= startMin && m < endMin
        else m >= startMin || m < endMin
      if (!silenced || e.fatal || e.count >= stormCount) inner.send(e)
    }
  }
}

/** Driver-side alarm accumulator + threshold/interval/expiry/escalation
  * evaluator — the reference's MonitorManager
  * (monitor/MonitorManager.java:47-262) without the singleton, the
  * scheduler thread, and the wall-clock: producers call
  * [[AlarmManager.trigger]] from wherever a signal appears (StallMonitor
  * routing, retention disk checks, job catch blocks), something periodic
  * calls [[AlarmManager.check]] (a ProcessingTime trigger's foreachBatch,
  * a poll loop, or a test), and pages go to the channels. All state is
  * O(alarm types) driver metadata; nothing here touches data or Spark.
  *
  * Deterministic by construction: the clock is injected, so the
  * interval/expiry/escalation behaviors are spec-pinned instead of
  * sleep-tested. */
final class AlarmManager(policies: Seq[AlarmPolicy],
    channels: Seq[AlarmChannel],
    fatalWithinMs: Long = 300000L,
    nowMs: () => Long = () => System.currentTimeMillis()) {
  require(policies.map(_.key).distinct.size == policies.size,
    "duplicate alarm policy keys")

  private val byKey = policies.map(p => p.key -> p).toMap

  private final class State {
    var count = 0
    var lastTriggerMs = 0L
    var lastSentMs = Long.MinValue
    var message = ""
    var value: Option[Double] = None
    // set under this.synchronized by check() just before the map slot is
    // removed — a trigger() holding a stale handle sees it and retries
    // instead of incrementing a detached instance (lost occurrence).
    var dead = false
  }
  private val states = TrieMap.empty[String, State]
  @volatile private var lastConsumedMs = Long.MinValue

  /** Record one raw occurrence of `key`. Unknown keys are a bug in the
    * caller — loud, not dropped. */
  def trigger(key: String, message: String,
      value: Option[Double] = None): Unit = {
    require(byKey.contains(key), s"unknown alarm key '$key' " +
      s"(known: ${byKey.keys.toSeq.sorted.mkString(", ")})")
    var done = false
    while (!done) {
      val st = states.getOrElseUpdate(key, new State)
      st.synchronized {
        if (!st.dead) {
          st.count += 1
          st.lastTriggerMs = nowMs()
          st.message = message
          st.value = value
          done = true
        }
        // dead: check() expired this instance concurrently — loop and
        // re-resolve a live State so the occurrence is never lost.
      }
    }
  }

  /** A downstream consumer made progress — the replica's commit gate or
    * the dump server's serve loop calls this; recent consumption arms
    * the FATAL escalation (ALARM_LATEST_CONSUME_TIME semantics). */
  def noteConsumed(): Unit = lastConsumedMs = nowMs()

  /** Evaluate every accumulated type: expire the decayed, page the
    * over-threshold (interval-gated), escalate where armed. Returns the
    * pages sent this call (already delivered to the channels). */
  def check(): Seq[AlarmEvent] = {
    val t = nowMs()
    val out = Seq.newBuilder[AlarmEvent]
    states.foreach { case (key, st) =>
      val p = byKey(key)
      st.synchronized {
        // sentinel checks precede subtraction: t - Long.MinValue wraps
        val intervalOk = st.lastSentMs == Long.MinValue ||
          t - st.lastSentMs >= p.intervalSeconds * 1000L
        if (p.expirable && t - st.lastTriggerMs > p.expireSeconds * 1000L) {
          st.dead = true // under st.synchronized — racing triggers retry
          states.remove(key)
        }
        else if (st.count >= p.threshold && intervalOk) {
          st.lastSentMs = t
          val ev = AlarmEvent(key, st.message, st.value, st.count, t)
          out += ev
          if (p.fatalIfActiveConsumer && lastConsumedMs != Long.MinValue &&
              t - lastConsumedMs <= fatalWithinMs)
            out += AlarmEvent(Alarms.Fatal,
              s"fatal: '$key' while a consumer is actively consuming — " +
                st.message, st.value, st.count, t, fatal = true)
        }
      }
    }
    val events = out.result()
    events.foreach(e => channels.foreach(_.send(e)))
    events
  }
}

/** The alarm types this engine actually emits, with the reference's
  * policy shape, plus the routing glue from the engine's existing
  * signals (StallMonitor, retention, heartbeat lag) into the manager. */
object Alarms {
  /** Merger silence — MERGER_STAGE_EMPTY_LOOP_EXCEED_THRESHOLD. */
  val MergerNoData = "cdc_merger_empty_loop_exceed_threshold"
  /** Producer merge delay — DUMPER_STAGE_LEADER_DELAY. */
  val DumperDelay = "cdc_dumper_leader_delayed"
  /** Producer silence — DUMPER_STAGE_LEADER_NODATA_ERROR (the one the
    * reference marks fatal-if-consumer). */
  val DumperNoData = "cdc_dumper_leader_nodata_error"
  /** Local wire-log disk usage over limit — BINLOG_NUM_LARGE_THEN_WARRNING. */
  val DiskUsage = "cdc_disk_usage_warning"
  /** A job/loop died with an exception — the *_ERROR family collapsed:
    * one type, the message carries which loop. */
  val TaskError = "cdc_task_error"
  /** The escalation type — BINLOG_FATAL_ERROR. */
  val Fatal = "cdc_binlog_fatal_error"

  /** One DN's merge frontier lagging the pack — the per-storage delay
    * the reference daemon watches (MonitorType delay thresholds); the
    * early signal BEFORE force-complete has to seal the DN out. */
  val StragglerDn = "cdc_storage_frontier_delayed"

  /** The reference's thresholds/intervals for the mapped rows
    * (MonitorType.java: threshold 1-2, interval 5-10 min). */
  def defaultPolicies: Seq[AlarmPolicy] = Seq(
    AlarmPolicy(MergerNoData, threshold = 1, intervalSeconds = 300),
    AlarmPolicy(DumperDelay, threshold = 2, intervalSeconds = 600),
    AlarmPolicy(DumperNoData, threshold = 2, intervalSeconds = 300,
      fatalIfActiveConsumer = true),
    AlarmPolicy(DiskUsage, threshold = 1, intervalSeconds = 600),
    AlarmPolicy(StragglerDn, threshold = 2, intervalSeconds = 300),
    AlarmPolicy(TaskError, threshold = 1, intervalSeconds = 300,
      expirable = false))

  /** Route watchdog alarms into the manager: "no_data" →
    * producer-silence, "merge_delay" → delay, lag as the trigger
    * value. Call with `StallMonitor.alarms` deltas or a `noteBatch`
    * return. */
  def route(mgr: AlarmManager, alarms: Seq[StallAlarm]): Unit =
    alarms.foreach { a =>
      val key = a.kind match {
        case "no_data" => DumperNoData
        case "merge_delay" => DumperDelay
        case other => sys.error(s"unknown stall alarm kind '$other'")
      }
      mgr.trigger(key,
        s"query ${a.queryId} ${a.kind} ${a.lagSeconds}s " +
          s"(threshold ${a.thresholdSeconds}s) at batch ${a.batchId}",
        Some(a.lagSeconds.toDouble))
    }

  /** Disk-usage watchdog over a wire-log dir: triggers [[DiskUsage]]
    * when the directory's total bytes exceed `limitBytes`, and returns
    * the measured total. Driver-side listing, O(files) — the same cost
    * class as the retention pass that runs next to it; an archived-FS
    * scheme works unchanged. */
  def checkDiskUsage(mgr: AlarmManager, dir: String,
      limitBytes: Long): Long = {
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = graft.util.HadoopIo.fsOf(root)
    val total =
      if (!fs.exists(root)) 0L
      else fs.listStatus(root).iterator
        .filter(_.isFile).map(_.getLen).sum
    if (total > limitBytes)
      mgr.trigger(DiskUsage,
        s"wire dir $dir holds $total bytes (limit $limitBytes)",
        Some(total.toDouble))
    total
  }

  /** Straggler watchdog over a production's holdback telemetry:
    * triggers [[StragglerDn]] when any DN's frontier lags the fastest
    * by more than `lagThreshold` TSO units, naming the WORST laggard
    * and the rows its stall is parking. Reads one sidecar (O(1)
    * driver-side) — call it per trigger or from the ops poll loop
    * beside [[checkDiskUsage]]. Returns the telemetry it read. */
  def checkStraggler(mgr: AlarmManager, workDir: String,
      lagThreshold: Long): Option[CdcBinlog.HoldTelemetry] = {
    val hold = new org.apache.hadoop.fs.Path(s"$workDir/hold")
    val fs = graft.util.HadoopIo.fsOf(hold)
    if (!fs.exists(hold)) return None
    val t = fs.listStatus(hold).iterator.map(_.getPath.getName)
      .filter(_.endsWith(".metrics"))
      .flatMap(n => n.stripSuffix(".metrics").toLongOption)
      .maxOption
      .flatMap(b => CdcBinlog.readHoldTelemetry(workDir, b))
    for {
      tel <- t
      (dn, lag) <- tel.lagByDn.maxByOption(_._2)
      if lag > lagThreshold
    } mgr.trigger(StragglerDn,
      s"DN '$dn' frontier lags the fastest by $lag TSO units " +
        s"(threshold $lagThreshold); ${tel.heldRows} rows parked " +
        s"across ${tel.segments} holdback segments — repair or " +
        "force-complete the DN before the backlog grows",
      Some(lag.toDouble))
    t
  }
}
