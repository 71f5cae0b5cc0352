package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

/** The alarm policy layer, clock-injected — threshold accumulation,
  * re-page interval, expirable decay, fatal-if-consumer escalation,
  * silence-window channel, StallMonitor routing, disk-usage check. */
class AlarmsSpec extends AnyFunSuite {

  private def mk(policies: Seq[AlarmPolicy],
      fatalWithinMs: Long = 300000L) = {
    var t = 1000L
    val buf = new AlarmChannel.Buffer
    val mgr = new AlarmManager(policies, Seq(buf), fatalWithinMs,
      nowMs = () => t)
    (mgr, buf, (d: Long) => t += d)
  }

  test("threshold: pages only once the accumulated count reaches it") {
    val (mgr, buf, _) = mk(Seq(AlarmPolicy("k", threshold = 3)))
    mgr.trigger("k", "one")
    mgr.trigger("k", "two")
    assert(mgr.check().isEmpty && buf.events.isEmpty)
    mgr.trigger("k", "three", Some(42.0))
    val sent = mgr.check()
    assert(sent.map(e => (e.key, e.count, e.triggerValue)) ==
      Seq(("k", 3, Some(42.0))))
    assert(buf.events.map(_.message) == Seq("three"))
  }

  test("interval: the same type re-pages only after intervalSeconds") {
    val (mgr, buf, advance) = mk(
      Seq(AlarmPolicy("k", threshold = 1, intervalSeconds = 60)))
    mgr.trigger("k", "m")
    assert(mgr.check().size == 1)
    mgr.trigger("k", "m")
    assert(mgr.check().isEmpty) // inside the interval: gated
    advance(59000)
    assert(mgr.check().isEmpty)
    advance(2000)
    assert(mgr.check().size == 1) // interval passed: pages again
    assert(buf.events.size == 2)
  }

  test("expirable decay: a burst below threshold never pages later; non-expirable persists") {
    val (mgr, _, advance) = mk(Seq(
      AlarmPolicy("exp", threshold = 3, expireSeconds = 10),
      AlarmPolicy("persist", threshold = 3, expirable = false)))
    (1 to 2).foreach(_ => mgr.trigger("exp", "x"))
    (1 to 2).foreach(_ => mgr.trigger("persist", "y"))
    advance(11000)
    assert(mgr.check().isEmpty) // exp state dropped here
    // one more trigger each: exp restarts from zero, persist kept its 2
    mgr.trigger("exp", "x")
    mgr.trigger("persist", "y")
    assert(mgr.check().map(_.key) == Seq("persist"))
  }

  test("fatal escalation: only while a consumer was recently consuming") {
    val policies = Seq(AlarmPolicy("k", threshold = 1,
      intervalSeconds = 10, fatalIfActiveConsumer = true))
    // no consumption ever → no escalation
    val (m1, b1, _) = mk(policies)
    m1.trigger("k", "m")
    assert(m1.check().map(_.fatal) == Seq(false))
    assert(b1.events.size == 1)
    // recent consumption → the page escalates alongside
    val (m2, b2, advance2) = mk(policies, fatalWithinMs = 5000)
    m2.noteConsumed()
    m2.trigger("k", "m")
    val sent = m2.check()
    assert(sent.map(e => (e.key, e.fatal)).toSet ==
      Set(("k", false), (Alarms.Fatal, true)))
    assert(b2.events.count(_.fatal) == 1)
    // stale consumption → back to non-fatal
    advance2(61000)
    m2.trigger("k", "m")
    assert(m2.check().map(_.fatal) == Seq(false))
  }

  test("silence window: low-count pages are held at night, storms and FATALs break through") {
    var minute = 120 // 02:00 — inside a 00:00-06:00 window
    val buf = new AlarmChannel.Buffer
    val ch = new AlarmChannel.Silenced(buf, startMin = 0, endMin = 360,
      stormCount = 10, minuteOfDay = () => minute)
    ch.send(AlarmEvent("k", "m", None, count = 1, atMs = 0))
    assert(buf.events.isEmpty) // silenced
    ch.send(AlarmEvent("k", "m", None, count = 10, atMs = 0))
    assert(buf.events.size == 1) // storm breaks through
    ch.send(AlarmEvent("k", "m", None, count = 1, atMs = 0, fatal = true))
    assert(buf.events.size == 2) // fatal breaks through
    minute = 480 // 08:00 — outside
    ch.send(AlarmEvent("k", "m", None, count = 1, atMs = 0))
    assert(buf.events.size == 3)
  }

  test("silence window wrapping midnight (startMin > endMin) silences both halves") {
    var minute = 1380 // 23:00 — inside a 22:00-06:00 overnight window
    val buf = new AlarmChannel.Buffer
    val ch = new AlarmChannel.Silenced(buf, startMin = 1320, endMin = 360,
      stormCount = 10, minuteOfDay = () => minute)
    ch.send(AlarmEvent("k", "m", None, count = 1, atMs = 0))
    assert(buf.events.isEmpty) // silenced before midnight
    minute = 120 // 02:00 — after midnight, still inside the window
    ch.send(AlarmEvent("k", "m", None, count = 1, atMs = 0))
    assert(buf.events.isEmpty) // silenced after midnight too
    ch.send(AlarmEvent("k", "m", None, count = 1, atMs = 0, fatal = true))
    assert(buf.events.size == 1) // fatal still breaks through
    minute = 480 // 08:00 — outside
    ch.send(AlarmEvent("k", "m", None, count = 1, atMs = 0))
    assert(buf.events.size == 2)
    minute = 1310 // 21:50 — outside (just before the window opens)
    ch.send(AlarmEvent("k", "m", None, count = 1, atMs = 0))
    assert(buf.events.size == 3)
  }

  test("expiry/trigger interleaving: an occurrence raced with expiry is never lost") {
    // Deterministic re-creation of the race check() resolves with the
    // dead flag: expiry drops the state, and a trigger landing "at the
    // same time" must accumulate into a LIVE state (count 1 → pages on
    // the next check), never a detached one (count lost forever).
    val (mgr, _, advance) = mk(
      Seq(AlarmPolicy("k", threshold = 1, expireSeconds = 10,
        intervalSeconds = 0)))
    mgr.trigger("k", "early")
    assert(mgr.check().size == 1)
    advance(11000)
    assert(mgr.check().isEmpty) // expired & removed
    mgr.trigger("k", "late")
    assert(mgr.check().map(_.count) == Seq(1)) // fresh state, not lost
  }

  test("unknown keys refuse loudly") {
    val (mgr, _, _) = mk(Alarms.defaultPolicies)
    val e = intercept[IllegalArgumentException] {
      mgr.trigger("no_such_alarm", "m")
    }
    assert(e.getMessage.contains("no_such_alarm"))
  }

  test("StallMonitor routing: silence and delay land as the mapped types with lag as the value") {
    val (mgr, _, _) = mk(Alarms.defaultPolicies)
    Alarms.route(mgr, Seq(
      StallAlarm("q1", "no_data", 7L, lagSeconds = 45,
        thresholdSeconds = 30),
      StallAlarm("q1", "no_data", 8L, lagSeconds = 75,
        thresholdSeconds = 30),
      StallAlarm("q1", "merge_delay", 8L, lagSeconds = 120,
        thresholdSeconds = 60),
      StallAlarm("q1", "merge_delay", 9L, lagSeconds = 180,
        thresholdSeconds = 60)))
    val sent = mgr.check()
    // DumperNoData (threshold 2, fatal-armed but no consumer) and
    // DumperDelay (threshold 2) both page; values carry the latest lag
    assert(sent.map(e => (e.key, e.triggerValue)).toSet == Set(
      (Alarms.DumperNoData, Some(75.0)),
      (Alarms.DumperDelay, Some(180.0))))
  }

  test("disk usage: over-limit wire dirs page with the measured bytes") {
    val dir = java.nio.file.Files.createTempDirectory("graft-alarm-disk")
    java.nio.file.Files.write(dir.resolve("binlog.000000000000.000000"),
      new Array[Byte](4096))
    java.nio.file.Files.write(dir.resolve("binlog.000000000000.000001"),
      new Array[Byte](4096))
    val (mgr, buf, _) = mk(Alarms.defaultPolicies)
    assert(Alarms.checkDiskUsage(mgr, dir.toString,
      limitBytes = 1 << 20) == 8192L)
    assert(mgr.check().isEmpty) // under limit: no page
    assert(Alarms.checkDiskUsage(mgr, dir.toString,
      limitBytes = 4096L) == 8192L)
    assert(mgr.check().map(e => (e.key, e.triggerValue)) ==
      Seq((Alarms.DiskUsage, Some(8192.0))))
    assert(buf.events.size == 1)
  }

  test("straggler watchdog: a DN lagging past the threshold pages " +
      "with its name and parked rows; even lags stay quiet") {
    val root = java.nio.file.Files.createTempDirectory("graft-alarm-str")
    val work = s"$root/work"
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(s"$work/hold"))
    def sidecar(batch: Long, body: String): Unit = {
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$work/hold/$batch.metrics"),
        body.getBytes("UTF-8"))
      ()
    }
    // threshold-2 policy: two over-threshold reads page once
    val (mgr, buf, _) = mk(Alarms.defaultPolicies)
    sidecar(3L, "barrier=10;emittedTxns=5;heldTxns=40;heldRows=40;" +
      "segments=3;maxFrontier=900;lag.dn0=890;lag.dn1=2;lag.dn2=0")
    val t = Alarms.checkStraggler(mgr, work, lagThreshold = 100L)
    assert(t.exists(_.lagByDn("dn0") == 890L))
    Alarms.checkStraggler(mgr, work, lagThreshold = 100L)
    val sent = mgr.check()
    assert(sent.map(_.key) == Seq(Alarms.StragglerDn))
    assert(sent.head.message.contains("'dn0'") &&
      sent.head.message.contains("40 rows parked") &&
      sent.head.triggerValue.contains(890.0), sent.head.message)
    // lags under the threshold: no page
    sidecar(4L, "barrier=10;emittedTxns=5;heldTxns=4;heldRows=4;" +
      "segments=1;maxFrontier=900;lag.dn0=50;lag.dn1=40;lag.dn2=30")
    Alarms.checkStraggler(mgr, work, lagThreshold = 100L)
    Alarms.checkStraggler(mgr, work, lagThreshold = 100L)
    assert(mgr.check().isEmpty)
    assert(buf.events.size == 1)
  }
}
