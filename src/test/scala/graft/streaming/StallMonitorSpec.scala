package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** `StallMonitor` — the no-data / merge-delay watchdog. */
class StallMonitorSpec extends SparkSpec {
  import spark.implicits._

  test("silence past the threshold raises no_data once per window") {
    var clock = 1000L * 1000 // ms
    val m = new StallMonitor(noDataThresholdSeconds = 10,
      now = () => clock)
    // data flowing: no alarm however long it runs
    assert(m.record("q", 0, 5, None).isEmpty)
    clock += 60_000
    assert(m.record("q", 1, 1, None).isEmpty)
    // silence below threshold: quiet
    clock += 9_000
    assert(m.record("q", 2, 0, None).isEmpty)
    // silence crosses the threshold: exactly one alarm, stamped with lag
    clock += 2_000
    val a = m.record("q", 3, 0, None)
    assert(a.map(x => (x.kind, x.lagSeconds)) == Seq(("no_data", 11L)))
    // re-armed: the next empty batch inside a fresh window is quiet…
    clock += 5_000
    assert(m.record("q", 4, 0, None).isEmpty)
    // …and a full further window of silence alarms again
    clock += 6_000
    assert(m.record("q", 5, 0, None).map(_.kind) == Seq("no_data"))
    assert(m.alarms.size == 2)
    // independent queries keep independent silence clocks
    assert(m.record("other", 0, 0, None).isEmpty)
  }

  test("merged event time lagging wall clock raises merge_delay") {
    var clock = 5000L * 1000
    val m = new StallMonitor(noDataThresholdSeconds = Long.MaxValue,
      mergeDelayThresholdSeconds = 60, now = () => clock)
    // newest merged event 30s old: fine
    assert(m.record("q", 0, 10, Some(clock / 1000 - 30)).isEmpty)
    // 90s old: the merger is falling behind — alarm with the actual lag
    val a = m.record("q", 1, 10, Some(clock / 1000 - 90))
    assert(a.map(x => (x.kind, x.lagSeconds)) == Seq(("merge_delay", 90L)))
    // rows flowing does not mask delay; silence does not mask progress
    clock += 1_000
    assert(m.record("q", 2, 0, Some(clock / 1000 - 120)).map(_.kind) ==
      Seq("merge_delay"))
  }

  test("a silent real stream drives the listener past the threshold") {
    val root = java.nio.file.Files.createTempDirectory("graft-stall")
    val src = s"$root/src"
    Seq((1L, 1700000000L)).toDF("id", "ts").coalesce(1)
      .write.mode("append").parquet(src)
    val m = new StallMonitor(noDataThresholdSeconds = 2,
      mergeDelayThresholdSeconds = 3600,
      delayMetric = Some(("graft_tap", "max_ts")))
    spark.streams.addListener(m)
    val q = spark.readStream
      .schema(org.apache.spark.sql.types.StructType.fromDDL(
        "id LONG, ts LONG"))
      .parquet(src)
      .observe("graft_tap", max(col("ts")).as("max_ts"))
      .writeStream
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("250 milliseconds"))
      .format("noop")
      .start()
    try {
      // first batch consumes the file; afterwards the source is silent —
      // empty triggers must cross the 2s threshold and alarm
      val deadline = System.currentTimeMillis() + 30_000
      while (m.alarms.map(_.kind).toSet.size < 2 &&
          System.currentTimeMillis() < deadline)
        Thread.sleep(200)
    } finally {
      q.stop()
      spark.streams.removeListener(m)
    }
    val kinds = m.alarms.map(_.kind).toSet
    assert(kinds.contains("no_data"), s"no alarm raised: ${m.alarms}")
    // the event-time lag of the 2023 fixture is huge — merge_delay fires
    // too once observed metrics flow through the listener
    assert(kinds.contains("merge_delay"), s"alarms: ${m.alarms}")
  }
}
