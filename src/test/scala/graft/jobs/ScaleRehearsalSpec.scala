package graft.jobs

import graft.SparkSpec

/** The composed live chain (§3.1 + §3.2 + retention + consumers) as
  * ONE run — the small-shape gate for `ScaleRehearsalJob`, whose
  * `main` produces the SCALING.md measurements at 600k/2.4M-row
  * scale. Asserts the invariants the measurement runs rely on:
  * conservation through the fan-out, hot-table pinning, consumer
  * convergence, and an archive-coupled purge that leaves the full
  * history servable. */
class ScaleRehearsalSpec extends SparkSpec {
  import spark.implicits._

  test("composed chain: fixture → heartbeat → produce(M=4, pinned hot) → consume → retention, invariants hold") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-rehearsal-spec").toString
    val dns = 4
    val rowsPerDn = 2000L
    val r = ScaleRehearsalJob.run(spark, root, dns, rowsPerDn,
      streams = 4, waves = 2, consumers = 2, numPartitions = 4,
      txnsPerCommit = 1000)

    // conservation: every fixture row reaches exactly one stream
    assert(r.producedRows == dns * rowsPerDn,
      s"produced ${r.producedRows} of ${dns * rowsPerDn}")
    // the hot table (40% of rows) is PINNED to stream 0 in full
    assert(r.hotStreamRows == dns * rowsPerDn * 2 / 5,
      s"hot rows on stream 0: ${r.hotStreamRows}")
    // the retention pass ran AFTER consumption, so post-run
    // expectations read the STITCHED archive+live history
    val reg = ScaleRehearsalJob.registry
    def stitched(i: Int): Long =
      graft.sinks.BinlogRetention.readStitched(spark,
          s"$root/out/stream-$i", s"$root/archive", reg)
        .filter($"op" === "INSERT").count()
    // consumers: distinct keys applied on the sampled streams equal
    // the INSERTed keys those streams carried (each key inserted once)
    val expected = (0 until 2).map(stitched).sum
    assert(r.consumedRows == expected,
      s"consumed ${r.consumedRows}, streams carried $expected")
    // retention purged something, and the stitched history is whole:
    // conservation still holds over archive+live across all streams
    val purged = r.stages.find(_.name == "retention").get.files
    assert(purged > 0, "the purge boundary must remove finished files")
    val liveOnly = graft.sinks.BinlogWire.readBinlogFiles(spark,
        s"$root/out/stream-0", reg)
      .filter($"op" === "INSERT").count()
    assert(liveOnly < stitched(0),
      "purge must have removed local prefix files from stream 0")
    assert((0 until 4).map(stitched).sum == r.producedRows,
      "archive+live must conserve every produced transaction")
  }

  test("standing shape (run D): concurrent ProcessingTime consumers on ALL streams converge, delta chains fold inside triggers, telemetry lands") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-rehearsal-standing").toString
    val dns = 4
    val rowsPerDn = 2000L
    // delta + a tiny compactAfter: folds must FIRE inside the standing
    // triggers at this scale; bounded fold (2 of 8 buckets per visit)
    // exercises the incremental path
    val r = ScaleRehearsalJob.run(spark, root, dns, rowsPerDn,
      streams = 4, waves = 2, consumers = 4, numPartitions = 4,
      txnsPerCommit = 250,
      maxBytesPerPoll = 256L * 1024, // several triggers per stream
      standingTriggerMs = Some(100L),
      applyMode = graft.operators.TxnApplier.ApplyMode.Delta,
      compactAfter = 2, compactMaxBuckets = 2,
      standingDeadlineMs = 10L * 60 * 1000)

    // every stream consumed to convergence, concurrently
    assert(r.consumed == 4)
    assert(r.producedRows == dns * rowsPerDn)
    val reg = ScaleRehearsalJob.registry
    def stitched(i: Int): Long =
      graft.sinks.BinlogRetention.readStitched(spark,
          s"$root/out/stream-$i", s"$root/archive", reg)
        .filter($"op" === "INSERT").count()
    assert(r.consumedRows == (0 until 4).map(stitched).sum,
      s"standing consumers must drain every stream: got " +
        s"${r.consumedRows} of ${(0 until 4).map(stitched).sum}")

    // telemetry: every consumer reports triggers (standing = several
    // per stream at this poll cap) and its rows in
    assert(r.consumerStats.size == 4)
    assert(r.consumerStats.forall(_.triggers >= 1))
    assert(r.consumerStats.map(_.rowsIn).sum >= r.producedRows,
      "per-trigger rows must cover the produced data")
    assert(r.consumerStats.forall(_.targetBytes > 0L))
    // compaction fired INSIDE the standing triggers and was bounded
    assert(r.compaction.nonEmpty,
      "delta chains at compactAfter=2 must have folded during the run")
    assert(r.compaction.forall(_.buckets <= 2),
      s"folds must honor compactMaxBuckets=2: ${r.compaction}")
    // and the chains are bounded at run end (folds kept up)
    reg.keys.filter(_._1 == "db").foreach { case (_, t) =>
      (0 until 4).foreach { i =>
        val dir = s"$root/target-$i/$t"
        if (graft.operators.TxnApplier.currentCommit(dir).isDefined)
          assert(graft.operators.TxnApplier.maxChainLength(dir) <= 16,
            s"unbounded chain at $dir")
      }
    }
  }

  test("Auto crossover anchor: a target CROSSES the crossover mid-run " +
      "under standing triggers — exactly one COW->delta flip, sticky, " +
      "state correct") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-rehearsal-auto").toString
    // a crossover small enough that the busiest targets outgrow it
    // mid-run (bootstrap starts near-empty => first triggers are COW),
    // probed on every commit so the flip lands at the knee
    val r = ScaleRehearsalJob.run(spark, root, dns = 2,
      rowsPerDn = 2000L, streams = 2, waves = 2, consumers = 2,
      numPartitions = 4, txnsPerCommit = 250,
      maxBytesPerPoll = 256L * 1024,
      standingTriggerMs = Some(100L),
      applyMode = graft.operators.TxnApplier.ApplyMode.Auto(
        crossoverBytes = 16L * 1024, remeasureCommits = 1L),
      standingDeadlineMs = 10L * 60 * 1000)
    assert(r.producedRows == 2 * 2000L && r.consumedRows > 0)
    // at least one target crossed: its flip history reads COW (the
    // initial decision records as a flip from nothing) then delta
    val byDir = r.modeFlips.groupBy(_.dir)
    val crossed = byDir.filter { case (_, fs) =>
      fs.map(_.delta) == Seq(false, true)
    }
    assert(crossed.nonEmpty,
      s"no target crossed 16KB mid-run: ${r.modeFlips}")
    // sticky: no target ever flipped delta->COW (a mid-chain COW apply
    // would fold the whole target first — the move Auto exists to avoid)
    byDir.foreach { case (d, fs) =>
      val deltas = fs.map(_.delta)
      assert(!deltas.zip(deltas.drop(1)).contains((true, false)),
        s"$d flipped delta->COW mid-run: $fs")
    }
  }

  test("run F composition: straggler -> force-complete -> sealed-gap " +
      "skip -> gap repair -> reshard 2->3 -> GTID resume, per-table " +
      "conservation against the DN logs") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-rehearsal-runf").toString
    val json = ScaleRehearsalJob.runF(spark, root, dns = 3,
      rowsPerDn = 8000L, streams = 2, streamsAfter = 3,
      triggerMs = 200L, numPartitions = 4, txnsPerCommit = 1000)
    def long(k: String): Long =
      s""""$k":(-?\\d+)""".r.findFirstMatchIn(json).get.group(1).toLong
    // dn0's two sealed-out waves were recorded and healed
    assert(long("sealedOutTxns") == 2L * 2000L, json)
    assert(long("repaired") > 0L && long("repairedTables") >= 1L, json)
    // conservation asserted inside runF (throws on violation); the
    // report confirms every routed table was checked
    assert(long("tablesChecked") >= 1L, json)
  }

  test("deliberate straggler: backlog parks append-only (segments " +
      "bounded), telemetry names dn0, catch-up releases with exact " +
      "conservation") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-rehearsal-straggler").toString
    val json = ScaleRehearsalJob.runStraggler(spark, root,
      dns = 3, rowsPerDn = 30000L, steps = 3, triggerMs = 200L,
      numPartitions = 4, holdMaxSegments = 3)
    def long(k: String): Long =
      s""""$k":(-?\\d+)""".r.findFirstMatchIn(json).get.group(1).toLong
    assert(long("emittedRows") == long("producedRows"),
      s"conservation: $json")
    assert(long("maxHeldRows") >= 2L * 10000L * 2,
      s"the backlog must actually have parked: $json")
    assert(long("maxSegments") <= 3, s"segment bound violated: $json")
    // the parked-regime triggers name dn0 as the laggard (positive
    // frontier lag) while OTHER DNs' txns park
    val parked = """\{"batch":[^}]*"heldRows":([1-9]\d*)[^}]*\}""".r
      .findAllMatchIn(json).map(_.matched).toSeq
    assert(parked.nonEmpty, s"no parked triggers in $json")
    assert(parked.exists(t =>
      """"lagStraggler":([1-9]\d*)""".r.findFirstIn(t).isDefined &&
        """"parkedOther":([1-9]\d*)""".r.findFirstIn(t).isDefined),
      s"straggler telemetry must name dn0's lag and others' parked " +
        s"txns: $parked")
  }
}
