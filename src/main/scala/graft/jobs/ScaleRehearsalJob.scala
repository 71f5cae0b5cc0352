package graft.jobs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.model.GtidSet
import graft.operators.TxnApplier
import graft.sinks.{BinlogRetention, BinlogWire}
import graft.streaming.{CdcBinlogX, CdcHeartbeat, CdcReplica}

/** SCALE REHEARSAL of the live chain — the composed production the
  * reference runs as its whole deployment (§3.1 + §3.2 + retention +
  * consumers), exercised as ONE measured run so super-linear stages
  * show up as numbers instead of beliefs:
  *
  *   N DN wire logs (multi-wave backlog, per-DN GTID streams)
  *     → CdcHeartbeat.beatOnce per DN (idle-frontier advancement)
  *     → CdcBinlogX AvailableNow drain (M streams, ONE PINNED HOT
  *       TABLE via overrides — the skew story, admission-controlled
  *       deep-backlog split)
  *     → BinlogRetention.pass per stream (archive-coupled purge)
  *     → CdcReplica consumers on sampled streams (dump-served, GTID
  *       auto-position, txn-applied)
  *
  * Each stage reports wall-clock, and the sink stages report
  * bytes/files/rows. `main` prints one JSON line per run so numbers
  * land in SCALING.md; `ScaleRehearsalSpec` runs a small shape and
  * asserts the invariants (conservation, hot-table pinning, purge +
  * stitched history).
  */
object ScaleRehearsalJob {

  final case class Stage(name: String, wallMs: Long, rows: Long = -1L,
      bytes: Long = -1L, files: Long = -1L)

  /** One STANDING consumer's per-trigger telemetry (run-D mode): how
    * many triggers it took to drain its stream, the worst and median
    * trigger wall, the rows it pulled, and its targets' final measured
    * bytes — the flat-per-trigger claim is checked against these, not
    * against a stage total. */
  final case class ConsumerStat(stream: Int, triggers: Int,
      rowsIn: Long, maxTriggerMs: Long, medianTriggerMs: Long,
      targetBytes: Long)

  final case class Report(dns: Int, rowsPerDn: Long, streams: Int,
      consumed: Int, stages: Seq[Stage], producedRows: Long,
      consumedRows: Long, hotStreamRows: Long,
      consumerStats: Seq[ConsumerStat] = Seq.empty,
      compaction: Seq[TxnApplier.CompactionEvent] = Seq.empty) {
    def json: String = {
      val st = stages.map(s => s""""${s.name}":{"wallMs":${s.wallMs},""" +
        s""""rows":${s.rows},"bytes":${s.bytes},"files":${s.files}}""")
        .mkString(",")
      val cs = consumerStats.map(c =>
        s"""{"stream":${c.stream},"triggers":${c.triggers},""" +
        s""""rowsIn":${c.rowsIn},"maxTriggerMs":${c.maxTriggerMs},""" +
        s""""medianTriggerMs":${c.medianTriggerMs},""" +
        s""""targetBytes":${c.targetBytes}}""").mkString(",")
      val cp = compaction.map(e =>
        s"""{"buckets":${e.buckets},"wallMs":${e.wallMs}}""")
        .mkString(",")
      s"""{"metric":"scale_rehearsal","dns":$dns,""" +
        s""""rowsPerDn":$rowsPerDn,"streams":$streams,""" +
        s""""consumed":$consumed,"producedRows":$producedRows,""" +
        s""""consumedRows":$consumedRows,""" +
        s""""hotStreamRows":$hotStreamRows,""" +
        s""""consumers":[$cs],"compaction":[$cp],"stages":{$st}}"""
    }
  }

  private def timed[A](body: => A): (A, Long) = {
    val t0 = System.nanoTime()
    val a = body
    (a, (System.nanoTime() - t0) / 1000000L)
  }

  private def dirStats(dir: String): (Long, Long) = {
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = graft.util.HadoopIo.fsOf(root)
    if (!fs.exists(root)) (0L, 0L)
    else {
      val files = fs.listStatus(root).filter(st => st.isFile &&
        st.getPath.getName.startsWith("binlog."))
      (files.map(_.getLen).sum, files.length.toLong)
    }
  }

  val HotTable = "hot"
  private val ColdTables = 6

  /** Registry: the hot table, `ColdTables` cold ones, the heartbeat
    * table. All string-image 3-col rows. */
  def registry: Map[(String, String), Seq[String]] =
    (Seq(("db", HotTable)) ++ (0 until ColdTables).map(i => ("db", s"t$i")))
      .map(_ -> Seq("k", "seq", "v")).toMap +
      ((CdcHeartbeat.DefaultSchema, CdcHeartbeat.DefaultTable) ->
        Seq("id"))

  /** TSO layout: CHUNK-INTERLEAVED across DNs — within a wave, DN `d`
    * owns every `dns`-th chunk of `TsoChunk` consecutive tsos. A real
    * deployment's DNs commit against ONE global TSO clock, so their
    * tso ranges interleave finely; the original per-DN sequential
    * blocks made the merge barrier track the lowest-range DN and
    * parked nearly the whole backlog in holdback until a wave
    * boundary — run E (24 M rows, 6 produce triggers) measured the
    * per-batch holdback rewrite going super-linear from exactly that
    * (produce 658 s vs run D's 120 s at 2×). Chunks (not per-row
    * stride) keep the gno := tso executed sets compact: one interval
    * per chunk, rowsPerWave/TsoChunk intervals per DN per wave. */
  val TsoChunk = 5000L

  /** One DN's wave of change rows (chunk-interleaved tsos; ~40% of
    * rows on the hot table, the rest spread over the cold tables). */
  private def waveDf(spark: SparkSession, waveBase: Long, d: Int,
      dns: Int, rows: Long): DataFrame = {
    val tso = lit(waveBase) +
      ((col("id") / TsoChunk).cast("long") * dns + d) * TsoChunk +
      col("id") % TsoChunk
    spark.range(rows).select(
      tso.as("tso"),
      tso.as("txnId"),
      lit("INSERT").as("op"),
      lit("db").as("schemaName"),
      when(col("id") % 5 < 2, lit(HotTable))
        .otherwise(concat(lit("t"), col("id") % ColdTables))
        .as("tableName"),
      map().cast("map<string,string>").as("before"),
      map(lit("k"), tso.cast("string"),
        lit("seq"), lit("1"),
        lit("v"), concat(lit("v"), col("id") % 97)).as("after"),
      lit(null).cast("string").as("ddl"),
      lit(1700000000L).as("tsoTime"))
  }

  private def chunksPerWave(rowsPerWave: Long): Long =
    (rowsPerWave + TsoChunk - 1) / TsoChunk

  // each wave reserves dns × chunksPerWave whole chunk SLOTS (a short
  // final chunk leaves a tso gap — tsos need not be dense); inside a
  // wave, chunk c of dn d starts at waveBase + (c*dns + d)*TsoChunk
  private def waveBase(w: Int, dns: Int, rowsPerWave: Long): Long =
    1L + w.toLong * dns * chunksPerWave(rowsPerWave) * TsoChunk

  /** DN `d`'s executed tso set for wave `w` — one interval per chunk. */
  private def waveIntervals(w: Int, d: Int, dns: Int,
      rowsPerWave: Long): Vector[(Long, Long)] = {
    val base = waveBase(w, dns, rowsPerWave)
    (0L until rowsPerWave by TsoChunk).map { c0 =>
      val lo = base + (c0 / TsoChunk * dns + d) * TsoChunk
      (lo, lo + math.min(TsoChunk, rowsPerWave - c0))
    }.toVector
  }

  def run(spark: SparkSession, root: String, dns: Int, rowsPerDn: Long,
      streams: Int, waves: Int = 2, consumers: Int = 2,
      numPartitions: Int = 8, txnsPerCommit: Int = 10000,
      maxBytesPerPoll: Long = 64L * 1024 * 1024,
      standingTriggerMs: Option[Long] = None,
      applyMode: TxnApplier.ApplyMode = TxnApplier.ApplyMode.Auto(),
      compactAfter: Int = 32,
      compactMaxBuckets: Int = Int.MaxValue,
      standingDeadlineMs: Long = 2L * 3600 * 1000): Report = {
    import spark.implicits._
    require(rowsPerDn % waves == 0, "rowsPerDn must split into waves")

    val reg = registry
    val rowsPerWave = rowsPerDn / waves
    val sids = (0 until dns).map(d => java.util.UUID.fromString(
      f"0a1b2c3d-5ca1-4444-3333-${d}%012d"))
    val dnDirs = (0 until dns).map(d => s"$root/dn$d")
    dnDirs.foreach(d => java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(d)))

    // ---- stage: fixture (not production cost — the DNs' own logs) ----
    val (_, fixtureMs) = timed {
      (0 until waves).foreach { w =>
        (0 until dns).foreach { d =>
          val prior = if (w == 0) GtidSet.Empty
            else GtidSet(Map(sids(d) -> (0 until w)
              .flatMap(pw => waveIntervals(pw, d, dns, rowsPerWave))
              .toVector))
          val scratch = java.nio.file.Files
            .createTempDirectory("graft-rehearsal-w").toString
          BinlogWire.writeChangeStreamBinlogFiles(
            waveDf(spark, waveBase(w, dns, rowsPerWave), d, dns,
              rowsPerWave)
              .coalesce(1).sortWithinPartitions("tso"),
            reg, scratch, checksummed = true, gtidSid = Some(sids(d)),
            priorExecuted = prior)
          java.nio.file.Files.move(
            java.nio.file.Paths.get(scratch, "binlog.000000"),
            java.nio.file.Paths.get(dnDirs(d), f"binlog.$w%06d"))
          ()
        }
      }
    }
    val fixtureStats = dnDirs.map(dirStats)
    // one past the last reserved chunk slot (the tso SPACE, ≥ row count
    // when the final chunks are partial)
    val totalTso =
      1L + waves.toLong * dns * chunksPerWave(rowsPerWave) * TsoChunk

    // ---- stage: heartbeat (driver-side beats advance every frontier
    //      past the whole backlog — the idle-DN liveness path) ----
    val (_, hbMs) = timed {
      (0 until dns).foreach { d =>
        CdcHeartbeat.beatOnce(spark, dnDirs(d), sids(d),
          tso = totalTso + d)
      }
    }

    // ---- stage: produce (the live chain: dump-dial → merge →
    //      barrier → M pinned streams, AvailableNow backlog drain) ----
    val out = s"$root/out"
    val gsid = java.util.UUID.fromString(
      "0a1b2c3d-5ca1-4444-3333-0000000f0f0f")
    val fan = CdcBinlogX.FanOut(streams,
      graft.operators.StreamHash.ByTable,
      overrides = Map(s"db.$HotTable" -> 0))
    val srvs = dnDirs.map(d =>
      new graft.sinks.BinlogDumpServer(d, "repl", "pw"))
    val (_, produceMs) = timed {
      try {
        val q = CdcBinlogX.start(spark,
          (0 until dns).map(d => (s"dn$d", "localhost", srvs(d).port)),
          "repl", "pw", reg, out, s"$root/ckpt", s"$root/work", fan,
          numPartitions = numPartitions,
          heartbeatTables = Set((CdcHeartbeat.DefaultSchema,
            CdcHeartbeat.DefaultTable)),
          trigger = Trigger.AvailableNow(),
          maxBytesPerPoll = maxBytesPerPoll,
          gtidSid = Some(gsid))
        q.awaitTermination()
      } finally srvs.foreach(_.close())
    }
    val streamDirs = (0 until streams).map(i => s"$out/stream-$i")
    val produceStats = streamDirs.map(dirStats)
    // one decode pass per stream: row count, max data tso (the standing
    // consumers' convergence frontier), hot-table rows
    val perStream: Seq[(Long, Long, Long)] = streamDirs.map { d =>
      if (!new java.io.File(d).isDirectory) (0L, 0L, 0L)
      else {
        val r = BinlogWire.readBinlogFiles(spark, d, reg)
          .filter($"op" === "INSERT")
          .agg(count(lit(1)), coalesce(max($"tso"), lit(0L)),
            sum(when($"tableName" === HotTable, 1L).otherwise(0L)))
          .as[(Long, Long, Long)].collect().head
        r
      }
    }
    val producedRows = perStream.map(_._1).sum
    val hotStreamRows = perStream.headOption.map(_._3).getOrElse(0L)

    // ---- stage: consume (CdcReplica per sampled stream: dump-served,
    //      GTID auto-position, transactional apply; runs BEFORE the
    //      retention purge — bootstrap-through-the-purge-boundary is
    //      q115/BinlogRetentionSpec's covered path).
    //      Two shapes: AvailableNow drains streams sequentially (runs
    //      A–C); standingTriggerMs runs ALL sampled consumers as
    //      CONCURRENT ProcessingTime queries — the deployment's real
    //      standing-trigger shape (run D) — stopping each once its
    //      targets' committed frontier reaches the stream's max data
    //      tso (driver metadata polls, no data jobs). ----
    val sampled = (0 until math.min(consumers, streams)).filter(i =>
      new java.io.File(streamDirs(i)).isDirectory)
    def targetsOf(i: Int): Seq[WireReplicaJob.TableTarget] =
      reg.keys.filter(_._1 == "db").toSeq.map { case (sch, t) =>
        WireReplicaJob.TableTarget(sch, t,
          Seq("k" -> "bigint", "seq" -> "bigint", "v" -> "string"),
          Seq("k"), "seq", s"$root/target-$i/$t", 8)
      }
    def startConsumer(i: Int, trigger: Trigger,
        g: graft.sinks.BinlogDumpServer) =
      CdcReplica.start(spark,
        Seq((s"s$i", "localhost", g.port)), "repl", "pw",
        reg.filter(_._1._1 == "db"), targetsOf(i),
        s"$root/consumer-ckpt-$i", s"$root/consumer-stage-$i",
        s"$root/consumer-registry-$i", txnsPerCommit = txnsPerCommit,
        trigger = trigger,
        maxBytesPerPoll = maxBytesPerPoll,
        applyMode = applyMode, compactAfter = compactAfter,
        compactMaxBuckets = compactMaxBuckets)
    def countTargets(i: Int): Long = targetsOf(i).map { t =>
      if (TxnApplier.currentCommit(t.targetDir).isEmpty) 0L
      else TxnApplier.readCurrent(spark, t.targetDir).count()
    }.sum
    TxnApplier.drainCompactionLog() // clear pre-consume noise
    var consumerStats = Seq.empty[ConsumerStat]
    val (consumedRows, consumeMs) = timed {
      standingTriggerMs match {
        case None =>
          sampled.map { i =>
            val g = new graft.sinks.BinlogDumpServer(streamDirs(i),
              "repl", "pw")
            try {
              val q = startConsumer(i, Trigger.AvailableNow(), g)
              q.awaitTermination()
            } finally g.close()
            countTargets(i)
          }.sum
        case Some(ms) =>
          val servers = sampled.map(i =>
            i -> new graft.sinks.BinlogDumpServer(streamDirs(i),
              "repl", "pw")).toMap
          try {
            val queries = sampled.map(i =>
              i -> startConsumer(i, Trigger.ProcessingTime(ms),
                servers(i))).toMap
            // convergence: a consumer is drained once the max committed
            // lastTso across its targets reaches the stream's max data
            // tso, observed STABLE twice (the max-tso table can commit
            // while a sibling's apply is still in the same trigger) —
            // O(tables) pointer reads per poll, no Spark jobs
            val frontier = sampled.map(i => i -> perStream(i)._2).toMap
            def committedMax(i: Int): Long = targetsOf(i)
              .flatMap(t => TxnApplier.currentCommit(t.targetDir))
              .map(_.lastTso).maxOption.getOrElse(0L)
            val deadline = System.nanoTime() + standingDeadlineMs * 1000000L
            val confirms = scala.collection.mutable.Map(
              sampled.map(_ -> 0): _*)
            // progress harvesting rides the poll loop: recentProgress
            // is a BOUNDED ring (last ~100 entries), and an early-
            // finishing consumer idling at a fast ProcessingTime
            // cadence wraps its own data batches out of it long before
            // the slowest stream drains (run E measured a drained
            // stream reporting 0 triggers from exactly this)
            val harvested = scala.collection.mutable.Map(sampled.map(_ ->
              scala.collection.mutable.Map.empty[Long, (Long, Long)]): _*)
            def harvest(i: Int): Unit =
              queries(i).recentProgress.foreach { pr =>
                if (pr.numInputRows > 0)
                  harvested(i)(pr.batchId) = (pr.numInputRows,
                    pr.durationMs.getOrDefault("triggerExecution", 0L)
                      .longValue())
              }
            var live = sampled.toSet
            while (live.nonEmpty && System.nanoTime() < deadline) {
              Thread.sleep(1000L)
              live.toSeq.foreach(harvest)
              live.toSeq.foreach { i =>
                // the frontier commits MID-batch (the apply's pointer
                // lands inside foreachBatch), so also require the
                // trigger to be idle before confirming — stopping an
                // in-flight batch is exactly-once for DATA (the gates)
                // but its progress event would never publish, and the
                // per-trigger telemetry below must be complete
                if (committedMax(i) >= frontier(i) &&
                    !queries(i).status.isTriggerActive) {
                  confirms(i) += 1
                  if (confirms(i) >= 2) {
                    queries(i).stop(); live -= i
                  }
                } else confirms(i) = 0
              }
            }
            require(live.isEmpty,
              s"standing consumers never converged: streams $live " +
                s"(committed ${live.map(committedMax)}, wanted " +
                s"${live.map(frontier)})")
            sampled.foreach(harvest) // final sweep after the stops
            consumerStats = sampled.map { i =>
              val prog = harvested(i).values.toSeq
              val durs = prog.map(_._2).sorted
              ConsumerStat(i, prog.size,
                prog.map(_._1).sum,
                durs.lastOption.getOrElse(0L),
                if (durs.isEmpty) 0L else durs(durs.size / 2),
                targetsOf(i).map(t =>
                  TxnApplier.targetBytes(t.targetDir)).sum)
            }
          } finally servers.values.foreach(_.close())
          sampled.map(countTargets).sum
      }
    }
    val compactionEvents = TxnApplier.drainCompactionLog()

    // ---- stage: retention (archive-coupled purge per stream; keep
    //      the top half of the TSO space live) ----
    val archRoot = s"$root/archive"
    val purgeBoundary = totalTso / 2
    val ((purgedFiles, archivedFiles), retentionMs) = timed {
      val per = streamDirs.filter(d => new java.io.File(d).isDirectory)
        .map { d =>
          val (archived, purged) = BinlogRetention.pass(spark, d,
            archRoot, purgeBoundary)
          (purged.size.toLong, archived.size.toLong)
        }
      (per.map(_._1).sum, per.map(_._2).sum)
    }

    Report(dns, rowsPerDn, streams, sampled.size,
      Seq(
        Stage("fixture", fixtureMs, rows = dns * rowsPerDn,
          bytes = fixtureStats.map(_._1).sum,
          files = fixtureStats.map(_._2).sum),
        Stage("heartbeat", hbMs, rows = dns.toLong),
        Stage("produce", produceMs, rows = producedRows,
          bytes = produceStats.map(_._1).sum,
          files = produceStats.map(_._2).sum),
        Stage("consume", consumeMs, rows = consumedRows),
        Stage("retention", retentionMs, files = purgedFiles,
          rows = archivedFiles)),
      producedRows, consumedRows, hotStreamRows,
      consumerStats, compactionEvents)
  }

  /** `runMain graft.jobs.ScaleRehearsalJob <root> <dns> <rowsPerDn>
    * <streams> [waves] [consumers] [standingMs] [mode] [compactAfter]
    * [compactMaxBuckets]` — prints the report JSON line.
    *
    * `standingMs` > 0 switches the consume stage to the run-D shape:
    * ALL `consumers` streams consumed by concurrent ProcessingTime
    * queries. `mode` is cow|delta|auto (the consumers' apply mode). */
  def main(args: Array[String]): Unit = {
    val root = args(0)
    val dns = args(1).toInt
    val rowsPerDn = args(2).toLong
    val streams = args(3).toInt
    val waves = if (args.length > 4) args(4).toInt else 2
    val consumers = if (args.length > 5) args(5).toInt else 2
    val standingMs = if (args.length > 6) args(6).toLong else 0L
    val mode = if (args.length > 7) args(7) match {
      case "cow" => TxnApplier.ApplyMode.Cow
      case "delta" => TxnApplier.ApplyMode.Delta
      case "auto" => TxnApplier.ApplyMode.Auto()
      case other => sys.error(s"unknown apply mode '$other'")
    } else TxnApplier.ApplyMode.Auto()
    val compactAfter = if (args.length > 8) args(8).toInt else 32
    val compactMaxBuckets =
      if (args.length > 9) args(9).toInt else Int.MaxValue
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .appName("graft-scale-rehearsal")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.ui.enabled", "false")
      // local FS without per-path chmod forks (NoChmodLocalFs doc):
      // the rehearsal's publish loops are METADATA-heavy (a manifest
      // write + pointer swap per commit group), and a forked chmod per
      // FS op turns them into the measurement's bottleneck — run D's
      // first launch read 15-30 s per delta-publish from exactly this
      .config("spark.hadoop.fs.file.impl", "graft.util.NoChmodLocalFs")
      .getOrCreate()
    try {
      val r = run(spark, root, dns, rowsPerDn, streams, waves,
        consumers, numPartitions = math.min(cpus, 16),
        standingTriggerMs = if (standingMs > 0) Some(standingMs) else None,
        applyMode = mode, compactAfter = compactAfter,
        compactMaxBuckets = compactMaxBuckets)
      println(r.json)
    } finally spark.stop()
  }
}
