package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.model.ChangeEvent
import graft.operators.{MergeSort, Staged}

/** Global-Binlog PRODUCTION composed from the live `graft-cdc` source —
  * the reference's primary product (§3.1: N DN dumps → total TSO order →
  * binlog wire files; task/.../merge/LogEventMerger.java:54,125-168 →
  * dumper/.../logfile/LogFileGenerator.java:121) as ONE checkpointed
  * StreamingQuery. The sibling of [[CdcReplica.start]]: that composition
  * APPLIES the stream to tables; this one RE-EMITS it as a totally
  * ordered MySQL wire log.
  *
  * Per micro-batch the drain already yields every DN's new transactions
  * (one drain task per DN); what the batch boundary does NOT give is the
  * reference merger's ALIGNMENT guarantee — a transaction that acquired
  * its TSO before the drain but reached one DN's log after it would
  * sort below already-emitted data in a later batch. So emission is
  * gated exactly like LogEventMerger's heartbeat barrier
  * (merge/HeartBeatWindow.java:30): each DN's FRONTIER is the highest
  * TSO it has ever delivered (real transactions and heartbeat
  * transactions alike — the reference injects per-DN heartbeats
  * precisely so idle sources keep the merge advancing), and a
  * transaction emits only when its commit TSO is at or below the MIN
  * frontier across all DNs. Everything above the barrier carries over
  * to the next batch in a versioned holdback stage.
  *
  * Emission order and framing: transactions (grouped by `txnId` — XA
  * branches of one global transaction fuse across DNs, the merger's
  * TsoMerge semantics) sort by (commit TSO, txnId) into range-partitioned
  * runs that keep every transaction whole, and each batch's runs become
  * wire files `binlog.<batch>.<partition>` — name order IS total TSO
  * order, across batches because the barrier is monotone and within a
  * batch because the runs are range-partitioned. Heartbeat transactions
  * advance frontiers but are filtered from the log (the reference
  * consumes them at the merger; they never reach the dumper's files).
  *
  * Exactly-once under replay: a replayed batch N re-reads holdback
  * stage N-1 (stages are versioned by batchId; N-1 is deleted only
  * after N+1 ran, i.e. after N committed), recomputes the same barrier
  * from the same persisted frontiers, deletes its own `binlog.<N>.`
  * prefix, and rewrites byte-identical files — the replay fully
  * supersedes the attempt it replaces, so a kill anywhere leaves the
  * log equal to a run that never crashed.
  *
  * Scale shape: the only shuffles are one hash partition by txnId (the
  * commit-TSO window — per-txn bounded) and one range partition by
  * (commit TSO, txnId) for the runs; the frontier collect is O(DN
  * count); holdback size is bounded by the barrier lag (steady state:
  * under one heartbeat period of data), not history. With
  * `targetRowsPerFile` set, the per-batch run count scales with the
  * emitted volume (the reference's binlogFileSize rotation,
  * dumper/.../logfile/LogFileGenerator.java) so a burst lands in more
  * bounded files instead of bigger ones.
  */
object CdcBinlog {

  def start(spark: SparkSession,
      endpoints: Seq[(String, String, Int)],
      user: String, password: String,
      tableCols: Map[(String, String), Seq[String]],
      outDir: String, checkpointDir: String, workDir: String,
      numPartitions: Int = 4,
      heartbeatTables: Set[(String, String)] = Set.empty,
      trigger: Trigger = Trigger.ProcessingTime(0L),
      maxBytesPerPoll: Long = CdcConf.DefaultMaxBytesPerPoll,
      startExecuted: Map[String, String] = Map.empty,
      soTimeoutMs: Int = 30000,
      serverId: Long = 12345L,
      checksummed: Boolean = false,
      registryDir: Option[String] = None,
      forceCompleteAfterBatches: Int = 0,
      gtidSid: Option[java.util.UUID] = None,
      targetRowsPerFile: Int = 0,
      fanOut: Option[CdcBinlogX.FanOut] = None): StreamingQuery = {
    // the frontier sidecar is ';'/'='/','-delimited and the source's
    // options reuse '@'/';' — refuse DN names that would corrupt
    // either (the CdcReplica.start / saveRegistry guard family)
    endpoints.foreach { case (dn, _, _) =>
      require(dn.nonEmpty &&
        !dn.exists(c => "\"\\,;=@/".contains(c) || c.isWhitespace),
        s"DN name '$dn' carries option/sidecar/path delimiters")
    }
    val dns = endpoints.map(_._1)
    spark.readStream.format("graft-cdc")
      .option("endpoints",
        endpoints.map { case (dn, h, p) => s"$dn@$h:$p" }.mkString(","))
      .option("user", user).option("password", password)
      .option("tables", tableCols.map { case ((s, t), cols) =>
        s"$s.$t:${cols.mkString(",")}"
      }.mkString(";"))
      .option("maxBytesPerPoll", maxBytesPerPoll.toString)
      .option("soTimeoutMs", soTimeoutMs.toString)
      .option("serverId", serverId.toString)
      .options(registryDir.map(d => Map("registryDir" -> d))
        .getOrElse(Map.empty))
      .options(if (startExecuted.isEmpty) Map.empty[String, String]
        else Map("startExecuted" -> startExecuted
          .map { case (dn, set) => s"$dn=$set" }.mkString(";")))
      .load()
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        emitBatch(batch, batchId, dns, tableCols, heartbeatTables,
          outDir, workDir, numPartitions, checksummed, registryDir,
          forceCompleteAfterBatches, gtidSid, targetRowsPerFile, fanOut)
        ()
      }
      .trigger(trigger)
      .start()
  }

  /** One micro-batch of the production pipeline, deterministic in
    * (source offset range, holdback stage N-1) so a replayed batch
    * rewrites identical state and identical files. */
  private[streaming] def emitBatch(batch: DataFrame, batchId: Long,
      dns: Seq[String], tableCols: Map[(String, String), Seq[String]],
      heartbeatTables: Set[(String, String)],
      outDir: String, workDir: String, numPartitions: Int,
      checksummed: Boolean,
      registryDir: Option[String] = None,
      forceCompleteAfterBatches: Int = 0,
      gtidSid: Option[java.util.UUID] = None,
      targetRowsPerFile: Int = 0,
      fanOut: Option[CdcBinlogX.FanOut] = None): Unit = {
    val spark = batch.sparkSession
    val fs = graft.util.HadoopIo.fsOf(new Path(workDir))

    // in-stream DDL: decode names and the wire RE-ENCODE registry must
    // agree (the writer maps image keys by name; the wire itself
    // carries none). The RE-ENCODE base is versioned per batch beside
    // the frontier sidecar — the mutable registryDir sidecar (the
    // SOURCE's decode seed) is saved before the checkpoint commits, so
    // a replay that re-read it would see the already-evolved names,
    // compute an EMPTY rename step, and re-encode old-keyed held rows
    // as NULL cells. Reading the hold/<N-1>.registry snapshot instead
    // makes the replay recompute the SAME base → same rename step →
    // byte-identical files.
    val regSeed = new Path(s"$workDir/hold/${batchId - 1}.registry")
    val reg0 = registryDir.map { d =>
      if (fs.exists(regSeed))
        graft.jobs.LiveReplicaJob.mergeRegistry(
          graft.util.HadoopIo.readString(regSeed), tableCols)
      else {
        // first batch of a (possibly resumed) query: materialize the
        // seed so a replay of THIS batch re-reads the pre-evolution
        // registry even after the end-of-batch registryDir save
        val r = graft.jobs.LiveReplicaJob.resumeRegistry(d, tableCols)
        writeRegistrySnapshot(fs, regSeed, r)
        r
      }
    }.getOrElse(tableCols)

    // the decoded batch stages once: the frontier agg, the gate split
    // and the wire write must not re-run the drain/decode
    val staged = Staged.parquetStage(batch, s"$workDir/stage")

    // in-stream DDL inside THIS batch: decode evolves names inline
    // (BinlogWire.decodeStream), so post-DDL rows arrive keyed by the
    // NEW name while held/pre-DDL rows carry the old one. The write
    // registry is the EVOLVED one, and renamed keys in older rows are
    // re-keyed to it — otherwise the re-encode would null their cells.
    val evolved = registryDir.map { _ =>
      graft.jobs.LiveReplicaJob.evolveRegistryFromBatch(staged, reg0)
    }.getOrElse(reg0)

    // frontiers: highest TSO each DN has EVER delivered (heartbeats
    // included) — max-merged with the persisted frontiers, so an idle
    // DN keeps the level its last heartbeat established
    val st = readFrontiers(fs,
      new Path(s"$workDir/hold/${batchId - 1}.frontier"))
    val batchMax = staged.groupBy(col("partitionId"))
      .agg(max(col("tso")).as("m"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val frontiers = dns.map { dn =>
      val p = st.frontiers.get(dn)
      val front = math.max(p.map(_._1).getOrElse(Long.MinValue),
        batchMax.getOrElse(dn, Long.MinValue))
      // stall age: consecutive batches without this DN advancing — the
      // force-complete clock (LogEventMerger.tryForceComplete :238-273)
      val advanced = batchMax.get(dn)
        .exists(_ > p.map(_._1).getOrElse(Long.MinValue))
      val stall = if (advanced) 0 else p.map(_._2).getOrElse(0) + 1
      dn -> (front, stall)
    }.toMap
    // the merge barrier: complete only up to the slowest DN's frontier
    // (a DN that has never delivered anything holds everything back —
    // the merger's all-sources gate). With force-complete enabled, a DN
    // stalled past the threshold is EXCLUDED so a dead DN cannot stall
    // production forever — the reference's availability trade; the
    // barrier is clamped monotone so an exclusion-set change can never
    // regress the seal.
    val live =
      if (forceCompleteAfterBatches <= 0) frontiers
      else frontiers.filter(_._2._2 < forceCompleteAfterBatches)
    val rawBarrier =
      if (live.nonEmpty) live.values.map(_._1).min
      else if (frontiers.nonEmpty) frontiers.values.map(_._1).min
      else Long.MinValue
    val barrier = math.max(st.barrier, rawBarrier)

    val holdPrev = new Path(s"$workDir/hold/${batchId - 1}")
    val held =
      if (fs.exists(holdPrev))
        spark.read.schema(ChangeEvent.schema).parquet(holdPrev.toString)
      else spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        ChangeEvent.schema)

    val isHeartbeat =
      if (heartbeatTables.isEmpty) col("op") === "HEARTBEAT"
      else col("op") === "HEARTBEAT" ||
        heartbeatTables.map { case (s, t) =>
          col("schemaName") === s && col("tableName") === t
        }.reduce(_ || _)

    // commit TSO per GLOBAL transaction: XA branches share txnId AND
    // the commit TSO — the TSO oracle stamps one CTS per global commit
    // and every participant's binlog carries it (the reference's
    // MergeBarrier fuses on exactly this, merge/MergeBarrier.java:51).
    // Under that contract the gate is airtight: a barrier-passing txn
    // has CTS <= every DN's frontier, and a DN serving in TSO order
    // past the CTS has by definition delivered its branch — so every
    // branch of a barrier-passing txn is present before it emits.
    // (A source violating the shared-CTS contract could emit a txn
    // partially; that is a data-contract breach, not a merge race.)
    val all = normalizeRenames(
      staged.unionByName(held).filter(!isHeartbeat), reg0, evolved)
      .withColumn("__commit_tso",
        max(col("tso")).over(Window.partitionBy(col("txnId"))))
    val gated = Staged.parquetStage(all, s"$workDir/gated")
    // a force-completed log has SEALED everything at or below the old
    // barrier: a revived DN delivering transactions back there would
    // have to emit out of name order — refuse loudly, the operator
    // decides (reseed, or accept the gap and restart past it)
    if (forceCompleteAfterBatches > 0 && st.barrier > Long.MinValue) {
      val late = gated
        .filter(col("__commit_tso") <= st.barrier)
        .filter(!col("partitionId").isin(
          st.frontiers.filter(_._2._1 >= st.barrier).keys.toSeq: _*))
        .select(col("partitionId"), col("tso")).limit(1).collect()
      if (late.nonEmpty)
        throw new IllegalStateException(
          s"CdcBinlog: DN '${late(0).getString(0)}' delivered txn tso " +
          s"${late(0).getLong(1)} at or below the force-completed " +
          s"barrier ${st.barrier} — the log is sealed past it; " +
          "emitting now would break total order")
    }
    val emit = gated.filter(col("__commit_tso") <= barrier)

    // one aggregate serves two masters: the merge-metrics sidecar (the
    // reference's MergeMetrics surface, task/.../metrics/
    // MergeMetrics.java) and size-based rotation — emitted/held txn
    // counts plus emitted ROW count, off the already-staged gate
    val counts = gated.agg(
      countDistinct(when(col("__commit_tso") <= barrier,
        col("txnId"))).as("e"),
      countDistinct(when(col("__commit_tso") > barrier,
        col("txnId"))).as("h"),
      count(when(col("__commit_tso") <= barrier, lit(1))).as("er"))
      .collect()(0)
    // rotation by volume (LogFileGenerator's binlogFileSize semantics,
    // dumper/.../logfile/LogFileGenerator.java — the reference rotates
    // a busy log more often, not into one giant file): the run count
    // scales with THIS batch's emitted rows, so a 1000× burst still
    // lands in bounded files. Deterministic under replay — the count
    // is a pure function of (offset range, holdback N-1).
    // run count for a log holding `rows` rows (fan-out passes each
    // stream's OWN count — hash skew makes uniform shares lie)
    def partsFor(rows: Long): Int =
      if (targetRowsPerFile <= 0) numPartitions
      else math.max(1L, (rows + targetRowsPerFile - 1) /
        targetRowsPerFile).min(10000L).toInt

    // the batch's wire files: delete this batch's prefix first so a
    // replayed attempt fully supersedes the one it replaces (range
    // partitioner sampling is not stable across attempts)
    val prefix = f"binlog.$batchId%06d."
    def deleteByPrefix(dir: String): Unit = {
      val root = new Path(dir)
      val ofs = graft.util.HadoopIo.fsOf(root)
      if (ofs.exists(root))
        ofs.listStatus(root).foreach { st =>
          if (st.isFile && st.getPath.getName.startsWith(prefix))
            ofs.delete(st.getPath, false)
        }
    }
    // with a sid, the produced log(s) carry their OWN GTID stream
    // (gno := commit TSO — decoded rows all carry the txn's CTS, and
    // TSOs are globally unique) with cumulative PREVIOUS_GTIDS, read
    // back from the log itself (own-prefix files are already deleted,
    // so a replay computes the same prior): the output is a
    // FIRST-CLASS auto-position-servable binlog a downstream replica
    // can dump with the graft-cdc source
    def writeLog(rows: DataFrame, dir: String, parts: Int): Unit = {
      deleteByPrefix(dir)
      val ordered = MergeSort.sortedRunsGrouped(rows, parts,
        Seq("__commit_tso", "txnId"), Seq("tso", "traceId"))
        .drop("__commit_tso")
      val prior = gtidSid.map(_ =>
        graft.sinks.BinlogCatalog.executedGtidSet(spark, dir))
        .getOrElse(graft.model.GtidSet.Empty)
      graft.sinks.BinlogWire.writeChangeStreamBinlogFiles(ordered,
        evolved, dir, filePrefix = prefix, checksummed = checksummed,
        gtidSid = gtidSid, priorExecuted = prior)
      ()
    }
    fanOut match {
      case None => writeLog(emit, outDir, partsFor(counts.getLong(2)))
      case Some(f) =>
        // Binlog-X (§3.2): DML hashes to its stream (HashConfig
        // .getStreamSeq semantics); DDL broadcasts to ALL streams (the
        // TxnTag path) so every per-stream log is self-describing
        import graft.operators.StreamHash
        // record-level keys come from whichever image carries them:
        // DELETE rows have theirs in `before` — without the fallback a
        // key's delete would hash to a different stream than its
        // inserts and break per-key order
        val pkExprs = f.pkCols.map(c => coalesce(
          element_at(col("after"), c), element_at(col("before"), c)))
        val dml = emit.filter(col("op") =!= "DDL")
          .withColumn("__stream", StreamHash.streamSeq(f.level,
            f.streams, col("schemaName"), col("tableName"), pkExprs))
        val streamed = Staged.parquetStage(
          dml.unionByName(
            StreamHash.broadcastToAllStreams(
                emit.filter(col("op") === "DDL"), f.streams)
              .withColumnRenamed("stream", "__stream")),
          s"$workDir/streamed")
        // per-stream rotation sizing off the staged frame: under hash
        // skew a hot stream must still honor targetRowsPerFile (one
        // O(M) aggregate; deterministic, so replays re-split the same)
        val perStream: Map[Int, Long] =
          if (targetRowsPerFile <= 0) Map.empty
          else streamed.groupBy(col("__stream")).count().collect()
            .map(r => r.getInt(0) -> r.getLong(1)).toMap
        (0 until f.streams).foreach { i =>
          writeLog(streamed.filter(col("__stream") === i)
            .drop("__stream"), s"$outDir/stream-$i",
            partsFor(perStream.getOrElse(i, 0L)))
        }
    }

    // holdback stage N + frontier sidecar; N-2 (committed once N ran)
    // is reclaimed — the work dir holds at most two batches of lag
    gated.filter(col("__commit_tso") > barrier).drop("__commit_tso")
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"$workDir/hold/$batchId")
    writeFrontiers(fs, new Path(s"$workDir/hold/$batchId.frontier"),
      FrontierState(barrier, frontiers))
    // merge-metrics sidecar, written beside the frontier for operators
    // (writeSwap: readMergeMetrics must never see a half-written file)
    graft.util.HadoopIo.writeSwap(
      new Path(s"$workDir/hold/.$batchId.metrics.tmp"),
      new Path(s"$workDir/hold/$batchId.metrics"),
      s"barrier=$barrier;emittedTxns=${counts.getLong(0)};" +
        s"heldTxns=${counts.getLong(1)}")
    fs.delete(new Path(s"$workDir/hold/${batchId - 2}.metrics"), false)
    fs.delete(new Path(s"$workDir/hold/${batchId - 2}"), true)
    fs.delete(new Path(s"$workDir/hold/${batchId - 2}.frontier"), false)
    // persist the evolved registry: the versioned snapshot is the NEXT
    // batch's re-encode base (and this batch's replay anchor, above);
    // the registryDir sidecar seeds the SOURCE's decode, where the
    // wire's positional cells make an early save rename-safe
    registryDir.foreach { d =>
      writeRegistrySnapshot(fs,
        new Path(s"$workDir/hold/$batchId.registry"), evolved)
      fs.delete(new Path(s"$workDir/hold/${batchId - 2}.registry"), false)
      if (evolved != reg0)
        graft.jobs.LiveReplicaJob.saveRegistry(d, evolved)
    }
    ()
  }

  /** Re-key renamed map entries to the evolved column names: for every
    * table whose registry renamed positions (same arity, different
    * names), a row still keyed by the OLD name gets its entry moved to
    * the new one. Holdback rows are stored normalized, so one
    * base→evolved step per batch covers every epoch in flight. */
  private def normalizeRenames(df: DataFrame,
      base: Map[(String, String), Seq[String]],
      evolved: Map[(String, String), Seq[String]]): DataFrame = {
    val renames = evolved.flatMap { case (key, newCols) =>
      base.get(key).filter(_.size == newCols.size).map { oldCols =>
        key -> oldCols.zip(newCols).filter { case (o, n) => o != n }
      }
    }.filter(_._2.nonEmpty)
    if (renames.isEmpty) df
    else renames.foldLeft(df) { case (acc, ((sch, tbl), pairs)) =>
      val cond = col("schemaName") === sch && col("tableName") === tbl
      def fix(mcol: String) = {
        val moved = pairs.foldLeft(col(mcol)) { case (m, (o, n)) =>
          when(cond && element_at(m, o).isNotNull &&
              element_at(m, n).isNull,
            map_concat(
              map_filter(m, (k, _) => k =!= o),
              map(lit(n), element_at(m, o))))
            .otherwise(m)
        }
        moved
      }
      acc.withColumn("before", fix("before"))
        .withColumn("after", fix("after"))
    }
  }

  /** One batch's merge metrics (the reference's MergeMetrics surface):
    * the sealed barrier plus emitted/held transaction counts. */
  final case class MergeMetrics(barrier: Long, emittedTxns: Long,
      heldTxns: Long)

  /** Read the merge-metrics sidecar batch `batchId` wrote under
    * `workDir` — None if it has aged out (the work dir keeps the last
    * two batches) or the batch never ran. */
  def readMergeMetrics(workDir: String, batchId: Long)
      : Option[MergeMetrics] = {
    val p = new Path(s"$workDir/hold/$batchId.metrics")
    val fs = graft.util.HadoopIo.fsOf(p)
    if (!fs.exists(p)) None
    else {
      val kv = graft.util.HadoopIo.readString(p).split(";")
        .map(_.split("=", 2)).collect { case Array(k, v) => k -> v }
        .toMap
      // honor the Option contract even on an unparseable file (the
      // writer swaps atomically, but an operator-mangled file must
      // read as absent, not throw)
      try for {
        b <- kv.get("barrier"); e <- kv.get("emittedTxns")
        h <- kv.get("heldTxns")
      } yield MergeMetrics(b.toLong, e.toLong, h.toLong)
      catch { case _: NumberFormatException => None }
    }
  }

  /** Batch-versioned registry snapshot — the shared saveRegistry
    * serialization (guards included) written ATOMICALLY: this file is
    * the replay's schema anchor; a truncated half-write trusted by a
    * replay would be the exact wrong-base corruption it exists to
    * prevent. */
  private def writeRegistrySnapshot(fs: org.apache.hadoop.fs.FileSystem,
      p: Path, reg: Map[(String, String), Seq[String]]): Unit =
    graft.util.HadoopIo.writeSwap(
      new Path(p.getParent, s".${p.getName}.tmp"), p,
      graft.jobs.LiveReplicaJob.serializeRegistry(reg))

  /** Persisted merge state: the sealed barrier plus per-DN
    * (frontier, consecutive-stall-batches). */
  private[streaming] final case class FrontierState(barrier: Long,
      frontiers: Map[String, (Long, Int)])

  private def readFrontiers(fs: org.apache.hadoop.fs.FileSystem,
      p: Path): FrontierState =
    if (!fs.exists(p)) FrontierState(Long.MinValue, Map.empty)
    else {
      val in = fs.open(p)
      val text =
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      val parts = text.split(";").toSeq.filter(_.nonEmpty)
      val barrier = parts.collectFirst {
        case kv if kv.startsWith("barrier=") =>
          kv.stripPrefix("barrier=").toLong
      }.getOrElse(Long.MinValue)
      val fronts = parts.filterNot(_.startsWith("barrier=")).map { kv =>
        val Array(dn, v) = kv.split("=", 2)
        v.split(",") match {
          case Array(f, stall) => dn -> (f.toLong, stall.toInt)
          case Array(f) => dn -> (f.toLong, 0)
        }
      }.toMap
      FrontierState(barrier, fronts)
    }

  private def writeFrontiers(fs: org.apache.hadoop.fs.FileSystem,
      p: Path, state: FrontierState): Unit = {
    val text = (s"barrier=${state.barrier}" +:
      state.frontiers.toSeq.sortBy(_._1).map { case (dn, (f, stall)) =>
        s"$dn=$f,$stall"
      }).mkString(";")
    // atomic: the frontier is replay-critical state — a truncated
    // half-write read back as a lower barrier/frontier would re-emit
    graft.util.HadoopIo.writeSwap(
      new Path(p.getParent, s".${p.getName}.tmp"), p, text)
  }
}

/** Binlog-X: the MULTI-STREAM Global-Binlog production (SURVEY §3.2) —
  * the same live composition as [[CdcBinlog.start]] (drain → TSO merge
  * → frontier barrier → wire files), fanned out into M per-stream logs
  * under `outDir/stream-<i>`.
  *
  * Reference semantics: `HashConfig.getStreamSeq` assigns each event a
  * stream by DATABASE / TABLE / RECORD hash
  * (task/.../transmit/relay/HashConfig.java:208-265); DDL (and the
  * heartbeat alignment the barrier already consumed) broadcast to all
  * streams (the TxnTag path), so each per-stream log is
  * self-describing. Each stream's log is independently TSO-ordered and
  * (with `gtidSid`) independently auto-position-servable; a RECORD-
  * level hash may split one transaction's rows across streams — the
  * reference's documented trade for per-key parallel consumption.
  */
object CdcBinlogX {

  /** Fan-out spec: stream count, hash level, and (for ByRecord) the
    * after-image keys that form the record hash. */
  final case class FanOut(streams: Int,
      level: graft.operators.StreamHash.HashLevel =
        graft.operators.StreamHash.ByTable,
      pkCols: Seq[String] = Seq.empty)

  def start(spark: SparkSession,
      endpoints: Seq[(String, String, Int)],
      user: String, password: String,
      tableCols: Map[(String, String), Seq[String]],
      outDir: String, checkpointDir: String, workDir: String,
      fanOut: FanOut,
      numPartitions: Int = 4,
      heartbeatTables: Set[(String, String)] = Set.empty,
      trigger: Trigger = Trigger.ProcessingTime(0L),
      maxBytesPerPoll: Long = CdcConf.DefaultMaxBytesPerPoll,
      startExecuted: Map[String, String] = Map.empty,
      soTimeoutMs: Int = 30000,
      serverId: Long = 12345L,
      checksummed: Boolean = false,
      registryDir: Option[String] = None,
      forceCompleteAfterBatches: Int = 0,
      gtidSid: Option[java.util.UUID] = None,
      targetRowsPerFile: Int = 0): StreamingQuery = {
    require(fanOut.streams > 0, "fanOut.streams must be positive")
    CdcBinlog.start(spark, endpoints, user, password, tableCols,
      outDir, checkpointDir, workDir, numPartitions, heartbeatTables,
      trigger, maxBytesPerPoll, startExecuted, soTimeoutMs, serverId,
      checksummed, registryDir, forceCompleteAfterBatches, gtidSid,
      targetRowsPerFile, fanOut = Some(fanOut))
  }
}
