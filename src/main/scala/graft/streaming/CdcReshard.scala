package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.StreamHash
import graft.sinks.{BinlogCatalog, BinlogWire}

/** Binlog-X stream-count change (re-shard): the operator story for
  * M → M′ the reference's daemon drives by re-planning the stream
  * topology (daemon/cluster/topology/BinlogXTopologyBuilder.java — the
  * daemon computes a new stream plan and restarts the dispatcher/Final
  * chain on it; consumers resume by GTID).
  *
  * The Spark-first restatement keeps GENERATIONS, not rewrites:
  *
  *  1. DRAIN — stop the M-stream production at a quiet point (an
  *     AvailableNow run that terminates). Everything emitted lives in
  *     `fromDir/stream-0..M-1`; everything above the last emission
  *     barrier sits in the production's holdback stage (workDir).
  *  2. [[reshard]] — compute the BARRIER TSO (the max transaction TSO
  *     across the old generation's streams, from their GTID executed
  *     sets: gno := tso) and write the generation manifest
  *     `toDir/_reshard` naming the old dir, the barrier and the new
  *     fan-out. The old generation is never touched.
  *  3. RESUME — restart the production with the NEW fan-out, the NEW
  *     outDir and the SAME source checkpoint + workDir:
  *     `CdcBinlogX.start(..., fanOut = to, outDir = toDir)`. The
  *     source offsets (per-DN executed GTID sets) carry over, and the
  *     holdback stage releases the above-barrier transactions into the
  *     new generation — exactly-once across the generation boundary
  *     with zero re-materialization.
  *  4. SERVE — [[readStitchedStream]] gives a consumer of new stream j
  *     its FULL history: the old generation re-hashed under the NEW
  *     fan-out and filtered to j (≤ barrier), then the new generation's
  *     own stream-j log (> barrier). DDL (broadcast to every old
  *     stream) is deduplicated to one copy and re-broadcast to every
  *     new stream. A consumer that already consumed an old stream
  *     resumes by GTID: its executed set skips nothing in the new
  *     generation (all new txns are above the barrier), and moved-in
  *     tables bootstrap from the stitched history.
  *
  * Scale shape: reshard itself is O(M) metadata (executed-set folds);
  * the stitched read prunes nothing from the old generation by
  * construction (re-hash requires a decode pass) but is a BOOTSTRAP
  * path — steady-state consumers read only the new generation's own
  * stream.
  */
object CdcReshard {

  final case class Manifest(fromDir: String, barrierTso: Long,
      fromStreams: Int, to: CdcBinlogX.FanOut)

  private def manifestPath(toDir: String) = new Path(s"$toDir/_reshard")

  private def levelName(l: StreamHash.HashLevel): String = l match {
    case StreamHash.ByDatabase => "ByDatabase"
    case StreamHash.ByTable => "ByTable"
    case StreamHash.ByRecord => "ByRecord"
  }

  private def levelOf(s: String): StreamHash.HashLevel = s match {
    case "ByDatabase" => StreamHash.ByDatabase
    case "ByTable" => StreamHash.ByTable
    case "ByRecord" => StreamHash.ByRecord
    case other => sys.error(s"unknown hash level '$other' in manifest")
  }

  /** Seal the generation boundary: barrier = max transaction TSO across
    * the OLD generation's streams (their logs carry gno := tso), write
    * the manifest into the (empty) new generation dir. Refuses a
    * non-empty `toDir` — a re-shard never overwrites a generation. */
  def reshard(spark: SparkSession, fromDir: String, toDir: String,
      from: CdcBinlogX.FanOut, to: CdcBinlogX.FanOut): Manifest = {
    require(from.streams > 0 && to.streams > 0, "stream counts positive")
    val fromRoot = new Path(fromDir)
    val ffs = graft.util.HadoopIo.fsOf(fromRoot)
    require(ffs.exists(new Path(fromDir, "stream-0")),
      s"$fromDir does not look like a Binlog-X generation (no stream-0)")
    val toRoot = new Path(toDir)
    val tfs = graft.util.HadoopIo.fsOf(toRoot)
    require(!tfs.exists(manifestPath(toDir)),
      s"$toDir already carries a re-shard manifest")
    if (tfs.exists(toRoot))
      require(!tfs.listStatus(toRoot).exists(
          _.getPath.getName.startsWith("stream-")),
        s"$toDir already holds stream dirs — a re-shard targets a " +
          "FRESH generation dir")
    else tfs.mkdirs(toRoot)
    // barrier: max gno (= tso) over every old stream's executed set.
    // Empty streams contribute nothing; a generation with no emitted
    // transaction at all cannot seal a boundary.
    val maxes = (0 until from.streams).flatMap { i =>
      val d = s"$fromDir/stream-$i"
      if (!ffs.exists(new Path(d))) None
      else {
        val ex = BinlogCatalog.executedGtidSet(spark, d)
        ex.sets.values.flatten.map(_._2 - 1L).maxOption
      }
    }
    require(maxes.nonEmpty,
      s"$fromDir: no emitted transactions in any stream — nothing to " +
        "re-shard from (produce first, or start fresh at the new M)")
    val barrier = maxes.max
    val m = Manifest(fromDir, barrier, from.streams, to)
    graft.util.HadoopIo.writeSwap(
      new Path(s"$toDir/._reshard.tmp"), manifestPath(toDir),
      Seq(
        s"fromDir=$fromDir",
        s"barrier=$barrier",
        s"fromStreams=${from.streams}",
        s"toStreams=${to.streams}",
        s"level=${levelName(to.level)}",
        s"pkCols=${to.pkCols.mkString(",")}",
        s"overrides=${to.overrides.toSeq.sorted
          .map { case (k, v) => s"$k:$v" }.mkString(";")}"
      ).mkString("\n"))
    m
  }

  /** Read the generation manifest back. */
  def manifest(spark: SparkSession, toDir: String): Manifest = {
    val p = manifestPath(toDir)
    require(graft.util.HadoopIo.fsOf(p).exists(p),
      s"$toDir has no _reshard manifest")
    val kv = graft.util.HadoopIo.readString(p).split("\n")
      .filter(_.contains("=")).map { l =>
        val at = l.indexOf('=')
        l.substring(0, at) -> l.substring(at + 1)
      }.toMap
    Manifest(kv("fromDir"), kv("barrier").toLong, kv("fromStreams").toInt,
      CdcBinlogX.FanOut(kv("toStreams").toInt, levelOf(kv("level")),
        kv.getOrElse("pkCols", "").split(",").toSeq.filter(_.nonEmpty),
        kv.getOrElse("overrides", "").split(";").toSeq.filter(_.nonEmpty)
          .map { e =>
            val at = e.lastIndexOf(':')
            e.substring(0, at) -> e.substring(at + 1).toInt
          }.toMap))
  }

  /** The re-plan INPUT the reference's daemon computes before a
    * topology change (daemon/cluster/topology/BinlogXTopologyBuilder
    * .java builds the stream plan; the daemon decides M from cluster
    * load): what M → M′ the measured load says, leaving EXECUTION
    * operator-invoked ([[reshard]] — a stream-count change is a
    * generation boundary, not something a heuristic should spring on
    * running consumers). */
  final case class Recommendation(fromStreams: Int, toStreams: Int,
      perStreamTxns: Seq[Long], skew: Double, heldTxns: Long,
      reasons: Seq[String]) {
    def changeRecommended: Boolean = toStreams != fromStreams
  }

  /** Recommend a stream count from the load the generation ACTUALLY
    * carried. Load per stream = transactions in its executed GTID set
    * — driver metadata (O(intervals) text), no wire decode. Policy,
    * deterministic and stated:
    *
    *  - M′ = ceil(total / targetTxnsPerStream), clamped to
    *    [1, maxStreams] — the per-stream volume band the operator
    *    sizes consumers for (the reference daemon's analog input is
    *    its stream-count config against observed EPS).
    *  - skew = max/mean per-stream load. Past `skewLimit` the
    *    recommendation FLAGS the hot streams instead of raising M′ —
    *    more streams cannot split one hot table (the reference pins
    *    hot tables the same way: stream overrides); the reason names
    *    the streams so the operator pins or splits tables.
    *  - producer pressure: when `workDir` is given and the newest
    *    merge-metrics sidecar shows held > emitted transactions, the
    *    reasons say so (backlog is a producer/trigger-sizing signal,
    *    not a stream-count one — M′ is left alone).
    */
  def recommend(spark: SparkSession, fromDir: String,
      from: CdcBinlogX.FanOut, targetTxnsPerStream: Long,
      skewLimit: Double = 4.0, maxStreams: Int = 256,
      workDir: Option[String] = None): Recommendation = {
    require(targetTxnsPerStream > 0, "targetTxnsPerStream positive")
    val loads = (0 until from.streams).map { i =>
      val d = s"$fromDir/stream-$i"
      if (!graft.util.HadoopIo.fsOf(new Path(d)).exists(new Path(d))) 0L
      else BinlogCatalog.executedGtidSet(spark, d).sets.values
        .flatMap(_.map { case (lo, hi) => hi - lo }).sum
    }
    val total = loads.sum
    val mean = if (from.streams == 0) 0.0
      else total.toDouble / from.streams
    val skew = if (mean <= 0.0) 1.0 else loads.max / mean
    val reasons = Seq.newBuilder[String]
    val mPrime = math.min(maxStreams.toLong, math.max(1L,
      (total + targetTxnsPerStream - 1) / targetTxnsPerStream)).toInt
    if (mPrime > from.streams)
      reasons += s"mean per-stream load ${mean.toLong} txns exceeds " +
        s"the $targetTxnsPerStream target: grow ${from.streams} -> " +
        s"$mPrime"
    else if (mPrime < from.streams)
      reasons += s"mean per-stream load ${mean.toLong} txns is below " +
        s"the $targetTxnsPerStream target: shrink ${from.streams} -> " +
        s"$mPrime"
    if (skew > skewLimit) {
      val hot = loads.zipWithIndex
        .filter { case (l, _) => l > mean * skewLimit }.map(_._2)
      reasons += s"skew ${f"$skew%.1f"}x over streams $hot — a " +
        "stream-count change cannot split one hot table; pin or " +
        "split via FanOut.overrides"
    }
    val held = workDir.map(latestHeldTxns).getOrElse(0L)
    val emitted = workDir.map(latestEmittedTxns).getOrElse(0L)
    if (held > emitted && held > 0) {
      // discriminate the backlog's CAUSE from the straggler telemetry
      // (CdcBinlog.readHoldTelemetry): a backlog with one DN's
      // frontier lag dwarfing the rest is a STRAGGLER DN — repair or
      // force-complete IT; a backlog with even lags is trigger/
      // admission sizing. Neither is a stream-count signal.
      val laggard = workDir.flatMap(latestLaggard)
      laggard match {
        case Some((dn, lag)) =>
          reasons += s"producer holdback $held txns exceeds emitted " +
            s"$emitted — straggler DN '$dn' lags the fastest frontier " +
            s"by $lag; repair or force-complete it, M' untouched"
        case None =>
          reasons += s"producer holdback $held txns exceeds emitted " +
            s"$emitted — backlog pressure; size " +
            "triggers/maxBytesPerPoll, not streams"
      }
    }
    Recommendation(from.streams, mPrime, loads, skew, held,
      reasons.result())
  }

  /** The straggler (if any) named by the newest holdback telemetry: a
    * DN whose frontier lag exceeds 4× every other DN's (and is
    * nonzero). None when lags are even — then the backlog is a
    * sizing problem, not a sick DN. */
  private def latestLaggard(workDir: String): Option[(String, Long)] = {
    val hold = new Path(s"$workDir/hold")
    val fs = graft.util.HadoopIo.fsOf(hold)
    if (!fs.exists(hold)) return None
    fs.listStatus(hold).iterator.map(_.getPath.getName)
      .filter(_.endsWith(".metrics"))
      .flatMap(n => n.stripSuffix(".metrics").toLongOption)
      .maxOption
      .flatMap(b => CdcBinlog.readHoldTelemetry(workDir, b))
      .flatMap { t =>
        val lags = t.lagByDn.toSeq
        lags.sortBy(-_._2) match {
          case (dn, worst) +: rest
              if worst > 0 && rest.forall(_._2 * 4 <= worst) =>
            Some((dn, worst))
          case _ => None
        }
      }
  }

  private def latestMetrics(workDir: String)
      : Option[CdcBinlog.MergeMetrics] = {
    val hold = new Path(s"$workDir/hold")
    val fs = graft.util.HadoopIo.fsOf(hold)
    if (!fs.exists(hold)) return None
    fs.listStatus(hold).iterator.map(_.getPath.getName)
      .filter(_.endsWith(".metrics"))
      .flatMap(n => n.stripSuffix(".metrics").toLongOption)
      .maxOption
      .flatMap(b => CdcBinlog.readMergeMetrics(workDir, b))
  }
  private def latestHeldTxns(workDir: String): Long =
    latestMetrics(workDir).map(_.heldTxns).getOrElse(0L)
  private def latestEmittedTxns(workDir: String): Long =
    latestMetrics(workDir).map(_.emittedTxns).getOrElse(0L)

  /** The stream the NEW fan-out assigns each decoded event — the same
    * expression the live fan-out writes with (coalesce(after, before)
    * for record keys, overrides honored). */
  private def newStreamCol(to: CdcBinlogX.FanOut) = {
    val pkExprs = to.pkCols.map(c => coalesce(
      element_at(col("after"), c), element_at(col("before"), c)))
    StreamHash.streamSeqWithOverrides(to.level, to.streams,
      col("schemaName"), col("tableName"), pkExprs, to.overrides)
  }

  /** Full history of NEW stream `j` across the generation boundary:
    * old generation re-hashed to the new fan-out and filtered to j
    * (DML; ≤ barrier), old-generation DDL deduplicated to one copy
    * (every old stream carries the broadcast), then the new
    * generation's own stream-j log (> barrier, defensive — the new
    * generation only holds above-barrier transactions). Ordered by
    * (tso, intra-file position) per source, presented sorted by tso. */
  def readStitchedStream(spark: SparkSession, toDir: String, j: Int,
      tableCols: Map[(String, String), Seq[String]]): DataFrame = {
    val m = manifest(spark, toDir)
    require(j >= 0 && j < m.to.streams,
      s"stream $j outside [0, ${m.to.streams})")
    val oldParts = (0 until m.fromStreams).map { i =>
      val decoded = BinlogWire.readBinlogFiles(spark,
        s"${m.fromDir}/stream-$i", tableCols)
      // the DDL broadcast means every old stream carries an identical
      // copy — keep stream 0's only, or the stitched view would apply
      // each DDL fromStreams times
      if (i == 0) decoded
      else decoded.filter(col("op") =!= "DDL")
    }
    val old = oldParts.reduce(_.unionByName(_))
      .filter(col("tso") <= m.barrierTso)
      .filter(col("op") === "DDL" || newStreamCol(m.to) === j)
    // a stream no new-generation transaction hashed to yet has no dir
    // (the writers create dirs on first emission) — its stitched view
    // is just the re-hashed old generation
    val freshDir = new Path(s"$toDir/stream-$j")
    if (!graft.util.HadoopIo.fsOf(freshDir).exists(freshDir))
      old.orderBy(col("tso"))
    else {
      val fresh = BinlogWire.readBinlogFiles(spark, s"$toDir/stream-$j",
          tableCols)
        .filter(col("tso") > m.barrierTso)
      old.unionByName(fresh).orderBy(col("tso"))
    }
  }
}
