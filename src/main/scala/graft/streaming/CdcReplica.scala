package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.jobs.{LiveReplicaJob, WireReplicaJob}
import graft.operators.{Staged, TxnApplier}

/** THE streaming deployment call: the `graft-cdc` source wired to the
  * routed transaction-preserving apply as ONE checkpointed
  * StreamingQuery — the Structured Streaming analog of
  * [[graft.jobs.LiveReplicaJob.run]], with Spark owning triggers,
  * offsets, restart recovery, progress metrics, and the streaming UI.
  *
  * Per micro-batch: the decoded multi-table change batch stages once
  * (so the multi-pass DDL-aware routing never re-reads the source),
  * applies through [[WireReplicaJob.applyRoutedWithDdl]] (per-table
  * committed-TSO gates make replayed batches exactly-once; in-stream
  * ADD/DROP evolve metadata-only, MODIFY/CHANGE/RENAME rebuild in
  * place), the wire name registry's evolution persists to the
  * `registryDir` sidecar (the NEXT batch's decode reads it through the
  * source's registryDir option), and an optional vacuum schedule
  * reclaims rebuild-superseded target versions.
  *
  * Restart story: kill the query, start it again with the same
  * `checkpointDir` — the offset log holds the per-DN executed GTID
  * sets, so the replica resumes at the last committed batch; repoint
  * `endpoints` at a promoted source across the restart and the same
  * checkpoint keeps the position (GTID cursors name transactions, not
  * files). The registry sidecar carries column renames across the
  * restart the same way it does for the poll-loop runner.
  */
object CdcReplica {

  def start(spark: SparkSession,
      endpoints: Seq[(String, String, Int)],
      user: String, password: String,
      tableCols: Map[(String, String), Seq[String]],
      targets: Seq[WireReplicaJob.TableTarget],
      checkpointDir: String, stagingDir: String, registryDir: String,
      txnsPerCommit: Int = 8,
      vacuumEveryBatches: Long = 0L,
      trigger: Trigger = Trigger.ProcessingTime(0L),
      maxBytesPerPoll: Long = CdcConf.DefaultMaxBytesPerPoll,
      startExecuted: Map[String, String] = Map.empty,
      soTimeoutMs: Int = 30000,
      serverId: Long = 12345L,
      applyMode: TxnApplier.ApplyMode = TxnApplier.ApplyMode.Auto(),
      compactAfter: Int = 32,
      compactMaxBuckets: Int = Int.MaxValue): StreamingQuery = {
    // the option strings reuse the sidecar/offset delimiters — refuse
    // names that would corrupt them (same guard family as saveRegistry)
    endpoints.foreach { case (dn, _, _) =>
      require(!dn.exists(c => "\"\\,;=@/".contains(c) || c.isWhitespace),
        s"DN name '$dn' carries option/offset/path delimiters")
    }
    tableCols.foreach { case ((s, t), cols) =>
      require(!(s + t).exists(";:,".contains(_)) && !s.contains("."),
        s"table name '$s'.'$t' carries option delimiters")
      require(cols.forall(c => !c.exists(";:,".contains(_))),
        s"column names of '$s'.'$t' carry option delimiters")
    }
    val reader = spark.readStream.format("graft-cdc")
      .option("endpoints",
        endpoints.map { case (dn, h, p) => s"$dn@$h:$p" }.mkString(","))
      // a replica's upstream is a PRODUCED wire log (writer-enforced
      // per-SID tso order), so the compact range-claim cursor is sound
      // — without it, a fan-out stream's sparse gno space grows the
      // streaming offset O(consumed transactions) (20 MB per batch at
      // the sf1 rehearsal scale)
      .option("rangeClaimOffsets", "true")
      .option("user", user).option("password", password)
      .option("tables", tableCols.map { case ((s, t), cols) =>
        s"$s.$t:${cols.mkString(",")}"
      }.mkString(";"))
      .option("registryDir", registryDir)
      .option("maxBytesPerPoll", maxBytesPerPoll.toString)
      .option("soTimeoutMs", soTimeoutMs.toString)
      .option("serverId", serverId.toString)
    val withStart =
      if (startExecuted.isEmpty) reader
      else reader.option("startExecuted", startExecuted
        .map { case (dn, set) => s"$dn=$set" }.mkString(";"))
    withStart.load()
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        val staged = Staged.parquetStage(batch, stagingDir)
        // applyMode defaults AUTO here — the standing consumer is
        // exactly the workload whose COW applies go O(n²) once the
        // target grows (uniform keys touch every bucket every trigger;
        // see TxnApplier.applyBatchDelta), but a SMALL table's COW
        // apply beats delta's fixed per-trigger pipeline cost, so the
        // mode flips per table at the measured size crossover
        WireReplicaJob.applyRoutedWithDdl(staged, targets, txnsPerCommit,
          fromTso = None, applyMode = applyMode,
          compactAfter = compactAfter,
          compactMaxBuckets = compactMaxBuckets)
        val reg0 = LiveReplicaJob.resumeRegistry(registryDir, tableCols)
        val evolved = LiveReplicaJob.evolveRegistryFromBatch(staged, reg0)
        if (evolved != reg0) LiveReplicaJob.saveRegistry(registryDir, evolved)
        // cadence off Spark's MONOTONIC batchId (not a closure counter,
        // which would reset on every query restart and drift the
        // schedule): vacuum fires on batches k-1, 2k-1, … regardless of
        // how many restarts the run absorbed
        if (vacuumEveryBatches > 0 &&
            (batchId + 1) % vacuumEveryBatches == 0)
          targets.foreach { t =>
            // delta chains reference every dir they overlay — fold them
            // first so vacuum has superseded dirs to reclaim (compaction
            // otherwise only fires at the compactAfter bound); the fold
            // honors compactMaxBuckets so a bounded-pause deployment
            // doesn't cliff at vacuum cadence either (unreclaimed
            // chains just wait for the next cadence); no-ops on
            // plain/COW and un-bootstrapped targets
            TxnApplier.compactBuckets(spark, t.targetDir,
              compactMaxBuckets)
            TxnApplier.vacuum(t.targetDir)
          }
        ()
      }
      .trigger(trigger)
      .start()
  }
}
