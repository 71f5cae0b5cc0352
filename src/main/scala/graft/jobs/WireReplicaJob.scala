package graft.jobs

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.TxnApplier
import graft.sinks.BinlogWire

/** The standing replica fed by the WIRE, not by a parquet change stream:
  * tail a directory of MySQL binlog files (the dump service's output),
  * decode each micro-batch through the incremental parser, and replay it
  * through the transaction-preserving applier — the reference's full
  * dumper → replica hop (DumperSlave serving MysqlBinlogExtractor →
  * TransactionApplier, polardbx-cdc-rpl/.../extractor/
  * MysqlBinlogExtractor.java:55, applier/TransactionApplier.java:50-87)
  * as one Spark standing query over the engine's own wire format.
  *
  * Exactly-once across restarts composes from two independent gates:
  * file DISCOVERY is the checkpointed binaryFile source (a restart
  * resumes at the first unseen wire file), and APPLY is `TxnApplier`'s
  * committed position (a replayed or half-applied micro-batch skips
  * every transaction at or below the target's last committed TSO). A
  * crash at any point — mid-decode, mid-apply, between batch and
  * checkpoint commit — lands on a transaction boundary some source
  * commit produced.
  *
  * PRODUCER CONTRACT — one transaction per wire file: the apply gate
  * above makes a txn split across two files UNSAFE (if
  * `maxFilesPerTrigger` lands the halves in different triggers, the
  * first half commits and advances the gate, and the second half
  * replays at-or-below it and is silently dropped). Wire producers must
  * keep txns whole per file with txn-grouped range partitioning
  * (`MergeSort.sortedRunsGrouped` on the tso / (commitTso, txnId) key —
  * equal keys never split across range partitions); the writers
  * enforce it and fail the write loudly on a split or interleaved txn
  * (`BinlogWire.writeTxnFramedBinlogFiles` mark-range check,
  * `writeChangeStreamBinlogFiles` file-boundary txn check). The same
  * gate also requires files to ARRIVE in rotation order: the file
  * source delivers by modification time, so the writers stamp each
  * file's mtime monotonic with its name — a producer writing wire
  * files by other means must preserve that property.
  */
object WireReplicaJob {

  /** One replicated table's routing target: which decoded rows belong
    * to it (`schemaName`/`tableName`), how they type (`colTypes` must
    * cover `keyCols` and `seqCol`), and where they apply (its own
    * `TxnApplier` target). The reference routes every DBMSRowChange by
    * its own table to per-table apply units
    * (rpl/applier/SplitApplier.java:43-146 per-table split, dispatched
    * through ApplyHelper.java:56-61); here a target IS that unit. */
  final case class TableTarget(schemaName: String, tableName: String,
      colTypes: Seq[(String, String)], keyCols: Seq[String],
      seqCol: String, targetDir: String, nBuckets: Int) {
    def table: (String, String) = (schemaName, tableName)
  }

  /** Route one decoded multi-table batch to per-table `TxnApplier`
    * targets — the reference's SplitApplier restated: the decode side
    * already emits every table's rows (`fromWireSegments` takes the
    * full TABLE_MAP registry); this is the missing routing layer, so a
    * two-table DN stream applies through ONE poll/trigger instead of
    * two loops dialing the same DN twice.
    *
    * Position-gate discipline (what makes the routing crash-safe
    * behind ONE source cursor): every target keeps its OWN committed
    * lastTso, and the caller advances the shared source cursor
    * (file/pos, or the streaming checkpoint) only after THIS call
    * returns. A crash after table A applied but before table B leaves
    * the cursor unmoved; the re-served batch replays into A's gate
    * (skipped, at-or-below its lastTso) and applies to B — per-table
    * exactly-once without cross-table coordination.
    *
    * `decoded` is consumed once per target — CALLERS with more than
    * one target must pass a materialized frame (staged parquet; the
    * routed entry points below do) or each target re-runs the wire
    * decode. */
  def applyRouted(decoded: DataFrame, targets: Seq[TableTarget],
      txnsPerCommit: Int = 8, fromTso: Option[Long] = None,
      maxParallelTables: Int = 4,
      applyMode: TxnApplier.ApplyMode = TxnApplier.ApplyMode.Cow,
      compactAfter: Int = 32,
      compactMaxBuckets: Int = Int.MaxValue): Unit = {
    validateTargets(targets)
    // configured-but-quiet targets still bootstrap (metadata-only,
    // limit 0) on the FIRST batch: the schema sidecar must exist before
    // a table's first rows arrive, because maintenance cadences
    // (compact/vacuum over every configured target) and the DDL fold
    // read it — deferring bootstrap to first-rows would turn an early
    // ALTER into a crash loop. One driver FS check per bootstrapped
    // target per batch; the one-time empty write is schema-only.
    targets.filter(t => TxnApplier.currentCommit(t.targetDir).isEmpty)
      .foreach { t =>
        val typed = shape(decoded, t.schemaName, t.tableName,
          t.colTypes, keyCols = t.keyCols)
        TxnApplier.bootstrap(typed.limit(0).drop("op", "tso"),
          t.keyCols, t.targetDir, t.nBuckets,
          initialTso = fromTso.getOrElse(0L))
      }
    inParallel(presentTargets(decoded, targets), maxParallelTables) { t =>
      // the target's CURRENT schema and persisted rename lineage, not
      // the caller's snapshot: after an evolution/rebuild in an earlier
      // batch, a stale TableTarget (or a stale decode registry naming a
      // renamed column by its old name) must not drop or null values
      val colTypes = TxnApplier.targetSchema(t.targetDir)
        .map(_.fields.toSeq.map(f => f.name -> f.dataType.sql))
        .getOrElse(t.colTypes)
      applyOne(decoded, t, colTypes, txnsPerCommit, fromTso,
        TxnApplier.renameLineage(t.targetDir), applyMode, compactAfter,
        compactMaxBuckets)
    }
  }

  /** The targets THIS batch actually carries rows for — one tiny
    * distinct job (bounded by table count) instead of a full staged
    * image pass per absent table. A Binlog-X fan-out stream carries
    * only the tables hashed (or pinned) to it, so a consumer routing
    * the full registry would otherwise pay most of its trigger in
    * staging provably-empty frames (measured ~6 s × absent-table per
    * trigger at the sf1 rehearsal). Skipping an absent table is safe:
    * its committed lastTso gate only moves when rows apply. */
  private def presentTargets(decoded: DataFrame,
      targets: Seq[TableTarget]): Seq[TableTarget] = {
    if (targets.size <= 1) return targets
    val present = decoded
      .select(col("schemaName"), col("tableName")).distinct()
      .collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    targets.filter(t => present.contains((t.schemaName, t.tableName)))
  }

  private def applyOne(decoded: DataFrame, t: TableTarget,
      colTypes: Seq[(String, String)], txnsPerCommit: Int,
      fromTso: Option[Long],
      aliases: Map[String, Seq[String]] = Map.empty,
      applyMode: TxnApplier.ApplyMode = TxnApplier.ApplyMode.Cow,
      compactAfter: Int = 32,
      compactMaxBuckets: Int = Int.MaxValue): Unit = {
    val typed = shape(decoded, t.schemaName, t.tableName, colTypes,
      aliases, t.keyCols)
    if (TxnApplier.currentCommit(t.targetDir).isEmpty)
      TxnApplier.bootstrap(typed.limit(0).drop("op", "tso"),
        t.keyCols, t.targetDir, t.nBuckets,
        initialTso = fromTso.getOrElse(0L))
    val delta = TxnApplier.useDelta(t.targetDir, applyMode)
    TxnApplier.recordModeDecision(t.targetDir, delta)
    if (delta) {
      // the standing-consumer shape: O(batch) delta commits, chains
      // folded once they reach compactAfter (amortized O(target /
      // compactAfter) per trigger — never the COW mode's every-trigger
      // touched-bucket rewrite, which is O(target) against a uniform
      // key stream and O(n²) over a long run). compactMaxBuckets < all
      // bounds the fold PAUSE per trigger (rolling per-bucket
      // incremental compaction) at the cost of chains riding a little
      // above compactAfter while the fold sweeps.
      if (TxnApplier.maxChainLength(t.targetDir) >= compactAfter)
        TxnApplier.compactBuckets(decoded.sparkSession, t.targetDir,
          compactMaxBuckets)
      TxnApplier.applyBatchDelta(typed, t.keyCols, t.seqCol, "op", "tso",
        t.targetDir, t.nBuckets, txnsPerCommit)
    } else
      TxnApplier.applyBatch(typed, t.keyCols, t.seqCol, "op", "tso",
        t.targetDir, t.nBuckets, txnsPerCommit)
    ()
  }

  /** Per-table applies run CONCURRENTLY (the reference's
    * SplitApplier.parallelExecute — tables are independent apply
    * units): each target owns its directory and its gate, so the only
    * shared object is the immutable decoded frame, and Spark schedules
    * the overlapping jobs across the cluster. Bounded by
    * `maxParallel` driver threads — trigger latency for N tables is
    * ~ceil(N/maxParallel) applies, not N. */
  private def inParallel(targets: Seq[TableTarget], maxParallel: Int)
      (body: TableTarget => Unit): Unit =
    if (targets.size <= 1 || maxParallel <= 1) targets.foreach(body)
    else {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(
        math.min(maxParallel, targets.size))
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.fromExecutor(pool)
      try {
        // await EVERY apply (lift to Try — no fail-fast): a fail-fast
        // Await would return while other tables' applies still run,
        // and the caller's retry could then race an orphaned applyBatch
        // on the same targetDir (whose _batchstage the retry deletes).
        // All finish, then the first failure rethrows.
        val done = scala.concurrent.Await.result(
          scala.concurrent.Future.sequence(targets.map(t =>
            scala.concurrent.Future(body(t))
              .transform(r => scala.util.Success(r)))),
          scala.concurrent.duration.Duration.Inf)
        done.collectFirst { case scala.util.Failure(e) => throw e }
      } finally pool.shutdown()
      ()
    }

  /** [[applyRouted]] plus DDL-IN-STREAM: the decoded batch's DDL
    * events evolve the routed targets' schemas before the row events
    * apply — the reference's replica DDL path (rpl applier dispatching
    * DDL through DdlApplyHelper alongside SplitApplier's row routing).
    *
    * Semantics and limits, stated loudly:
    *  - ADD COLUMN: metadata-only evolution
    *    ([[TxnApplier.evolveSchema]]); rows decoded BEFORE the DDL
    *    carry no value for the new column and apply as NULL (string
    *    images lack the key), rows after carry their values.
    *  - DROP COLUMN (non-key, non-seq): the column stops being
    *    selected; dropping a key or the sequence column throws.
    *  - MODIFY/CHANGE/RENAME COLUMN (non-key, non-seq): metadata-only
    *    evolution would mis-read existing files, so the target is
    *    REBUILT in place ([[TxnApplier.rebuildTarget]] — cast/rename
    *    the committed state, one full rewrite, pointer-swapped at the
    *    committed txn boundary; the reference's meta layer likewise
    *    applies such DDL by rebuilding its images,
    *    meta/PolarDbXTableMetaManager.java:103). Rows whose string
    *    images carry the OLD name — decoded before the rename in the
    *    same batch, or in ANY later batch by a consumer whose decode
    *    registry is stale (the file-tail streaming replica) — land
    *    intact through an old-name fallback chain, PERSISTED in the
    *    target's `_renames` sidecar so the chain survives batches and
    *    restarts; ADDing a column whose name an old chain holds
    *    evicts that name (it now belongs to the new column).
    *  - MODIFY/CHANGE/RENAME touching a KEY or the sequence column:
    *    still refused loudly — the caller's TableTarget names them,
    *    and silently re-keying a routed target would orphan its
    *    bucketing contract.
    *  - RENAME TABLE / ALTER ... RENAME TO on a routed table: refused
    *    loudly — the decode registry would follow the new name while
    *    the routing still matched the old one, silently stopping
    *    replication; re-point the TableTarget out of band.
    *  - DDL for tables nobody routes: ignored, like their row events.
    *
    * The DDL stream is folded DRIVER-SIDE in TSO order — DDL is
    * human-scale (schema changes per trigger, not rows), the one
    * bounded collect this path adds. Idempotent across batch replays:
    * re-adding an identical column or re-dropping an absent one
    * no-ops, so the foreachBatch replay story is unchanged. Targets
    * are bootstrapped (schema-only) BEFORE the fold so evolution
    * always has a sidecar to evolve; row apply then shapes each table
    * with its target's CURRENT (possibly evolved) schema — the target
    * IS the schema state, callers never track evolution. */
  def applyRoutedWithDdl(decoded: DataFrame, targets: Seq[TableTarget],
      txnsPerCommit: Int = 8, fromTso: Option[Long] = None,
      maxParallelTables: Int = 4,
      applyMode: TxnApplier.ApplyMode = TxnApplier.ApplyMode.Cow,
      compactAfter: Int = 32,
      compactMaxBuckets: Int = Int.MaxValue): Unit = {
    import graft.operators.DdlParser
    validateTargets(targets)
    val spark = decoded.sparkSession
    import spark.implicits._
    val byTable = targets.map(t => t.table -> t).toMap
    targets.foreach { t =>
      if (TxnApplier.currentCommit(t.targetDir).isEmpty) {
        val typed = shape(decoded, t.schemaName, t.tableName,
          t.colTypes, keyCols = t.keyCols)
        TxnApplier.bootstrap(typed.limit(0).drop("op", "tso"),
          t.keyCols, t.targetDir, t.nBuckets,
          initialTso = fromTso.getOrElse(0L))
      }
    }
    val ddls = decoded
      .filter(col("op") === "DDL" && col("ddl").isNotNull)
      .select(col("tso").cast("long"), col("schemaName"), col("ddl"))
      .orderBy(col("tso"), col("ddl")) // ddl tie-break: deterministic fold
      .as[(Long, String, String)].collect()
    // DDL honors a position gate like the rows do: a statement at or
    // below max(committed row TSO, committed DDL TSO) already took
    // effect in some earlier trigger and skips — so a replayed batch
    // (even one replayed AFTER later batches, out of order) never
    // re-runs a rename whose chain has moved on. The DDL high-water
    // mark is its own sidecar (TxnApplier.ddlPosition) because row
    // position only advances with row transactions. A crash between a
    // statement's effect and its position commit replays just that
    // statement, which the hasOld/type checks absorb as a no-op.
    val ddlGate: Map[(String, String), Long] = targets.map(t =>
      t.table -> math.max(
        TxnApplier.currentCommit(t.targetDir)
          .map(_.lastTso).getOrElse(0L),
        TxnApplier.ddlPosition(t.targetDir))).toMap
    // per-table fallback chains for renamed columns: the target's
    // PERSISTED lineage (earlier batches' renames — stale-registry
    // decodes may still name those columns the old way in ANY later
    // batch) plus whatever THIS batch's statements add. Changes
    // persist back to the target's `_renames` sidecar.
    val renameAliases = scala.collection.mutable.Map(
      targets.map(t =>
        t.table -> TxnApplier.renameLineage(t.targetDir)): _*)
      .withDefaultValue(Map.empty)
    ddls.foreach { case (tso, defaultSchema, stmt) =>
      DdlParser.parseAll(stmt, defaultSchema).foreach { parsed =>
      parsed match {
        // renaming a ROUTED TABLE refuses loudly: the decode registry
        // would follow the new name while the TableTarget still routes
        // the old one — every later row would silently stop
        // replicating. Re-point the TableTarget out of band instead.
        case DdlParser.RenameTable(pairs)
            if pairs.exists(p => byTable.contains(p._1)) =>
          throw new IllegalArgumentException(
            s"RENAME TABLE on routed table(s) " +
              pairs.map(_._1).filter(byTable.contains)
                .map { case (s3, t3) => s"$s3.$t3" }.mkString(",") +
              " is unsupported online (the routing names the table); " +
              "re-point the TableTarget and restart the stream")
        case DdlParser.AlterTable(s2, t2, actions)
            if byTable.contains((s2, t2)) &&
              actions.exists(_.isInstanceOf[DdlParser.RenameTo]) =>
          throw new IllegalArgumentException(
            s"ALTER TABLE $s2.$t2 RENAME TO ... is unsupported online " +
              "(the routing names the table); re-point the TableTarget " +
              "and restart the stream")
        case DdlParser.AlterTable(s2, t2, actions)
            if byTable.contains((s2, t2)) && tso > ddlGate((s2, t2)) =>
          val t = byTable((s2, t2))
          val aliasesBefore = renameAliases(t.table)
          def curFields = TxnApplier.targetSchema(t.targetDir).getOrElse(
            sys.error(s"target ${t.targetDir}: no schema sidecar"))
            .fields.toVector
          var fields = curFields
          def guardKeySeq(n: String, what: String): Unit =
            require(!t.keyCols.contains(n) && n != t.seqCol,
              s"$what $n: key/sequence columns of routed table " +
                s"${t.schemaName}.${t.tableName} cannot change online " +
                "(the TableTarget routing names them)")
          // flush pending metadata evolution, then rebuild in place —
          // actions observe strict statement order
          def flushThen(rebuild: org.apache.spark.sql.DataFrame =>
              org.apache.spark.sql.DataFrame): Unit = {
            if (fields != curFields)
              TxnApplier.evolveSchema(t.targetDir,
                org.apache.spark.sql.types.StructType(fields))
            TxnApplier.rebuildTarget(spark, t.targetDir, t.keyCols,
              t.nBuckets, rebuild)
            fields = curFields // reload from the rebuilt sidecar
          }
          def recordRename(oldName: String, newName: String): Unit = {
            val al = renameAliases(t.table)
            // the old name inherits any chain it already headed;
            // distinct keeps a replayed statement from duplicating it
            val chain = oldName +: al.getOrElse(oldName, Seq.empty)
            renameAliases(t.table) = (al - oldName) +
              (newName ->
                (chain ++ al.getOrElse(newName, Seq.empty)).distinct)
          }
          // a REUSED name must leave every old chain: images carrying
          // it from here on belong to the NEW column, not the renamed
          // one a stale registry once called by that name
          def evictFromChains(name: String): Unit =
            renameAliases(t.table) = renameAliases(t.table)
              .map { case (k, olds) => k -> olds.filterNot(_ == name) }
          actions.foreach {
            case DdlParser.AddColumn(cd, _, _) =>
              // target layout is bucket-hashed, not ordinal — FIRST/
              // AFTER placement is presentation, appended here
              val dt = parseSqlType(cd.dataType)
              fields.find(_.name == cd.name) match {
                case Some(f) => require(f.dataType == dt,
                  s"ADD COLUMN ${cd.name}: exists as ${f.dataType}, " +
                    s"statement says $dt — rebuild the target")
                case None =>
                  fields = fields :+
                    org.apache.spark.sql.types.StructField(cd.name, dt)
                  evictFromChains(cd.name)
              }
            case DdlParser.DropColumn(n) =>
              guardKeySeq(n, "DROP COLUMN")
              fields = fields.filterNot(_.name == n)
            case DdlParser.ModifyColumn(cd, _, _) =>
              guardKeySeq(cd.name, "MODIFY COLUMN")
              val dt = parseSqlType(cd.dataType)
              require(fields.exists(_.name == cd.name),
                s"MODIFY COLUMN ${cd.name}: no such column on " +
                  s"${t.schemaName}.${t.tableName}")
              if (!fields.find(_.name == cd.name).forall(_.dataType == dt))
                flushThen(df => df.withColumn(cd.name,
                  col(cd.name).cast(dt)))
            case DdlParser.ChangeColumn(oldName, cd, _, _) =>
              // idempotent across batch replays: old gone + new
              // present at the right type is "already applied"
              guardKeySeq(oldName, "CHANGE COLUMN")
              guardKeySeq(cd.name, "CHANGE COLUMN")
              val dt = parseSqlType(cd.dataType)
              val renameNeeded = oldName != cd.name &&
                fields.exists(_.name == oldName)
              require(!renameNeeded || !fields.exists(_.name == cd.name),
                s"CHANGE COLUMN $oldName -> ${cd.name}: target name " +
                  s"already exists on ${t.schemaName}.${t.tableName} " +
                  "(a duplicate-name schema would misbind cells)")
              val curType = fields
                .find(_.name == (if (renameNeeded) oldName else cd.name))
                .map(_.dataType)
              require(curType.isDefined,
                s"CHANGE COLUMN $oldName: no such column on " +
                  s"${t.schemaName}.${t.tableName}")
              if (renameNeeded || !curType.contains(dt))
                flushThen { df =>
                  val r = if (renameNeeded)
                    df.withColumnRenamed(oldName, cd.name) else df
                  if (curType.contains(dt)) r
                  else r.withColumn(cd.name, col(cd.name).cast(dt))
                }
              if (oldName != cd.name) {
                // the NEW name may be a REUSE of a name some other
                // chain still holds (renamed away earlier): evict it
                // there first, then record this rename's own chain
                evictFromChains(cd.name)
                recordRename(oldName, cd.name)
              }
            case DdlParser.RenameColumn(oldName, newName) =>
              guardKeySeq(oldName, "RENAME COLUMN")
              guardKeySeq(newName, "RENAME COLUMN")
              val hasOld = fields.exists(_.name == oldName)
              require(hasOld || fields.exists(_.name == newName),
                s"RENAME COLUMN $oldName: no such column on " +
                  s"${t.schemaName}.${t.tableName}")
              require(!hasOld || !fields.exists(_.name == newName),
                s"RENAME COLUMN $oldName -> $newName: target name " +
                  s"already exists on ${t.schemaName}.${t.tableName} " +
                  "(a duplicate-name schema would misbind cells)")
              if (hasOld) // replay after the rebuild: already applied
                flushThen(_.withColumnRenamed(oldName, newName))
              evictFromChains(newName) // name reuse: see CHANGE above
              recordRename(oldName, newName)
            case DdlParser.AddPrimaryKey(_) | DdlParser.DropPrimaryKey |
                 DdlParser.IgnoredAction => ()
            case other => throw new IllegalArgumentException(
              s"online DDL '$other' on routed table " +
                s"${t.schemaName}.${t.tableName} is unsupported; " +
                "rebuild the target out of band")
          }
          if (fields != curFields)
            TxnApplier.evolveSchema(t.targetDir,
              org.apache.spark.sql.types.StructType(fields))
          // lineage persists BEFORE the position: a crash between the
          // two replays this statement, whose no-op checks absorb it
          if (renameAliases(t.table) != aliasesBefore)
            TxnApplier.saveRenameLineage(t.targetDir,
              renameAliases(t.table))
          TxnApplier.commitDdlPosition(t.targetDir, tso)
        case _ => () // unrouted table or non-evolution statement
      }
      }
    }
    inParallel(presentTargets(decoded, targets), maxParallelTables) { t =>
      val evolved = TxnApplier.targetSchema(t.targetDir).get.fields
        .toSeq.map(f => f.name -> f.dataType.sql)
      applyOne(decoded, t, evolved, txnsPerCommit, fromTso,
        renameAliases(t.table), applyMode, compactAfter,
        compactMaxBuckets)
    }
  }

  private def parseSqlType(t: String): org.apache.spark.sql.types.DataType =
    org.apache.spark.sql.types.StructType.fromDDL(s"c $t").head.dataType

  /** Start the wire replica for ONE replicated table.
    *
    * @param colTypes ordered (column, Spark SQL type) pairs for the
    *   decoded string images — the replica's row shape. Must include
    *   `keyCols` and `seqCol`.
    * @param tableCols the wire TABLE_MAP column-name registry passed to
    *   the decoder (schema/table → column names), as written by the
    *   encoding sink.
    * @param fromTso dump-from-TSO start cursor: replay only transactions
    *   with tso > fromTso. `BinlogCatalog.seekTso` locates the start
    *   FILE (files wholly below it are listed but never opened — decode
    *   cost is O(suffix)), and the apply gate's initial committed
    *   position is set to fromTso so the seek file's own prefix (txns at
    *   or below the cursor) skips — the reference's
    *   SearchTsoEventHandleV2 → dump hop. File granularity prunes I/O;
    *   the tso gate is the exact boundary (decode is file-scoped because
    *   TABLE_MAP state is declared per file).
    */
  def start(spark: SparkSession, wireDir: String,
      tableCols: Map[(String, String), Seq[String]],
      schemaName: String, tableName: String,
      colTypes: Seq[(String, String)], keyCols: Seq[String],
      seqCol: String, targetDir: String, checkpointDir: String,
      nBuckets: Int, txnsPerCommit: Int = 8,
      continuous: Option[String] = None,
      maxFilesPerTrigger: Int = 16,
      fromTso: Option[Long] = None): StreamingQuery =
    startRouted(spark, wireDir, tableCols,
      Seq(TableTarget(schemaName, tableName, colTypes, keyCols, seqCol,
        targetDir, nBuckets)),
      checkpointDir, txnsPerCommit, continuous, maxFilesPerTrigger,
      fromTso)

  /** Start the wire replica for a SET of replicated tables off one
    * stream — each micro-batch decodes the wire files once and routes
    * per-table through [[applyRouted]]. With more than one target the
    * decoded batch is staged to parquet first (under the checkpoint
    * dir) so N targets read the stage, never re-run the wire decode; a
    * replayed trigger overwrites the stage byte-identically, and every
    * target's own position gate drops what it already applied — see
    * [[applyRouted]] for the crash-safety argument. */
  def startRouted(spark: SparkSession, wireDir: String,
      tableCols: Map[(String, String), Seq[String]],
      targets: Seq[TableTarget], checkpointDir: String,
      txnsPerCommit: Int = 8,
      continuous: Option[String] = None,
      maxFilesPerTrigger: Int = 16,
      fromTso: Option[Long] = None,
      ddlInStream: Boolean = false): StreamingQuery = {
    // misconfiguration fails at START, not on the first trigger
    validateTargets(targets)
    val startFile = fromTso.map { t =>
      graft.sinks.BinlogCatalog.seekTso(spark, wireDir, t)._1
    }.filter(_.nonEmpty)
    val decoded = BinlogWire.tailBinlogFiles(spark, wireDir, tableCols,
      maxFilesPerTrigger, minFileName = startFile)
    val trigger = continuous match {
      case Some(interval) => Trigger.ProcessingTime(interval)
      case None => Trigger.AvailableNow()
    }
    decoded.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // no isEmpty pre-check: it would decode every wire file a first
        // time just to count; bootstrap is schema-only (limit 0) and
        // applyBatch's own staged probe short-circuits an empty batch
        val input =
          if (targets.size == 1 && !ddlInStream) batch
          else graft.operators.Staged.parquetStage(batch,
            s"$checkpointDir/_route_stage")
        if (ddlInStream)
          applyRoutedWithDdl(input, targets, txnsPerCommit, fromTso)
        else applyRouted(input, targets, txnsPerCommit, fromTso)
        ()
      }
      .start()
  }

  private[jobs] def validateTargets(targets: Seq[TableTarget]): Unit = {
    require(targets.nonEmpty, "no targets")
    require(targets.map(_.table).distinct.size == targets.size,
      "duplicate (schema, table) targets")
    require(targets.map(_.targetDir).distinct.size == targets.size,
      "two tables routed to one targetDir")
    targets.foreach { t =>
      require(t.colTypes.map(_._1).toSet
          .intersect(t.keyCols.toSet) == t.keyCols.toSet
          && t.colTypes.exists(_._1 == t.seqCol),
        s"colTypes must cover keyCols and seqCol for " +
          s"${t.schemaName}.${t.tableName}")
    }
  }

  /** Decoded wire rows → the replica's typed row shape: one table's row
    * events, each string image cast per `colTypes`. DELETE rows carry
    * their values in the BEFORE image (the after side is empty on the
    * wire), so the effective image picks by op — the applier needs the
    * key columns populated to erase the row. `aliases` gives a renamed
    * column its OLD names, newest first: rows decoded before an
    * in-batch RENAME carry the old key in their string image, and the
    * coalesce chain reads them under the new name.
    *
    * With `keyCols` given, an UPDATE whose PRIMARY KEY CHANGED
    * (before-image key ≠ after-image key) SPLITS into DELETE(before) +
    * INSERT(after): keyed by the after image alone, the old key's row
    * would silently survive in the target — the reference detects
    * exactly this and falls back to a serial delete-then-insert
    * (rpl/applier/SplitApplier.java:43-146). One pass via explode; the
    * split rows keep their own seq values and land on DIFFERENT keys,
    * so the applier's per-(txn, key) merge is unaffected. */
  def shape(decoded: DataFrame, schemaName: String, tableName: String,
      colTypes: Seq[(String, String)],
      aliases: Map[String, Seq[String]] = Map.empty,
      keyCols: Seq[String] = Seq.empty): DataFrame = {
    def imgGet(m: Column, n: String): Column = {
      val names = n +: aliases.getOrElse(n, Seq.empty)
      coalesce(names.map(a => element_at(m, a)): _*)
    }
    val keyChanged =
      if (keyCols.isEmpty) lit(false)
      else col("op") === "UPDATE" && size(col("before")) > 0 &&
        keyCols.map(k =>
          !(imgGet(col("before"), k) <=> imgGet(col("after"), k)))
          .reduce(_ || _)
    val entries = when(keyChanged,
      array(
        struct(lit("DELETE").as("o"), col("before").as("m")),
        struct(lit("INSERT").as("o"), col("after").as("m"))))
      .otherwise(array(struct(col("op").as("o"),
        when(col("op") === "DELETE", col("before"))
          .otherwise(col("after")).as("m"))))
    decoded
      .filter(col("schemaName") === schemaName &&
        col("tableName") === tableName &&
        col("op").isin("INSERT", "UPDATE", "DELETE"))
      .select(explode(entries).as("__e"), col("tso"))
      .select(colTypes.map { case (n, t) =>
        imgGet(col("__e.m"), n).cast(t).as(n)
      } ++ Seq(col("__e.o").as("op"), col("tso")): _*)
  }
}
