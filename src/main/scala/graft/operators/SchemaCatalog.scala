package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-travel schema catalog: fold a DDL log into versioned table schemas
  * and resolve each change event against the schema current at its TSO.
  *
  * Reference semantics: MemoryTableMeta replays DDL text to maintain the
  * schema repository (polardbx-cdc-canal/.../tsdb/MemoryTableMeta.java:
  * 82-147), PolarDbXTableMetaManager resolves row events against it as of
  * their position (polardbx-cdc-meta/.../PolarDbXTableMetaManager.java:103),
  * with snapshot + rollback modes (meta/RollbackMode.java).
  *
  * Spark restatement: the DDL log is data — (tso, schemaName, tableName,
  * schemaJson). Versioning = a window: each DDL row's validity interval is
  * [tso, next tso for the same table). Resolution = the as-of join from
  * AsOfJoin (broadcast — schema catalogs are always small relative to the
  * event stream, even with millions of DDLs).
  */
object SchemaCatalog {

  /** Fold a DDL log into versioned dimension rows with validity intervals:
    * (schemaName, tableName, schemaJson, valid_from, valid_to). */
  def versions(ddlLog: DataFrame, tsoCol: String = "tso"): DataFrame = {
    val w = Window.partitionBy(col("schemaName"), col("tableName"))
      .orderBy(col(tsoCol))
    ddlLog
      .withColumn("valid_from", col(tsoCol))
      .withColumn("valid_to",
        coalesce(lead(col(tsoCol), 1).over(w), lit(Long.MaxValue)))
      .drop(tsoCol)
  }

  /** Snapshot: the schema of every table as of a given TSO (RollbackMode
    * SNAPSHOT_EXACTLY analog — used to bootstrap a restarted pipeline). */
  def snapshotAt(ddlLog: DataFrame, tso: Long, tsoCol: String = "tso"): DataFrame = {
    val w = Window.partitionBy(col("schemaName"), col("tableName"))
      .orderBy(col(tsoCol).desc)
    ddlLog.filter(col(tsoCol) <= tso)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Resolve events against their as-of schema version: broadcast range
    * join on (schemaName, tableName) with tso ∈ [valid_from, valid_to). */
  def resolve(events: DataFrame, ddlLog: DataFrame,
      eventTsoCol: String = "tso"): DataFrame =
    AsOfJoin.broadcastAsOf(events, versions(ddlLog),
      Seq("schemaName", "tableName"), eventTsoCol, "valid_from", "valid_to")

  /** Resolve events against a *raw DDL-text* log — the MemoryTableMeta.apply
    * path end-to-end (canal/.../tsdb/MemoryTableMeta.java:122-147): parse +
    * fold the DDL strings into versioned schemas (DdlParser.foldDdlLog),
    * then as-of join. rawDdlLog columns: (tso, schemaName = session default
    * schema, ddl = statement text). */
  def resolveDdlText(events: DataFrame, rawDdlLog: DataFrame,
      eventTsoCol: String = "tso"): DataFrame =
    resolve(events, DdlParser.foldDdlLog(rawDdlLog), eventTsoCol)

  /** Restart-path resolution (RollbackMode.SNAPSHOT_EXACTLY analog):
    * bootstrap the catalog from a schema snapshot taken at `snapTso` and
    * replay only the raw DDL text issued after it — never the full
    * history. Events with tso < snapTso resolve to no schema (they
    * precede the bootstrap), matching a restarted pipeline's horizon. */
  def resolveFromSnapshot(events: DataFrame, snapshot: DataFrame,
      snapTso: Long, rawDdlSince: DataFrame,
      eventTsoCol: String = "tso"): DataFrame =
    resolve(events, DdlParser.foldDdlLogFrom(snapshot, snapTso, rawDdlSince),
      eventTsoCol)

  /** Consistency check (meta/ConsistencyChecker.java analog): compare the
    * catalog's folded state as of `tso` against an authoritative snapshot
    * (the reference compares MemoryTableMeta to information_schema).
    * Returns one row per disagreeing table: status ∈ missing_in_fold /
    * missing_in_auth / mismatch — empty means the fold replayed the DDL
    * history faithfully. A full outer join on (schemaName, tableName);
    * both sides are catalog-sized (bounded), never event-stream-sized. */
  def consistencyDiff(ddlLog: DataFrame, authoritative: DataFrame,
      tso: Long, tsoCol: String = "tso"): DataFrame = {
    val fold = snapshotAt(ddlLog, tso, tsoCol)
      .filter(col("schemaJson").isNotNull)
      .select(col("schemaName"), col("tableName"),
        col("schemaJson").as("fold_json"))
    val auth = authoritative
      .select(col("schemaName"), col("tableName"),
        col("schemaJson").as("auth_json"))
    fold.join(auth, Seq("schemaName", "tableName"), "full_outer")
      .withColumn("status",
        when(col("auth_json").isNull, lit("missing_in_auth"))
          .when(col("fold_json").isNull, lit("missing_in_fold"))
          .when(col("fold_json") =!= col("auth_json"), lit("mismatch")))
      .filter(col("status").isNotNull)
  }
}
