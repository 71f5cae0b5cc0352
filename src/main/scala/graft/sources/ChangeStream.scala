package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.ChangeEvent

/** Adapter from the driver's `events` fixture to the engine's
  * `ChangeEvent` envelope (FIXTURES.md role mapping: event_id = TSO/seq,
  * user_id = transaction key, event_type = operation, props = payload).
  * Synthesizes the per-transaction COMMIT marker the stateful assembler
  * expects (the fixture is an already-committed history, so every
  * transaction's last event is followed by its commit).
  */
object ChangeStream {

  /** Map fixture rows to ChangeEvents; op mapping mirrors q44
    * (signup→INSERT, error→DELETE, else UPDATE). */
  def fromEvents(events: DataFrame): DataFrame =
    events.select(
      col("event_id").as("tso"),
      col("user_id").as("txnId"),
      lit("dn1").as("partitionId"),
      format_string("%010d", col("event_id")).as("traceId"),
      when(col("event_type") === "signup", "INSERT")
        .when(col("event_type") === "error", "DELETE")
        .otherwise("UPDATE").as("op"),
      lit("app").as("schemaName"),
      lit("events").as("tableName"),
      col("ts").as("tsoTime"),
      map().cast("map<string,string>").as("before"),
      map(lit("value"), col("value").cast("string")).as("after"),
      lit(null).cast("string").as("ddl"),
      lit(1L).as("serverId"))

  /** Append one COMMIT marker per transaction (after its max tso). */
  def withCommits(changeEvents: DataFrame): DataFrame = {
    val commits = changeEvents.groupBy(col("txnId"))
      .agg(max(col("tso")).as("tso"), max(col("tsoTime")).as("tsoTime"))
      .select(col("tso"), col("txnId"), lit("dn1").as("partitionId"),
        lit("~commit").as("traceId"), lit("COMMIT").as("op"),
        lit("app").as("schemaName"), lit("events").as("tableName"),
        col("tsoTime"),
        map().cast("map<string,string>").as("before"),
        map().cast("map<string,string>").as("after"),
        lit(null).cast("string").as("ddl"), lit(1L).as("serverId"))
    changeEvents.unionByName(commits)
  }

  def toDataset(df: DataFrame)(implicit spark: SparkSession): Dataset[ChangeEvent] = {
    import spark.implicits._
    df.as[ChangeEvent]
  }
}
