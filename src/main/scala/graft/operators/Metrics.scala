package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pipeline metrics taps.
  *
  * Reference semantics: RtRecordFilter is a pass-through stage that
  * records per-stage latency/row counts (polardbx-cdc-task/.../extractor/
  * filter/RtRecordFilter.java:30); MergeMetrics/ExtractorMetrics keep
  * EPS/BPS, delay, and pass counters (task/.../metrics/MergeMetrics.java).
  *
  * Spark restatement: `Dataset.observe` — metrics ride the existing job
  * (zero extra passes, collected on the driver via QueryExecutionListener
  * or StreamingQueryListener), exactly the pass-through-tap shape. Delay =
  * now − max event time, the merge-delay formula
  * (LogEventMerger.java:347-349).
  */
object Metrics {

  /** Pass-through tap: counts + null-key count + max position. Read the
    * values from the observation listener after an action. */
  def tap(df: DataFrame, name: String, tsoCol: String, keyCol: String): DataFrame =
    df.observe(name,
      count(lit(1)).as("rows"),
      sum(when(col(keyCol).isNull, 1).otherwise(0)).as("null_keys"),
      max(col(tsoCol)).as("max_tso"))

  /** Merge-delay column for event-time lag dashboards:
    * now − tso physical time, in seconds. */
  def mergeDelaySeconds(tsoTimeCol: Column): Column =
    (unix_timestamp(current_timestamp()) - unix_timestamp(tsoTimeCol))
      .cast("long")

  /** Windowed EPS (events/sec) over an event-time column. */
  def eps(df: DataFrame, tsCol: String, windowLen: String = "1 minute"): DataFrame =
    df.groupBy(window(col(tsCol), windowLen).as("w"))
      .agg(count(lit(1)).as("events"))
      .withColumn("eps", col("events") /
        (col("w.end").cast("long") - col("w.start").cast("long")))
}
