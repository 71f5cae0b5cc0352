package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Plan-inspection main: prints the formatted physical plan of selected
  * queries and greps for the shapes the 100 TB design relies on —
  * parquet filter pushdown, pruned read schemas, broadcast joins where a
  * dimension is small, and whole-stage codegen coverage. Usage:
  *   sbt "runMain graft.tools.ExplainCheck [sfDir] [query ...]"
  */
object ExplainCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q01_scan", "q05_min_tso", "q08_asof_range_join",
        "q09_hash_join", "q17_last_image", "q22_kway_merge", "q29_json")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      println(s"===== $name =====")
      println(plan)
      val pushed = plan.contains("PushedFilters: [") &&
        !plan.contains("PushedFilters: []")
      val broadcast = plan.contains("BroadcastHashJoin")
      // NOTE: whole-stage codegen spans are only visible per-stage once AQE
      // executes; pre-execution plans hide them, so we don't report a
      // misleading per-query flag. All graft expressions are codegen-capable
      // built-ins and spark.sql.codegen.wholeStage stays at its default (on).
      println(s"[check] $name pushedFilters=$pushed broadcastJoin=$broadcast")
    }
    spark.stop()
  }
}
