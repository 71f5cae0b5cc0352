package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Per-Spark-job wall-time triage for one SparkEntry query: prints every
  * job the query launches with its duration and first-stage name, so a
  * query whose phases hide many small actions (applier loops, schema
  * probes) shows exactly where driver round-trips go.
  *
  * runMain graft.tools.JobProf q61_handoff [sfDir]
  */
object JobProf {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q60_txn_apply")
    val sfDir = args.lift(1).getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val lines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(js.stageInfos.lastOption.map(_.name)).getOrElse("?")
        starts.put(js.jobId, (System.nanoTime(), desc.take(120)))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(starts.get(je.jobId)).foreach { case (t0, desc) =>
          lines.add(f"job ${je.jobId}%3d ${(System.nanoTime() - t0) / 1e9}%7.2f s  $desc")
        }
      }
    })
    val fn = graft.SparkEntry.queries(name)
    // warm pass then measured pass — steady-state job costs
    fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    Thread.sleep(500) // let queued listener events drain
    lines.clear()
    val t0 = System.nanoTime()
    fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    val total = (System.nanoTime() - t0) / 1e9
    Thread.sleep(500)
    lines.forEach(l => println(s"[jobprof] $l"))
    println(f"[jobprof] $name total $total%.2f s over ${lines.size} jobs")
    spark.stop()
  }
}
