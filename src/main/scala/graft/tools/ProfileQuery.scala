package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Per-job profiler for a declared query under the Bench config: runs a
  * warm pass, then one timed pass with a listener recording every Spark
  * job's wall time and description — the "which action inside this
  * operator is the expensive one" measurement the optimization guide
  * (§1) starts from, without the UI (disabled in the sandbox).
  * Usage: sbt "runMain graft.tools.ProfileQuery <sfDir> <query> [query..]"
  */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val scratch = new java.io.File(
      if (new java.io.File("/dev/shm").isDirectory) "/dev/shm/graft-prof"
      else System.getProperty("java.io.tmpdir"))
    scratch.mkdirs()
    System.setProperty("java.io.tmpdir", scratch.getAbsolutePath)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.local.dir", s"${scratch.getAbsolutePath}/spark-local")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.hadoop.fs.file.impl", "graft.util.NoChmodLocalFs")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.streaming.pollingDelay", "1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    final case class Job(id: Int, desc: String, start: Long,
      var end: Long = 0L, var stages: Int = 0, var tasks: Int = 0)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, Job]()
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val desc = Option(j.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(Option(j.properties)
            .flatMap(p => Option(p.getProperty("callSite.short"))))
          .getOrElse("")
        val job = Job(j.jobId, desc, j.time)
        job.stages = j.stageInfos.size
        job.tasks = j.stageInfos.map(_.numTasks).sum
        jobs.put(j.jobId, job)
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        Option(jobs.get(j.jobId)).foreach(_.end = j.time)
      }
    }

    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      // warm pass (JIT, codegen cache, staged inputs)
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      jobs.clear()
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val total = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.removeSparkListener(listener)
      Thread.sleep(200) // let listener events drain
      println(s"===== $name total=${f"$total%.3f"}s jobs=${jobs.size} =====")
      import scala.jdk.CollectionConverters._
      val all = jobs.values.asScala.toSeq.sortBy(_.start)
      val sumMs = all.map(j => math.max(0L, j.end - j.start)).sum
      println(f"sum(job wall)=${sumMs / 1000.0}%.3fs (gaps = driver/plan time)")
      all.foreach { j =>
        val dur = math.max(0L, j.end - j.start)
        println(f"  job ${j.id}%4d ${dur}%6d ms stages=${j.stages}%2d tasks=${j.tasks}%4d  ${j.desc.take(110)}")
      }
    }
    spark.stop()
  }
}
