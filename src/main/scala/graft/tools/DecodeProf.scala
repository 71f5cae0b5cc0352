package graft.tools

import org.apache.spark.sql.SparkSession

/** Wire-decode throughput probe: read a produced wire dir through the
  * registry decode and report MB/s. `runMain graft.tools.DecodeProf
  * <wireDir> [tables]` — tables default to the rehearsal registry. */
object DecodeProf {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt
    val spark = SparkSession.builder().appName("graft-decode-prof")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val reg: Map[(String, String), Seq[String]] =
      (("db", "hot") +: (0 until 6).map(i => ("db", s"t$i")))
        .map(t => t -> Seq("k", "seq", "v")).toMap
    val bytes = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("binlog.")).map(_.length()).sum
    val t0 = System.nanoTime()
    val n = graft.sinks.BinlogWire.readBinlogFiles(spark, dir, reg).count()
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"[prof] decoded $n rows / ${bytes / 1e6}%.0f MB in " +
      f"$secs%.1f s = ${bytes / 1e6 / secs}%.1f MB/s aggregate " +
      f"(${new java.io.File(dir).listFiles().count(_.getName.startsWith("binlog."))} files/tasks)")
    spark.stop()
  }
}
