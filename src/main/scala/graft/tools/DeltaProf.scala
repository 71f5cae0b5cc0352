package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Micro-profile of one standing-consumer trigger's apply cost, both
  * modes, at rehearsal scale: N single-row txns across T tables,
  * txnsPerCommit groups — run with GRAFT_PROF=1 to see phase times.
  * `runMain graft.tools.DeltaProf [rows] [tables] [txnsPerCommit]`. */
object DeltaProf {
  def main(args: Array[String]): Unit = {
    val rows = if (args.length > 0) args(0).toLong else 240000L
    val tables = if (args.length > 1) args(1).toInt else 7
    val tpc = if (args.length > 2) args(2).toInt else 10000
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt
    val spark = SparkSession.builder().appName("graft-delta-prof")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-dprof")
    def mkBatch(tbl: Int, lo: Long, n: Long) =
      spark.range(lo, lo + n).select(
        ($"id" % 100000L).as("k"), $"id".as("seq"),
        lit("UPDATE").as("op"), concat(lit("v"), $"id").as("v"),
        $"id".as("tso"))
    def timed[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime(); val r = body
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val perTable = rows / tables
    (0 until tables).foreach { t =>
      val dir = s"$root/delta-t$t"
      graft.operators.TxnApplier.bootstrap(
        mkBatch(t, 0, 1).limit(0).drop("op", "tso"), Seq("k"), dir, 8)
      timed(s"applyBatchDelta t$t (${perTable} rows, tpc=$tpc)") {
        graft.operators.TxnApplier.applyBatchDelta(
          mkBatch(t, 1, perTable), Seq("k"), "seq", "op", "tso", dir, 8, tpc)
      }
    }
    (0 until tables).foreach { t =>
      val dir = s"$root/cow-t$t"
      graft.operators.TxnApplier.bootstrap(
        mkBatch(t, 0, 1).limit(0).drop("op", "tso"), Seq("k"), dir, 8)
      timed(s"applyBatch(COW) t$t (${perTable} rows, tpc=$tpc)") {
        graft.operators.TxnApplier.applyBatch(
          mkBatch(t, 1, perTable), Seq("k"), "seq", "op", "tso", dir, 8, tpc)
      }
    }
    spark.stop()
  }
}
