package graft.jobs

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.TxnApplier
import graft.sinks.BinlogWire
import graft.sinks.BinlogWire._
import graft.sources.BinlogDumpClient

/** The standing LIVE replica over the real dump dialogue: poll/apply
  * triggers against a protocol-faithful server converge to the same
  * state as reading the files directly, cursors advance across
  * triggers, an un-rotated successor is quietly "no new data", and a
  * full re-poll from the start replays into the applier's position
  * gate without doubling a transaction. */
class LiveReplicaSpec extends SparkSpec {
  import spark.implicits._

  private val specs = Seq(ColSpec("acct", LongLong), ColSpec("seq", LongLong),
    ColSpec("balance", LongLong))
  private val tableCols = Map(("bank", "accounts") -> specs.map(_.name))
  private val colTypes =
    Seq("acct" -> "long", "seq" -> "long", "balance" -> "long")

  private def lastImages(dir: String): Map[Long, Long] =
    BinlogWire.readBinlogFiles(spark, dir, tableCols)
      .select(element_at($"after", "acct").cast("long"),
        element_at($"after", "seq").cast("long"),
        element_at($"after", "balance").cast("long"))
      .as[(Long, Long, Long)].collect()
      .groupBy(_._1).map { case (a, rs) => a -> rs.maxBy(_._2)._3 }

  test("poll/apply triggers: incremental convergence, kept cursors, replay gate") {
    val root = java.nio.file.Files.createTempDirectory("graft-live")
    val full = s"$root/full"
    val served = s"$root/served"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(served))
    val target = s"$root/replica"
    val staging = s"$root/stage"

    // 8 transfer txns, 4-file rotate-chained log with running balances
    val transfers = (1L to 8L).map(t => (t, (t % 6) + 1, ((t + 2) % 6) + 1, t * 5))
    val bal = scala.collection.mutable.Map[Long, Long]()
      .withDefaultValue(1000L)
    val images = transfers.flatMap { case (t, f, to, amt) =>
      bal(f) = bal(f) - amt; bal(to) = bal(to) + amt
      Seq((t, 2 * t, f, bal(f)), (t, 2 * t + 1, to, bal(to)))
    }
    val batch = images.toDF("tso", "seq", "acct", "balance")
      .select($"acct", $"seq", lit("UPDATE").as("op"), $"balance", $"tso")
      .withColumn("ts", lit(1700000000L))
    val ordered = graft.operators.MergeSort.sortedRunsGrouped(
      batch, 4, Seq("tso"), Seq("seq"))
    BinlogWire.writeTxnFramedBinlogFiles(ordered, specs, "bank", "accounts",
      "op", "ts", "tso", full, checksummed = true, rotateChain = true,
      tsoCarrier = "sequence")
    def publish(names: String*): Unit = names.foreach { n =>
      java.nio.file.Files.copy(java.nio.file.Paths.get(full, n),
        java.nio.file.Paths.get(served, n))
    }
    def state(): Map[Long, Long] = TxnApplier.readCurrent(spark, target)
      .select($"acct", $"balance").as[(Long, Long)].collect().toMap

    publish("binlog.000000", "binlog.000001")
    val srv = new graft.sinks.BinlogDumpServer(served, "repl", "pw")
    try {
      val ep0 = Seq(BinlogDumpClient.Endpoint("dn1", "localhost", srv.port,
        "repl", "pw", "binlog.000000", 4L))
      def trigger(eps: Seq[BinlogDumpClient.Endpoint]) =
        LiveReplicaJob.pollApplyOnce(spark, eps, tableCols, "bank",
          "accounts", colTypes, Seq("acct"), "seq", target, staging,
          nBuckets = 4, txnsPerCommit = 2)

      // trigger 1: the first two files apply; cursor lands on the
      // successor the rotate chain names
      val ep1 = trigger(ep0)
      assert(state() == lastImages(served))
      assert(ep1.head.binlogFile == "binlog.000002" && ep1.head.pos == 4L)

      // trigger 2 with NOTHING rotated yet: no new data, cursor kept
      val ep1b = trigger(ep1)
      assert(ep1b == ep1 && state() == lastImages(served))

      // the producer rotates twice; trigger 3 applies exactly the rest
      publish("binlog.000002", "binlog.000003")
      val ep2 = trigger(ep1b)
      assert(state() == bal.toMap)
      assert(ep2.head.binlogFile == "binlog.000004")
      val versionsDone = TxnApplier.versions(target).size

      // a full re-poll from the START replays everything into the
      // position gate: no txn doubles, no new observable state
      val ep3 = trigger(ep0)
      assert(ep3.head.binlogFile == "binlog.000004")
      assert(state() == bal.toMap)
      assert(TxnApplier.versions(target).size == versionsDone)

      // BOUNDED bootstrap: a fresh replica catching up on the full
      // history with a per-poll byte cap converges over SEVERAL
      // triggers (never one unbounded drain), to the identical state
      val target2 = s"$root/replica2"
      val staging2 = s"$root/stage2"
      var eps = ep0
      var triggers = 0
      var advanced = true
      while (advanced && triggers < 32) {
        val next = LiveReplicaJob.pollApplyOnce(spark, eps, tableCols,
          "bank", "accounts", colTypes, Seq("acct"), "seq", target2,
          staging2, nBuckets = 4, txnsPerCommit = 2,
          maxBytesPerPoll = 400L)
        advanced = next != eps
        eps = next
        triggers += 1
      }
      assert(triggers >= 3, s"cap ignored: converged in $triggers triggers")
      assert(TxnApplier.readCurrent(spark, target2)
        .select($"acct", $"balance").as[(Long, Long)].collect().toMap
        == bal.toMap)
    } finally srv.close()
  }
}
