package graft.jobs

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.model.GtidSet
import graft.operators.TxnApplier
import graft.sinks.BinlogWire
import graft.streaming.CdcBinlog

/** The reference QA suite's TRANSFER consistency scenario
  * (polardbx-cdc-test/.../binlog/TransferTest.java): random money
  * transfers — including CROSS-DN XA transactions whose two branches
  * share one commit TSO — flow DN logs → live Global-Binlog production
  * → wire replica, and the conservation invariant (total balance
  * constant) must hold not just at the end but at EVERY committed
  * version of the downstream target: a transfer is atomic or absent,
  * never half-visible. TxnApplier's versioned commits make the
  * invariant directly assertable per txn boundary. */
class TransferConsistencySpec extends SparkSpec {
  import spark.implicits._

  private val reg = Map(
    ("bank", "account") -> Seq("id", "seq", "balance"),
    ("bank", "hb") -> Seq("k"))

  test("random XA transfers: sum(balance) invariant at EVERY downstream commit version") {
    val rnd = new scala.util.Random(20260815L)
    val root = java.nio.file.Files.createTempDirectory("graft-transfer")
    val (d1, d2) = (s"$root/dn1", s"$root/dn2")
    Seq(d1, d2).foreach(d => java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(d)))
    val out = s"$root/out"
    val sid1 = java.util.UUID.fromString(
      "0a1b2c3d-1717-4444-3333-000000000001")
    val sid2 = java.util.UUID.fromString(
      "0a1b2c3d-1717-4444-3333-000000000002")

    // 10 accounts, 100 each; account -> DN by parity (a sharded bank)
    val nAccounts = 10
    val balances = scala.collection.mutable.Map(
      (0 until nAccounts).map(_ -> 100L): _*)
    def dnOf(acct: Int): Int = acct % 2

    // 20 transfers at tso 1..20; roughly half are CROSS-DN (XA): the
    // debit and credit rows go to DIFFERENT DN logs under ONE txnId
    // and ONE commit tso — the merger must fuse and the replica must
    // apply them atomically
    case class Leg(tso: Long, acct: Int, balBefore: Long, balAfter: Long)
    val legsByDn = Array(Vector.newBuilder[Leg], Vector.newBuilder[Leg])
    var crossDn = 0
    (1L to 20L).foreach { tso =>
      val from = rnd.nextInt(nAccounts)
      var to = rnd.nextInt(nAccounts)
      while (to == from) to = rnd.nextInt(nAccounts)
      if (dnOf(from) != dnOf(to)) crossDn += 1
      val amount = 1L + rnd.nextInt(10)
      val fb = balances(from); val tb = balances(to)
      balances(from) = fb - amount
      balances(to) = tb + amount
      legsByDn(dnOf(from)) += Leg(tso, from, fb, fb - amount)
      legsByDn(dnOf(to)) += Leg(tso, to, tb, tb + amount)
    }
    assert(crossDn >= 5, s"seed must yield XA coverage, got $crossDn")

    def legDf(legs: Seq[Leg], hbTso: Long) = {
      val rows = legs.map(l =>
        (l.tso, l.tso, "UPDATE", "bank", "account",
          Map("id" -> l.acct.toString, "seq" -> (l.tso - 1).toString,
            "balance" -> l.balBefore.toString),
          Map("id" -> l.acct.toString, "seq" -> l.tso.toString,
            "balance" -> l.balAfter.toString),
          null: String, 1700000000L)) :+
        ((hbTso, hbTso, "INSERT", "bank", "hb",
          Map.empty[String, String], Map("k" -> hbTso.toString),
          null: String, 1700000000L))
      rows.toDF("tso", "txnId", "op", "schemaName", "tableName",
        "before", "after", "ddl", "tsoTime")
    }
    def publish(df: org.apache.spark.sql.DataFrame, sid: java.util.UUID,
        intoDir: String): Unit = {
      val d = java.nio.file.Files
        .createTempDirectory("graft-transfer-w").toString
      BinlogWire.writeChangeStreamBinlogFiles(
        df.coalesce(1).sortWithinPartitions("tso"), reg, d,
        checksummed = true, gtidSid = Some(sid),
        priorExecuted = GtidSet.Empty)
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(d, "binlog.000000"),
        java.nio.file.Paths.get(intoDir, "binlog.000000"))
      ()
    }
    publish(legDf(legsByDn(0).result(), 100L), sid1, d1)
    publish(legDf(legsByDn(1).result(), 101L), sid2, d2)

    // produce the global binlog from the two DN logs
    val srvs = Seq(d1, d2).map(d =>
      new graft.sinks.BinlogDumpServer(d, "repl", "pw"))
    try {
      val q = CdcBinlog.start(spark,
        Seq(("dn1", "localhost", srvs(0).port),
          ("dn2", "localhost", srvs(1).port)),
        "repl", "pw", reg, out, s"$root/ckpt", s"$root/work",
        numPartitions = 2, heartbeatTables = Set(("bank", "hb")),
        trigger = Trigger.AvailableNow())
      q.awaitTermination()
    } finally srvs.foreach(_.close())

    // the replica: bootstrap the initial 10x100 state, then apply the
    // produced log one transaction per commit — every version is a
    // transaction boundary
    val targetDir = s"$root/target"
    TxnApplier.bootstrap(
      (0 until nAccounts).map(a => (a.toLong, 0L, 100L))
        .toDF("id", "seq", "balance"),
      Seq("id"), targetDir, 4)
    val q2 = WireReplicaJob.start(spark, out, reg, "bank", "account",
      Seq("id" -> "bigint", "seq" -> "bigint", "balance" -> "bigint"),
      Seq("id"), "seq", targetDir, s"$root/replica-ckpt", 4,
      txnsPerCommit = 1)
    q2.awaitTermination()

    // final state matches the fixture's books exactly
    val finalState = TxnApplier.readCurrent(spark, targetDir)
      .select($"id", $"balance").as[(Long, Long)].collect().toMap
    assert(finalState == balances.map { case (a, b) => a.toLong -> b }
      .toMap)

    // THE invariant: at every committed version — bootstrap, and one
    // per applied transaction — the bank holds exactly 1000. A split
    // transaction (one XA branch visible without the other) would
    // break conservation at its version.
    val versions = TxnApplier.versions(targetDir)
    assert(versions.size >= 21,
      s"one version per txn expected, got ${versions.size}")
    versions.foreach { v =>
      val sum = TxnApplier.readVersion(spark, targetDir, v)
        .agg(org.apache.spark.sql.functions.sum($"balance"))
        .head().getLong(0)
      assert(sum == 1000L,
        s"version $v leaked money: total $sum — a transaction was " +
          "half-applied")
    }
  }
}
