package graft.jobs

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.{Filters, TxnApplier}

/** Full-copy → incremental handoff: the snapshot position recorded by the
  * bootstrap is exactly where the incremental stream picks up — no change
  * double-applied, none lost, across restarts. */
class HandoffJobSpec extends SparkSpec {
  import spark.implicits._

  private val nAccounts = 8L
  private val total = nAccounts * 1000L

  private val transfers = (1L to 12L)
    .map(t => (t, (t % nAccounts) + 1, ((t + 3) % nAccounts) + 1, t * 10))

  private def deltas = transfers.flatMap { case (t, from, to, amt) =>
    Seq((t, 2 * t, from, -amt), (t, 2 * t + 1, to, amt))
  }.toDF("tso", "seq", "acct", "delta")

  /** Change-stream rows (with replica-filter routing columns). */
  private def changeBatch = {
    val w = Window.partitionBy($"acct").orderBy($"seq")
    deltas.select($"acct", $"seq", lit("UPDATE").as("op"),
      (lit(1000L) + sum($"delta").over(w)).as("balance"), $"tso",
      lit("bank").as("schemaName"), lit("accounts").as("tableName"))
  }

  /** Source state AS OF `tso`: balances with every change ≤ tso folded. */
  private def snapshotAt(tso: Long) = {
    val net = deltas.filter($"tso" <= tso)
      .groupBy($"acct").agg(sum($"delta").as("net"))
    (1L to nAccounts).map(a => (a, 0L, "INSERT", 1000L))
      .toDF("acct", "seq", "op", "balance")
      .join(net, Seq("acct"), "left")
      .select($"acct", $"seq", $"op",
        ($"balance" + coalesce($"net", lit(0L))).as("balance"))
  }

  private def finalBalances = {
    val net = transfers.foldLeft(Map.empty[Long, Long].withDefaultValue(0L)) {
      case (m, (_, f, to, amt)) => m.updated(f, m(f) - amt).updated(to, m(to) + amt)
    }
    (1L to nAccounts).map(a => a -> (1000L + net(a))).toMap
  }

  test("snapshot at tso 6 + incremental tail == full history") {
    val dir = java.nio.file.Files.createTempDirectory("graft-handoff").toString
    val (src, target) = (s"$dir/src", s"$dir/target")
    changeBatch.write.parquet(src)
    val q = HandoffJob.run(spark, snapshotAt(6L), snapshotTso = 6L,
      src, changeBatch.schema, Filters.ReplicaSpec(doDbs = Seq("bank")),
      "schemaName", "tableName", Seq("acct"), "seq", "op", "tso",
      target, s"$dir/ckpt", nBuckets = 4, txnsPerCommit = 3)
    q.awaitTermination(120000)
    // final state = full-history fold (nothing doubled from tso <= 6,
    // nothing lost from tso > 6)
    val got = TxnApplier.readCurrent(spark, target)
      .select($"acct", $"balance").as[(Long, Long)].collect().toMap
    assert(got == finalBalances)
    // the invariant holds at EVERY observable state (snapshot included)
    TxnApplier.versions(target).foreach { v =>
      val s = TxnApplier.readVersion(spark, target, v)
        .agg(sum($"balance")).head().getLong(0)
      assert(s == total, s"invariant broken at version $v")
    }
    // incremental resumed exactly at the snapshot position
    assert(TxnApplier.currentCommit(target).exists(_.lastTso == 12L))

    // restart re-enters run: already-bootstrapped target goes straight to
    // INCREMENTAL; a fresh checkpoint replays the source, applyBatch
    // filters everything at or below lastTso — nothing doubles
    val vsBefore = TxnApplier.versions(target)
    val q2 = HandoffJob.run(spark, snapshotAt(6L), snapshotTso = 6L,
      src, changeBatch.schema, Filters.ReplicaSpec(doDbs = Seq("bank")),
      "schemaName", "tableName", Seq("acct"), "seq", "op", "tso",
      target, s"$dir/ckpt2", nBuckets = 4, txnsPerCommit = 3)
    q2.awaitTermination(120000)
    assert(TxnApplier.versions(target) == vsBefore)
    assert(TxnApplier.readCurrent(spark, target)
      .select($"acct", $"balance").as[(Long, Long)].collect().toMap ==
      finalBalances)
  }

  test("replica filter scopes the incremental stream") {
    val dir = java.nio.file.Files.createTempDirectory("graft-handoff-f").toString
    val (src, target) = (s"$dir/src", s"$dir/target")
    // interleave a foreign schema's rows — they must not reach the target
    changeBatch.unionByName(
        changeBatch.withColumn("schemaName", lit("other"))
          .withColumn("balance", lit(-999999L)))
      .write.parquet(src)
    val q = HandoffJob.run(spark, snapshotAt(0L), snapshotTso = 0L,
      src, changeBatch.schema, Filters.ReplicaSpec(doDbs = Seq("bank")),
      "schemaName", "tableName", Seq("acct"), "seq", "op", "tso",
      target, s"$dir/ckpt", nBuckets = 4, txnsPerCommit = 4)
    q.awaitTermination(120000)
    val got = TxnApplier.readCurrent(spark, target)
      .select($"acct", $"balance").as[(Long, Long)].collect().toMap
    assert(got == finalBalances)
  }
}
