package graft.jobs

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.SparkSpec

class GlobalBinlogJobSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s"2024-01-01 $s")

  private def ev(tso: Long, txnId: Long, dn: String, trace: String,
      op: String, time: Timestamp, table: String = "t") =
    (tso, txnId, dn, trace, op, "app", table, time,
      Map.empty[String, String], Map("v" -> tso.toString), null: String, 1L)

  private val cols = Seq("tso", "txnId", "partitionId", "traceId", "op",
    "schemaName", "tableName", "tsoTime", "before", "after", "ddl", "serverId")

  test("SparkEntry.entry (flagship) yields rows on sf0.001") {
    val out = graft.SparkEntry.entry(spark)
    assert(out.count() > 0)
    val tsos = out.select($"commit_tso").as[Long].collect()
    assert(tsos.toSeq == tsos.sorted.toSeq)
  }

  test("multi-DN merge: commit gate, XA fusion, heartbeat gate, total order") {
    // window 1 (00:00): complete on both DNs. window 2 (00:01): dn2 silent.
    val dn1 = Seq(
      ev(10L, 1L, "dn1", "01", "INSERT", ts("00:00:05")),
      ev(11L, 1L, "dn1", "02", "UPDATE", ts("00:00:06")),
      ev(12L, 1L, "dn1", "~c", "COMMIT", ts("00:00:07")),
      // XA txn 2: participant on dn1, commit tso 20 shared with dn2's part
      ev(19L, 2L, "dn1", "01", "INSERT", ts("00:00:10")),
      ev(20L, 2L, "dn1", "~c", "COMMIT", ts("00:00:11")),
      // txn 5 in window 2 — window incomplete, must be held back
      ev(70L, 5L, "dn1", "01", "INSERT", ts("00:01:05")),
      ev(71L, 5L, "dn1", "~c", "COMMIT", ts("00:01:06")),
      ev(1L, 100L, "dn1", "hb", "HEARTBEAT", ts("00:00:01")),
      ev(60L, 101L, "dn1", "hb", "HEARTBEAT", ts("00:01:01"))
    ).toDF(cols: _*)
    val dn2 = Seq(
      // XA txn 3 on dn2: same commit tso 20 → fuses with txn 2
      ev(18L, 3L, "dn2", "01", "DELETE", ts("00:00:09")),
      ev(20L, 3L, "dn2", "~c", "COMMIT", ts("00:00:11")),
      // txn 4: no commit marker → dropped
      ev(30L, 4L, "dn2", "01", "INSERT", ts("00:00:20")),
      ev(2L, 102L, "dn2", "hb", "HEARTBEAT", ts("00:00:02"))
      // note: NO dn2 heartbeat in window 2
    ).toDF(cols: _*)

    val out = GlobalBinlogJob.run(Seq(dn1, dn2), "1 minute")
    val rows = out.select($"commit_tso", $"parties", $"n_events")
      .as[(Long, Seq[String], Long)].collect().toSeq

    // txn1 (tso 12, dn1 only) and fused XA txn (tso 20, both DNs) released;
    // txn4 uncommitted dropped; txn5 held back (incomplete window 2)
    assert(rows.map(_._1) == Seq(12L, 20L))
    val xa = rows.find(_._1 == 20L).get
    assert(xa._2.toSet == Set("dn1", "dn2"))
    assert(xa._3 == 2L) // one event from each participant
    // intra/inter ordering: events of the fused txn are tso-ordered
    val xaEvents = out.filter($"commit_tso" === 20L)
      .select($"events").head().getSeq[org.apache.spark.sql.Row](0)
    assert(xaEvents.map(_.getString(0)) == Seq("01", "01"))
    assert(out.columns.contains("events"))
  }
}
