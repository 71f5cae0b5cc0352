package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.jobs.WireReplicaJob
import graft.model.GtidSet
import graft.operators.TxnApplier
import graft.sinks.BinlogWire

/** Randomized fuzz over the graft-cdc streaming source: seeded random
  * two-table change streams split across TWO DNs (each its own wire
  * log, own GTID sid, own rotation schedule), revealed in random
  * phases, each phase drained by a RESTARTED checkpointed streaming
  * query whose foreachBatch routes into per-table txn targets. The
  * final state of every table must equal a naive sequential fold of
  * the full op stream — across restarts, multi-DN offset bookkeeping,
  * rotations, and an extra no-new-data run (which must change
  * nothing). */
class CdcSourceFuzzSpec extends SparkSpec {
  import spark.implicits._

  private val tables = Seq("alpha", "beta")
  private val dns = Seq("dn1", "dn2")

  // (tso, seq, table, op, key, value)
  private type Op = (Long, Long, String, String, Long, String)

  private def naive(ops: Seq[Op], table: String): Map[Long, String] =
    ops.filter(_._3 == table).sortBy(o => (o._1, o._2))
      .foldLeft(Map.empty[Long, String]) {
        case (state, (_, _, _, "DELETE", k, _)) => state - k
        case (state, (_, _, _, _, k, v)) => state + (k -> v)
      }

  private val reg = tables.map(t =>
    ("db", t) -> Seq("k", "seq", "v")).toMap

  private def wireDf(ops: Seq[Op]) =
    ops.map { case (tso, seq, table, op, k, v) =>
      val img = Map("k" -> k.toString, "seq" -> seq.toString, "v" -> v)
      val (before, after) =
        if (op == "DELETE") (img, Map.empty[String, String])
        else (Map.empty[String, String], img)
      (tso, tso, op, "db", table, before, after, null: String,
        1700000000L)
    }.toDF("tso", "txnId", "op", "schemaName", "tableName", "before",
      "after", "ddl", "tsoTime")

  test("random 2-DN streams over phased restarts == sequential fold (2 rounds)") {
    val rnd = new scala.util.Random(20260816L)
    (1 to 2).foreach { round =>
      val root = java.nio.file.Files
        .createTempDirectory(s"graft-cdcfuzz$round").toString
      val sids = dns.map(dn => dn -> java.util.UUID.fromString(
        f"00000000-0000-4000-8000-${round}%06d${dns.indexOf(dn)}%06d"))
        .toMap
      dns.foreach(dn => java.nio.file.Files.createDirectories(
        java.nio.file.Paths.get(s"$root/$dn")))
      val targets = tables.map { t =>
        WireReplicaJob.TableTarget("db", t,
          Seq("k" -> "long", "seq" -> "long", "v" -> "string"),
          Seq("k"), "seq", s"$root/t_$t", 2)
      }

      // global txns 1..N, each assigned to one DN
      var seq = 0L
      val nKeys = 3 + rnd.nextInt(6)
      val nTxn = 12L + rnd.nextInt(16)
      val txns = (1L to nTxn).map { tso =>
        val ops = (0 until 1 + rnd.nextInt(3)).map { _ =>
          seq += 1
          val op = rnd.nextInt(4) match {
            case 0 => "INSERT"; case 1 | 2 => "UPDATE"; case _ => "DELETE"
          }
          (tso, seq, tables(rnd.nextInt(tables.size)), op,
            rnd.nextInt(nKeys).toLong, s"v$seq")
        }
        (tso, dns(rnd.nextInt(dns.size)), ops)
      }
      val allOps = txns.flatMap(_._3)

      // random increasing phase cutoffs over the global tso order
      val cuts = (rnd.shuffle((1L until nTxn).toList).take(2).sorted
        :+ nTxn).distinct
      val prior = scala.collection.mutable.Map(
        dns.map(_ -> GtidSet.Empty): _*)
      val fileIdx = scala.collection.mutable.Map(dns.map(_ -> 0): _*)

      def publishPhase(lo: Long, hi: Long): Unit = dns.foreach { dn =>
        val mine = txns.filter(t => t._2 == dn && t._1 > lo && t._1 <= hi)
        if (mine.nonEmpty) {
          val d = java.nio.file.Files
            .createTempDirectory("graft-cdcfuzz-w").toString
          BinlogWire.writeChangeStreamBinlogFiles(
            wireDf(mine.flatMap(_._3)).coalesce(1)
              .sortWithinPartitions("tso", "txnId"),
            reg, d, checksummed = true, gtidSid = Some(sids(dn)),
            priorExecuted = prior(dn))
          java.nio.file.Files.copy(
            java.nio.file.Paths.get(d, "binlog.000000"),
            java.nio.file.Paths.get(s"$root/$dn",
              f"binlog.${fileIdx(dn)}%06d"))
          fileIdx(dn) += 1
          prior(dn) = mine.foldLeft(prior(dn))((s, t) =>
            s.add(sids(dn), t._1))
        }
      }

      def drain(ports: Map[String, Int]): Unit = {
        val q = spark.readStream.format("graft-cdc")
          .option("endpoints",
            dns.map(dn => s"$dn@localhost:${ports(dn)}").mkString(","))
          .option("user", "repl").option("password", "pw")
          .option("tables", tables.map(t => s"db.$t:k,seq,v").mkString(";"))
          .load()
          .writeStream
          .option("checkpointLocation", s"$root/ckpt")
          .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
            val staged = graft.operators.Staged.parquetStage(
              batch, s"$root/stage")
            WireReplicaJob.applyRouted(staged, targets,
              txnsPerCommit = 1 + rnd.nextInt(3))
            ()
          }
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
      }

      var lo = 0L
      cuts.foreach { hi =>
        publishPhase(lo, hi)
        lo = hi
        val servers = dns.map(dn =>
          dn -> new graft.sinks.BinlogDumpServer(s"$root/$dn",
            "repl", "pw")).toMap
        try drain(servers.view.mapValues(_.port).toMap)
        finally servers.values.foreach(_.close())
      }
      // one more restart with NOTHING new: the checkpointed offsets
      // must make it a no-op
      val servers = dns.map(dn =>
        dn -> new graft.sinks.BinlogDumpServer(s"$root/$dn",
          "repl", "pw")).toMap
      try drain(servers.view.mapValues(_.port).toMap)
      finally servers.values.foreach(_.close())

      tables.foreach { t =>
        val got = TxnApplier.readCurrent(spark, s"$root/t_$t")
          .select($"k", $"v").as[(Long, String)].collect().toMap
        assert(got == naive(allOps, t),
          s"round $round table $t diverged (seed-fixed)")
      }
    }
  }
}
