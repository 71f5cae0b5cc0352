package graft.jobs

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.TxnApplier

/** Randomized routed-replica fuzz (the qatest/random discipline applied
  * to the round's headline feature): seeded random multi-table change
  * streams, cut into random txn-aligned batches with random REPLAYS,
  * routed through per-table targets — the final state of every table
  * must equal a naive sequential fold, and replays must never double a
  * transaction. */
class RoutedReplicaFuzzSpec extends SparkSpec {
  import spark.implicits._

  private val tables = Seq("alpha", "beta")

  // (tso, seq, table, op, key, value)
  private type Op = (Long, Long, String, String, Long, String)

  private def naive(ops: Seq[Op], table: String): Map[Long, String] =
    ops.filter(_._3 == table).sortBy(o => (o._1, o._2))
      .foldLeft(Map.empty[Long, String]) {
        case (state, (_, _, _, "DELETE", k, _)) => state - k
        case (state, (_, _, _, _, k, v)) => state + (k -> v)
      }

  private def decodedOf(ops: Seq[Op]) =
    ops.map { case (tso, seq, table, op, k, v) =>
      val img = Map("k" -> k.toString, "seq" -> seq.toString, "v" -> v)
      val (before, after) =
        if (op == "DELETE") (img, Map.empty[String, String])
        else (Map.empty[String, String], img)
      (tso, op, "db", table, before, after)
    }.toDF("tso", "op", "schemaName", "tableName", "before", "after")

  test("random two-table streams in random txn batches with replays == sequential fold (5 rounds)") {
    val rnd = new scala.util.Random(20260814L)
    (1 to 5).foreach { round =>
      val root = java.nio.file.Files
        .createTempDirectory(s"graft-rfuzz$round").toString
      val targets = tables.map { t =>
        WireReplicaJob.TableTarget("db", t,
          Seq("k" -> "long", "seq" -> "long", "v" -> "string"),
          Seq("k"), "seq", s"$root/$t", 2)
      }
      var seq = 0L
      val nKeys = 3 + rnd.nextInt(8)
      val txns = (1L to (10L + rnd.nextInt(20))).map { tso =>
        tso -> (0 until 1 + rnd.nextInt(3)).map { _ =>
          seq += 1
          val table = tables(rnd.nextInt(tables.size))
          val op = rnd.nextInt(4) match {
            case 0 => "INSERT"; case 1 | 2 => "UPDATE"; case _ => "DELETE"
          }
          (tso, seq, table, op, rnd.nextInt(nKeys).toLong, s"v$seq")
        }
      }
      val allOps = txns.flatMap(_._2)

      // random txn-aligned batch boundaries; ~1/3 of batches replay
      var i = 0
      var prev = Option.empty[Seq[Op]]
      while (i < txns.size) {
        val take = 1 + rnd.nextInt(6)
        val batch = txns.slice(i, i + take).flatMap(_._2)
        i += take
        WireReplicaJob.applyRouted(decodedOf(batch), targets,
          txnsPerCommit = 1 + rnd.nextInt(3))
        if (rnd.nextInt(3) == 0)
          prev.foreach(p => WireReplicaJob.applyRouted(decodedOf(p),
            targets, txnsPerCommit = 2)) // replay: the gate must drop it
        prev = Some(batch)
      }

      tables.foreach { t =>
        val got = TxnApplier.readCurrent(spark, s"$root/$t")
          .select($"k", $"v").as[(Long, String)].collect().toMap
        assert(got == naive(allOps, t),
          s"round $round table $t diverged (seed-fixed)")
      }
    }
  }
}
